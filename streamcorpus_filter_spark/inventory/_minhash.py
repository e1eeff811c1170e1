"""Engine-portable MinHash hash-family constants (leaf module).

Imported by BOTH inventory/dedup.py (dedup_minhash_lsh) and
inventory/webcur.py (dedup_incremental_minhash) — a leaf so neither
needs the other mid-import (the registry imports inventory modules in a
fixed order; a cross-import between two registered modules deadlocks on
whichever is imported directly first, e.g. by a test).

Family: ONE md5 per shingle reduced to a base value x < p = 2^31 - 1
(hex prefix parsed identically by Spark's conv() and DuckDB's
CAST('0x…')), then perm_i = (a_i * x + b_i) mod p — the
pairwise-independent universal family standard MinHash implementations
use, with per-permutation constants derived from md5 at codegen time
and INLINED in the generated SQL. All arithmetic stays < 2^62 (exact in
BIGINT on any engine). See dedup._minhash_sql for the measured history.
"""

from __future__ import annotations

# Spark-dialect regex literal for the pinned ASCII whitespace class
# (double-backslash: Spark SQL string literals eat one level)
MINHASH_TOK = r"[ \\t\\n\\r\\f\\x0B]+"

MH_P = (1 << 31) - 1


def mh_constants(n_perm: int) -> list[tuple[int, int]]:
    import hashlib

    out = []
    for i in range(n_perm):
        a = int(hashlib.md5(f"minhash-a-{i}".encode()).hexdigest()[:12], 16)
        b = int(hashlib.md5(f"minhash-b-{i}".encode()).hexdigest()[:12], 16)
        out.append((a % (MH_P - 1) + 1, b % MH_P))
    return out
