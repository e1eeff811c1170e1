"""Shared tokenization primitives (leaf module — no package imports).

Lives below every inventory module so `curation` and `selection` can both
use these without a cycle through ``queries`` (queries imports every
inventory module at registration time; a `from .curation import _WS` in
`selection` raced curation's own module init when a test imported
curation first).
"""

from __future__ import annotations

import pyspark.sql.functions as F

# pinned ASCII whitespace class (kernels/rules.py tokenization spec):
# Python/Java \s is Unicode while DuckDB's RE2 \s is ASCII-only
_WS = "[ \\t\\n\\r\\f\\x0B]+"


def _toks(col: str = "text"):
    return F.filter(F.split(F.lower(col), _WS), lambda x: x != "")


def _fnv1a(word: str) -> int:
    h = 0xCBF29CE484222325
    for b in word.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


_HEX = "0123456789abcdef"


def md5_bucket_sql(instr_fn: str, expr: str, nibbles: int = 2) -> str:
    """0-based engine-portable hash bucket from the first md5 hex
    nibbles of ``expr``: position-in-hex-alphabet (both engines'
    instr/strpos are 1-based) folded base-16, so nibbles=1 covers
    [0, 16) and nibbles=2 covers [0, 256). One definition for the DSIR
    bigram buckets, the classifier-training feature space, and the
    export shard id — a portability fix lands in one place."""
    terms = []
    for i in range(1, nibbles + 1):
        scale = 16 ** (nibbles - i)
        pos = f"({instr_fn}('{_HEX}', substr(md5({expr}),{i},1))-1)"
        terms.append(f"{pos}*{scale}" if scale > 1 else pos)
    return "(" + " + ".join(terms) + ")"
