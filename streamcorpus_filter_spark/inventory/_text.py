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
