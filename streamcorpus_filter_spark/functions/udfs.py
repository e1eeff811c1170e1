"""Pandas-UDF factories for the pattern-match kernels.

Every factory takes a ``Broadcast`` handle (the automaton / model compiled
once on the driver) and returns an Arrow-vectorized pandas UDF. Per-row
Python Spark UDFs are banned by the spec (BASELINE.json:15); the Python
loop inside each kernel is over byte-columns of the whole Arrow batch,
not over rows.

Reference parity: this is the executor half of the reference's
ac_automata_search main loop (SURVEY.md §2.1 [RECALL]) — one shared
automaton, O(text) per document, every hit reported with offsets.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F

from ..kernels.automaton import ACAutomaton
from ..names import FilterNames

COUNTS_TYPE = "struct<patterns_matched: int, total_hits: int>"
MATCHES_TYPE = (
    "array<struct<target_id: string, name: string, begin: int, end: int>>"
)


def _encode_series(s: pd.Series) -> list[bytes]:
    return [ACAutomaton.encode(t) if isinstance(t, str) else b"" for t in s]


def ac_count_udf(bc_automaton):
    """text -> struct(patterns_matched, total_hits). The filter-predicate
    fast path: no offset materialization, minimal Arrow payload back."""

    @F.pandas_udf(COUNTS_TYPE)
    def match_counts(s: pd.Series) -> pd.DataFrame:
        ac: ACAutomaton = bc_automaton.value
        distinct, total = ac.count_batch(_encode_series(s))
        return pd.DataFrame(
            {
                "patterns_matched": distinct.astype("int32"),
                "total_hits": total.astype("int32"),
            }
        )

    return match_counts


def ac_spans_udf(bc_automaton, bc_filternames):
    """text -> array<struct(target_id,name,begin,end)> — the reference's
    Rating-annotation analog; byte offsets into lowercased UTF-8 text."""

    @F.pandas_udf(MATCHES_TYPE)
    def match_spans(s: pd.Series) -> pd.Series:
        ac: ACAutomaton = bc_automaton.value
        fn: FilterNames = bc_filternames.value
        names = fn.names
        rows, begins, pids = ac.search_batch(_encode_series(s))
        out: list[list[dict]] = [[] for _ in range(len(s))]
        lens = ac.pat_lens
        for r, b, p in zip(rows.tolist(), begins.tolist(), pids.tolist()):
            name = names[p]
            for tid in fn.name_to_target_ids[name]:
                out[r].append(
                    {
                        "target_id": tid,
                        "name": name,
                        "begin": b,
                        "end": b + int(lens[p]),
                    }
                )
        return pd.Series(out)

    return match_spans
