"""FilterNames — the reference's entire "query language".

The reference drives its filter from a Thrift struct FilterNames
(``filternames.thrift`` [RECALL — SURVEY.md §1.1]): a dictionary
``target_id -> [surface-form names]`` plus the inverse
``name -> [target_ids]``. We model it as a plain dataclass built from any
mapping (or a two-column DataFrame), compiled once into an ACAutomaton on
the driver and broadcast.

``DEFAULT_FILTER_NAMES`` is a fixture dictionary whose surface forms are
drawn from the synthetic ``documents`` vocabulary so the match stage has
real hits on the driver test tables. Every name is chosen to be
non-self-overlapping (no proper border), which makes occurrence counts
expressible in ANSI SQL via replace-arithmetic for the DuckDB oracle.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .kernels.automaton import ACAutomaton


@dataclass
class FilterNames:
    target_id_to_names: dict[str, list[str]]
    name_to_target_ids: dict[str, list[str]] = field(default_factory=dict)

    def __post_init__(self) -> None:
        if not self.name_to_target_ids:
            inv: dict[str, list[str]] = {}
            for tid, names in self.target_id_to_names.items():
                for n in names:
                    inv.setdefault(n.lower(), []).append(tid)
            self.name_to_target_ids = inv

    @property
    def names(self) -> list[str]:
        """Unique lowercased surface forms, in stable sorted order —
        pattern ids in the automaton index into this list."""
        return sorted(self.name_to_target_ids)

    def compile(self) -> ACAutomaton:
        return ACAutomaton(self.names)

    # -- builder round-trip (the reference's EP-R3 FilterNames builder
    # serialized a Thrift blob; ours is a JSON artifact + a loader from a
    # two-column names table — SURVEY.md §3.1)

    def to_json(self) -> str:
        import json

        return json.dumps(
            {"target_id_to_names": self.target_id_to_names}, sort_keys=True
        )

    @classmethod
    def from_json(cls, s: str) -> "FilterNames":
        import json

        return cls(json.loads(s)["target_id_to_names"])

    @classmethod
    def from_dataframe(cls, df, target_col: str = "target_id", name_col: str = "name"):
        """Build from a (target_id, name) DataFrame — the names table form.
        Collects to the driver: the dictionary is the broadcast-side small
        dim by construction (10^4-10^6 names, not corpus-sized)."""
        mapping: dict[str, list[str]] = {}
        for row in df.select(target_col, name_col).collect():
            mapping.setdefault(str(row[0]), []).append(str(row[1]))
        return cls({k: sorted(v) for k, v in mapping.items()})


DEFAULT_FILTER_NAMES = FilterNames(
    {
        "ent_spark": ["spark"],
        "ent_merge": ["merge", "sort merge"],
        "ent_stream": ["stream"],
        "ent_vector": ["vector"],
        "ent_customer": ["customer"],
        "ent_hashjoin": ["hash join"],
        "ent_query": ["query"],
        "ent_batch": ["batch"],
    }
)


def occurrences_sql(names: list[str], text_expr: str = "lower(text)") -> str:
    """ANSI-SQL total-occurrence count of all names in ``text_expr``
    (non-overlapping == all occurrences because names have no proper
    border). Used to generate the DuckDB oracle for ql_ac_match."""
    parts = [
        f"CAST((length({text_expr}) - length(replace({text_expr}, '{n}', ''))) / {len(n)} AS BIGINT)"
        for n in names
    ]
    return " + ".join(parts)


def presence_sql(names: list[str], text_expr: str = "lower(text)") -> str:
    """ANSI-SQL count of distinct names present in ``text_expr``."""
    parts = [
        f"(CASE WHEN {text_expr} LIKE '%{n}%' THEN 1 ELSE 0 END)" for n in names
    ]
    return "CAST(" + " + ".join(parts) + " AS BIGINT)"
