"""UDF / UDAF / UDTF surface rows (SURVEY.md §2.11) as driver-checkable
queries — one per Python-execution mechanism, each against a DuckDB
oracle so the Arrow round-trip itself is under the value-hash check.

  udf_scalar_pandas  pandas_udf Series->Series        (ArrowEvalPython)
  udf_iter_pandas    mapInPandas iterator form        (MapInPandas)
  udaf_grouped_agg   grouped-agg pandas_udf           (AggregateInPandas)
  udtf_grouped_map   applyInPandas per-group          (FlatMapGroupsInPandas)
  udtf_explode       @udtf lateral table function     (Python UDTF, Spark 4)
  udf_arrow_batch    mapInArrow zero-pandas hot path  (MapInArrow)

The spec bans per-row Python in the PIPELINE hot path (BASELINE.json:15);
udtf_explode is the one deliberate exception here because Python UDTFs
evaluate row-at-a-time by design — it exists as a capability-parity row
(SURVEY.md §2.11 P2), not a pipeline stage.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..queries import load, register


@register(
    "udf_scalar_pandas",
    """
    SELECT doc_id,
           length(regexp_replace(coalesce(text, ''), '[ \\t\\n\\r\\f\\v]+', ' ', 'g')) AS folded_len
    FROM documents
    """,
)
def udf_scalar_pandas(spark: SparkSession, sf: str) -> DataFrame:
    """Scalar pandas UDF (Series -> Series): whitespace-fold length.
    pandas' vectorized .str engine on the Arrow batch; no per-row Spark
    rows are materialized. Both sides fold on the pinned ASCII whitespace
    class (kernels/rules.py tokenization spec): Python-regex \\s is
    Unicode (NBSP, ideographic space) while DuckDB's RE2 \\s is
    ASCII-only, so an unpinned \\s would diverge on non-ASCII spaces."""

    @F.pandas_udf("int")
    def folded_len(s: pd.Series) -> pd.Series:
        # NULL text == '' (kernel contract; .str ops propagate NaN and
        # the astype would throw on it)
        return (
            s.fillna("")
            .str.replace(r"[ \t\n\r\f\v]+", " ", regex=True)
            .str.len()
            .astype("int32")
        )

    return load(spark, sf, "documents").select(
        "doc_id", folded_len("text").alias("folded_len")
    )


@register(
    "udf_iter_pandas",
    """
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(coalesce(text, ''), '[ \t\n\r\f\x0B]+'), w -> w <> ''))
                AS BIGINT) AS n_words
    FROM documents
    """,
)
def udf_iter_pandas(spark: SparkSession, sf: str) -> DataFrame:
    """mapInPandas (Iterator[pd.DataFrame] form): per-worker setup (the
    compiled splitter) is paid once per partition, then amortized across
    every Arrow batch the iterator yields."""
    import re

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # pinned ASCII whitespace class (kernels/rules.py spec) — the
        # compiled pattern stands in for expensive per-worker init
        split = re.compile(r"[ \t\n\r\f\x0B]+").split
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_words": pd.array(
                        [
                            sum(1 for w in split(t) if w)
                            if isinstance(t, str) else 0
                            for t in pdf["text"]
                        ],
                        dtype="int64",
                    ),
                }
            )

    return load(spark, sf, "documents").mapInPandas(
        fn, schema="doc_id bigint, n_words bigint"
    )


@register(
    "udaf_grouped_agg",
    """
    SELECT event_type,
           round(avg(value), 6) AS mean_value,
           round(max(value) - min(value), 6) AS value_range
    FROM events GROUP BY event_type
    """,
)
def udaf_grouped_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Grouped-aggregate pandas UDFs (Series -> scalar) under groupBy."""

    @F.pandas_udf("double")
    def mean_udaf(v: pd.Series) -> float:
        return float(v.mean())

    @F.pandas_udf("double")
    def range_udaf(v: pd.Series) -> float:
        return float(v.max() - v.min())

    return (
        load(spark, sf, "events")
        .groupBy("event_type")
        .agg(
            F.round(mean_udaf("value"), 6).alias("mean_value"),
            F.round(range_udaf("value"), 6).alias("value_range"),
        )
    )


@register(
    "udtf_grouped_map",
    """
    SELECT event_id,
           value - min(value) OVER (PARTITION BY user_id) AS centered
    FROM events
    """,
)
def udtf_grouped_map(spark: SparkSession, sf: str) -> DataFrame:
    """applyInPandas (per-group DataFrame -> DataFrame): within-group
    normalization (shift to the group minimum) — the per-host
    normalization shape. Min (unlike mean) is order-independent and the
    subtraction is a single exact float op, so the result hash-matches the
    oracle bit-for-bit with no rounding games."""

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "centered": pdf["value"] - pdf["value"].min(),
            }
        )

    return (
        load(spark, sf, "events")
        .groupBy("user_id")
        .applyInPandas(center, schema="event_id bigint, centered double")
    )


@register(
    "udtf_explode",
    """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
    SELECT doc_id, words[i] AS tok, CAST(i - 1 AS INT) AS pos
    FROM w, UNNEST(range(1, len(words) + 1)) AS r(i)
    WHERE words[i] <> ''
    """,
)
def udtf_explode(spark: SparkSession, sf: str) -> DataFrame:
    """Python UDTF (Spark 4 @udtf): one input doc -> N (token, pos) rows
    via a lateral join. Capability row, not a hot-path stage (see module
    docstring)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="tok string, pos int")
    class Tokenize:
        def eval(self, doc_id: int, text: str):
            pos = 0
            for tok in (text or "").split(" "):
                if tok:
                    yield tok, pos
                pos += 1

    spark.udtf.register("tokenize_udtf", Tokenize)
    load(spark, sf, "documents").createOrReplaceTempView("docs_udtf_in")
    return spark.sql(
        """
        SELECT d.doc_id, t.tok, t.pos
        FROM docs_udtf_in d,
             LATERAL tokenize_udtf(d.doc_id, d.text) t
        """
    )


@register(
    "udf_arrow_batch",
    """
    SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars
    FROM documents
    """,
)
def udf_arrow_batch(spark: SparkSession, sf: str) -> DataFrame:
    """mapInArrow: the zero-pandas escape hatch — operates on pyarrow
    RecordBatches directly (no pandas conversion on either side)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            n = pc.cast(
                pc.utf8_length(rb.column(rb.schema.get_field_index("text"))),
                pa.int64(),
            )
            yield pa.RecordBatch.from_arrays(
                [rb.column(rb.schema.get_field_index("doc_id")), n],
                names=["doc_id", "n_chars"],
            )

    return load(spark, sf, "documents").mapInArrow(
        fn, schema="doc_id bigint, n_chars bigint"
    )
