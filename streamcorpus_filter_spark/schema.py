"""Declared schemas — never inferred (inference at 10^12 rows is a full scan).

The ``pages`` shape is pinned by the task spec (BASELINE.json:15 input_hint):
(url:string, warc_ts:timestamp, html:binary, text:string, lang:string).
It is the Spark translation of the reference's Thrift StreamItem
(abs_url / stream_time / body.raw / body.clean_visible / language tag)
[RECALL — SURVEY.md §1.2].
"""

from __future__ import annotations

import pyspark.sql.types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# output of ql_ac_match: reference Rating{target_id, mentions} analog
MATCH_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("target_id", T.StringType(), False),
            T.StructField("name", T.StringType(), False),
            T.StructField("begin", T.IntegerType(), False),
            T.StructField("end", T.IntegerType(), False),
        ]
    )
)

# full pipeline output row (FIXTURES.md §B.4)
FILTERED_SCHEMA = T.StructType(
    list(PAGES_SCHEMA.fields)
    + [
        T.StructField("lang_pred", T.StringType(), True),
        T.StructField("lang_conf", T.DoubleType(), True),
        T.StructField("ppl", T.DoubleType(), True),
        T.StructField("matches", MATCH_SCHEMA, True),
        T.StructField("patterns_matched", T.IntegerType(), True),
        T.StructField("scrubbed_text", T.StringType(), True),
        T.StructField("bytes_scrubbed", T.LongType(), True),
        T.StructField("keep", T.BooleanType(), True),
        T.StructField("drop_reason", T.StringType(), True),
    ]
)

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("snapshot_id", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("docs_seen", T.LongType(), False),
        T.StructField("docs_kept", T.LongType(), False),
        T.StructField("langid_hits", T.LongType(), False),
        T.StructField("ppl_drops", T.LongType(), False),
        T.StructField("patterns_matched", T.LongType(), False),
        T.StructField("bytes_scrubbed", T.LongType(), False),
    ]
)
