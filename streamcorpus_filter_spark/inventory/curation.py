"""Corpus-curation operators (training-data pipeline extras).

Four ops a crawl-curation job runs between raw quality filtering and
training-set export, each expressed with JVM built-ins only (no Python in
the hot path) and each value-checked against a DuckDB oracle:

  * ``ql_classifier_score``  — fastText-style linear bag-of-words scorer:
    a broadcast (word -> weight) literal map folded per row with
    ``aggregate`` — zero shuffles, zero Python.
  * ``ql_stratified_sample`` — deterministic per-language downsampling via
    md5 hex-prefix thresholds (the way over-represented languages are
    rebalanced without a random() that engines can't reproduce).
  * ``txt_salient_terms``    — per-doc top-3 distinctive terms ranked by
    (tf desc, df asc, word) with stopwords removed — a float-free tf-idf
    ranking that is exactly reproducible on any engine.
  * ``curation_pipeline``    — the composition: length gate -> exact
    near-dup keep-first -> per-language rollup of kept/dup counts, i.e.
    the whole curation funnel as ONE declarative plan.

Scale notes are in each docstring; the common theme is that per-row work
stays in whole-stage codegen and the only shuffles are the aggregations
that genuinely need them (per-word df, per-hash keep-first).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..kernels.rules import STOPWORDS
from ..queries import load, register

# pinned ASCII whitespace class (kernels/rules.py tokenization spec):
# Python/Java \s is Unicode while DuckDB's RE2 \s is ASCII-only
_WS = "[ \\t\\n\\r\\f\\x0B]+"


def _toks(col: str = "text"):
    return F.filter(F.split(F.lower(col), _WS), lambda x: x != "")


# --------------------------------------------------- linear classifier

# Deterministic (word -> weight) table: FNV-1a of the word mapped to
# [-1000, 1000] micro-units. Shared verbatim by the Spark literal map and
# the generated SQL CASE, so both engines score identically. In a real
# deployment this is the trained fastText/logreg weight vector, broadcast
# exactly the same way.
_CONTENT_WORDS = (
    "data spark filter quality corpus model token language pipeline web "
    "crawl page text score train sample noise clean duplicate pattern"
).split()


def _fnv1a(word: str) -> int:
    h = 0xCBF29CE484222325
    for b in word.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


CLF_VOCAB: dict[str, int] = {
    w: (_fnv1a(w) % 2001) - 1000
    for w in (*STOPWORDS, *_CONTENT_WORDS)
}


def _clf_case_sql() -> str:
    arms = " ".join(
        f"WHEN '{w}' THEN {v}" for w, v in sorted(CLF_VOCAB.items())
    )
    return f"CASE w {arms} ELSE 0 END"


@register(
    "ql_classifier_score",
    f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '{_WS}'), x -> x <> '') AS toks
      FROM documents
    )
    SELECT doc_id,
           CAST(coalesce(list_sum(list_transform(toks, w -> {_clf_case_sql()})), 0)
                AS BIGINT) AS logit_micro,
           CAST(coalesce(list_sum(list_transform(toks, w -> {_clf_case_sql()})), 0)
                AS BIGINT) > 0 AS pred
    FROM t
    """,
)
def ql_classifier_score(spark: SparkSession, sf: str) -> DataFrame:
    """fastText-style linear bag-of-words classifier: logit = sum of
    per-token weights from a broadcast vocabulary, prediction = sign.
    Weights are integer micro-units so the fold is exact under any
    evaluation order (float dot products differ in the last ulps between
    engines — and between partitions).

    Scale shape: the vocab map is a LITERAL in the plan (a real model
    ships the same way via broadcast); scoring is one `transform` +
    `aggregate` per row inside whole-stage codegen — zero shuffles, zero
    Python, embarrassingly parallel at any corpus size."""
    vocab = F.create_map(
        *[F.lit(x) for w, v in sorted(CLF_VOCAB.items()) for x in (w, v)]
    )
    logit = F.aggregate(
        F.transform(_toks(), lambda w: F.coalesce(vocab[w], F.lit(0))),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return load(spark, sf, "documents").select(
        "doc_id",
        logit.alias("logit_micro"),
        (logit > 0).alias("pred"),
    )


# --------------------------------------------------- stratified sampling

# per-language md5-hex-prefix keep thresholds (4 hex chars, compared
# lexicographically == numerically): en is downsampled to 25%, de to 50%,
# everything else kept. Deterministic, seedless, identical on any engine.
SAMPLE_THRESHOLDS: dict[str, str] = {"en": "3fff", "de": "7fff"}
_DEFAULT_THRESHOLD = "ffff"


@register(
    "ql_stratified_sample",
    f"""
    SELECT doc_id, lang,
           substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS bucket
    FROM documents
    WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) <=
          CASE lang {' '.join(f"WHEN '{k}' THEN '{v}'" for k, v in sorted(SAMPLE_THRESHOLDS.items()))}
                    ELSE '{_DEFAULT_THRESHOLD}' END
    """,
)
def ql_stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic per-language downsampling: keep a doc iff the first
    4 hex chars of md5(doc_id) fall under the language's threshold
    (en -> 25%, de -> 50%, default keep). Hash-bucket sampling instead of
    rand() because it is reproducible across engines, retries, and
    resumed runs — the property a resumable 10^12-doc job needs.

    Scale shape: a scalar predicate on a scan — pushes down, no shuffle,
    no state; rebalancing a trillion docs costs one pass."""
    thr = F.create_map(
        *[F.lit(x) for k, v in sorted(SAMPLE_THRESHOLDS.items()) for x in (k, v)]
    )
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    return (
        load(spark, sf, "documents")
        .select("doc_id", "lang", bucket.alias("bucket"))
        .filter(
            F.col("bucket")
            <= F.coalesce(thr[F.col("lang")], F.lit(_DEFAULT_THRESHOLD))
        )
    )


# --------------------------------------------------- salient terms

_STOP_IN = ", ".join(f"'{w}'" for w in sorted(STOPWORDS))


@register(
    "txt_salient_terms",
    f"""
    WITH tf AS (
      SELECT doc_id, w AS word, count(*) AS tf
      FROM (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(text), '{_WS}'),
                                  x -> x <> '')) AS w
        FROM documents
      )
      WHERE w NOT IN ({_STOP_IN})
      GROUP BY doc_id, w
    ),
    df AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
    ranked AS (
      SELECT tf.doc_id, tf.word, tf.tf, df.df,
             row_number() OVER (PARTITION BY tf.doc_id
                                ORDER BY tf.tf DESC, df.df ASC, tf.word) AS rnk
      FROM tf JOIN df USING (word)
    )
    SELECT doc_id, word, tf, df, rnk FROM ranked WHERE rnk <= 3
    """,
)
def txt_salient_terms(spark: SparkSession, sf: str) -> DataFrame:
    """Per-doc top-3 distinctive terms: stopwords removed, ranked by
    (tf desc, df asc, word asc) — the tf-idf ordering computed on exact
    integers so every engine agrees (log-based idf floats differ in the
    last ulps and break cross-engine rank ties).

    Scale shape: explode -> per-(doc,word) count with map-side partial
    aggregation; per-word df is a second partial agg over the already
    deduped (doc,word) pairs (orders of magnitude smaller than the token
    stream); the df join broadcasts when the vocab is small and
    shuffle-joins on `word` otherwise; final top-3 is a bounded window
    per doc. No step holds more than (distinct words per doc) per key."""
    tf = (
        load(spark, sf, "documents")
        .select("doc_id", F.explode(_toks()).alias("word"))
        .filter(~F.col("word").isin(*sorted(STOPWORDS)))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("word").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("word").asc()
    )
    return (
        tf.join(df_, "word")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "word", "tf", "df", "rnk")
    )


# --------------------------------------------------- curation funnel

_MIN_CHARS = 120
# dedup key: md5 of the first 40 chars — the boilerplate-prefix
# fingerprint (exact full-text dups are the degenerate case; prefix
# fingerprints also catch template pages that differ only in the tail)
_FP_CHARS = 40


@register(
    "curation_pipeline",
    f"""
    WITH gated AS (
      SELECT doc_id, lang, n_chars, md5(substring(text, 1, {_FP_CHARS})) AS h
      FROM documents WHERE n_chars >= {_MIN_CHARS}
    ),
    keyed AS (
      SELECT doc_id, lang, n_chars,
             min(doc_id) OVER (PARTITION BY h) AS keep_id
      FROM gated
    )
    SELECT lang,
           count(*) AS docs_gated,
           CAST(sum(CASE WHEN doc_id = keep_id THEN 1 ELSE 0 END) AS BIGINT) AS docs_kept,
           CAST(sum(CASE WHEN doc_id <> keep_id THEN 1 ELSE 0 END) AS BIGINT) AS docs_dup,
           CAST(sum(CASE WHEN doc_id = keep_id THEN n_chars ELSE 0 END) AS BIGINT) AS chars_kept
    FROM keyed
    GROUP BY lang
    """,
)
def curation_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    """The curation funnel as one declarative plan: length gate ->
    prefix-fingerprint dedup keep-first (min doc_id per md5 of the first
    40 chars) -> per-language rollup of gated/kept/dup counts and kept
    bytes. This is the lineage-metrics summary a 10^12-doc curation job
    emits per run.

    Scale shape: the gate is a pushed-down scan predicate (verified in
    the plan: `PushedFilters: [GreaterThanOrEqual(n_chars,120)]`);
    keep-first is `min(doc_id) over (partition by h)` — ONE scan of the
    corpus and ONE shuffle on the 128-bit hash (uniform keys, no skew by
    construction), where the groupBy+join-back formulation read the
    corpus twice (Catalyst does not reuse a scan across differently
    aggregated subtrees — measured in the plan: 6 exchanges, 2 scans vs
    2 exchanges, 1 scan here); the final per-lang rollup aggregates a
    handful of rows."""
    w = Window.partitionBy("h")
    kept = F.col("doc_id") == F.col("keep_id")
    return (
        load(spark, sf, "documents")
        .filter(F.col("n_chars") >= _MIN_CHARS)
        .select(
            "doc_id", "lang", "n_chars",
            F.md5(F.substring("text", 1, _FP_CHARS)).alias("h"),
        )
        .withColumn("keep_id", F.min("doc_id").over(w))
        .groupBy("lang")
        .agg(
            F.count("*").alias("docs_gated"),
            F.sum(F.when(kept, 1).otherwise(0)).alias("docs_kept"),
            F.sum(F.when(~kept, 1).otherwise(0)).alias("docs_dup"),
            F.sum(F.when(kept, F.col("n_chars")).otherwise(0)).alias("chars_kept"),
        )
    )
