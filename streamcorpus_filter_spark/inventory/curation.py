"""Corpus-curation operators (training-data pipeline extras).

Ops a crawl-curation job runs between raw quality filtering and
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
  * ``ql_source_mix``        — deterministic per-source up/downsampling
    (training-corpus mixing weights as exact 1/1000ths; hash-bucketed
    fractional copies, no rand()).
  * ``txt_pack_bins``        — sequence-packing bin assignment: length
    buckets + fixed-capacity packs in deterministic doc order (the
    dataloader grouping that minimizes padding).

Scale notes are in each docstring; the common theme is that per-row work
stays in whole-stage codegen and the only shuffles are the aggregations
that genuinely need them (per-word df, per-hash keep-first).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..kernels.rules import STOPWORDS
from ..queries import load, register
from ._text import (  # noqa: F401  (re-exported: tests import from here)
    _WS,
    _fnv1a,
    _toks,
    md5_bucket_sql,
)


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
             list_filter(string_split_regex(lower(coalesce(text, '')), '{_WS}'), x -> x <> '') AS toks
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
        F.transform(_toks(F.coalesce("text", F.lit(""))), lambda w: F.coalesce(vocab[w], F.lit(0))),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return load(spark, sf, "documents").select(
        "doc_id",
        logit.alias("logit_micro"),
        (logit > 0).alias("pred"),
    )


# --------------------------------------------------- classifier training

# hashed-feature space for on-cluster training: 256 buckets via the first
# two md5 hex nibbles — the same engine-portable construction
# ql_dsir_importance uses for its bigram buckets. Bounded key space =
# map-side-combinable shuffle of at most 256 rows per map partition.
CLF_TRAIN_BUCKETS = 256
_CLF_POS_LANG = "en"


def _clf_bucket_sql(instr_fn: str, col: str = "w") -> str:
    """0-based hashed-token bucket in [0, 256) — the shared
    md5-nibble construction (inventory/_text.py)."""
    return md5_bucket_sql(instr_fn, col, nibbles=2)


_CLF_TRAIN_CTES = f"""
    t AS (
      SELECT doc_id, coalesce(lang, '') = '{_CLF_POS_LANG}' AS pos,
             list_filter(string_split_regex(lower(text), '{_WS}'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    k AS (
      SELECT doc_id, pos,
             CAST({_clf_bucket_sql("strpos")} AS BIGINT) AS bucket
      FROM (SELECT doc_id, pos, unnest(toks) AS w FROM t)
    ),
    c AS (
      SELECT bucket,
             CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS c_pos,
             CAST(sum(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS BIGINT) AS c_neg
      FROM k GROUP BY bucket
    ),
    wt AS (
      SELECT bucket, c_pos, c_neg,
             CAST(((c_pos + 1) * (sum(c_neg) OVER () + {CLF_TRAIN_BUCKETS}) * 1000)
                  // ((c_neg + 1) * (sum(c_pos) OVER () + {CLF_TRAIN_BUCKETS}))
                  AS BIGINT) AS w_milli
      FROM c
    )
"""


def _clf_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Per-bucket class-conditional token counts — the sufficient
    statistics of the naive-Bayes-style trainer. One explode + one
    groupBy on a 256-key space: the partial aggregation collapses each
    map partition to <= 256 rows before the shuffle, so training cost is
    one corpus scan regardless of corpus size."""
    d = load(spark, sf, "documents").select(
        (F.coalesce(F.col("lang"), F.lit("")) == _CLF_POS_LANG).alias("pos"),
        F.explode(_toks()).alias("w"),
    )
    return (
        d.select(
            F.expr(_clf_bucket_sql("instr")).cast("long").alias("bucket"),
            "pos",
        )
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("pos"), 1).otherwise(0)).cast("long").alias("c_pos"),
            F.sum(F.when(F.col("pos"), 0).otherwise(1)).cast("long").alias("c_neg"),
        )
    )


@register(
    "ql_classifier_train",
    f"WITH {_CLF_TRAIN_CTES} SELECT bucket, c_pos, c_neg, w_milli FROM wt",
)
def ql_classifier_train(spark: SparkSession, sf: str) -> DataFrame:
    """Train the quality classifier ON-CLUSTER from seed labels: the
    supervised-fastText loop a crawl pipeline runs to bootstrap its own
    filter (label = the deterministic seed rule lang = 'en'; in
    production, a curated seed set rides in the same column). Features
    are hashed-token buckets; the learned weight is the Laplace-smoothed
    class-conditional odds ratio in exact integer milli-units:

        w_milli = 1000 * (c_pos+1)/(T_pos+B) / ((c_neg+1)/(T_neg+B))

    computed by integer cross-multiplication (floor DIV on both engines)
    so training is bit-reproducible under any partitioning — a float
    log-odds sum would differ in the last ulps between engines and
    between retries. ql_classifier_score consumes exactly this artifact
    shape (bucket -> integer weight, broadcast as a literal map).

    Scale shape: one corpus scan, explode in codegen, groupBy on a
    BOUNDED 256-bucket key space (map-side combine collapses each task
    to <= 256 rows before the shuffle — same shape as lm_train_ngrams);
    the totals window runs over the 256-row AGGREGATE, not the corpus.
    At 10^12 docs the int64 cross-products need DECIMAL(38) headroom —
    swap the two CASTs; the plan is unchanged."""
    c = _clf_counts(spark, sf)
    w = Window.partitionBy()
    return (
        c.withColumn("__t_pos", F.sum("c_pos").over(w))
        .withColumn("__t_neg", F.sum("c_neg").over(w))
        .select(
            "bucket",
            "c_pos",
            "c_neg",
            F.expr(
                f"CAST(((c_pos + 1) * (__t_neg + {CLF_TRAIN_BUCKETS}) * 1000)"
                f" DIV ((c_neg + 1) * (__t_pos + {CLF_TRAIN_BUCKETS}))"
                " AS BIGINT)"
            ).alias("w_milli"),
        )
    )


@register(
    "ql_classifier_eval",
    f"""
    WITH {_CLF_TRAIN_CTES},
    lg AS (
      SELECT k.doc_id,
             CAST(sum(wt.w_milli - 1000) AS BIGINT) AS logit_milli
      FROM k JOIN wt USING (bucket) GROUP BY k.doc_id
    ),
    s AS (
      SELECT t.pos, coalesce(lg.logit_milli, 0) > 0 AS pred
      FROM t LEFT JOIN lg USING (doc_id)
    )
    SELECT CAST(sum(CASE WHEN pred AND pos THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           CAST(sum(CASE WHEN pred AND NOT pos THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           CAST(sum(CASE WHEN NOT pred AND pos THEN 1 ELSE 0 END) AS BIGINT) AS fn,
           CAST(sum(CASE WHEN NOT pred AND NOT pos THEN 1 ELSE 0 END) AS BIGINT) AS tn,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST((sum(CASE WHEN pred = pos THEN 1 ELSE 0 END) * 1000)
                // count(*) AS BIGINT) AS accuracy_milli
    FROM s
    """,
)
def ql_classifier_eval(spark: SparkSession, sf: str) -> DataFrame:
    """Train-then-eval in one plan: score every document with the
    ql_classifier_train weights (logit = sum over tokens of
    w_milli - 1000, i.e. log-odds-ish around the neutral ratio 1.000;
    pred = logit > 0) and roll up the confusion matrix against the seed
    labels — the self-diagnostic a pipeline runs before trusting a
    freshly trained filter (the north rule's F1 gate, computed on the
    cluster instead of a driver-side sklearn pass).

    Scale shape: the trained weight table is <= 256 rows — broadcast to
    the scoring join, so the corpus never shuffles on bucket; per-doc
    logits are one groupBy(doc_id) with map-side partial sums; the
    confusion rollup is a global agg of four integer counters (partial
    agg makes the final shuffle 1 row per task). Docs with zero tokens
    re-enter at the left join with logit 0 -> pred false, so short/empty
    pages are counted, not dropped."""
    weights = ql_classifier_train(spark, sf).select("bucket", "w_milli")
    docs = load(spark, sf, "documents")
    logits = (
        docs.select("doc_id", F.explode(_toks()).alias("w"))
        .select(
            "doc_id",
            F.expr(_clf_bucket_sql("instr")).cast("long").alias("bucket"),
        )
        .join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("w_milli") - 1000).cast("long").alias("logit_milli")
        )
    )
    scored = (
        docs.select(
            "doc_id",
            (F.coalesce(F.col("lang"), F.lit("")) == _CLF_POS_LANG).alias("pos"),
        )
        .join(logits, "doc_id", "left")
        .select(
            "pos",
            (F.coalesce(F.col("logit_milli"), F.lit(0)) > 0).alias("pred"),
        )
    )
    return scored.agg(
        F.sum(F.when(F.col("pred") & F.col("pos"), 1).otherwise(0))
        .cast("long")
        .alias("tp"),
        F.sum(F.when(F.col("pred") & ~F.col("pos"), 1).otherwise(0))
        .cast("long")
        .alias("fp"),
        F.sum(F.when(~F.col("pred") & F.col("pos"), 1).otherwise(0))
        .cast("long")
        .alias("fn"),
        F.sum(F.when(~F.col("pred") & ~F.col("pos"), 1).otherwise(0))
        .cast("long")
        .alias("tn"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    ).select(
        "*",
        F.expr(
            "CAST(((tp + tn) * 1000) DIV (tp + fp + fn + tn) AS BIGINT)"
        ).alias("accuracy_milli"),
    )


# ------------------------------------------------ classifier calibration

# reliability bins over the logit: clamp to [-4000, 3999], 1000-milli
# wide -> 8 bins. Clamp-then-shift keeps the binning in NON-NEGATIVE
# integers so truncating division (DIV / //) equals floor on both
# engines — no half-mode or negative-floor divergence possible.
CLF_CAL_CLAMP = 4000
CLF_CAL_BIN = 1000

_CAL_BIN_SQL = (
    f"(greatest(least(logit, {CLF_CAL_CLAMP - 1}), -{CLF_CAL_CLAMP})"
    f" + {CLF_CAL_CLAMP})"
)


@register(
    "ql_classifier_calibration",
    f"""
    WITH {_CLF_TRAIN_CTES},
    lg AS (
      SELECT k.doc_id,
             CAST(sum(wt.w_milli - 1000) AS BIGINT) AS logit_milli
      FROM k JOIN wt USING (bucket) GROUP BY k.doc_id
    ),
    s AS (
      SELECT t.pos, coalesce(lg.logit_milli, 0) AS logit
      FROM t LEFT JOIN lg USING (doc_id)
    ),
    b AS (
      SELECT CAST({_CAL_BIN_SQL} // {CLF_CAL_BIN} AS BIGINT) AS bin,
             pos, logit
      FROM s
    )
    SELECT bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
           CAST((sum(CASE WHEN pos THEN 1 ELSE 0 END) * 1000) // count(*)
                AS BIGINT) AS pos_rate_milli,
           CAST(CAST(sum(logit) AS BIGINT) // count(*)
                AS BIGINT) AS mean_logit_milli
    FROM b GROUP BY bin
    """,
)
def ql_classifier_calibration(spark: SparkSession, sf: str) -> DataFrame:
    """Reliability diagram for the on-cluster classifier: bin every
    document's logit into 8 fixed 1000-milli-wide bins (clamped at
    +/-4000) and report, per bin, the document count, the positive-label
    count, the empirical positive rate, and the mean logit — the
    calibration table an operator reads before picking a keep threshold
    (is logit 2000 actually ~88% positive, or is the scorer
    over-confident?). Complements ql_classifier_eval's single confusion
    matrix and ql_threshold_sweep's volume curve with the
    per-confidence-band ground-truth rate.

    Integer discipline: logits are exact integer milli-units
    (ql_classifier_train weights), binning clamps THEN shifts into
    non-negative range so truncating DIV is floor on both engines, and
    rates/means are integer cross-multiplication — no float enters any
    compare. mean_logit sums can be negative; Spark DIV and DuckDB //
    both truncate toward zero, the repo's established pair.

    Scale shape: same as ql_classifier_eval — <=256-row weight table
    broadcast to the scoring join (the exploded token stream never
    shuffles on bucket), per-doc logits via map-side-combinable
    groupBy(doc_id), then a groupBy on a BOUNDED 8-bin key space whose
    partial aggregation collapses each task to <=8 rows before the
    final exchange."""
    weights = ql_classifier_train(spark, sf).select("bucket", "w_milli")
    docs = load(spark, sf, "documents")
    logits = (
        docs.select("doc_id", F.explode(_toks()).alias("w"))
        .select(
            "doc_id",
            F.expr(_clf_bucket_sql("instr")).cast("long").alias("bucket"),
        )
        .join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("w_milli") - 1000).cast("long").alias("logit_milli")
        )
    )
    binned = (
        docs.select(
            "doc_id",
            (F.coalesce(F.col("lang"), F.lit("")) == _CLF_POS_LANG).alias(
                "pos"
            ),
        )
        .join(logits, "doc_id", "left")
        .select(
            "pos",
            F.coalesce(F.col("logit_milli"), F.lit(0))
            .cast("long")
            .alias("logit"),
        )
        .select(
            F.expr(
                f"CAST({_CAL_BIN_SQL} DIV {CLF_CAL_BIN} AS BIGINT)"
            ).alias("bin"),
            "pos",
            "logit",
        )
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("pos"), 1).otherwise(0))
            .cast("long")
            .alias("n_pos"),
            F.sum("logit").cast("long").alias("__s_logit"),
        )
        .select(
            "bin",
            "n_docs",
            "n_pos",
            F.expr("CAST((n_pos * 1000) DIV n_docs AS BIGINT)").alias(
                "pos_rate_milli"
            ),
            F.expr("CAST(__s_logit DIV n_docs AS BIGINT)").alias(
                "mean_logit_milli"
            ),
        )
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
    the plan: `PushedFilters: [GreaterThanOrEqual(n_chars,120)]`), and
    keep-first is computed WITHOUT windowing on the fingerprint
    (de-skewed in round 4: the previous `min(doc_id) OVER (PARTITION BY
    h)` claimed "uniform keys, no skew by construction" — false for
    IDENTICAL prefixes, the same way hashing never split identical
    lines in ql_line_dedup: one boilerplate prefix shared by billions
    of docs is ONE window partition). Still one corpus scan:
      1. groupBy(h, lang) — map-side-combinable count/min partials;
      2. groupBy(h) — one row per (h, lang) in, min-struct winner out,
         plus a collect_list of per-lang counts whose length is bounded
         by the number of LANGUAGES in the group (a handful), never by
         its document count — so a mega-fingerprint costs a bounded
         list, not a single-reducer sort;
      3. explode the bounded lists and roll up per language.
    Every shuffle is a hash aggregate; zero Window operators
    (plan-guarded)."""
    d = (
        load(spark, sf, "documents")
        .filter(F.col("n_chars") >= _MIN_CHARS)
        .select(
            "doc_id", "lang", "n_chars",
            F.md5(F.substring("text", 1, _FP_CHARS)).alias("h"),
        )
    )
    pl = d.groupBy("h", "lang").agg(
        F.count("*").alias("n"),
        F.min(F.struct("doc_id", "n_chars")).alias("mn"),
    )
    per_h = pl.groupBy("h").agg(
        F.min(
            F.struct(
                F.col("mn.doc_id").alias("doc_id"),
                F.col("lang").alias("lang"),
                F.col("mn.n_chars").alias("n_chars"),
            )
        ).alias("w"),
        F.collect_list(
            F.struct(F.col("lang").alias("lang"), F.col("n").alias("n"))
        ).alias("pls"),
    )
    ex = per_h.select("w", F.explode("pls").alias("p"))
    won = F.col("w.lang") == F.col("p.lang")
    return (
        ex.groupBy(F.col("p.lang").alias("lang"))
        .agg(
            F.sum("p.n").alias("docs_gated"),
            F.sum(F.when(won, 1).otherwise(0)).alias("docs_kept"),
            (F.sum("p.n") - F.sum(F.when(won, 1).otherwise(0))).alias("docs_dup"),
            F.sum(F.when(won, F.col("w.n_chars")).otherwise(0)).alias("chars_kept"),
        )
    )


# --------------------------------------------------- source mixing

# per-source mixing factors for training-corpus composition: >1 upsamples
# (docs repeated), <1 downsamples (hash-thresholded keep), in 1/1000ths
# so every copy-count decision is exact integer arithmetic on any engine.
MIX_MILLI: dict[str, int] = {"src0": 2500, "src1": 500, "src2": 1500, "src3": 250}
_MIX_DEFAULT = 1000


def _mix_case_sql() -> str:
    arms = " ".join(f"WHEN '{s}' THEN {m}" for s, m in sorted(MIX_MILLI.items()))
    return f"CASE source {arms} ELSE {_MIX_DEFAULT} END"


@register(
    "ql_source_mix",
    f"""
    WITH d AS (
      SELECT doc_id, source,
             {_mix_case_sql()} AS milli,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 1000 AS bucket
      FROM documents
    ),
    n AS (
      SELECT doc_id, source,
             (milli // 1000) + CASE WHEN bucket < (milli % 1000) THEN 1 ELSE 0 END AS n_copies
      FROM d
    )
    SELECT doc_id, source, CAST(r.i AS BIGINT) AS copy_idx
    FROM n, UNNEST(range(1, n_copies + 1)) AS r(i)
    WHERE n_copies > 0
    """,
)
def ql_source_mix(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic source mixing for training-corpus composition: each
    source has a factor in 1/1000ths (2.5x, 0.5x, ...); a doc yields
    floor(factor) copies plus one more iff its md5 hash bucket falls
    under the fractional part — so expected copies == factor exactly,
    per doc, reproducibly on any engine (no rand(), no resample drift
    between retries of a failed task — Spark task retries re-evaluate
    rand() and would silently change the corpus).

    Scale shape: a scalar copy-count expression + explode(sequence) on
    the scan — no shuffle, no state; upsampling is row-expansion at
    read time, downsampling is a pushed filter. The mix table ships as
    a plan literal exactly like the classifier vocab."""
    mix = F.create_map(
        *[F.lit(x) for s, m in sorted(MIX_MILLI.items()) for x in (s, m)]
    )
    milli = F.coalesce(mix[F.col("source")], F.lit(_MIX_DEFAULT))
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long") % 1000
    )
    n_copies = (milli / 1000).cast("long") + F.when(
        bucket < milli % 1000, F.lit(1)
    ).otherwise(F.lit(0))
    return (
        load(spark, sf, "documents")
        .select("doc_id", "source", n_copies.alias("n_copies"))
        .filter(F.col("n_copies") > 0)
        .select(
            "doc_id", "source",
            F.explode(F.sequence(F.lit(1), F.col("n_copies"))).alias("copy_idx"),
        )
    )


# --------------------------------------------------- sequence packing

_PACK_CAP = 4  # docs per pack within a length bucket


@register(
    "txt_pack_bins",
    f"""
    WITH t AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(lower(text), '{_WS}'), x -> x <> '')) AS n_tokens
      FROM documents
    ),
    b AS (
      SELECT doc_id, n_tokens,
             CAST(least(n_tokens // 64, 7) AS INT) AS bucket
      FROM t
    )
    SELECT doc_id, n_tokens, bucket,
           CAST((row_number() OVER (PARTITION BY bucket ORDER BY doc_id) - 1)
                // {_PACK_CAP} AS BIGINT) AS pack_id
    FROM b
    """,
)
def txt_pack_bins(spark: SparkSession, sf: str) -> DataFrame:
    """Sequence packing for training batches: docs are length-bucketed
    (64-token bands, capped at bucket 7) and assigned a pack_id of
    {_PACK_CAP} docs per pack within their bucket, in deterministic
    doc_id order — the grouping a dataloader uses to pack similar-length
    sequences and minimize padding. Greedy first-fit packing is
    inherently order-dependent; bucketing + fixed-capacity packs is the
    deterministic, shuffle-light formulation that reproduces identically
    on any engine and any partitioning.

    Scale shape: token count is a scalar expression; the only shuffle is
    the per-bucket window (8 buckets — at crawl scale partition instead
    by (bucket, day) or any natural key to keep window partitions
    bounded; the pack assignment stays per-partition-deterministic)."""
    w = Window.partitionBy("bucket").orderBy("doc_id")
    return (
        load(spark, sf, "documents")
        .select("doc_id", F.size(_toks()).alias("n_tokens"))
        .withColumn(
            "bucket", F.least(F.col("n_tokens") / 64, F.lit(7)).cast("int")
        )
        .withColumn(
            "pack_id",
            ((F.row_number().over(w) - 1) / _PACK_CAP).cast("long"),
        )
        .select("doc_id", "n_tokens", "bucket", "pack_id")
    )


# --------------------------------------------------- character entropy

# gibberish gate: natural prose has char entropy ~3-4.5 nats; repeated-
# character junk and template sludge sit far below. Threshold in nats.
_ENTROPY_GATE = 2.0


@register(
    "txt_char_entropy",
    f"""
    WITH c AS (
      SELECT doc_id, unnest(string_split(text, '')) AS ch
      FROM documents WHERE length(text) > 0
    ),
    f AS (SELECT doc_id, ch, count(*) AS c FROM c GROUP BY doc_id, ch),
    h AS (
      SELECT doc_id,
             ln(sum(c)) - sum(c * ln(c)) / sum(c) AS ent
      FROM f GROUP BY doc_id
    )
    SELECT d.doc_id,
           round(coalesce(h.ent, 0.0), 4) AS char_entropy,
           coalesce(h.ent, 0.0) < {_ENTROPY_GATE} AS low_entropy
    FROM documents d LEFT JOIN h ON h.doc_id = d.doc_id
    """,
)
def txt_char_entropy(spark: SparkSession, sf: str) -> DataFrame:
    """Per-doc Shannon character entropy (nats) + a low-entropy gibberish
    flag — the cheap quality signal that catches repeated-character junk,
    template sludge, and binary-pasted-as-text that length/stopword rules
    miss. H = ln(n) - sum(c*ln(c))/n over per-char counts, a form whose
    float ops both engines evaluate on identical integer inputs (round-4
    on the reported value absorbs the last-ulp ln differences; empty
    docs define H = 0).

    Scale shape: explode chars -> per-(doc,char) count with map-side
    partial agg (at most |alphabet| rows per doc survive the combine) ->
    per-doc fold. Two shuffles, both on keys that cannot skew beyond
    doc_id granularity."""
    d = load(spark, sf, "documents")
    # explicit empty-filter: split(text, '') not emitting a trailing ''
    # is only guaranteed since SPARK-40194 (3.4); pin the semantics
    chars = F.filter(F.split("text", ""), lambda x: x != F.lit(""))
    f = (
        d.filter(F.length("text") > 0)
        .select("doc_id", F.explode(chars).alias("ch"))
        .groupBy("doc_id", "ch")
        .agg(F.count("*").alias("c"))
    )
    h = f.groupBy("doc_id").agg(
        (F.log(F.sum("c")) - F.sum(F.col("c") * F.log("c")) / F.sum("c")).alias("ent")
    )
    return (
        d.select("doc_id")
        .join(h, "doc_id", "left")
        .select(
            "doc_id",
            F.round(F.coalesce("ent", F.lit(0.0)), 4).alias("char_entropy"),
            (F.coalesce("ent", F.lit(0.0)) < _ENTROPY_GATE).alias("low_entropy"),
        )
    )


# --------------------------------------------------- boilerplate scrub

# word n-gram size and the corpus-frequency gate above which a gram is
# "boilerplate" (CCNet/RefinedWeb remove lines/spans that recur across
# many pages: nav bars, cookie banners, footers). 5-grams in >= 3
# distinct docs is the smallest setting that fires on the test corpus
# while keeping the hot set tiny — which is the point at crawl scale:
# the hot set is the boilerplate vocabulary, and it is SMALL.
_BP_GRAM = 5
_BP_DF = 3


@register(
    "ql_boilerplate_scrub",
    f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(coalesce(text, '')), '{_WS}'), x -> x <> '') AS toks
      FROM documents
    ),
    g AS (
      SELECT doc_id, CAST(r.i - 1 AS INT) AS pos,
             array_to_string(toks[r.i:r.i + {_BP_GRAM - 1}], ' ') AS gram
      FROM t, unnest(range(1, len(toks) - {_BP_GRAM - 2})) r(i)
      WHERE len(toks) >= {_BP_GRAM}
    ),
    hot AS (
      SELECT gram FROM g GROUP BY gram
      HAVING count(DISTINCT doc_id) >= {_BP_DF}
    ),
    hits AS (
      SELECT DISTINCT g.doc_id, g.pos + u.x AS cov
      FROM g JOIN hot USING (gram),
           unnest([{", ".join(str(i) for i in range(_BP_GRAM))}]) u(x)
    ),
    cov AS (SELECT doc_id, list(cov) AS covered FROM hits GROUP BY doc_id),
    o AS (
      SELECT t.doc_id, t.toks,
             list_filter(t.toks,
                         (x, i) -> NOT list_contains(coalesce(covered, []), i - 1)
             ) AS kept
      FROM t LEFT JOIN cov ON cov.doc_id = t.doc_id
    )
    SELECT doc_id,
           CAST(len(toks) AS INT) AS n_toks,
           CAST(len(toks) - len(kept) AS INT) AS n_removed,
           -- array_to_string lowers to string_agg: NULL on an empty
           -- list, where Spark's array_join gives '' — pin to ''
           coalesce(array_to_string(kept, ' '), '') AS clean_text
    FROM o
    """,
)
def ql_boilerplate_scrub(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet/RefinedWeb-style boilerplate removal: a word 5-gram
    that occurs in >= 3 distinct docs is template sludge (nav
    bars, cookie banners, SEO footers); every token covered by any hot
    gram is dropped and the doc's text is reassembled from the
    survivors in original order. Output per doc: token count, removed
    count, cleaned text.

    Scale shape — the corpus itself never shuffles: (1) gram explode ->
    per-gram distinct-doc count with map-side partial agg, the one
    corpus-sized shuffle (uniform gram keys); (2) the hot set (grams
    above the df gate) is the boilerplate *vocabulary* — tiny by
    construction, broadcast to the gram stream, so finding covered
    positions is a broadcast semi-join with no exchange; (3) only the
    HIT slice (doc_id, position) — the boilerplate spans, a few percent
    of tokens on real crawls — shuffles into per-doc covered lists,
    then joins back to docs on doc_id. At 10^12 docs step (1) is a
    plain uniform-key agg and steps (2)-(3) move only boilerplate-sized
    data. Reassembly is a JVM higher-order filter on (token, index) —
    no Python anywhere."""
    d = load(spark, sf, "documents")
    toks = _toks(F.coalesce("text", F.lit("")))
    n = F.size(toks)
    grams = (
        d.filter(n >= _BP_GRAM)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), n - _BP_GRAM),
                    lambda p: F.struct(
                        p.alias("pos"),
                        F.array_join(
                            F.slice(toks, p + 1, _BP_GRAM), " "
                        ).alias("gram"),
                    ),
                )
            ).alias("g"),
        )
        .select("doc_id", F.col("g.pos").alias("pos"), F.col("g.gram").alias("gram"))
    )
    hot = (
        grams.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") >= _BP_DF)
        .select("gram")
    )
    hits = (
        grams.join(F.broadcast(hot), "gram")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (_BP_GRAM - 1))
            ).alias("cov"),
        )
        .distinct()
    )
    cov = hits.groupBy("doc_id").agg(F.collect_set("cov").alias("covered"))
    covered = F.coalesce("covered", F.array().cast("array<int>"))
    kept = F.filter(
        F.col("toks"), lambda x, i: ~F.array_contains(covered, i)
    )
    return (
        d.select("doc_id", toks.alias("toks"))
        .join(cov, "doc_id", "left")
        .select(
            "doc_id",
            F.size("toks").alias("n_toks"),
            (F.size("toks") - F.size(kept)).alias("n_removed"),
            F.array_join(kept, " ").alias("clean_text"),
        )
    )


# --------------------------------------------------- threshold sweep

# classifier-threshold calibration grid (micro-units of the linear
# logit): one row per candidate keep-threshold with keep volume and
# kept-mass stats — the table a curation run reads to PICK its cutoff
SWEEP_GRID = (-3000, -2000, -1000, 0, 1000, 2000, 3000)


@register(
    "ql_threshold_sweep",
    f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(coalesce(text, '')), '{_WS}'), x -> x <> '') AS toks
      FROM documents
    ),
    s AS (
      SELECT doc_id,
             CAST(coalesce(list_sum(list_transform(toks, w -> {_clf_case_sql()})), 0)
                  AS BIGINT) AS logit
      FROM t
    ),
    j AS (
      SELECT g.thr, s.logit
      FROM (SELECT unnest([{", ".join(str(t) for t in SWEEP_GRID)}]) AS thr) g
      CROSS JOIN s
    )
    SELECT CAST(thr AS INT) AS thr_micro,
           CAST(coalesce(sum(CASE WHEN logit > thr THEN 1 END), 0) AS BIGINT)
             AS n_keep,
           CAST((1000 * coalesce(sum(CASE WHEN logit > thr THEN 1 END), 0))
                // count(*) AS INT) AS keep_permille,
           CAST(coalesce(sum(CASE WHEN logit > thr THEN logit END), 0) AS BIGINT)
             AS kept_logit_micro
    FROM j GROUP BY thr
    """,
)
def ql_threshold_sweep(spark: SparkSession, sf: str) -> DataFrame:
    """Classifier-threshold calibration sweep: score every doc once with
    the ql_classifier_score linear logit, then report keep volume,
    keep rate (permille, exact integer division), and kept logit mass at
    each threshold in SWEEP_GRID — the keep-rate-vs-cutoff table a
    curation job inspects before committing a corpus-wide filter. All
    stats are exact integers (micro-unit weights, permille rates) so any
    engine and any partitioning agree bit-for-bit.

    Scale shape: the logit folds per row inside whole-stage codegen
    (vocab is a plan literal); the grid fan-out is a 7-element literal
    explode whose grouped aggregation partial-aggregates map-side, so
    the shuffle carries ~7 rows per task regardless of corpus size."""
    vocab = F.create_map(
        *[F.lit(x) for w, v in sorted(CLF_VOCAB.items()) for x in (w, v)]
    )
    logit = F.aggregate(
        F.transform(_toks(F.coalesce("text", F.lit(""))), lambda w: F.coalesce(vocab[w], F.lit(0))),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = load(spark, sf, "documents").select(logit.alias("logit"))
    kept = F.col("logit") > F.col("thr_micro")
    return (
        scored.select(
            F.explode(
                F.array(*[F.lit(t) for t in SWEEP_GRID])
            ).alias("thr_micro"),
            "logit",
        )
        .groupBy("thr_micro")
        .agg(
            F.coalesce(F.sum(F.when(kept, 1)), F.lit(0))
            .cast("bigint")
            .alias("n_keep"),
            F.count("*").alias("n_total"),
            F.coalesce(F.sum(F.when(kept, F.col("logit"))), F.lit(0))
            .cast("bigint")
            .alias("kept_logit_micro"),
        )
        .select(
            "thr_micro",
            "n_keep",
            F.expr("CAST((1000 * n_keep) DIV n_total AS INT)").alias(
                "keep_permille"
            ),
            "kept_logit_micro",
        )
    )
