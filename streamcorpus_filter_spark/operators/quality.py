"""Quality-pipeline stages as DataFrame -> DataFrame operators.

Scale design (SURVEY.md §4.2, the part Catalyst can't do for us): pandas
UDFs are opaque fences, so the pipeline computes every STRUCTURAL signal
with built-in JVM expressions first, drops the cheap-to-reject documents,
and only survivors cross the (single, fused) Python fence for
langid + perplexity + entity match + scrub. At Common-Crawl scale the
majority of rejects (too short, boilerplate, repetition) never pay Arrow
serialization.

The structural expressions implement kernels/rules.py EXACTLY (same token
class, same thresholds) — parity with the pure-Python oracle is tested at
L2 (tests/test_quality_parity.py).
"""

from __future__ import annotations

from typing import Iterator

import threading

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from ..kernels import rules
from ..kernels.automaton import ACAutomaton
from ..kernels.scrub import boundary_ok, mask_spans, scrub_pii
from ..kernels.extract import extract_text

# ---------------------------------------------------------------- structure


def _tokens(col: Column) -> Column:
    return F.filter(F.split(col, rules.TOKEN_SPLIT_JAVA), lambda x: x != "")


def _lines(col: Column) -> Column:
    return F.filter(F.split(col, "\n"), lambda x: x != "")


def _count_occ(col: Column, lit: str) -> Column:
    return (F.length(col) - F.length(F.replace(col, F.lit(lit), F.lit("")))) / len(lit)


def with_structural_signals(
    df: DataFrame, text_col: str = "text", lazy_top2: bool = False
) -> DataFrame:
    """Adds every rules.py structural signal as a column — built-ins only,
    no Python fence. One pass; the token/line arrays are named subexprs.

    ``lazy_top2=True`` computes the expensive top-bigram signal only for
    rows that pass every cheaper cascade rule (CaseWhen evaluates lazily),
    reporting 0.0 otherwise — the keep/drop cascade is unchanged because
    ``rep_top2gram`` is the last rule, but rows already doomed by a cheap
    rule skip the O(n log n) sort+scan. Use in the pipeline; keep False
    when the raw signal value itself is the query output."""
    # NULL text behaves like "" (-> gopher_short), matching the fused
    # kernel and the row-at-a-time oracle: without the coalesce every
    # signal goes NULL under ANSI mode, every cascade WHEN evaluates
    # NULL, and the row silently KEEPS — the opposite verdict
    c = F.coalesce(F.col(text_col), F.lit(""))
    toks = _tokens(c)
    lns = _lines(c)
    df = df.withColumn("__sig_toks", toks).withColumn("__sig_lns", lns)
    toks, lns = F.col("__sig_toks"), F.col("__sig_lns")
    n_words = F.size(toks)
    nw = F.greatest(n_words, F.lit(1)).cast("double")
    n_lines = F.greatest(F.size(lns), F.lit(1)).cast("double")

    sum_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    bullet = F.size(
        F.filter(
            lns,
            lambda x: x.startswith("- ") | x.startswith("* ") | x.startswith("• "),
        )
    )
    ellipsis = F.size(
        F.filter(lns, lambda x: x.endswith("...") | x.endswith("…"))
    )
    alpha = F.size(F.filter(toks, lambda x: x.rlike(r"\p{L}")))
    # literal IN-list folds to Catalyst InSet (hash lookup); an F.array of
    # literals would be rebuilt per element inside the lambda (~30x slower)
    stops = F.size(
        F.filter(toks, lambda x: F.lower(x).isin(*sorted(rules.STOPWORD_SET)))
    )
    n_terminal = sum(
        [_count_occ(c, ch) for ch in rules.TERMINAL_PUNCT], F.lit(0).cast("double")
    )
    line_punct = F.size(
        F.filter(
            lns,
            lambda x: x.endswith(".") | x.endswith("!") | x.endswith("?") | x.endswith("。"),
        )
    )
    # top word-bigram frequency: sorted grams -> longest equal run (JVM HOFs).
    # sequence(1, n) with n < 1 DESCENDS ([1, 0]) instead of being empty and
    # element_at(toks, 0) throws — docs with < 2 words short-circuit to []
    grams = F.when(
        n_words >= 2,
        F.transform(
            F.sequence(F.lit(1), n_words - 1),
            lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    top2 = F.aggregate(
        F.sort_array(grams),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc.best, F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1))
            ).alias("best"),
        ),
        lambda acc: acc.best,
    )

    out = (
        df.withColumn("n_words", n_words.cast("long"))
        .withColumn("mean_word_len", sum_len / nw)
        .withColumn(
            "symbol_per_word", (_count_occ(c, "#") + _count_occ(c, "...")) / nw
        )
        .withColumn("bullet_frac", bullet / n_lines)
        .withColumn("ellipsis_frac", ellipsis / n_lines)
        .withColumn("alpha_frac", alpha / nw)
        .withColumn("n_stopwords", stops.cast("long"))
        .withColumn("has_lorem", F.contains(F.lower(c), F.lit("lorem ipsum")))
        .withColumn("has_brace", F.contains(c, F.lit("{")))
        .withColumn("n_terminal", n_terminal)
        .withColumn("line_punct_frac", line_punct / n_lines)
        .withColumn(
            "dup_line_frac",
            (F.size(lns) - F.size(F.array_distinct(lns))) / n_lines,
        )
    )
    top2_frac = F.lit(2.0) * top2 / nw
    if lazy_top2:
        top2_frac = F.when(_pre_top2_reason().isNull(), top2_frac).otherwise(
            F.lit(0.0)
        )
    return out.withColumn("top2gram_frac", top2_frac).drop(
        "__sig_toks", "__sig_lns"
    )


def _pre_top2_reason() -> Column:
    """Cascade rules cheaper than rep_top2gram, first-drop-wins (evaluated
    over the signal columns added by with_structural_signals)."""
    r = rules
    return (
        F.when(F.col("n_words") < r.MIN_WORDS, "gopher_short")
        .when(F.col("n_words") > r.MAX_WORDS, "gopher_long")
        .when(
            ~F.col("mean_word_len").between(r.MIN_MEAN_WORD_LEN, r.MAX_MEAN_WORD_LEN),
            "gopher_word_len",
        )
        .when(F.col("symbol_per_word") > r.MAX_SYMBOL_TO_WORD, "gopher_symbol")
        .when(F.col("bullet_frac") > r.MAX_BULLET_LINE_FRAC, "gopher_bullet")
        .when(F.col("ellipsis_frac") > r.MAX_ELLIPSIS_LINE_FRAC, "gopher_ellipsis")
        .when(F.col("alpha_frac") < r.MIN_ALPHA_WORD_FRAC, "gopher_alpha")
        .when(F.col("n_stopwords") < r.MIN_STOPWORDS, "gopher_stopwords")
        .when(F.col("has_lorem"), "c4_lorem")
        .when(F.col("has_brace"), "c4_brace")
        .when(F.col("n_terminal") < r.MIN_TERMINAL_PUNCT, "c4_sentences")
        .when(F.col("line_punct_frac") < r.MIN_LINE_PUNCT_FRAC, "c4_line_punct")
        .when(F.col("dup_line_frac") > r.MAX_DUP_LINE_FRAC, "rep_dup_lines")
    )


def structural_reason() -> Column:
    """First-drop-wins cascade over the structural signal columns —
    mirrors rules.structural_drop_reason (incl. rep_top2gram)."""
    return F.coalesce(
        _pre_top2_reason(),
        F.when(F.col("top2gram_frac") > rules.MAX_TOP2GRAM_FRAC, "rep_top2gram"),
    )


SIGNAL_COLS = [
    "n_words", "mean_word_len", "symbol_per_word", "bullet_frac",
    "ellipsis_frac", "alpha_frac", "n_stopwords", "has_lorem", "has_brace",
    "n_terminal", "line_punct_frac", "dup_line_frac", "top2gram_frac",
]

# ------------------------------------------------------------- fused kernel

FUSED_STRUCT = (
    "struct<sreason: string, lang_pred: string, lang_conf: double, "
    "ppl: double, patterns_matched: int, total_hits: int, "
    "scrubbed_text: string, bytes_scrubbed: bigint, tox_hits: int>"
)


def fused_pipeline_udf(bc_langid, bc_lm, bc_ent_ac, bc_tox_ac, from_html: bool):
    """THE pipeline fence: one scalar pandas UDF (html|text) -> struct with
    [extract ->] structural rules -> langid + perplexity + entity match +
    PII scrub + toxicity mask.

    Why one Python fence and not JVM built-ins for the structural rules:
    measured on this corpus, the equivalent higher-order-function
    expressions (split/filter/aggregate lambdas — interpreted, outside
    WholeStageCodegen, and re-inlined per cascade rule by projection
    collapse) cost >10x the vectorized kernel below (~0.7 ms/doc), and the
    text column would cross the Arrow boundary anyway for the
    match/scrub stages. Only this one column crosses; structurally dropped
    rows short-circuit inside the kernel (null model fields, sreason set).
    Models come from broadcasts, deserialized once per worker; the
    JVM-built-in structural implementation lives on in
    with_structural_signals() and is oracle-checked by the ql_* inventory
    queries (inventory/quality.py).
    """

    @F.pandas_udf(FUSED_STRUCT)
    def fn(col: pd.Series) -> pd.DataFrame:
        langid = bc_langid.value
        lm = bc_lm.value
        ent_ac: ACAutomaton = bc_ent_ac.value
        tox_ac: ACAutomaton = bc_tox_ac.value

        if from_html:
            texts_all = [
                extract_text(h) if h is not None else "" for h in col
            ]
        else:
            texts_all = [t if isinstance(t, str) else "" for t in col]
        # fast C-accelerated twin (early-exit per rule); the scalar
        # structural_signals pair stays the oracle's disjoint code path
        sreasons = [rules.structural_reason_fast(t) for t in texts_all]
        n = len(texts_all)
        out = pd.DataFrame(
            {
                "sreason": pd.array(sreasons, dtype="object"),
                "lang_pred": pd.array([None] * n, dtype="object"),
                "lang_conf": pd.array([None] * n, dtype="Float64"),
                "ppl": pd.array([None] * n, dtype="Float64"),
                "patterns_matched": pd.array([None] * n, dtype="Int32"),
                "total_hits": pd.array([None] * n, dtype="Int32"),
                "scrubbed_text": pd.array([None] * n, dtype="object"),
                "bytes_scrubbed": pd.array([None] * n, dtype="Int64"),
                "tox_hits": pd.array([None] * n, dtype="Int32"),
            }
        )
        live = [i for i, s in enumerate(sreasons) if s is None]
        if not live:
            return out
        texts = [texts_all[i] for i in live]
        enc = [t.lower().encode("utf-8") for t in texts]
        pred_ix, conf = langid.score_batch(enc)
        ppl = lm.ppl_batch(enc)
        distinct, total = ent_ac.count_batch(enc)

        scrubbed: list[str | None] = []
        nbytes: list[int | None] = []
        tox_n: list[int] = []
        # PII scrub (canonical kernel), then toxicity mask on the
        # scrubbed text via the broadcast automaton (ASCII-lower bytes)
        pii_out = [scrub_pii(t) for t in texts]
        tox_input = [s.encode("utf-8").lower() for s, _b, _h in pii_out]
        rows, begins, pids = tox_ac.search_batch(tox_input)
        spans_per_doc: list[list[tuple[int, int]]] = [[] for _ in texts]
        lens = tox_ac.pat_lens
        for r, b, p in zip(rows.tolist(), begins.tolist(), pids.tolist()):
            e = b + int(lens[p])
            if boundary_ok(tox_input[r], b, e):
                spans_per_doc[r].append((b, e))
        for (s_text, pii_b, _h), spans in zip(pii_out, spans_per_doc):
            if len(spans) >= rules.TOX_DROP_HITS:
                scrubbed.append(None)  # dropped as toxic downstream
                nbytes.append(0)
            else:
                masked, tox_b = mask_spans(s_text, spans)
                scrubbed.append(masked)
                nbytes.append(pii_b + tox_b)
            tox_n.append(len(spans))

        out.iloc[live, out.columns.get_loc("lang_pred")] = [
            langid.langs[i] for i in pred_ix
        ]
        out.iloc[live, out.columns.get_loc("lang_conf")] = conf
        out.iloc[live, out.columns.get_loc("ppl")] = ppl
        out.iloc[live, out.columns.get_loc("patterns_matched")] = distinct
        out.iloc[live, out.columns.get_loc("total_hits")] = total
        out.iloc[live, out.columns.get_loc("scrubbed_text")] = pd.array(
            scrubbed, dtype="object"
        )
        out.iloc[live, out.columns.get_loc("bytes_scrubbed")] = pd.array(
            nbytes, dtype="Int64"
        )
        out.iloc[live, out.columns.get_loc("tox_hits")] = pd.array(
            tox_n, dtype="Int32"
        )
        return out

    return fn


def extract_fn(html_col: str = "html", out_col: str = "text"):
    """mapInPandas extraction stage — the canonical kernel mapped over the
    batch (regex work is C; the invariant demands this exact function)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pdf.assign(**{out_col: [extract_text(h) for h in pdf[html_col]]})

    return fn


# ------------------------------------------------------------- the pipeline

_BC_CACHE: dict[str, object] = {}
_BC_LOCK = threading.Lock()


def _broadcast_models(spark: SparkSession):
    """Broadcast the four model artifacts once per Spark application —
    repeated pipeline invocations reuse the same broadcast ids instead of
    re-pickling MBs of model arrays per call (and per-worker lazy
    deserialization stays warm, since the broadcast id is what keys it).
    Lock + destroy: two threads building pipelines on a fresh app must
    not double-broadcast the several-MB arrays, and a process that
    restarts sessions (test suites, notebooks) must not accumulate dead
    apps' driver-side broadcast blocks."""
    key = spark.sparkContext.applicationId
    with _BC_LOCK:
        if _BC_CACHE.get("app") != key:
            from ..models import (
                default_charlm,
                default_langid,
                pages_automaton,
                toxic_automaton,
            )

            for old in _BC_CACHE.get("bcs", ()):
                try:
                    old.destroy()
                except Exception:
                    pass  # prior app's context is already gone
            sc = spark.sparkContext
            _BC_CACHE["app"] = key
            _BC_CACHE["bcs"] = (
                sc.broadcast(default_langid()),
                sc.broadcast(default_charlm()),
                sc.broadcast(pages_automaton()),
                sc.broadcast(toxic_automaton()),
            )
        return _BC_CACHE["bcs"]


def run_quality_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    extract_from_html: bool = False,
    min_partitions: int | None = None,
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) -> filtered rows with
    keep/drop_reason/scrubbed_text/metrics columns (FILTERED-like schema,
    minus the heavy html column).

    Plan shape (the 100TB story) — ONE linear plan, no branch/union (a
    filter-split would re-run the scan + extraction once per branch), and
    ONE Arrow fence (only the html-or-text column crosses into Python;
    see fused_pipeline_udf for the measured built-ins-vs-kernel call):
      scan -> fused fence (extract -> structural -> langid/ppl/match/
           scrub, early-exit on structural drop) -> final keep/drop
           cascade (JVM CaseWhen)

    ``min_partitions``: input with fewer partitions than this is
    repartitioned before the heavy stages (defaults to
    ``2 * sc.defaultParallelism`` — 2-3 tasks per core evens out the
    heavy doc-length tail). A real Common-Crawl-scale table already has
    thousands of file-splits, so the guard only fires on small/test
    inputs. Caveat: getNumPartitions reports SPLITS, and a parquet row
    group is the true minimum split unit — a single-row-group file scans
    as one task no matter what this reports, so test fixtures must be
    written with real row groups (synth.write_pages_parquet does).
    """
    sc = spark.sparkContext
    bc_lang, bc_lm, bc_ent, bc_tox = _broadcast_models(spark)

    want = (
        min_partitions if min_partitions is not None else 2 * sc.defaultParallelism
    )
    if pages.rdd.getNumPartitions() < want:
        pages = pages.repartition(want)

    in_col = "html" if extract_from_html else "text"
    # every non-payload column (url, warc_ts, lang, plus any caller-added
    # lineage columns like input_file/partition_id) rides through untouched
    passthrough = [c for c in pages.columns if c not in ("html", "text")]
    enriched = pages.select(
        *passthrough,
        fused_pipeline_udf(
            bc_lang, bc_lm, bc_ent, bc_tox, from_html=extract_from_html
        )(F.col(in_col)).alias("m"),
    )

    r = rules
    final_reason = F.coalesce(
        F.col("m.sreason"),
        F.when(F.col("m.lang_conf") < r.MIN_LANG_CONF, "lang_uncertain")
        .when(F.col("m.ppl") > r.MAX_PPL, "high_ppl")
        .when(F.col("m.tox_hits") >= r.TOX_DROP_HITS, "toxic"),
    )
    # oracle short-circuit parity: stages after the drop point are null
    early = F.coalesce(
        final_reason.isin("lang_uncertain", "high_ppl"), F.lit(False)
    )
    return enriched.select(
        *passthrough,
        F.col("m.lang_pred").alias("lang_pred"),
        F.col("m.lang_conf").alias("lang_conf"),
        F.col("m.ppl").alias("ppl"),
        F.when(~early, F.col("m.patterns_matched")).alias("patterns_matched"),
        F.when(~early, F.col("m.total_hits")).alias("total_hits"),
        F.when(final_reason.isNull(), F.col("m.scrubbed_text")).alias(
            "scrubbed_text"
        ),
        F.when(final_reason.isNull(), F.col("m.bytes_scrubbed")).alias(
            "bytes_scrubbed"
        ),
        F.when(~early, F.col("m.tox_hits")).alias("tox_hits"),
        final_reason.isNull().alias("keep"),
        final_reason.alias("drop_reason"),
    )
