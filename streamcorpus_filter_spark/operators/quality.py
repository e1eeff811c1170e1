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


def with_structural_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds every rules.py structural signal as a column — built-ins only,
    no Python fence. One pass; the token/line arrays are named subexprs."""
    c = F.col(text_col)
    toks = _tokens(c)
    lns = _lines(c)
    df = df.withColumn("_toks", toks).withColumn("_lns", lns)
    toks, lns = F.col("_toks"), F.col("_lns")
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
    stop_arr = F.array(*[F.lit(w) for w in sorted(rules.STOPWORD_SET)])
    stops = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, F.lower(x))))
    n_terminal = sum(
        [_count_occ(c, ch) for ch in rules.TERMINAL_PUNCT], F.lit(0).cast("double")
    )
    line_punct = F.size(
        F.filter(
            lns,
            lambda x: x.endswith(".") | x.endswith("!") | x.endswith("?") | x.endswith("。"),
        )
    )
    # top word-bigram frequency: sorted grams -> longest equal run (JVM HOFs)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n_words - 1, F.lit(0))),
        lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
    )
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

    return (
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
        .withColumn("top2gram_frac", F.lit(2.0) * top2 / nw)
        .drop("_toks", "_lns")
    )


def structural_reason() -> Column:
    """First-drop-wins cascade over the structural signal columns —
    mirrors rules.structural_drop_reason (incl. rep_top2gram)."""
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
        .when(F.col("top2gram_frac") > r.MAX_TOP2GRAM_FRAC, "rep_top2gram")
    )


SIGNAL_COLS = [
    "n_words", "mean_word_len", "symbol_per_word", "bullet_frac",
    "ellipsis_frac", "alpha_frac", "n_stopwords", "has_lorem", "has_brace",
    "n_terminal", "line_punct_frac", "dup_line_frac", "top2gram_frac",
]

# ------------------------------------------------------------- fused kernel

FUSED_COLS = (
    "lang_pred string, lang_conf double, ppl double, "
    "patterns_matched int, total_hits int, scrubbed_text string, "
    "bytes_scrubbed long, tox_hits int"
)


def fused_quality_fn(bc_langid, bc_lm, bc_ent_ac, bc_tox_ac, text_col: str = "text"):
    """One mapInPandas pass computing langid + perplexity + entity match +
    PII scrub + toxicity mask. Models come from broadcasts (deserialized
    once per worker); all scanning is the batch-vectorized numpy kernels."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        langid = bc_langid.value
        lm = bc_lm.value
        ent_ac: ACAutomaton = bc_ent_ac.value
        tox_ac: ACAutomaton = bc_tox_ac.value
        for pdf in batches:
            texts = [t if isinstance(t, str) else "" for t in pdf[text_col]]
            enc = [t.lower().encode("utf-8") for t in texts]
            pred_ix, conf = langid.score_batch(enc)
            ppl = lm.ppl_batch(enc)
            distinct, total = ent_ac.count_batch(enc)

            scrubbed: list[str | None] = []
            nbytes: list[int] = []
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

            yield pdf.assign(
                lang_pred=[langid.langs[i] for i in pred_ix],
                lang_conf=conf,
                ppl=ppl,
                patterns_matched=distinct.astype("int32"),
                total_hits=total.astype("int32"),
                scrubbed_text=scrubbed,
                bytes_scrubbed=pd.array(nbytes, dtype="int64"),
                tox_hits=pd.array(tox_n, dtype="int32"),
            )

    return fn


def extract_fn(html_col: str = "html", out_col: str = "text"):
    """mapInPandas extraction stage — the canonical kernel mapped over the
    batch (regex work is C; the invariant demands this exact function)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pdf.assign(**{out_col: [extract_text(h) for h in pdf[html_col]]})

    return fn


# ------------------------------------------------------------- the pipeline


def run_quality_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    extract_from_html: bool = False,
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) -> filtered rows with
    keep/drop_reason/scrubbed_text/metrics columns (FILTERED-like schema,
    minus the heavy html column).

    Plan shape (the 100TB story):
      scan -> [extract] -> structural signals (JVM built-ins)
           -> filter-split on structural verdict
           -> survivors only: ONE fused Arrow fence (langid/ppl/match/scrub)
           -> final keep/drop cascade -> union of both branches
    """
    from ..models import (
        default_charlm,
        default_langid,
        pages_automaton,
        toxic_automaton,
    )

    sc = spark.sparkContext
    bc_lang = sc.broadcast(default_langid())
    bc_lm = sc.broadcast(default_charlm())
    bc_ent = sc.broadcast(pages_automaton())
    bc_tox = sc.broadcast(toxic_automaton())

    base = pages
    if extract_from_html:
        base = base.drop("text")
        base = base.mapInPandas(
            extract_fn(), schema=", ".join(
                [f"{f.name} {f.dataType.simpleString()}" for f in base.schema.fields]
            ) + ", text string",
        )
    base = base.drop("html")

    sig = with_structural_signals(base).withColumn("_sreason", structural_reason())

    failed = sig.filter(F.col("_sreason").isNotNull()).select(
        "url", "warc_ts", "lang",
        F.lit(None).cast("string").alias("lang_pred"),
        F.lit(None).cast("double").alias("lang_conf"),
        F.lit(None).cast("double").alias("ppl"),
        F.lit(None).cast("int").alias("patterns_matched"),
        F.lit(None).cast("int").alias("total_hits"),
        F.lit(None).cast("string").alias("scrubbed_text"),
        F.lit(None).cast("long").alias("bytes_scrubbed"),
        F.lit(None).cast("int").alias("tox_hits"),
        F.lit(False).alias("keep"),
        F.col("_sreason").alias("drop_reason"),
    )

    passed = sig.filter(F.col("_sreason").isNull())
    in_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in passed.schema.fields
    )
    enriched = passed.mapInPandas(
        fused_quality_fn(bc_lang, bc_lm, bc_ent, bc_tox),
        schema=in_schema + ", " + FUSED_COLS,
    )
    r = rules
    final_reason = (
        F.when(F.col("lang_conf") < r.MIN_LANG_CONF, "lang_uncertain")
        .when(F.col("ppl") > r.MAX_PPL, "high_ppl")
        .when(F.col("tox_hits") >= r.TOX_DROP_HITS, "toxic")
    )
    # oracle short-circuit parity: stages after the drop point are null
    early = F.coalesce(
        final_reason.isin("lang_uncertain", "high_ppl"), F.lit(False)
    )
    done = enriched.select(
        "url", "warc_ts", "lang",
        "lang_pred", "lang_conf", "ppl",
        F.when(~early, F.col("patterns_matched")).alias("patterns_matched"),
        F.when(~early, F.col("total_hits")).alias("total_hits"),
        F.when(final_reason.isNull(), F.col("scrubbed_text")).alias("scrubbed_text"),
        F.when(final_reason.isNull(), F.col("bytes_scrubbed")).alias("bytes_scrubbed"),
        F.when(~early, F.col("tox_hits")).alias("tox_hits"),
        final_reason.isNull().alias("keep"),
        final_reason.alias("drop_reason"),
    )
    return done.unionByName(failed)
