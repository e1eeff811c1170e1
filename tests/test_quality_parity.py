"""L2 — oracle parity: the Spark pipeline vs the row-at-a-time oracle on
the synthetic pages corpus (BASELINE.json:2,15 — keep/drop F1 >= 0.99,
byte-identical scrubbed/extracted text per url).
"""

from __future__ import annotations

import math

import pytest

from streamcorpus_filter_spark.models import (
    default_charlm,
    default_langid,
)
from streamcorpus_filter_spark.oracle import oracle_row
from streamcorpus_filter_spark.synth import (
    PAGES_FILTER_NAMES,
    TOXIC_LEXICON,
    make_pages,
)

N_PAGES = 1200


@pytest.fixture(scope="module")
def pages():
    return make_pages(N_PAGES, seed=42)


@pytest.fixture(scope="module")
def oracle_results(pages):
    langid, lm = default_langid(), default_charlm()
    toxic = [t for t, _ in TOXIC_LEXICON]
    # oracle consumes html only — extraction parity is part of the check
    return [
        oracle_row(h, langid, lm, PAGES_FILTER_NAMES, toxic)
        for h in pages["html"]
    ]


@pytest.fixture(scope="module")
def spark_results(spark, pages):
    from streamcorpus_filter_spark.operators.quality import run_quality_pipeline

    df = spark.createDataFrame(
        list(zip(pages["url"], pages["warc_ts"], pages["html"], pages["text"], pages["lang"])),
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    out = run_quality_pipeline(spark, df, extract_from_html=True)
    rows = out.collect()
    # pages urls contain duplicates (dedup fixture) — key by position
    return {(r.url, str(r.warc_ts)): r for r in rows}, rows


def test_text_column_is_extraction(pages):
    # by construction, but guards the generator + kernel contract
    from streamcorpus_filter_spark.kernels.extract import extract_text

    for h, t in zip(pages["html"][:200], pages["text"][:200]):
        assert extract_text(h) == t


def test_keep_drop_f1_and_reasons(pages, oracle_results, spark_results):
    by_key, rows = spark_results
    assert len(rows) == N_PAGES
    tp = fp = fn_ = 0
    reason_match = 0
    n = 0
    for url, ts, o in zip(pages["url"], pages["warc_ts"], oracle_results):
        r = by_key[(url, str(ts))]
        n += 1
        if r.keep and o.keep:
            tp += 1
        elif r.keep and not o.keep:
            fp += 1
        elif not r.keep and o.keep:
            fn_ += 1
        if (r.drop_reason or None) == (o.drop_reason or None):
            reason_match += 1
    prec = tp / max(tp + fp, 1)
    rec = tp / max(tp + fn_, 1)
    f1 = 2 * prec * rec / max(prec + rec, 1e-9)
    assert f1 >= 0.99, f"F1={f1} (tp={tp} fp={fp} fn={fn_})"
    assert reason_match / n >= 0.99, f"reason agreement {reason_match / n}"


def test_scrubbed_text_byte_identical(pages, oracle_results, spark_results):
    by_key, _ = spark_results
    checked = 0
    for url, ts, o in zip(pages["url"], pages["warc_ts"], oracle_results):
        r = by_key[(url, str(ts))]
        if o.keep and r.keep:
            assert r.scrubbed_text == o.scrubbed_text, url
            assert r.bytes_scrubbed == o.bytes_scrubbed, url
            checked += 1
    assert checked > N_PAGES * 0.4  # the corpus keeps a healthy majority


def test_stage_values_match(pages, oracle_results, spark_results):
    by_key, _ = spark_results
    lang_agree = 0
    n_scored = 0
    for url, ts, o in zip(pages["url"], pages["warc_ts"], oracle_results):
        r = by_key[(url, str(ts))]
        if o.lang_pred is not None and r.lang_pred is not None:
            n_scored += 1
            if o.lang_pred == r.lang_pred:
                lang_agree += 1
            assert math.isclose(r.lang_conf, o.lang_conf, rel_tol=1e-6, abs_tol=1e-9)
            assert math.isclose(r.ppl, o.ppl, rel_tol=1e-6)
        if o.patterns_matched is not None and r.patterns_matched is not None:
            assert r.patterns_matched == o.patterns_matched, url
            assert r.total_hits == o.total_hits, url
        if o.tox_hits is not None and r.tox_hits is not None:
            assert r.tox_hits == o.tox_hits, url
    assert n_scored > 0
    assert lang_agree / max(n_scored, 1) >= 0.995


def test_drop_reason_distribution_sane(oracle_results):
    from collections import Counter

    reasons = Counter(o.drop_reason for o in oracle_results if not o.keep)
    # the generator plants every major class; assert the big ones fired
    for expected in ["gopher_short", "gopher_bullet", "c4_lorem", "high_ppl", "rep_dup_lines", "toxic"]:
        assert reasons.get(expected, 0) > 0, (expected, reasons)


def test_spark_native_cascade_matches_kernel(spark, pages):
    """The DataFrame-native structural cascade (with_structural_signals +
    structural_reason — built-ins only, no Python fence) must agree with
    kernels/rules.structural_drop_reason row-for-row, INCLUDING NULL text
    (under ANSI mode a NULL text once made every cascade WHEN evaluate
    NULL and the row silently KEEP — the opposite of the kernel's
    gopher_short), and lazy_top2 must not change any verdict."""
    import pyspark.sql.functions as F
    from pyspark.sql.types import StringType, StructField, StructType

    from streamcorpus_filter_spark.kernels import rules
    from streamcorpus_filter_spark.kernels.extract import extract_text
    from streamcorpus_filter_spark.operators.quality import (
        structural_reason,
        with_structural_signals,
    )

    texts = [extract_text(h) for h in pages["html"][:400]]
    texts.append(None)  # the ANSI NULL regression
    texts.append("")
    want = [
        rules.structural_drop_reason(
            rules.structural_signals(t if t is not None else "")
        )
        for t in texts
    ]
    from pyspark.sql.types import LongType

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        StructType([
            StructField("i", LongType()),
            StructField("text", StringType()),
        ]),
    )
    for lazy in (False, True):
        got = (
            with_structural_signals(df, lazy_top2=lazy)
            .withColumn("reason", structural_reason())
            .select("i", "reason")
            .collect()
        )
        by_i = {r["i"]: r["reason"] for r in got}
        mismatches = [
            (i, by_i[i], want[i]) for i in range(len(texts))
            if by_i[i] != want[i]
        ]
        assert not mismatches, (lazy, mismatches[:5])
