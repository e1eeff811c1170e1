"""L1/L2 checks for the C4 line-level rewrite (kernels/rules.py
c4_line_filter) and its Spark built-ins twin (inventory ql_c4_rules)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from streamcorpus_filter_spark.kernels import rules


@pytest.mark.parametrize(
    "text,expect",
    [
        ("one two three.", "one two three."),
        ("one two three", ""),                       # no terminal punct
        ("too short.", ""),                          # < 3 words
        ("uses javascript here.", ""),               # bad substring
        ("uses JavaScript here.", ""),               # case-insensitive
        ("ends with spaces.   ", "ends with spaces.   "),  # rtrim then check
        ("a b c!\nx y z?\nno punct\nd e f。", "a b c!\nx y z?\nd e f。"),
        ("", ""),
        ("\n\n", ""),
    ],
)
def test_c4_line_filter_cases(text, expect):
    assert rules.c4_line_filter(text) == expect


def test_c4_spark_twin_matches_kernel(spark):
    """The built-ins implementation used by ql_c4_rules must byte-match
    the Python kernel on the synthetic pages corpus (multi-line, planted
    bullets/gibberish/real prose)."""
    from streamcorpus_filter_spark.synth import make_pages

    pages = make_pages(150, seed=7)
    df = spark.createDataFrame(
        list(zip(range(len(pages["text"])), pages["text"])), "i long, text string"
    )
    kept = F.filter(
        F.split(F.col("text"), "\n"),
        lambda l: F.rtrim(l).rlike("[.!?。]$")
        & (
            F.size(F.filter(F.split(l, " "), lambda w: w != ""))
            >= rules.C4_MIN_LINE_WORDS
        )
        & ~F.contains(F.lower(l), F.lit(rules.C4_BAD_SUBSTR)),
    )
    got = {
        r["i"]: r["out"]
        for r in df.select("i", F.array_join(kept, "\n").alias("out")).collect()
    }
    for i, t in enumerate(pages["text"]):
        assert got[i] == rules.c4_line_filter(t), f"doc {i}"
