"""Batch-vs-scalar parity for the whole-batch vectorized langid scorer:
the concatenated-buffer n-gram hashing with doc-boundary masking must
produce exactly the per-doc math of the scalar oracle path, including
empty docs, 1-2 byte docs, and multibyte UTF-8 at batch boundaries."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

from streamcorpus_filter_spark.models import default_langid


_model = default_langid()


def _check_batch(texts: list[str]) -> None:
    enc = [t.lower().encode("utf-8") for t in texts]
    pred, conf = _model.score_batch(enc)
    for i, t in enumerate(texts):
        lang_s, conf_s = _model.score_one(t)
        assert _model.langs[pred[i]] == lang_s, (i, t[:40])
        assert math.isclose(conf[i], conf_s, rel_tol=1e-6, abs_tol=1e-9), (i, t[:40])


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(codec="utf-8", max_codepoint=0x9FFF),
            max_size=80,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_batch_matches_scalar_random(texts):
    _check_batch(texts)


def test_batch_boundary_edges():
    # adjacent docs must not leak n-grams into each other: these pairs
    # share bytes at the boundary and would collide if masking failed
    _check_batch(["", "a", "ab", "abc", "", "é", "中文", "aaa", "aab"])
    _check_batch(["xyz"] * 5 + [""] * 3 + ["zyx"])
