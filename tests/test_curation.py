"""Curation-operator tests: independent Python recounts of each new op
(the DuckDB oracle is the driver's check; these recount with plain
python/pandas so a shared SQL mistake can't self-confirm)."""

from __future__ import annotations

import hashlib
from collections import Counter

import duckdb
import pytest

from streamcorpus_filter_spark.inventory.curation import (
    CLF_VOCAB,
    SAMPLE_THRESHOLDS,
    _DEFAULT_THRESHOLD,
    _FP_CHARS,
    _MIN_CHARS,
)
from streamcorpus_filter_spark.kernels.rules import STOPWORD_SET

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def reg():
    from streamcorpus_filter_spark import queries as q

    return q


@pytest.fixture(scope="module")
def docs():
    return (
        duckdb.connect()
        .execute(
            f"SELECT doc_id, text, lang, n_chars FROM '{SF_SMALL}/documents.parquet'"
        )
        .fetchall()
    )


def _tokens(text: str) -> list[str]:
    # pinned ASCII whitespace class
    out, cur = [], []
    for ch in text.lower():
        if ch in " \t\n\r\f\x0b":
            if cur:
                out.append("".join(cur))
                cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


def test_classifier_logit_matches_python_fold(spark, reg, docs):
    rows = {r.doc_id: r for r in reg.QUERIES["ql_classifier_score"](spark, SF_SMALL).collect()}
    assert len(rows) == len(docs)
    for doc_id, text, _lang, _nc in docs:
        want = sum(CLF_VOCAB.get(w, 0) for w in _tokens(text))
        got = rows[doc_id]
        assert got.logit_micro == want, doc_id
        assert got.pred == (want > 0)


def test_classifier_plan_is_shuffle_and_python_free(spark, reg):
    plan = reg.QUERIES["ql_classifier_score"](spark, SF_SMALL)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_curation_plan_single_scan_no_window(spark, reg):
    """The funnel must be ONE corpus scan with the length gate pushed
    down, and (round 4) ZERO Window operators: the old keep-first
    `min(doc_id) OVER (PARTITION BY h)` gathered every doc sharing a
    boilerplate prefix in one reducer — hashing never splits identical
    prefixes. The de-skewed shape is three hash aggregates (at most 3
    exchanges), the middle one carrying only language-bounded lists."""
    import io, contextlib

    df = reg.QUERIES["curation_pipeline"](spark, SF_SMALL)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    tree = plan.split("\n\n")[0]  # node tree only (details repeat names)
    assert tree.count("Scan parquet") == 1
    assert tree.count("Exchange") <= 3
    assert tree.count("Window") == 0
    assert "GreaterThanOrEqual(n_chars," in plan


def test_stratified_sample_matches_md5_thresholds(spark, reg, docs):
    got = {r.doc_id: r for r in reg.QUERIES["ql_stratified_sample"](spark, SF_SMALL).collect()}
    for doc_id, _text, lang, _nc in docs:
        prefix = hashlib.md5(str(doc_id).encode()).hexdigest()[:4]
        keep = prefix <= SAMPLE_THRESHOLDS.get(lang, _DEFAULT_THRESHOLD)
        assert (doc_id in got) == keep, (doc_id, lang, prefix)
        if keep:
            assert got[doc_id].bucket == prefix
    # the en downsample actually bites (~25% keep on a 500-doc corpus)
    en_total = sum(1 for _, _, lang, _ in docs if lang == "en")
    en_kept = sum(1 for r in got.values() if r.lang == "en")
    assert en_kept < en_total / 2


def test_salient_terms_match_python_ranking(spark, reg, docs):
    rows = reg.QUERIES["txt_salient_terms"](spark, SF_SMALL).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # python recount: tf per doc, df over all docs
    tfs = {
        doc_id: Counter(w for w in _tokens(text) if w not in STOPWORD_SET)
        for doc_id, text, _l, _n in docs
    }
    df = Counter()
    for c in tfs.values():
        df.update(c.keys())
    for doc_id, tf in tfs.items():
        want = sorted(tf.items(), key=lambda kv: (-kv[1], df[kv[0]], kv[0]))[:3]
        got = sorted(by_doc.get(doc_id, []), key=lambda r: r.rnk)
        assert [(g.word, g.tf, g.df) for g in got] == [
            (w, c, df[w]) for w, c in want
        ], doc_id


def test_curation_funnel_matches_python_recount(spark, reg, docs):
    rows = {r.lang: r for r in reg.QUERIES["curation_pipeline"](spark, SF_SMALL).collect()}
    gated = [(d, l, n, hashlib.md5(t[:_FP_CHARS].encode()).hexdigest())
             for d, t, l, n in docs if n >= _MIN_CHARS]
    keep = {}
    for d, _l, _n, h in gated:
        keep[h] = min(keep.get(h, d), d)
    want: dict = {}
    for d, l, n, h in gated:
        w = want.setdefault(l, [0, 0, 0, 0])
        w[0] += 1
        if keep[h] == d:
            w[1] += 1
            w[3] += n
        else:
            w[2] += 1
    assert set(rows) == set(want)
    for lang, (g, k, dup, ch) in want.items():
        r = rows[lang]
        assert (r.docs_gated, r.docs_kept, r.docs_dup, r.chars_kept) == (g, k, dup, ch)
    # at least one language must show the funnel actually gating
    assert any(r.docs_gated < sum(1 for _, _, l, _ in docs if l == lang)
               for lang, r in rows.items())
    # and the dup path must actually fire somewhere
    assert sum(r.docs_dup for r in rows.values()) > 0


def test_source_mix_copy_counts_match_python(spark, reg, docs):
    from streamcorpus_filter_spark.inventory.curation import MIX_MILLI, _MIX_DEFAULT

    rows = reg.QUERIES["ql_source_mix"](spark, SF_SMALL).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.copy_idx)
    sources = (
        duckdb.connect()
        .execute(f"SELECT doc_id, source FROM '{SF_SMALL}/documents.parquet'")
        .fetchall()
    )
    for doc_id, source in sources:
        milli = MIX_MILLI.get(source, _MIX_DEFAULT)
        bucket = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16) % 1000
        want = milli // 1000 + (1 if bucket < milli % 1000 else 0)
        got = sorted(by_doc.get(doc_id, []))
        assert got == list(range(1, want + 1)), (doc_id, source, milli, bucket)
    # both the upsample (copy_idx 2+) and downsample (absent docs) paths fire
    assert any(len(v) > 1 for v in by_doc.values())
    assert len(by_doc) < len(sources)


def test_pack_bins_deterministic_and_capacity_bounded(spark, reg):
    from streamcorpus_filter_spark.inventory.curation import _PACK_CAP

    rows = reg.QUERIES["txt_pack_bins"](spark, SF_SMALL).collect()
    assert rows
    packs: dict = {}
    for r in rows:
        assert r.bucket == min(r.n_tokens // 64, 7)
        packs.setdefault((r.bucket, r.pack_id), []).append(r.doc_id)
    for (bucket, pack_id), members in packs.items():
        assert len(members) <= _PACK_CAP
    # within a bucket, packs partition docs in sorted doc_id order
    by_bucket: dict = {}
    for r in rows:
        by_bucket.setdefault(r.bucket, []).append((r.doc_id, r.pack_id))
    for bucket, pairs in by_bucket.items():
        pairs.sort()
        want_pack = [i // _PACK_CAP for i in range(len(pairs))]
        assert [p for _, p in pairs] == want_pack, bucket


def test_char_entropy_matches_python(spark, reg, docs):
    import math
    from collections import Counter

    rows = {r.doc_id: r for r in reg.QUERIES["txt_char_entropy"](spark, SF_SMALL).collect()}
    assert len(rows) == len(docs)
    for doc_id, text, _l, _n in docs:
        if text:
            c = Counter(text)
            n = len(text)
            want = math.log(n) - sum(v * math.log(v) for v in c.values()) / n
        else:
            want = 0.0
        got = rows[doc_id]
        assert abs(got.char_entropy - round(want, 4)) < 1e-9, doc_id
        assert got.low_entropy == (want < 2.0)


def test_boilerplate_scrub_matches_python_recount(spark, reg, docs):
    from streamcorpus_filter_spark.inventory.curation import _BP_DF, _BP_GRAM

    # independent recount: hot grams by distinct-doc df, covered spans,
    # per-doc reassembly — plain dicts, no SQL shared with either engine
    gram_docs: dict = {}
    doc_grams: dict = {}
    for doc_id, text, _l, _n in docs:
        toks = _tokens(text)
        grams = [
            (p, " ".join(toks[p : p + _BP_GRAM]))
            for p in range(len(toks) - _BP_GRAM + 1)
        ]
        doc_grams[doc_id] = (toks, grams)
        for _, g in grams:
            gram_docs.setdefault(g, set()).add(doc_id)
    hot = {g for g, ds in gram_docs.items() if len(ds) >= _BP_DF}
    assert hot, "fixture must contain corpus-hot grams for this test to bite"

    rows = {
        r.doc_id: r
        for r in reg.QUERIES["ql_boilerplate_scrub"](spark, SF_SMALL).collect()
    }
    assert len(rows) == len(docs)
    scrubbed_docs = 0
    for doc_id, (toks, grams) in doc_grams.items():
        covered = set()
        for p, g in grams:
            if g in hot:
                covered.update(range(p, p + _BP_GRAM))
        kept = [t for i, t in enumerate(toks) if i not in covered]
        got = rows[doc_id]
        assert got.n_toks == len(toks), doc_id
        assert got.n_removed == len(toks) - len(kept), doc_id
        assert got.clean_text == " ".join(kept), doc_id
        if covered:
            scrubbed_docs += 1
    assert scrubbed_docs > 0  # the df gate actually fires on the fixture


def test_boilerplate_scrub_hot_set_is_broadcast(spark, reg):
    """The hot-gram join must be broadcast (the boilerplate vocabulary is
    tiny by construction); only the gram-df agg and the hit slice may
    shuffle."""
    plan = (
        reg.QUERIES["ql_boilerplate_scrub"](spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ----------------------------------------------------- threshold sweep


def test_threshold_sweep_recount(spark, reg, docs):
    from streamcorpus_filter_spark.inventory.curation import SWEEP_GRID

    logits = [
        sum(CLF_VOCAB.get(w, 0) for w in _tokens(text))
        for _doc_id, text, _lang, _n in docs
    ]
    got = {
        r.thr_micro: (r.n_keep, r.keep_permille, r.kept_logit_micro)
        for r in reg.QUERIES["ql_threshold_sweep"](spark, SF_SMALL).collect()
    }
    assert sorted(got) == sorted(SWEEP_GRID)
    for thr in SWEEP_GRID:
        kept = [x for x in logits if x > thr]
        want = (len(kept), 1000 * len(kept) // len(logits), sum(kept))
        assert got[thr] == want, thr


def test_threshold_sweep_monotone(spark, reg):
    rows = sorted(
        reg.QUERIES["ql_threshold_sweep"](spark, SF_SMALL).collect(),
        key=lambda r: r.thr_micro,
    )
    # raising the cutoff can only shrink the kept set
    for a, b in zip(rows, rows[1:]):
        assert b.n_keep <= a.n_keep
        assert b.keep_permille <= a.keep_permille
    # and at 500 real docs the sweep must actually discriminate
    assert rows[0].n_keep > rows[-1].n_keep


def _clf_py_weights(docs):
    """Python recount of ql_classifier_train's sufficient statistics and
    integer milli-odds weights (exactly the Laplace cross-multiply)."""
    c_pos: Counter = Counter()
    c_neg: Counter = Counter()
    for _doc_id, text, lang, _n in docs:
        tgt = c_pos if (lang or "") == "en" else c_neg
        for w in _tokens(text or ""):
            h = hashlib.md5(w.encode()).hexdigest()
            tgt[int(h[0], 16) * 16 + int(h[1], 16)] += 1
    t_pos, t_neg = sum(c_pos.values()), sum(c_neg.values())
    weights = {
        b: ((c_pos[b] + 1) * (t_neg + 256) * 1000)
        // ((c_neg[b] + 1) * (t_pos + 256))
        for b in set(c_pos) | set(c_neg)
    }
    return c_pos, c_neg, weights


def test_classifier_train_matches_python_recount(spark, reg, docs):
    c_pos, c_neg, weights = _clf_py_weights(docs)
    got = {
        r.bucket: r
        for r in reg.QUERIES["ql_classifier_train"](spark, SF_SMALL).collect()
    }
    assert set(got) == set(weights)
    assert all(0 <= b < 256 for b in got)
    for b, r in got.items():
        assert (r.c_pos, r.c_neg) == (c_pos[b], c_neg[b]), b
        assert r.w_milli == weights[b], b
    # the trainer must actually discriminate on the real corpus: some
    # buckets above the neutral ratio, some below
    ws = [r.w_milli for r in got.values()]
    assert min(ws) < 1000 < max(ws)


def test_classifier_eval_confusion_matches_python(spark, reg, docs):
    _c_pos, _c_neg, weights = _clf_py_weights(docs)
    tp = fp = fn_ = tn = 0
    for _doc_id, text, lang, _n in docs:
        logit = 0
        for w in _tokens(text or ""):
            h = hashlib.md5(w.encode()).hexdigest()
            logit += weights[int(h[0], 16) * 16 + int(h[1], 16)] - 1000
        pred, pos = logit > 0, (lang or "") == "en"
        if pred and pos:
            tp += 1
        elif pred:
            fp += 1
        elif pos:
            fn_ += 1
        else:
            tn += 1
    out = reg.QUERIES["ql_classifier_eval"](spark, SF_SMALL).collect()[0]
    assert (out.tp, out.fp, out.fn, out.tn) == (tp, fp, fn_, tn)
    assert out.n_docs == len(docs)
    assert out.tp + out.fp + out.fn + out.tn == out.n_docs
    assert out.accuracy_milli == (tp + tn) * 1000 // len(docs)


def test_classifier_eval_weights_join_is_broadcast(spark, reg):
    """The <=256-row trained weight table must BROADCAST to the scoring
    join — a sort-merge shuffle there would move the whole exploded
    token table on the bucket key at crawl scale."""
    plan = (
        reg.QUERIES["ql_classifier_eval"](spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_classifier_calibration_matches_python_recount(spark, reg, docs):
    _cp, _cn, weights = _clf_py_weights(docs)
    bins: dict[int, list[int]] = {}  # bin -> [n, n_pos, sum_logit]
    for _doc_id, text, lang, _n in docs:
        logit = 0
        for w in _tokens(text or ""):
            h = hashlib.md5(w.encode()).hexdigest()
            logit += weights[int(h[0], 16) * 16 + int(h[1], 16)] - 1000
        b = (max(min(logit, 3999), -4000) + 4000) // 1000
        agg = bins.setdefault(b, [0, 0, 0])
        agg[0] += 1
        agg[1] += 1 if (lang or "") == "en" else 0
        agg[2] += logit
    got = {
        r.bin: r
        for r in reg.QUERIES["ql_classifier_calibration"](
            spark, SF_SMALL
        ).collect()
    }
    assert set(got) == set(bins)
    for b, (n, npos, slog) in bins.items():
        r = got[b]
        assert (r.n_docs, r.n_pos) == (n, npos), b
        assert r.pos_rate_milli == (npos * 1000) // n, b
        # truncation toward zero (Spark DIV / DuckDB //), not floor
        want_mean = (abs(slog) // n) * (1 if slog >= 0 else -1)
        assert r.mean_logit_milli == want_mean, b
    assert sum(r.n_docs for r in got.values()) == len(docs)


def test_classifier_calibration_weights_join_is_broadcast(spark, reg):
    plan = (
        reg.QUERIES["ql_classifier_calibration"](spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
