"""Selection-operator tests: independent plain-Python recounts of the
three data-selection ops (the DuckDB oracle is the driver's check;
these recount with python/numpy so a shared SQL mistake can't
self-confirm), plus structural properties of the chunking and PQ
outputs that no row-for-row value check expresses."""

from __future__ import annotations

import hashlib
import math

import duckdb
import numpy as np
import pytest

from streamcorpus_filter_spark.inventory.selection import (
    CHUNK_S,
    CHUNK_W,
    DSIR_WEIGHTS,
    PQ_CLAMP,
    PQ_K,
    PQ_M,
    PQ_SUB,
)

SF_SMALL = "/root/testdata/sf0.001"
_WS_CHARS = " \t\n\r\f\x0b"


@pytest.fixture(scope="module")
def reg():
    from streamcorpus_filter_spark import queries as q

    return q


def _tokens(text: str) -> list[str]:
    out, cur = [], []
    for ch in text.lower():
        if ch in _WS_CHARS:
            if cur:
                out.append("".join(cur))
                cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


@pytest.fixture(scope="module")
def docs():
    return (
        duckdb.connect()
        .execute(f"SELECT doc_id, text FROM '{SF_SMALL}/documents.parquet'")
        .fetchall()
    )


# --------------------------------------------------------------- chunking


def test_doc_chunk_reconstructs_every_token_stream(spark, reg, docs):
    rows = reg.QUERIES["txt_doc_chunk"](spark, SF_SMALL).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, text in docs:
        toks = _tokens(text)
        chunks = sorted(by_doc.get(doc_id, []), key=lambda r: r.chunk_idx)
        if not toks:
            assert chunks == []
            continue
        # expected chunk count
        n = len(toks)
        nch = 1 + (max(n - CHUNK_W, 0) + CHUNK_S - 1) // CHUNK_S
        assert [c.chunk_idx for c in chunks] == list(range(nch))
        for c in chunks:
            start = c.chunk_idx * CHUNK_S
            want = toks[start : start + CHUNK_W]
            assert c.chunk_ntok == len(want) > 0
            assert c.chunk_text == " ".join(want)
        # stitching the stride-prefix of each chunk (full tail for the
        # last) reproduces the token stream exactly — i.e. the windows
        # cover everything, in order, with exactly W-S overlap
        stitched: list[str] = []
        for c in chunks[:-1]:
            stitched.extend(c.chunk_text.split(" ")[:CHUNK_S])
        stitched.extend(chunks[-1].chunk_text.split(" "))
        assert stitched == toks


# --------------------------------------------------------------- DSIR


def _dsir_logw(toks: list[str]) -> int:
    hexd = "0123456789abcdef"
    acc = 0
    for a, b in zip(toks, toks[1:]):
        h = hashlib.md5(f"{a} {b}".encode()).hexdigest()
        acc += DSIR_WEIGHTS[hexd.index(h[0]) * 16 + hexd.index(h[1])]
    return acc


def test_dsir_matches_python_twin(spark, reg, docs):
    got = {
        r.doc_id: r
        for r in reg.QUERIES["ql_dsir_importance"](spark, SF_SMALL).collect()
    }
    assert len(got) == len(docs)
    for doc_id, text in docs:
        toks = _tokens(text)
        r = got[doc_id]
        assert r.n_bigrams == max(len(toks) - 1, 0)
        want = _dsir_logw(toks)
        assert r.dsir_logw_micro == want
        assert r.selected == (want > 0)


def test_dsir_weight_table_is_balanced():
    # the deterministic stand-in weights must actually select a
    # non-trivial fraction either way, or `selected` checks nothing
    assert min(DSIR_WEIGHTS) < -500 and max(DSIR_WEIGHTS) > 500
    assert len(DSIR_WEIGHTS) == 256


# --------------------------------------------------------------- PQ


def test_pq_codebook_vectors_quantize_to_themselves(spark, reg):
    out = {
        r.vec_id: r
        for r in reg.QUERIES["emb_pq_quantize"](spark, SF_SMALL).collect()
    }
    # every fixture vector got a row, codes are 8 nibble values
    emb = (
        duckdb.connect()
        .execute(f"SELECT vec_id, embedding FROM '{SF_SMALL}/embeddings.parquet'")
        .fetchall()
    )
    assert len(out) == len(emb)
    for r in out.values():
        parts = [int(p) for p in r.codes.split("-")]
        assert len(parts) == PQ_M
        assert all(0 <= p < PQ_K for p in parts)
        assert r.qerr >= 0
    # codebook members reconstruct exactly: qerr 0, code = own index
    # (fixture vectors are distinct gaussians, no centroid ties)
    for k in range(PQ_K):
        assert out[k].qerr == 0
        assert out[k].codes == "-".join([str(k)] * PQ_M)


def test_pq_assignment_matches_numpy_argmin(spark, reg):
    out = {
        r.vec_id: r
        for r in reg.QUERIES["emb_pq_quantize"](spark, SF_SMALL).collect()
    }
    emb = (
        duckdb.connect()
        .execute(
            f"SELECT vec_id, embedding FROM '{SF_SMALL}/embeddings.parquet' ORDER BY vec_id"
        )
        .fetchall()
    )

    def quant(v):
        return np.array(
            [
                max(min(math.floor(float(np.float64(x)) * 1000), PQ_CLAMP), -PQ_CLAMP)
                for x in v
            ],
            dtype=np.int64,
        )

    Q = {vid: quant(v) for vid, v in emb}
    cb = np.stack([Q[k] for k in range(PQ_K)])  # (K, 64)
    for vid, _ in emb:
        qe = Q[vid]
        codes, qerr = [], 0
        for m in range(PQ_M):
            s = slice(m * PQ_SUB, (m + 1) * PQ_SUB)
            d = ((cb[:, s] - qe[s]) ** 2).sum(axis=1)
            codes.append(int(d.argmin()))  # numpy argmin = first min = tie rule
            qerr += int(d.min())
        r = out[vid]
        assert r.codes == "-".join(map(str, codes))
        assert r.qerr == qerr


# --------------------------------------------------------------- hash split


def test_hash_split_recount(spark, reg, docs):
    got = {
        r.doc_id: (r.bucket, r.split)
        for r in reg.QUERIES["ql_hash_split"](spark, SF_SMALL).collect()
    }
    assert len(got) == len(docs)
    counts = {"train": 0, "val": 0, "test": 0}
    for doc_id, _text in docs:
        b = hashlib.md5(str(doc_id).encode()).hexdigest()[:2]
        split = "train" if b <= "cb" else ("val" if b <= "e5" else "test")
        counts[split] += 1
        assert got[doc_id] == (b, split), doc_id
    # ratio sanity at 500 docs: ~80/10/10 with binomial slack
    n = len(docs)
    assert 0.70 * n <= counts["train"] <= 0.90 * n
    assert counts["val"] >= 1 and counts["test"] >= 1


def test_hash_split_is_sticky_under_increments(spark, reg):
    """A doc's split depends only on doc_id — re-running over a GROWN
    corpus must not move any old doc (the sticky-holdout property)."""
    full = {
        r.doc_id: r.split
        for r in reg.QUERIES["ql_hash_split"](spark, SF_SMALL).collect()
    }
    for doc_id, split in full.items():
        b = hashlib.md5(str(doc_id).encode()).hexdigest()[:2]
        want = "train" if b <= "cb" else ("val" if b <= "e5" else "test")
        assert split == want


# ------------------------------------------------------------- k-means


def test_kmeans_lloyd_recount(spark, reg):
    """Pure-numpy recount of the whole Lloyd trajectory (init ->
    KM_ITERS truncating-mean updates -> final assignment), independent
    of both the Spark plan and the DuckDB oracle, so a shared SQL
    mistake can't self-confirm."""
    import numpy as np
    from streamcorpus_filter_spark.inventory.selection import (
        KM_ITERS,
        KM_K,
        PQ_CLAMP,
    )

    rows = (
        duckdb.connect()
        .execute(f"SELECT vec_id, embedding FROM '{SF_SMALL}/embeddings.parquet' ORDER BY vec_id")
        .fetchall()
    )
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    x = np.array(
        [
            [
                max(min(math.floor(float(v) * 1000), PQ_CLAMP), -PQ_CLAMP)
                for v in r[1]
            ]
            for r in rows
        ],
        dtype=np.int64,
    )
    ks = [int(i) for i in ids if i < KM_K]
    cb = x[np.isin(ids, ks)]

    def assign(c):
        d = ((x[:, None, :] - c[None]) ** 2).sum(-1)
        return d.argmin(1), d

    for _ in range(KM_ITERS):
        a, _ = assign(cb)
        nxt_ks, nxt = [], []
        for i, k in enumerate(ks):
            m = a == i
            if not m.sum():
                continue  # empty cluster drops out
            s = x[m].sum(0)
            n = int(m.sum())
            # truncating division toward zero == Spark DIV / DuckDB //
            nxt_ks.append(k)
            nxt.append(np.sign(s) * (np.abs(s) // n))
        order = np.argsort(nxt_ks)
        ks = [nxt_ks[i] for i in order]
        cb = np.stack(nxt)[order]

    a, d = assign(cb)
    want = {
        int(ids[i]): (ks[a[i]], int(d[i, a[i]])) for i in range(len(ids))
    }
    got = {
        int(r.vec_id): (int(r.cluster), int(r.dist_sq))
        for r in reg.QUERIES["emb_kmeans_lloyd"](spark, SF_SMALL).collect()
    }
    assert got == want


def test_kmeans_lloyd_structure(spark, reg):
    from streamcorpus_filter_spark.inventory.selection import KM_K

    out = reg.QUERIES["emb_kmeans_lloyd"](spark, SF_SMALL).collect()
    n_emb = (
        duckdb.connect()
        .execute(f"SELECT count(*) FROM '{SF_SMALL}/embeddings.parquet'")
        .fetchone()[0]
    )
    assert len(out) == n_emb  # every vector assigned exactly once
    assert {r.vec_id for r in out} == set(range(n_emb))
    clusters = {r.cluster for r in out}
    assert clusters <= set(range(KM_K)) and len(clusters) >= 2
    assert all(r.dist_sq >= 0 for r in out)
