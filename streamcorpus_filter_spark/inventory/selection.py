"""Data-selection & training-prep operators (LLM-pipeline extras).

Three ops a training-data pipeline runs after quality filtering, each
JVM-built-ins only in the hot path and each value-checked against a
DuckDB oracle that RECOMPUTES the result (no frozen constants):

  * ``txt_doc_chunk``      — split each document into overlapping
    fixed-width token windows (the training-sequence chunking step that
    precedes packing); W=32 tokens, stride S=24 (8-token overlap).
  * ``ql_dsir_importance`` — DSIR-style data selection (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    hashed word-bigram features, per-bucket log(p_target/p_raw) weights
    in integer micro-units, importance log-weight = sum over bigrams;
    keep iff positive. The 256-bucket weight table is the "trained"
    artifact, inlined identically on both engines (the repo's
    ql_classifier_score convention); bucket hashing is md5-prefix so
    every engine agrees bit-for-bit.
  * ``emb_pq_quantize``    — product quantization of the embedding
    column: 64 dims = 8 subspaces x 8 dims, 16 centroids per subspace
    (codes = 8 nibbles/vector, a 256x compression of float32[64] — the
    way a 10^12-row ANN index fits in RAM). The codebook is the
    subvectors of the 16 smallest vec_ids, so the DuckDB oracle
    recomputes codebook AND assignment from the table itself — the
    pattern sim_ivf_topk's integer k-means adopted in round 4 to shed
    its contract-scale-only caveat.

Engine-portability notes shared by all three:
  * token split uses the pinned ASCII whitespace class (kernels/rules.py
    spec) — Python/Java \\s is Unicode, DuckDB RE2 \\s is ASCII-only;
  * floats never enter a comparison: PQ quantizes every coordinate to
    clamped integer milli-units with floor() (identical IEEE double op
    on both engines; round() half-mode differs between engines), DSIR
    weights are exact integers;
  * argmin ties break on the smallest centroid index on both sides
    (array_position-of-min in Spark = first occurrence; row_number
    ORDER BY dist, k in DuckDB).

Scale shapes are in each docstring; the theme: per-row work inside
whole-stage codegen, the codebook/weights as plan literals (a real
deployment broadcasts the trained artifact the same way), and the only
explode is txt_doc_chunk's — whose output is the desired row set, not
an intermediate.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..queries import load, register
from ._text import _WS, _fnv1a, _toks, md5_bucket_sql

# --------------------------------------------------- doc chunking

CHUNK_W = 32  # window width (tokens)
CHUNK_S = 24  # stride (tokens) -> 8-token overlap; W > S keeps every
#               chunk non-empty (last start < n because ceil((n-W)/S)*S
#               <= n-W+S-1 <= n-1 when W >= S)


@register(
    "txt_doc_chunk",
    f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '{_WS}'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    s AS (
      SELECT doc_id, toks, len(toks) AS n,
             1 + (greatest(len(toks) - {CHUNK_W}, 0) + {CHUNK_S - 1})
                 // {CHUNK_S} AS nch
      FROM t WHERE len(toks) > 0
    ),
    x AS (
      SELECT doc_id, toks, unnest(range(0, nch)) AS chunk_idx FROM s
    )
    SELECT doc_id,
           CAST(chunk_idx AS BIGINT) AS chunk_idx,
           CAST(len(list_slice(toks, chunk_idx*{CHUNK_S}+1,
                               chunk_idx*{CHUNK_S}+{CHUNK_W})) AS BIGINT)
             AS chunk_ntok,
           array_to_string(list_slice(toks, chunk_idx*{CHUNK_S}+1,
                                      chunk_idx*{CHUNK_S}+{CHUNK_W}), ' ')
             AS chunk_text
    FROM x
    """,
)
def txt_doc_chunk(spark: SparkSession, sf: str) -> DataFrame:
    """Overlapping token-window chunking: every doc yields
    ceil-div windows of W=32 tokens at stride S=24, the last window
    short, empty docs yielding no rows. This is the sequence-prep step
    between filtering and txt_pack_bins: a trillion docs become O(docs)
    training windows in ONE narrow pass.

    Scale shape: split/slice/explode all inside whole-stage codegen,
    zero shuffles, and the explode multiplies rows by ~n_tokens/S —
    output volume, not an intermediate blow-up. Chunk boundaries depend
    only on the row itself, so the op is embarrassingly parallel and
    resumable per input split."""
    toks = _toks()
    n = F.size(toks)
    nch = (
        F.lit(1)
        + F.floor(
            (F.greatest(n - F.lit(CHUNK_W), F.lit(0)) + F.lit(CHUNK_S - 1))
            / F.lit(CHUNK_S)
        )
    ).cast("long")
    d = (
        load(spark, sf, "documents")
        .select("doc_id", toks.alias("toks"), n.alias("n"), nch.alias("nch"))
        .filter(F.col("n") > 0)
    )
    start = (F.col("chunk_idx") * CHUNK_S + 1).cast("int")
    sl = F.slice(F.col("toks"), start, CHUNK_W)
    return d.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0).cast("long"), F.col("nch") - 1)).alias(
            "chunk_idx"
        ),
        "toks",
    ).select(
        "doc_id",
        "chunk_idx",
        F.size(sl).cast("long").alias("chunk_ntok"),
        F.array_join(sl, " ").alias("chunk_text"),
    )


# --------------------------------------------------- DSIR importance

# per-bucket log(p_target/p_raw) in integer micro-units — deterministic
# stand-in for the trained DSIR bucket weights, generated the same way
# as CLF_VOCAB (FNV-1a -> [-1000, 1000]) and inlined verbatim on both
# engines.
DSIR_BUCKETS = 256
DSIR_WEIGHTS: list[int] = [
    (_fnv1a(f"dsir:{b}") % 2001) - 1000 for b in range(DSIR_BUCKETS)
]
def _dsir_bucket_sql(instr_fn: str) -> str:
    """1-based weight index for a bigram ``bg`` (the shared md5-nibble
    bucket, inventory/_text.py, shifted for element_at indexing)."""
    return f"({md5_bucket_sql(instr_fn, 'bg', nibbles=2)} + 1)"


@register(
    "ql_dsir_importance",
    f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '{_WS}'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    b AS (
      SELECT doc_id,
             list_transform(range(1, len(toks)),
                            i -> toks[i] || ' ' || toks[i+1]) AS bgs
      FROM t
    )
    SELECT doc_id,
           CAST(len(bgs) AS BIGINT) AS n_bigrams,
           CAST(coalesce(list_sum(list_transform(bgs, bg ->
                ([{",".join(map(str, DSIR_WEIGHTS))}])
                  [{_dsir_bucket_sql("strpos")}])), 0) AS BIGINT)
             AS dsir_logw_micro,
           CAST(coalesce(list_sum(list_transform(bgs, bg ->
                ([{",".join(map(str, DSIR_WEIGHTS))}])
                  [{_dsir_bucket_sql("strpos")}])), 0) AS BIGINT) > 0
             AS selected
    FROM b
    """,
)
def ql_dsir_importance(spark: SparkSession, sf: str) -> DataFrame:
    """DSIR-style importance weighting: hash each adjacent-word bigram
    to one of 256 buckets (md5-prefix nibbles — engine-portable), sum
    the bucket's log(p_target/p_raw) micro-weight, keep the doc iff the
    importance log-weight is positive. This is the hashed-n-gram
    data-selection step a pretraining pipeline runs to tilt a raw crawl
    toward a target domain without a neural scorer.

    Scale shape: the weight table is a 256-int literal in the plan (a
    trained table ships the same way via broadcast); per-row work is
    one transform+aggregate fold in whole-stage codegen — zero
    shuffles, zero Python, one pass over 10^12 docs."""
    arr = "array(" + ",".join(map(str, DSIR_WEIGHTS)) + ")"
    logw_sql = (
        f"aggregate(transform(bgs, bg -> element_at({arr}, "
        f"{_dsir_bucket_sql('instr')})), "
        "cast(0 as bigint), (acc, x) -> acc + cast(x as bigint))"
    )
    toks = _toks()
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return (
        load(spark, sf, "documents")
        .select("doc_id", bigrams.alias("bgs"))
        .select(
            "doc_id",
            F.size("bgs").cast("long").alias("n_bigrams"),
            # coalesce mirrors the oracle's coalesce(list_sum(...), 0):
            # NULL text must yield logw 0 / selected false on BOTH sides
            F.coalesce(F.expr(logw_sql), F.lit(0).cast("long"))
            .alias("dsir_logw_micro"),
            (F.coalesce(F.expr(logw_sql), F.lit(0).cast("long")) > 0)
            .alias("selected"),
        )
    )


# --------------------------------------------------- product quantization

# constants + quantize SQL live in the LEAF module _pq.py (re-exported
# here for existing consumers/tests) so dedup.py's oracle f-strings can
# import them at module-import time without an inventory cross-import
from ._pq import _QUANT_DUCK, _QUANT_SPARK, PQ_CLAMP, PQ_K, PQ_M, PQ_SUB

__all__ = [  # noqa: F822 — re-exports consumed by tests and dedup.py
    "PQ_M", "PQ_SUB", "PQ_K", "PQ_CLAMP", "_QUANT_SPARK", "_QUANT_DUCK",
]

_PQ_CACHE: dict[tuple[str, str], list[list[list[int]]]] = {}


def _pq_codebook(spark: SparkSession, sf: str) -> list[list[list[int]]]:
    """Codebook = quantized subvectors of the PQ_K smallest vec_ids —
    bounded deterministic 16-row collect, memoized per (app, sf) like
    the IVF centroids. Returns [m][k][j] integer milli-units. The driver
    quantization is the same IEEE double floor as the SQL on both
    engines, so all three agree exactly."""
    key = (spark.sparkContext.applicationId, sf)
    if key not in _PQ_CACHE:
        for old in [x for x in _PQ_CACHE if x[0] != key[0]]:
            del _PQ_CACHE[old]
        rows = (
            load(spark, sf, "embeddings")
            .filter(F.col("vec_id") < PQ_K)
            .orderBy("vec_id")
            .select("embedding")
            .collect()
        )
        q = [
            [
                max(min(math.floor(float(x) * 1000), PQ_CLAMP), -PQ_CLAMP)
                for x in r.embedding
            ]
            for r in rows
        ]
        _PQ_CACHE[key] = [
            [q[k][m * PQ_SUB : (m + 1) * PQ_SUB] for k in range(PQ_K)]
            for m in range(PQ_M)
        ]
    return _PQ_CACHE[key]


def _pq_oracle() -> str:
    terms = (
        "list_sum(list_transform(range(1,{s}), j -> "
        "(q.qe[CAST(m.m*{w}+j AS INT)] - cb.ce[CAST(m.m*{w}+j AS INT)])"
        " * (q.qe[CAST(m.m*{w}+j AS INT)] - cb.ce[CAST(m.m*{w}+j AS INT)])))"
    ).format(s=PQ_SUB + 1, w=PQ_SUB)
    return f"""
    WITH q AS (SELECT vec_id, {_QUANT_DUCK} AS qe FROM embeddings),
    cb AS (SELECT vec_id AS k, qe AS ce FROM q WHERE vec_id < {PQ_K}),
    sub AS (
      SELECT q.vec_id, m.m, cb.k, {terms} AS dist
      FROM q, range(0, {PQ_M}) m(m), cb
    ),
    best AS (
      SELECT vec_id, m, k, dist,
             row_number() OVER (PARTITION BY vec_id, m
                                ORDER BY dist, k) AS rn
      FROM sub
    )
    SELECT vec_id,
           string_agg(CAST(k AS VARCHAR), '-' ORDER BY m) AS codes,
           CAST(sum(dist) AS BIGINT) AS qerr
    FROM best WHERE rn = 1 GROUP BY vec_id
    """


@register("emb_pq_quantize", _pq_oracle())
def emb_pq_quantize(spark: SparkSession, sf: str) -> DataFrame:
    """Product quantization: each 64-dim embedding becomes 8 codes (one
    argmin over 16 centroids per 8-dim subspace) plus the exact integer
    quantization error — float32[64] compressed 256x, which is how a
    10^12-row ANN index (sim_ivf_topk's re-rank tier) fits in executor
    memory. All distance math is on clamped integer milli-units so
    Spark, DuckDB, and the driver agree bit-for-bit; ties take the
    smallest centroid index on both engines.

    Scale shape: quantization to clamped integer milli-units stays JVM-
    side, then ONE Arrow fence runs the (batch x 8-subspace x 16-centroid
    x 8-dim) distance argmin as whole-batch numpy — map-only, zero
    shuffles, the codebook rides the task closure (a real trained
    codebook ships as a broadcast the same way). Measured A/B/C at 200k
    rows x local[8] before choosing this shape: (A) unrolling all 1,024
    squared-diff terms into one Project blows janino's 64 KB method
    limit (ANSI multiplyExact + error-context per term), so the whole
    stage silently drops to interpreted eval — 29-91k rows/s; (B)
    higher-order functions (slice/zip_with/aggregate over a folded
    codebook literal) keep the plan tiny but lambda eval allocates per
    element — 2-4k rows/s, 25x slower; (C) this numpy kernel — 37-73k
    rows/s, the best average, and the only variant whose cost stays flat
    if PQ_M/PQ_K grow to production sizes (argmin work is a dense BLAS-
    shaped broadcast, not an expression tree). DOUBLE-math variants of
    (A) don't help: the quantize transform() is itself CodegenFallback,
    so the stage never reaches whole-stage codegen anyway. First-min
    ties = numpy argmin = SQL array_position semantics on both engines.
    The oracle recomputes the codebook from the table itself, so the
    value check holds at every sf — no contract-scale caveat."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    cbarr = np.array(_pq_codebook(spark, sf), dtype=np.int64)  # (M,K,S)
    load(spark, sf, "embeddings").createOrReplaceTempView("emb_v")
    q = spark.sql(f"SELECT vec_id, {_QUANT_SPARK} AS qe FROM emb_v")
    out_schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("codes", StringType()),
            StructField("qerr", LongType()),
        ]
    )

    def pq_batches(it):
        for pdf in it:
            if not len(pdf):
                continue
            x = (
                np.stack(pdf["qe"].to_numpy())
                .astype(np.int64)
                .reshape(len(pdf), PQ_M, 1, PQ_SUB)
            )
            d = ((x - cbarr[None]) ** 2).sum(-1)  # (B, M, K)
            k = d.argmin(-1)  # first min = smallest centroid index
            qerr = np.take_along_axis(d, k[..., None], -1)[..., 0].sum(-1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "codes": ["-".join(map(str, row)) for row in k],
                    "qerr": qerr,
                }
            )

    return q.mapInPandas(pq_batches, out_schema)


# --------------------------------------------------- hash split

# train/val/test assignment by 2-hex md5(doc_id) prefix, compared
# lexicographically (== numerically for fixed-width hex): <= 'cb' is
# 204/256 ~ 80% train, <= 'e5' the next 26/256 ~ 10% val, rest test.
SPLIT_TRAIN_MAX = "cb"
SPLIT_VAL_MAX = "e5"

_SPLIT_BUCKET_SQL = "substring(md5(CAST(doc_id AS VARCHAR)), 1, 2)"


@register(
    "ql_hash_split",
    f"""
    SELECT doc_id, lang,
           {_SPLIT_BUCKET_SQL} AS bucket,
           CASE WHEN {_SPLIT_BUCKET_SQL} <= '{SPLIT_TRAIN_MAX}' THEN 'train'
                WHEN {_SPLIT_BUCKET_SQL} <= '{SPLIT_VAL_MAX}' THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def ql_hash_split(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic train/val/test split: assign each doc by the first
    two hex chars of md5(doc_id) — ~80/10/10. Hash assignment instead of
    rand() because a training corpus split must be reproducible across
    engines, retries, resumed runs, and INCREMENTAL ingests (a new crawl
    snapshot's docs fall into the same splits without reshuffling old
    ones — the property a sticky eval holdout needs).

    Scale shape: a scalar projection on the scan — no shuffle, no state,
    no seed coordination across 1000 executors; downstream writers just
    ``partitionBy("split")``."""
    b = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(b <= SPLIT_TRAIN_MAX, "train")
        .when(b <= SPLIT_VAL_MAX, "val")
        .otherwise("test")
    )
    return load(spark, sf, "documents").select(
        "doc_id", "lang", b.alias("bucket"), split.alias("split")
    )


# --------------------------------------------------- distributed k-means

KM_K = 4  # clusters
KM_ITERS = 2  # Lloyd centroid updates (fixed -> both engines recompute)
KM_DIM = 64


def _km_dist(q: str, c: str) -> str:
    """Integer squared L2 between two quantized BIGINT lists (DuckDB).
    Max term (2e6)^2, x64 dims = 2.56e14 — inside BIGINT; list_sum may
    widen to HUGEINT, so every consumer CASTs back."""
    return (
        f"list_sum(list_transform(range(1, {KM_DIM + 1}), j -> "
        f"({q}[CAST(j AS INT)] - {c}[CAST(j AS INT)])"
        f" * ({q}[CAST(j AS INT)] - {c}[CAST(j AS INT)])))"
    )


def _km_ctes() -> str:
    """The WITH-body of the Lloyd recomputation, reusable by every
    oracle that builds on the clustering (emb_kmeans_lloyd itself,
    emb_cluster_balanced_sample): ends with CTE ``r`` holding
    (vec_id, k, dist, rn) where rn=1 is the final assignment."""
    dist = _km_dist("q.qe", "c.ce")
    parts = [
        f"q AS (SELECT vec_id, {_QUANT_DUCK} AS qe FROM embeddings)",
        f"c0 AS (SELECT vec_id AS k, qe AS ce FROM q WHERE vec_id < {KM_K})",
    ]
    for t in range(1, KM_ITERS + 1):
        parts.append(
            f"d{t} AS (SELECT q.vec_id, c.k, {dist} AS dist"
            f" FROM q CROSS JOIN c{t - 1} c)"
        )
        parts.append(
            f"a{t} AS (SELECT vec_id, k, row_number() OVER"
            f" (PARTITION BY vec_id ORDER BY dist, k) AS rn FROM d{t})"
        )
        parts.append(
            f"c{t} AS (SELECT k, list(cm ORDER BY j) AS ce FROM ("
            f"SELECT a.k, j.j,"
            f" CAST(sum(q.qe[CAST(j.j AS INT)]) AS BIGINT) // count(*) AS cm"
            f" FROM (SELECT vec_id, k FROM a{t} WHERE rn = 1) a"
            f" JOIN q USING (vec_id)"
            f" CROSS JOIN range(1, {KM_DIM + 1}) j(j)"
            f" GROUP BY a.k, j.j) GROUP BY k)"
        )
    parts.append(
        f"fin AS (SELECT q.vec_id, c.k, {dist} AS dist"
        f" FROM q CROSS JOIN c{KM_ITERS} c)"
    )
    parts.append(
        "r AS (SELECT vec_id, k, dist, row_number() OVER"
        " (PARTITION BY vec_id ORDER BY dist, k) AS rn FROM fin)"
    )
    return ",\n".join(parts)


def _km_oracle() -> str:
    """Full Lloyd recomputation (see _km_ctes): ties break on the
    smallest centroid id (ORDER BY dist, k), empty clusters simply drop
    out of the GROUP BY — both exactly what the Spark side's numpy
    argmin over k-sorted centroids and groupBy update produce."""
    return (
        "WITH " + _km_ctes()
        + "\nSELECT vec_id, CAST(k AS BIGINT) AS cluster,"
        " CAST(dist AS BIGINT) AS dist_sq FROM r WHERE rn = 1"
    )


@register("emb_kmeans_lloyd", _km_oracle())
def emb_kmeans_lloyd(spark: SparkSession, sf: str) -> DataFrame:
    """Distributed Lloyd k-means over the embedding column — the
    topic-clustering workhorse a curation pipeline runs before
    cluster-balanced sampling or SemDeDup-style per-cluster dedup.
    KM_K=4 centroids, deterministic init (the KM_K smallest vec_ids,
    the emb_pq_quantize codebook convention), KM_ITERS=2 fixed update
    rounds so the DuckDB oracle recomputes the whole trajectory at any
    sf. All math on clamped integer milli-units: assignment distances,
    centroid means (truncating DIV on both engines), and the output
    dist_sq are exact integers, so the result is bit-stable under any
    partitioning, retry, or engine.

    Scale shape (the MLlib shape, minus floats): per iteration, ONE
    corpus scan feeds an Arrow-fence numpy kernel that emits per-batch
    PARTIAL SUMS — at most KM_K x 64 rows per batch, i.e. the
    map-side-combine analog — which a groupBy on the bounded
    (cluster, dim) key space reduces to <= 256 rows, collected and
    rebroadcast as the next iteration's task-closure centroids. The
    corpus itself never shuffles; driver traffic is O(K x dim) per
    round. Final assignment is map-only. Ties: numpy argmin = first
    minimum over k-ascending centroids = the oracle's ORDER BY dist, k;
    a cluster emptied by an update drops out of the groupBy on BOTH
    engines and later rounds proceed with the survivors.

    Each round re-scans the parquet table (a pruned two-column columnar
    scan) instead of caching the quantized vectors: at 100 TB a re-scan
    is cheaper than materializing the working set in executor memory,
    and it keeps the op stateless across rounds (a retry resumes from
    the table, not a lost cache). If KM_ITERS grew to tens,
    ``persist(MEMORY_AND_DISK)`` on ``q`` is the one-line knob — the
    plan shape is unchanged."""
    import numpy as np
    import pandas as pd

    load(spark, sf, "embeddings").createOrReplaceTempView("emb_km_v")
    q = spark.sql(f"SELECT vec_id, {_QUANT_SPARK} AS qe FROM emb_km_v")

    init = (
        q.filter(F.col("vec_id") < KM_K)
        .orderBy("vec_id")
        .select("vec_id", "qe")
        .collect()
    )  # bounded: KM_K rows
    ks = [int(r.vec_id) for r in init]
    cb = np.array([list(r.qe) for r in init], dtype=np.int64)

    def _partials(karr: "np.ndarray", c: "np.ndarray"):
        def gen(it):
            for pdf in it:
                if not len(pdf):
                    continue
                x = np.stack(pdf["qe"].to_numpy()).astype(np.int64)
                d = ((x[:, None, :] - c[None]) ** 2).sum(-1)
                a = d.argmin(1)  # first min = smallest centroid id
                rows = {"k": [], "j": [], "s": [], "n": []}
                for i, k in enumerate(karr):
                    m = a == i
                    cnt = int(m.sum())
                    if not cnt:
                        continue
                    s = x[m].sum(0)
                    rows["k"] += [int(k)] * KM_DIM
                    rows["j"] += list(range(1, KM_DIM + 1))
                    rows["s"] += [int(v) for v in s]
                    rows["n"] += [cnt] * KM_DIM
                if rows["k"]:
                    yield pd.DataFrame(rows)

        return gen

    for _ in range(KM_ITERS):
        karr = np.array(ks, dtype=np.int64)
        part = q.mapInPandas(
            _partials(karr, cb), "k long, j long, s long, n long"
        )
        cent = (
            part.groupBy("k", "j")
            .agg(F.expr("CAST(sum(s) DIV sum(n) AS BIGINT)").alias("cm"))
            .collect()
        )  # bounded: <= KM_K x 64 rows
        byk: dict[int, dict[int, int]] = {}
        for r in cent:
            byk.setdefault(int(r.k), {})[int(r.j)] = int(r.cm)
        ks = sorted(byk)
        cb = np.array(
            [[byk[k][j] for j in range(1, KM_DIM + 1)] for k in ks],
            dtype=np.int64,
        )

    karr = np.array(ks, dtype=np.int64)
    final_cb = cb

    def assign(it):
        for pdf in it:
            if not len(pdf):
                continue
            x = np.stack(pdf["qe"].to_numpy()).astype(np.int64)
            d = ((x[:, None, :] - final_cb[None]) ** 2).sum(-1)
            a = d.argmin(1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "cluster": karr[a],
                    "dist_sq": np.take_along_axis(d, a[:, None], 1)[:, 0],
                }
            )

    return q.mapInPandas(assign, "vec_id long, cluster long, dist_sq long")


# ------------------------------------------- cluster-balanced sampling

KM_SAMPLE_M = 32  # per-cluster quota
KM_SAMPLE_SALTS = 8


@register(
    "emb_cluster_balanced_sample",
    f"""
    WITH {_km_ctes()},
    asg AS (SELECT vec_id, k AS cluster FROM r WHERE rn = 1)
    SELECT vec_id, CAST(cluster AS BIGINT) AS cluster,
           CAST(pick_rank AS BIGINT) AS pick_rank
    FROM (
      SELECT vec_id, cluster,
             row_number() OVER (PARTITION BY cluster
                                ORDER BY md5(CAST(vec_id AS VARCHAR)),
                                         vec_id) AS pick_rank
      FROM asg
    ) WHERE pick_rank <= {KM_SAMPLE_M}
    """,
)
def emb_cluster_balanced_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Cluster-balanced selection: after emb_kmeans_lloyd assigns every
    vector a topic cluster, keep a fixed quota of KM_SAMPLE_M per
    cluster, ranked by md5(vec_id) — the deterministic, seedless,
    resume-stable stand-in for random sampling (the ql_hash_split
    convention). This is the step that stops a corpus's dominant topic
    from dominating the training mix (cluster-balanced sampling per
    DoReMi/SemDeDup-style pipelines): the head topic contributes the
    same quota as the tail.

    Scale shape: cluster cardinality is TINY (K clusters) while cluster
    sizes are corpus-sized and skewed — precisely the shape where
    `row_number() OVER (PARTITION BY cluster)` funnels the megacluster
    through one reducer. So the quota is taken in two salted stages
    (the ql_host_cap pattern, plan-guarded): stage 1 ranks within
    (cluster, salt = vec_id % {KM_SAMPLE_SALTS}) — external sorts of
    1/{KM_SAMPLE_SALTS} slices — and keeps M per salted group; stage 2
    re-ranks the <= {KM_SAMPLE_SALTS}xM survivors per cluster, a
    BOUNDED group no matter how big the corpus. Same rows as the single
    window (any global top-M row is in its salt group's top-M), which
    is what the single-window oracle checks."""
    a = emb_kmeans_lloyd(spark, sf).select("vec_id", "cluster")
    skey = F.md5(F.col("vec_id").cast("string"))
    s1 = (
        a.withColumn("salt", F.col("vec_id") % KM_SAMPLE_SALTS)
        .withColumn("skey", skey)
        .withColumn(
            "r1",
            F.row_number().over(
                Window.partitionBy("cluster", "salt").orderBy(
                    "skey", "vec_id"
                )
            ),
        )
        .filter(F.col("r1") <= KM_SAMPLE_M)
    )
    return (
        s1.withColumn(
            "pick_rank",
            F.row_number().over(
                Window.partitionBy("cluster").orderBy("skey", "vec_id")
            ),
        )
        .filter(F.col("pick_rank") <= KM_SAMPLE_M)
        .select("vec_id", "cluster", F.col("pick_rank").cast("long").alias("pick_rank"))
    )
