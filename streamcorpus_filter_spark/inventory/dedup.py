"""Dedup + similarity-search + text-analysis + multimodal query inventory
(training-data-pipeline operators; graded alongside SURVEY.md §2).

Near-dup fixtures are derived deterministically inside each query (the
fixture tables have no natural near-dups): every doc_id % 10 == 0 gets a
truncated twin with id doc_id + 1_000_000 — reproduced identically in the
DuckDB oracle SQL, so exact-Jaccard pairs are value-checked end to end.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..kernels.rules import STOPWORD_SET
from ..operators.dedup import (
    cosine_expr,
    hamming64_expr,
    jaccard_pairs,
    simhash_fn,
    word_shingles,
)
from ..queries import cached_broadcast, load, register

# SQL fragment: documents plus truncated twins (first 40 words) of every
# 10th doc — the near-dup planted fixture, identical on both engines.
_TWINNED = """
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id,
           array_to_string(list_filter(string_split(text, ' '), w -> w <> '')[1:40], ' ') AS text
    FROM documents WHERE doc_id % 10 = 0
"""


def _twinned(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents").select("doc_id", "text")
    toks = F.filter(F.split("text", "[ \\t\\n\\r\\f\\x0B]+"), lambda x: x != "")
    twins = (
        d.filter(F.col("doc_id") % 10 == 0)
        .select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.array_join(F.slice(toks, 1, 40), " ").alias("text"),
        )
    )
    return d.unionByName(twins)


@register(
    "dedup_exact_hash",
    """
    SELECT md5(text) AS content_hash, count(*) AS copies, min(doc_id) AS canonical_id
    FROM documents GROUP BY md5(text) HAVING count(*) >= 1
    """,
)
def dedup_exact_hash(spark: SparkSession, sf: str) -> DataFrame:
    """Exact content dedup: hash-groupBy, canonical = smallest id."""
    return (
        load(spark, sf, "documents")
        .groupBy(F.md5("text").alias("content_hash"))
        .agg(F.count("*").alias("copies"), F.min("doc_id").alias("canonical_id"))
    )


# document-frequency cap for the exact shingle self-join: shingles seen in
# more than this many docs are dropped before the join (hot-key guard; see
# operators/dedup.py jaccard_pairs). Mirrored in the oracle SQL below.
MAX_SHINGLE_DF = 64


@register(
    "dedup_ngram_jaccard",
    f"""
    WITH t AS ({_TWINNED}),
    w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS words FROM t),
    sh0 AS (
      SELECT DISTINCT doc_id, words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
      FROM w, UNNEST(range(1, greatest(len(words) - 1, 1))) AS r(i)
    ),
    sh AS (
      SELECT doc_id, shingle FROM (
        SELECT doc_id, shingle, count(*) OVER (PARTITION BY shingle) AS df
        FROM sh0
      ) WHERE df <= {MAX_SHINGLE_DF}
    ),
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
      FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
      GROUP BY x.doc_id, y.doc_id
    )
    SELECT a, b, round(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) AS jaccard
    FROM inter JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
    WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.2
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """Exact word-3-gram Jaccard near-dup pairs on the twinned corpus,
    with the df > {MAX_SHINGLE_DF} hot-shingle cap active on both engines
    (exact Jaccard over the capped/informative shingle space)."""
    sh = word_shingles(_twinned(spark, sf), "doc_id", "text", k=3)
    return jaccard_pairs(sh, "doc_id", threshold=0.2, max_df=MAX_SHINGLE_DF)


_MINHASH_TOK = r"[ \\t\\n\\r\\f\\x0B]+"


def _minhash_sql(n_perm: int = 32, bands: int = 16, threshold: float = 0.2) -> str:
    """The MinHash+LSH query as ONE generated SQL string. Semantically
    identical to the DataFrame composition in operators/dedup.py (same
    xxhash64 expressions, verified identical output at sf0.1) but built
    in a single spark.sql parse: the DataFrame form's ~200 Column-API
    calls cost 1.4s of Py4J round-trips per invocation — 40% of the
    query's wall time — vs ~0.2s for one SQL parse.

    Plan notes (measured, also apply to the SQL form): keep the shingle
    expression inline in the explode (naming the array and exploding
    later trips InferFiltersFromGenerate, whose inferred size()>0 filter
    gets the whole expression re-inlined and evaluated twice per row —
    8x); the explode+partial-min-agg shape shuffles ~1 row/doc
    (map-side combine); a row-local array_min(transform) variant is 10x
    slower (interpreted HOF hashing, no codegen)."""
    rows = n_perm // bands
    hash_cols = ", ".join(
        f"xxhash64(concat('{i}|', shingle)) AS h{i}" for i in range(n_perm)
    )
    min_cols = ", ".join(f"min(h{i}) AS m{i}" for i in range(n_perm))
    band_structs = ", ".join(
        "named_struct('band', {bi}, 'bh', xxhash64(concat_ws(',', {parts})))".format(
            bi=bi,
            parts=", ".join(f"cast(m{bi * rows + j} AS string)" for j in range(rows)),
        )
        for bi in range(bands)
    )
    return f"""
    WITH twinned AS (
      SELECT doc_id, text FROM docs_v
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id,
             array_join(slice(filter(split(text, '{_MINHASH_TOK}'), x -> x != ''), 1, 40), ' ') AS text
      FROM docs_v WHERE doc_id % 10 = 0
    ),
    toks AS (SELECT doc_id, filter(split(text, '{_MINHASH_TOK}'), x -> x != '') AS t FROM twinned),
    sh AS (
      SELECT doc_id,
             explode(array_distinct(transform(sequence(1, greatest(size(t) - 2, 0)),
                 i -> concat_ws(' ', element_at(t, i), element_at(t, i + 1), element_at(t, i + 2))))) AS shingle
      FROM toks
    ),
    hashed AS (SELECT doc_id, {hash_cols} FROM sh),
    sigs AS (SELECT doc_id, {min_cols} FROM hashed GROUP BY doc_id),
    banded AS (
      SELECT doc_id, bb.band AS band, bb.bh AS bh
      FROM sigs LATERAL VIEW explode(array({band_structs})) t AS bb
    ),
    cands AS (
      SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      FROM banded x JOIN banded y ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id
    ),
    sets AS (SELECT doc_id, collect_set(shingle) AS shset FROM sh GROUP BY doc_id)
    SELECT a, b, round(jac, 6) AS jaccard FROM (
      SELECT a, b,
             size(array_intersect(sa.shset, sb.shset)) /
             CAST(size(sa.shset) + size(sb.shset) - size(array_intersect(sa.shset, sb.shset)) AS DOUBLE) AS jac
      FROM cands JOIN sets sa ON cands.a = sa.doc_id JOIN sets sb ON cands.b = sb.doc_id
    ) WHERE jac >= {threshold}
    """


@register("dedup_minhash_lsh")  # xxhash sketches are engine-specific -> rows-only
def dedup_minhash_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash (32 perms) + LSH banding (16 bands x 2 rows, ~certain
    recall above j~0.5) candidate pairs, verified by exact Jaccard on the
    candidates only — the linear-time near-dup path at scale. pytest
    checks recall vs the exact pairs on planted twins; see _minhash_sql
    for why this query is generated SQL rather than Column-API calls."""
    load(spark, sf, "documents").createOrReplaceTempView("docs_v")
    return spark.sql(_minhash_sql(n_perm=32, bands=16, threshold=0.2))


@register("dedup_simhash")  # custom bit sketch -> rows-only
def dedup_simhash(spark: SparkSession, sf: str) -> DataFrame:
    """64-bit SimHash near-dup pairs: 16-bit band join, hamming <= 6
    verify. Bands make it an equi-join (no cartesian) at any scale."""
    t = _twinned(spark, sf)
    sh = t.mapInPandas(simhash_fn("doc_id", "text"), schema="doc_id bigint, simhash bigint")
    banded = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned("simhash", i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("bits"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", "bb.band", "bb.bits")
    a = banded.select(
        F.col("doc_id").alias("a"), F.col("simhash").alias("ha"), "band", "bits"
    )
    b = banded.select(
        F.col("doc_id").alias("b"), F.col("simhash").alias("hb"), "band", "bits"
    )
    return (
        a.join(b, ["band", "bits"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", hamming64_expr(F.col("ha"), F.col("hb")).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= 6)
    )


@register(
    "dedup_embedding_cosine",
    """
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 20)
    SELECT q.vec_id AS query_id, nn.vec_id AS nn_id,
           round(nn.cos, 4) AS cosine
    FROM q, LATERAL (
      SELECT e.vec_id, list_cosine_similarity(q.embedding, e.embedding) AS cos
      FROM embeddings e WHERE e.vec_id <> q.vec_id
      ORDER BY cos DESC, e.vec_id LIMIT 1
    ) nn
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding near-dup: nearest neighbor by cosine for a query slice.
    Query side broadcast; corpus never shuffles until the tiny top-1 agg."""
    e = load(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    joined = e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        F.col("vec_id").alias("nn_id"),
        cosine_expr(F.col("qv"), F.col("embedding")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), "nn_id")
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", "nn_id", F.round("cos", 4).alias("cosine"))
    )


# ------------------------------------------------------- similarity search


@register(
    "sim_topk_bruteforce",
    """
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5)
    SELECT query_id, nn_id, rank FROM (
      SELECT q.vec_id AS query_id, e.vec_id AS nn_id,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC, e.vec_id
             ) AS rank
      FROM q, embeddings e WHERE e.vec_id <> q.vec_id
    ) WHERE rank <= 10
    """,
)
def sim_topk_bruteforce(spark: SparkSession, sf: str) -> DataFrame:
    """Brute-force cosine top-10 ANN baseline: broadcast queries x corpus
    scan, JVM-side dot products, per-query top-k window.

    (ranks, not raw cosines, are the checked values: float32 summation
    order differs between engines at the 1e-7 level.)"""
    e = load(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    joined = e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        F.col("vec_id").alias("nn_id"),
        cosine_expr(F.col("qv"), F.col("embedding")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), "nn_id")
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("query_id", "nn_id", "rank")
    )


@register("sim_lsh_bucketed")  # hyperplane projections -> rows-only
def sim_lsh_bucketed(spark: SparkSession, sf: str) -> DataFrame:
    """Random-hyperplane LSH ANN: 6-bit sign buckets over 16 rotations;
    candidates = bucket collisions in any rotation; exact cosine re-rank.
    The scale path: corpus hashed once, lookup is an equi-join on bucket.
    pytest checks recall@10 vs brute force."""
    bc = cached_broadcast(
        spark, "lsh_planes",
        lambda: np.random.RandomState(7).randn(16, 6, 64).astype(np.float64),
    )  # (rot, bit, dim)

    def bucketize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        P = bc.value
        for pdf in batches:
            V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            rows = {"vec_id": pdf["vec_id"]}
            for r in range(P.shape[0]):
                signs = (V @ P[r].T) > 0  # (n, 6)
                rows[f"b{r}"] = (signs @ (1 << np.arange(6))).astype("int64")
            yield pd.DataFrame(rows)

    e = load(spark, sf, "embeddings")
    schema = "vec_id bigint, " + ", ".join(f"b{r} bigint" for r in range(16))
    buckets = e.select("vec_id", "embedding").mapInPandas(bucketize, schema=schema)
    buckets = buckets.select(
        "vec_id",
        F.explode(
            F.array(*[
                F.struct(F.lit(r).alias("rot"), F.col(f"b{r}").alias("bucket"))
                for r in range(16)
            ])
        ).alias("rb"),
    ).select("vec_id", "rb.rot", "rb.bucket")

    q = buckets.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "rot", "bucket"
    )
    cands = (
        buckets.join(F.broadcast(q), ["rot", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("nn_id"))
        .distinct()
    )
    ev = load(spark, sf, "embeddings")
    qv = ev.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    scored = (
        cands.join(F.broadcast(qv), "query_id")
        .join(ev, F.col("vec_id") == F.col("nn_id"))
        .select("query_id", "nn_id", cosine_expr(F.col("qv"), F.col("embedding")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), "nn_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("query_id", "nn_id", "rank", F.round("cos", 4).alias("cosine"))
    )


@register("sim_ivf_topk")  # trained centroids -> rows-only
def sim_ivf_topk(spark: SparkSession, sf: str) -> DataFrame:
    """IVF (inverted-file) ANN: k-means centroids trained driver-side on a
    bounded sample, broadcast; every corpus vector is assigned to its
    nearest centroid in one numpy pass; a query probes only its nprobe
    nearest cells (equi-join on cell id) and exact-cosine re-ranks the
    candidates. The scale path for 10^9+ vectors: the corpus is hashed
    once into cell-keyed layout, query cost is ~nprobe/K of a full scan,
    and the join is an equi-join AQE can plan. pytest checks recall@10
    vs brute force."""
    K, NPROBE, SEED, SAMPLE = 16, 4, 11, 2048

    e = load(spark, sf, "embeddings")

    def _train_centroids() -> np.ndarray:
        # bounded, deterministic sample to the driver (vec_id order) — at
        # 10^12 rows this would be `ORDER BY hash LIMIT n` / reservoir
        samp = np.stack(
            e.orderBy("vec_id").limit(SAMPLE).toPandas()["embedding"].map(np.asarray)
        ).astype(np.float64)
        rng = np.random.RandomState(SEED)
        cent = samp[rng.choice(len(samp), K, replace=False)]
        for _ in range(8):  # Lloyd iterations, cosine metric (normalized)
            cn = cent / np.linalg.norm(cent, axis=1, keepdims=True)
            sn = samp / np.linalg.norm(samp, axis=1, keepdims=True)
            assign = (sn @ cn.T).argmax(axis=1)
            for k in range(K):
                m = assign == k
                if m.any():
                    cent[k] = samp[m].mean(axis=0)
        return cent / np.linalg.norm(cent, axis=1, keepdims=True)

    # the trained index is the IVF artifact: build once per (app, table)
    bc = cached_broadcast(spark, f"ivf_centroids_{sf}", _train_centroids)

    def assign_cells(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        C = bc.value  # (K, dim), unit norm
        for pdf in batches:
            V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
            sims = Vn @ C.T  # (n, K)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "cell": sims.argmax(axis=1).astype("int32")}
            )

    def probe_cells(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        C = bc.value
        for pdf in batches:
            V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
            order = np.argsort(-(Vn @ C.T), axis=1)[:, :NPROBE]  # (n, NPROBE)
            ids = np.repeat(pdf["vec_id"].to_numpy(), NPROBE)
            yield pd.DataFrame(
                {"query_id": ids, "cell": order.ravel().astype("int32")}
            )

    cells = e.select("vec_id", "embedding").mapInPandas(
        assign_cells, schema="vec_id bigint, cell int"
    )
    probes = (
        e.filter(F.col("vec_id") < 5)
        .select("vec_id", "embedding")
        .mapInPandas(probe_cells, schema="query_id bigint, cell int")
    )
    cands = (
        cells.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("nn_id"))
        .distinct()
    )
    qv = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    scored = (
        cands.join(F.broadcast(qv), "query_id")
        .join(e, F.col("vec_id") == F.col("nn_id"))
        .select(
            "query_id", "nn_id", cosine_expr(F.col("qv"), F.col("embedding")).alias("cos")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), "nn_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("query_id", "nn_id", "rank", F.round("cos", 4).alias("cosine"))
    )


# ----------------------------------------------------------- text analysis


@register(
    "txt_token_count",
    r"""
    SELECT doc_id,
           CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT) AS bpe_ish_tokens
    FROM documents
    """,
)
def txt_token_count(spark: SparkSession, sf: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex tokenizer."""
    d = load(spark, sf, "documents")
    toks = F.filter(F.split("text", "[ \\t\\n\\r\\f\\x0B]+"), lambda x: x != "")
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("ws_tokens"),
        F.regexp_count("text", F.lit(r"\w+|[^\w\s]")).cast("bigint").alias("bpe_ish_tokens"),
    )


@register(
    "txt_fingerprint",
    """
    SELECT doc_id, md5(text) AS fp, CAST(length(text) AS BIGINT) AS n_chars
    FROM documents
    """,
)
def txt_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Content fingerprint (md5) — the exact-dedup/lineage key."""
    return load(spark, sf, "documents").select(
        "doc_id", F.md5("text").alias("fp"), F.length("text").cast("bigint").alias("n_chars")
    )


@register("txt_rolling_fp")  # custom rolling hash -> rows-only
def txt_rolling_fp(spark: SparkSession, sf: str) -> DataFrame:
    """Winnowing-style fingerprint: minimum 64-bit rolling hash over
    16-byte windows (numpy kernel) — robust to suffix edits."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        B, W = 257, 16
        # window hash = sum_j byte[j] * B^(W-1-j) mod 2^64; vectorized as W
        # strided adds (numpy uint64 wraps silently) — no per-byte loop.
        weights = np.array(
            [pow(B, W - 1 - j, 1 << 64) for j in range(W)], dtype=np.uint64
        )
        for pdf in batches:
            out = []
            for t in pdf["text"]:
                data = np.frombuffer(
                    t.encode("utf-8") if isinstance(t, str) else b"", dtype=np.uint8
                ).astype(np.uint64)
                if data.size < W:
                    out.append(0)
                    continue
                n = data.size - W + 1
                h = np.zeros(n, dtype=np.uint64)
                for j in range(W):
                    h += data[j : j + n] * weights[j]
                out.append(int(h.min().astype(np.int64)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "min_fp": pd.array(out, dtype="int64")})

    return load(spark, sf, "documents").select("doc_id", "text").mapInPandas(
        fn, schema="doc_id bigint, min_fp bigint"
    )


_STOPLIST_SQL = "[" + ", ".join(f"'{w}'" for w in sorted(STOPWORD_SET)) + "]"


@register(
    "txt_quality_score",
    f"""
    WITH s AS (
      SELECT doc_id,
             len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_words,
             len(list_filter(list_filter(string_split(text, ' '), w -> w <> ''),
                 w -> list_contains({_STOPLIST_SQL}, lower(w)))) AS n_stop
      FROM documents
    )
    SELECT doc_id,
           round(0.5 * least(n_words / 100.0, 1.0)
               + 0.5 * least(n_stop / 10.0, 1.0), 6) AS quality
    FROM s
    """,
)
def txt_quality_score(spark: SparkSession, sf: str) -> DataFrame:
    """Composite quality score from length + stopword density."""
    from ..operators.quality import with_structural_signals

    s = with_structural_signals(load(spark, sf, "documents"))
    return s.select(
        "doc_id",
        F.round(
            0.5 * F.least(F.col("n_words") / 100.0, F.lit(1.0))
            + 0.5 * F.least(F.col("n_stopwords") / 10.0, F.lit(1.0)),
            6,
        ).alias("quality"),
    )


# ---------------------------------------------------------------- multimodal


@register(
    "mm_blob_stats",
    """
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS blob_len,
           md5(text) AS blob_md5
    FROM documents
    """,
)
def mm_blob_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Opaque-binary-column plumbing: treat text bytes as a media blob and
    compute typed metadata JVM-side (the fixture has no real media)."""
    d = load(spark, sf, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("blob")
    )
    return d.select(
        "doc_id",
        F.length("blob").cast("bigint").alias("blob_len"),
        F.md5("blob").alias("blob_md5"),
    )


@register("mm_decode_features")  # deterministic fake decode -> rows-only
def mm_decode_features(spark: SparkSession, sf: str) -> DataFrame:
    """Media decode + feature-extract plumbing over binary blobs via
    mapInPandas. Real decoders (PIL/ffmpeg) are absent in this
    environment, so decode is a clearly-marked deterministic fake (hashed
    bytes -> 8-dim feature); the Spark-side schema, batching, and
    partition behavior are the real thing. Swap `_fake_decode` for a real
    decoder on a cluster."""

    def _fake_decode(blob: bytes) -> np.ndarray:
        # STUB: stands in for image/audio decode; see operators/multimodal.
        a = np.frombuffer(blob, dtype=np.uint8)
        if a.size == 0:
            return np.zeros(8)
        chunks = np.array_split(a.astype(np.float64), 8)
        return np.array([c.mean() if c.size else 0.0 for c in chunks])

    import json

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode(b if isinstance(b, (bytes, bytearray)) else b"") for b in pdf["blob"]]
            # feature vector serialized as a JSON string, not array<double>:
            # the driver canonicalizes rows-only outputs with a pandas
            # sort_values, which cannot factorize list cells — strings sort
            # and hash fine, and json.loads round-trips losslessly
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "feature": [json.dumps(np.round(f, 6).tolist()) for f in feats],
                    "dim": pd.array([len(f) for f in feats], dtype="int32"),
                }
            )

    d = load(spark, sf, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("blob")
    )
    return d.mapInPandas(fn, schema="doc_id bigint, feature string, dim int")


@register("mm_resize")  # deterministic fake image resize -> rows-only
def mm_resize(spark: SparkSession, sf: str) -> DataFrame:
    """Image-resize plumbing over opaque blobs: interpret the blob as a
    square byte 'image' (side = floor(sqrt(len))), block-mean it down to
    a fixed 8x8 thumbnail (STUB for a real PIL/cv2 resize — absent in
    this environment), return the 64-byte thumbnail as binary plus typed
    source/target dims. The Spark-side reality: binary-in/binary-out
    Arrow batching with per-row metadata, the shape every real media
    resize stage has."""
    DST = 8

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs: list[bytes] = []
            sides: list[int] = []
            for blob in pdf["blob"]:
                b = blob if isinstance(blob, (bytes, bytearray)) else b""
                side = max(int(len(b) ** 0.5), 1)
                a = np.frombuffer(b[: side * side], dtype=np.uint8)
                if a.size < side * side:
                    a = np.pad(a, (0, side * side - a.size))
                img = a.reshape(side, side).astype(np.float64)
                # STUB resize: block-mean via split indices (any side size)
                ys = np.array_split(np.arange(side), DST)
                xs = np.array_split(np.arange(side), DST)
                thumb = np.array(
                    [[img[np.ix_(y, x)].mean() if y.size and x.size else 0.0 for x in xs] for y in ys]
                )
                thumbs.append(np.round(thumb).astype(np.uint8).tobytes())
                sides.append(side)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "thumb": thumbs,
                    "src_side": pd.array(sides, dtype="int32"),
                    "dst_side": pd.array([DST] * len(sides), dtype="int32"),
                }
            )

    d = load(spark, sf, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("blob")
    )
    return d.mapInPandas(
        fn, schema="doc_id bigint, thumb binary, src_side int, dst_side int"
    )


@register("mm_frame_sample")  # deterministic fake frame decode -> rows-only
def mm_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Video-style frame sampling over opaque blobs: each blob yields up to
    N_FRAMES evenly-spaced 'frames' (fixed-stride byte windows standing in
    for decoded frames — real ffmpeg/PIL are absent here, the STUB is the
    window slice), one output ROW per frame (mapInPandas as a UDTF: the
    batch fans out 1->N). Spark-side reality being exercised: row-expanding
    Arrow stage, per-frame typed metadata, and downstream per-frame
    feature columns. Swap the window slice for a real decoder on a
    cluster."""
    import json

    N_FRAMES, FRAME_BYTES = 4, 256

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            offs: list[int] = []
            feats: list[str] = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                b = blob if isinstance(blob, (bytes, bytearray)) else b""
                n = max(1, min(N_FRAMES, len(b) // FRAME_BYTES or 1))
                for fi in range(n):
                    off = (fi * max(len(b) - FRAME_BYTES, 0)) // max(n - 1, 1) if n > 1 else 0
                    win = np.frombuffer(b[off : off + FRAME_BYTES], dtype=np.uint8)
                    # STUB decode: 4-bin byte histogram as the "frame feature"
                    hist = np.bincount(win >> 6, minlength=4).astype(np.float64)
                    hist /= max(win.size, 1)
                    ids.append(doc_id)
                    idxs.append(fi)
                    offs.append(off)
                    # JSON string, not array<double> — see mm_decode_features
                    feats.append(json.dumps(np.round(hist, 6).tolist()))
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "byte_offset": pd.array(offs, dtype="int64"),
                    "frame_feat": feats,
                }
            )

    d = load(spark, sf, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("blob")
    )
    return d.mapInPandas(
        fn,
        schema="doc_id bigint, frame_idx int, byte_offset bigint, frame_feat string",
    )
