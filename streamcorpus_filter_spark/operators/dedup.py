"""Dedup & similarity building blocks (training-data-pipeline operators).

All-DataFrame implementations where Spark can express the semantics
(shingling, MinHash via xxhash64, LSH banding, cosine via higher-order
array functions); numpy-in-pandas only for the SimHash bit kernel and the
random-hyperplane bucketing, which Spark lacks.

Scale notes (the 100TB story):
  * shingle self-joins are keyed equi-joins (shuffle on shingle hash) with
    doc-pair aggregation — never a cartesian
  * MinHash-LSH: signatures are per-doc aggs (one shuffle on doc), band
    buckets are an equi-join key; candidate verification is exact Jaccard
    on the candidates only
  * brute-force ANN broadcasts the (small) query set so the corpus side
    never shuffles; the LSH variant turns it into an equi-join on bucket
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def word_shingles(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, hashed: bool = False
) -> DataFrame:
    """Distinct word k-gram shingles: (id, shingle). Built-ins only.

    ``hashed=True`` emits the shingle as an int64 ``xxhash64`` over the
    k token strings directly (variadic native hash — no gram STRING is
    ever materialized) instead of the space-joined gram text. Jaccard
    over hashed shingles equals Jaccard over strings up to ~n^2/2^64
    collisions, downstream join keys shrink to 8 bytes, and skipping
    the per-gram concat_ws allocation alone cut the 48k-page demo's
    shingle stage ~25% — use it everywhere the shingle text itself is
    not the output."""
    toks = F.filter(F.split(F.col(text_col), "[ \\t\\n\\r\\f\\x0B]+"), lambda x: x != "")
    df = df.select(F.col(id_col).alias("_id"), toks.alias("_toks"))

    def gram(i):
        parts = [F.element_at("_toks", i + j) for j in range(k)]
        return F.xxhash64(*parts) if hashed else F.concat_ws(" ", *parts)

    empty = F.array().cast("array<bigint>" if hashed else "array<string>")
    # sequence(1, n) with n < 1 DESCENDS ([1, 0]) instead of being empty,
    # and element_at(_toks, 0) then throws — docs shorter than one
    # shingle must short-circuit to an empty gram array
    grams = F.when(
        F.size("_toks") >= k,
        F.transform(F.sequence(F.lit(1), F.size("_toks") - (k - 1)), gram),
    ).otherwise(empty)
    return (
        df.select("_id", F.explode(F.array_distinct(grams)).alias("shingle"))
        .select(F.col("_id").alias(id_col), "shingle")
    )


def jaccard_pairs(
    shingles: DataFrame, id_col: str, threshold: float, max_df: int | None = None
) -> DataFrame:
    """Exact Jaccard over a shingle table: returns (a, b, jaccard) with
    a < b and jaccard >= threshold. One shuffle on shingle, one on pair.

    ``max_df`` caps shingle document frequency BEFORE the self-join: a
    shingle appearing in n docs yields n^2 join rows, so without a cap one
    hot stop-phrase shingle ("of the and" at crawl scale) degenerates the
    equi-join toward a cartesian on that key. With the cap, both the
    intersection AND the per-doc sizes are computed over the capped
    shingle space (= exact Jaccard restricted to informative shingles —
    the standard df-capped search-index semantics, mirrored verbatim in
    the DuckDB oracle). The uncapped exact path remains for
    fixtures/candidate verification; LSH is the scale path either way.

    The cap itself must not recreate the skew it guards against: a
    window `count(*) OVER (PARTITION BY shingle)` gathers every copy of
    the hot shingle in ONE reducer before filtering it out (hashing
    never splits equal keys — the same trap ql_line_dedup had). The df
    count is therefore a map-side-combinable groupBy + a semi-join back:
    the hot key's probe rows stream through the join and drop, and AQE
    can split a skewed probe partition."""
    if max_df is not None:
        keep = (
            shingles.groupBy("shingle")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_df)
            .select("shingle")
        )
        shingles = shingles.join(keep, "shingle", "left_semi")
    sizes = shingles.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = shingles.select(F.col(id_col).alias("a"), "shingle")
    b = shingles.select(F.col(id_col).alias("b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("sa"))
    sb = sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("sb"))
    return (
        inter.join(sa, "a")
        .join(sb, "b")
        .withColumn(
            "jaccard", F.col("inter") / (F.col("sa") + F.col("sb") - F.col("inter"))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", F.round("jaccard", 6).alias("jaccard"))
    )


def verify_pairs_jaccard(
    cands: DataFrame,
    shingles: DataFrame,
    id_col: str,
    threshold: float,
    *,
    max_broadcast_ids: int = 10_000_000,
) -> DataFrame:
    """Exact Jaccard computed ONLY on candidate pairs (a, b) — the LSH
    scale path: join each side to its collected shingle set, then
    intersect/union via array built-ins. Work is proportional to the
    candidate count, never to all pairs sharing a shingle (which is what
    LSH exists to avoid). Returns (a, b, jaccard) with jaccard >= threshold.

    The shingle table is semi-joined to the candidate doc ids BEFORE the
    collect_set: without it the verify stage shuffles every doc's full
    shingle list even though only candidate docs are ever looked at —
    measured 18s vs 3s at 21M shingle rows / 3.3k candidates, and at
    crawl scale the difference is the whole corpus vs the near-dup slice.

    The id set is BROADCAST explicitly: left with a shuffle semi-join,
    the stream side is the corpus's entire shingle table, so its shuffle
    bytes grow with corpus size even though the output is candidates-only
    (measured in BENCH/IMHDEMO.md: 214 MB -> 719 MB probe shuffle across
    a 4x seen-corpus growth, all of it this semi-join). Candidate ids are
    bounded by the band-collision count — orders of magnitude below the
    corpus — so the broadcast turns the verify into a scan-side filter
    with ZERO corpus-side shuffle; only the filtered candidate shingles
    (seen-size-independent) shuffle into collect_set.

    The broadcast is guarded, not unconditional: on a pathological input
    (dirty corpus, too-low band/threshold) candidates can approach corpus
    size, and a forced broadcast of that id set is a driver/executor OOM
    where a shuffle semi-join is merely slow. One count() prices the set;
    past ``max_broadcast_ids`` (10M ids ≈ 80 MB of BIGINTs, comfortably
    broadcastable) the plan falls back to the shuffle semi-join — the
    escape hatch size-based planning would have provided."""
    ids = (
        cands.select(F.col("a").alias(id_col))
        .unionByName(cands.select(F.col("b").alias(id_col)))
        .distinct()
        # materialize once: the guard's count() and the semi-join below
        # would otherwise each re-execute the candidate-generation plan
        # (typically a band equi-join) from scratch
        .localCheckpoint(eager=True)
    )
    if ids.count() <= max_broadcast_ids:
        ids = F.broadcast(ids)
    sets_ = (
        shingles.join(ids, id_col, "left_semi")
        .groupBy(id_col)
        .agg(F.collect_set("shingle").alias("shset"))
    )
    sa = sets_.select(F.col(id_col).alias("a"), F.col("shset").alias("sh_a"))
    sb = sets_.select(F.col(id_col).alias("b"), F.col("shset").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    return (
        cands.join(sa, "a")
        .join(sb, "b")
        .withColumn(
            "jaccard", inter / (F.size("sh_a") + F.size("sh_b") - inter)
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_signatures(
    shingles: DataFrame, id_col: str, n_perm: int = 32
) -> DataFrame:
    """(id, sig: array<bigint>) — perm i = min over shingles of
    xxhash64(i, shingle). One aggregation, JVM-side hashing.

    Perms hash (lit(i), shingle) VARIADICALLY: xxhash64 folds the seed
    int and the shingle as fixed-width native values. The obvious
    alternative — hashing the string concat "i|shingle" — paid a
    cast-to-string + concat allocation per (shingle, perm), and at 21M
    shingles x 32 perms that was 98s of a 163s job (profiled on the
    48k-page demo); the variadic form does the same stage in a few
    seconds because no string is ever built."""
    hashed = shingles.select(
        id_col,
        *[
            F.xxhash64(F.lit(i), F.col("shingle")).alias(f"h{i}")
            for i in range(n_perm)
        ],
    )
    agg = hashed.groupBy(id_col).agg(
        *[F.min(f"h{i}").alias(f"m{i}") for i in range(n_perm)]
    )
    return agg.select(
        id_col, F.array(*[F.col(f"m{i}") for i in range(n_perm)]).alias("sig")
    )


def lsh_band_keys(
    sigs: DataFrame, id_col: str, n_perm: int = 32, bands: int = 8
) -> DataFrame:
    """(id, band, bh): the LSH band keys of each MinHash signature —
    the PERSISTABLE index artifact (dedup_incremental_minhash stores
    exactly this shape in a SnapshotCatalog table; at 10^12 docs the
    table would be written with an Iceberg bucket(bh) partition
    transform so probes co-partition against it without re-shuffling
    the index). Band hash is variadic native xxhash64 over the band's
    signature slots — no cast-to-string/concat per band."""
    rows = n_perm // bands
    return sigs.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(
                            *[F.col("sig")[bi * rows + j] for j in range(rows)]
                        ).alias("bh"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bh")


def lsh_candidate_pairs(
    sigs: DataFrame, id_col: str, n_perm: int = 32, bands: int = 8
) -> DataFrame:
    """Band the signatures (rows = n_perm/bands) and equi-join on
    (band, band-hash) to get candidate pairs (a < b), deduplicated."""
    banded = lsh_band_keys(sigs, id_col, n_perm, bands)
    a = banded.select(F.col(id_col).alias("a"), "band", "bh")
    b = banded.select(F.col(id_col).alias("b"), "band", "bh")
    return (
        a.join(b, ["band", "bh"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def cosine_expr(x: Column, y: Column) -> Column:
    """Cosine similarity of two array<float> columns via built-in HOFs —
    stays JVM-side (no Python fence)."""
    dot = F.aggregate(
        F.zip_with(x, y, lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    nx = F.sqrt(
        F.aggregate(x, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    ny = F.sqrt(
        F.aggregate(y, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    # zero-norm guard: cosine vs the zero vector is DEFINED as 0.0 (real
    # embedding tables contain zero rows — padding, failed encoders) —
    # without it ANSI mode throws DIVIDE_BY_ZERO and kills the job
    denom = nx * ny
    return F.when(denom > 0, dot / denom).otherwise(F.lit(0.0))


# ------------------------------------------------------------------ simhash


def simhash_fn(id_col: str, text_col: str):
    """64-bit SimHash over distinct-word hashes, fully batch-vectorized:
    one Arrow pass computes FNV-1a for EVERY word of EVERY doc in the
    batch as a numpy column sweep over a packed byte buffer (no per-word
    Python hashing — that was the one row-at-a-time-ish kernel left in
    round 1), then per-doc bit votes via a single segmented reduction.
    Bit b of the sketch = sign of sum over words of (+1 if hash bit b set
    else -1). Parity with the scalar `_poly_hash64` twin is asserted in
    tests/test_dedup_similarity.py."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernels.rules import TOKEN_SPLIT_PY

        for pdf in batches:
            # distinct words per doc (pinned ASCII whitespace class — a
            # bare str.split() splits on Unicode whitespace and diverges
            # from the SQL oracle's RE2 class on NBSP etc.); vote sums
            # are order-independent, so set iteration order is irrelevant
            doc_words = [
                [w.encode("utf-8") for w in {x for x in TOKEN_SPLIT_PY.split(t) if x}]
                if isinstance(t, str)
                else []
                for t in pdf[text_col]
            ]
            out = simhash_batch(doc_words)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "simhash": pd.array(out, dtype="int64")}
            )

    return fn


def simhash_batch(doc_words: list[list[bytes]]) -> np.ndarray:
    """SimHash for a batch of docs (each a list of distinct encoded words).

    Vectorization: all words are packed into one uint8 buffer; FNV-1a
    advances column-by-column (h = (h ^ byte) * prime on the still-active
    rows), so the Python-level loop is over max word LENGTH (~10s), never
    over words (~10^5 per batch). Per-doc votes come from one
    np.add.reduceat over the word-bit matrix."""
    n_docs = len(doc_words)
    out = np.zeros(n_docs, dtype=np.int64)
    counts = np.fromiter((len(ws) for ws in doc_words), dtype=np.int64, count=n_docs)
    flat = [w for ws in doc_words for w in ws]
    n = len(flat)
    if n == 0:
        return out
    lens = np.fromiter((len(w) for w in flat), dtype=np.int64, count=n)
    buf = np.frombuffer(b"".join(flat), dtype=np.uint8)
    offs = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=offs[1:])
    h = np.full(n, 1469598103934665603, dtype=np.uint64)  # FNV offset basis
    prime = np.uint64(1099511628211)
    for j in range(int(lens.max())):
        active = lens > j
        h[active] = (h[active] ^ buf[offs[active] + j].astype(np.uint64)) * prime
    # (n_words, 64) uint8 bit matrix via unpackbits on the raw uint64
    # bytes — a broadcasted >>/& does the same thing ~25x slower
    hb = h.astype("<u8", copy=False).view(np.uint8).reshape(n, 8)
    bits = np.unpackbits(hb, axis=1, bitorder="little")  # col k = bit k
    nz = counts > 0
    starts = np.zeros(n_docs, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    sums = np.add.reduceat(bits, starts[nz], axis=0, dtype=np.int64)
    votes = 2 * sums - counts[nz, None]
    masks = np.uint64(1) << np.arange(64, dtype=np.uint64)
    out[nz] = ((votes > 0).astype(np.uint64) @ masks).astype(np.int64)
    return out


def _poly_hash64(data: bytes) -> int:
    """Deterministic 64-bit FNV-1a (process-stable, unlike Python's builtin
    hash) — the scalar oracle twin of the vectorized column sweep in
    simhash_batch."""
    h = 1469598103934665603  # FNV offset basis
    for byte in data:
        h = ((h ^ byte) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return h


def hamming64_expr(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))
