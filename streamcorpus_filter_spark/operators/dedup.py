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


def word_shingles(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """Distinct word k-gram shingles: (id, shingle). Built-ins only."""
    toks = F.filter(F.split(F.col(text_col), "[ \\t\\n\\r\\f\\x0B]+"), lambda x: x != "")
    df = df.select(F.col(id_col).alias("_id"), toks.alias("_toks"))
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("_toks") - (k - 1), F.lit(0))),
        lambda i: F.concat_ws(
            " ", *[F.element_at("_toks", i + j) for j in range(k)]
        ),
    )
    return (
        df.select("_id", F.explode(F.array_distinct(grams)).alias("shingle"))
        .select(F.col("_id").alias(id_col), "shingle")
    )


def jaccard_pairs(
    shingles: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    """Exact Jaccard over a shingle table: returns (a, b, jaccard) with
    a < b and jaccard >= threshold. One shuffle on shingle, one on pair."""
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
    cands: DataFrame, shingles: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    """Exact Jaccard computed ONLY on candidate pairs (a, b) — the LSH
    scale path: join each side to its collected shingle set, then
    intersect/union via array built-ins. Work is proportional to the
    candidate count, never to all pairs sharing a shingle (which is what
    LSH exists to avoid). Returns (a, b, jaccard) with jaccard >= threshold."""
    sets_ = shingles.groupBy(id_col).agg(F.collect_set("shingle").alias("shset"))
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
    xxhash64(i || shingle). One aggregation, JVM-side hashing."""
    hashed = shingles.select(
        id_col,
        *[
            F.xxhash64(F.concat(F.lit(f"{i}|"), F.col("shingle"))).alias(f"h{i}")
            for i in range(n_perm)
        ],
    )
    agg = hashed.groupBy(id_col).agg(
        *[F.min(f"h{i}").alias(f"m{i}") for i in range(n_perm)]
    )
    return agg.select(
        id_col, F.array(*[F.col(f"m{i}") for i in range(n_perm)]).alias("sig")
    )


def lsh_candidate_pairs(
    sigs: DataFrame, id_col: str, n_perm: int = 32, bands: int = 8
) -> DataFrame:
    """Band the signatures (rows = n_perm/bands) and equi-join on
    (band, band-hash) to get candidate pairs (a < b), deduplicated."""
    rows = n_perm // bands
    banded = sigs.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",", *[F.col("sig")[bi * rows + j].cast("string") for j in range(rows)]
                            )
                        ).alias("bh"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bh")
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
    return dot / (nx * ny)


# ------------------------------------------------------------------ simhash


def simhash_fn(id_col: str, text_col: str):
    """64-bit SimHash over word hashes — numpy bit kernel in one Arrow
    pass: per word w, h=blake-free polynomial hash; bit b contributes
    +1/-1; simhash bit = sign of the sum."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bit_masks = (np.uint64(1) << np.arange(64, dtype=np.uint64))
        for pdf in batches:
            out = []
            for t in pdf[text_col]:
                words = t.split() if isinstance(t, str) else []
                if not words:
                    out.append(0)
                    continue
                hs = np.array(
                    [_poly_hash64(w.encode("utf-8")) for w in set(words)],
                    dtype=np.uint64,
                )
                bits = (hs[:, None] & bit_masks[None, :]) != 0  # (n, 64)
                votes = bits.sum(axis=0) * 2 - len(hs)  # (+1/-1 sums)
                sh = np.uint64(0)
                for b in np.nonzero(votes > 0)[0]:
                    sh |= bit_masks[b]
                out.append(int(sh.astype(np.int64)))  # two's complement
            yield pd.DataFrame({id_col: pdf[id_col], "simhash": pd.array(out, dtype="int64")})

    return fn


def _poly_hash64(data: bytes) -> int:
    """Deterministic 64-bit polynomial rolling hash (process-stable, unlike
    Python's builtin hash)."""
    h = 1469598103934665603  # FNV offset basis
    for byte in data:
        h = ((h ^ byte) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return h


def hamming64_expr(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))
