#!/usr/bin/env python
"""Merge-on-read vs copy-on-write deletion at scale: measure BOTH
delete verbs on the same snapshot-catalog table and report wall time,
bytes WRITTEN by the commit, and the read-back cost — the numbers
behind delete_keys's design claim that removing a handful of rows from
a huge table should cost kilobytes, not a table rewrite.

Protocol (per corpus size): project the deterministic synthetic crawl
corpus (big_demo's builder) into a catalog table, then
  * CoW: ``delete_where`` on 16 doc_ids -> full-table rewrite commit;
  * MoR: ``delete_keys`` on the same 16 ids -> key-file-only commit;
measured on two separate catalogs seeded identically. Bytes = du of
the data dirs the commit added; read-back = wall of a full count()
after the delete (MoR pays the broadcast anti-join, CoW reads its
rewritten copy). Best-of-2 timed passes after a warm pass (this VM's
raw walls swing 2-3x).

Usage: python tools/mor_demo.py [--sizes 48000 480000] [--cores 32]
Appends to BENCH/mordemo_runs.json, regenerates BENCH/MORDEMO.md.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import tempfile
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

import big_demo  # noqa: E402  (harness reuse: corpus, session)

RUNS = REPO / "BENCH" / "mordemo_runs.json"
MD = REPO / "BENCH" / "MORDEMO.md"
N_DELETE = 16


def du(path: str | pathlib.Path) -> int:
    return sum(
        f.stat().st_size
        for f in pathlib.Path(path).rglob("*")
        if f.is_file()
    )


def seeded_catalog(spark, corpus: str):
    from pyspark.sql import functions as F

    from streamcorpus_filter_spark.catalog import SnapshotCatalog

    cat = SnapshotCatalog(tempfile.mkdtemp(prefix="mordemo_"))
    docs = spark.read.parquet(corpus).select(
        F.xxhash64("url", "warc_ts").alias("doc_id"),
        "text",
        "lang",
        F.length("text").cast("long").alias("n_chars"),
    )
    cat.append(docs)
    return cat


def timed_best2(fn):
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def run(n_pages: int, cores: int) -> dict:
    spark = big_demo.build_spark(cores)
    try:
        corpus = big_demo.build_corpus(n_pages, workers=min(16, cores))
        ids = [
            r.doc_id
            for r in spark.read.parquet(corpus)
            .selectExpr("xxhash64(url, warc_ts) AS doc_id")
            .orderBy("doc_id")
            .limit(N_DELETE)
            .collect()
        ]
        kdf = spark.createDataFrame([(i,) for i in ids], "doc_id bigint")
        pred = "doc_id IN (" + ",".join(map(str, ids)) + ")"
        out = {"n_docs": spark.read.parquet(corpus).count(), "cores": cores}

        # --- copy-on-write
        cat = seeded_catalog(spark, corpus)
        before = {p.name for p in (cat.root / "data").iterdir()}
        t0 = time.perf_counter()
        cat.delete_where(spark, pred)
        out["cow_wall_s"] = round(time.perf_counter() - t0, 2)
        new_dirs = [
            cat.root / "data" / p.name
            for p in (cat.root / "data").iterdir()
            if p.name not in before
        ]
        out["cow_bytes_written"] = sum(du(d) for d in new_dirs)
        cat.read(spark).count()  # warm
        out["cow_read_wall_s"] = round(
            timed_best2(lambda: cat.read(spark).count()), 2
        )

        # --- merge-on-read
        cat2 = seeded_catalog(spark, corpus)
        before = {p.name for p in (cat2.root / "data").iterdir()}
        t0 = time.perf_counter()
        cat2.delete_keys(spark, kdf, ["doc_id"])
        out["mor_wall_s"] = round(time.perf_counter() - t0, 2)
        new_dirs = [
            cat2.root / "data" / p.name
            for p in (cat2.root / "data").iterdir()
            if p.name not in before
        ]
        out["mor_bytes_written"] = sum(du(d) for d in new_dirs)
        cat2.read(spark).count()  # warm
        out["mor_read_wall_s"] = round(
            timed_best2(lambda: cat2.read(spark).count()), 2
        )

        # --- merge-on-read, production fast path (no matched-count
        # scan at commit -- Iceberg's own equality-delete behavior)
        cat3 = seeded_catalog(spark, corpus)
        t0 = time.perf_counter()
        cat3.delete_keys(spark, kdf, ["doc_id"], count_matched=False)
        out["mor_fast_wall_s"] = round(time.perf_counter() - t0, 2)

        out["write_amplification_ratio"] = round(
            out["cow_bytes_written"] / max(out["mor_bytes_written"], 1), 1
        )
        return out
    finally:
        spark.stop()


def write_md(runs: list[dict]) -> None:
    by_docs = sorted(
        {r["n_docs"]: r for r in runs}.values(), key=lambda r: r["n_docs"]
    )
    lines = [
        "# Merge-on-read vs copy-on-write deletion — measured at local[32]",
        "",
        f"`python tools/mor_demo.py`: delete the same {N_DELETE} doc_ids",
        "from identically-seeded catalog tables with BOTH verbs",
        "(delete_where = CoW full rewrite; delete_keys = MoR key-file",
        "commit). Bytes = contents of the data dirs the commit added.",
        "Read-back = full count() after the delete, best-of-2 after a",
        "warm pass (raw walls on this VM swing 2-3x).",
        "",
        "| docs | CoW commit (s) | CoW bytes | MoR commit (s) |"
        " MoR fast commit (s) | MoR bytes | write amp | CoW read (s) |"
        " MoR read (s) |",
        "| --- | --- | --- | --- | --- | --- | --- | --- | --- |",
    ]
    for r in by_docs:
        lines.append(
            f"| {r['n_docs']:,} | {r['cow_wall_s']} |"
            f" {r['cow_bytes_written']:,} | {r['mor_wall_s']} |"
            f" {r.get('mor_fast_wall_s', '-')} |"
            f" {r['mor_bytes_written']:,} |"
            f" {r['write_amplification_ratio']:,}x |"
            f" {r['cow_read_wall_s']} | {r['mor_read_wall_s']} |"
        )
    lines += [
        "",
        "The design claim, measured: CoW deletion writes the WHOLE table",
        "again to remove a handful of rows (bytes grow linearly with the",
        "corpus), while MoR writes a key file whose size is independent",
        "of corpus size — the write-amplification ratio IS the table/keys",
        "size ratio, and it is what makes deletion viable at 10^12 docs.",
        "The default MoR commit still scans once for the matched count",
        "(exact history + zero-match no-op); `count_matched=False` is",
        "the production fast path with NO scan at commit — Iceberg's own",
        "equality-delete behavior — whose wall is O(keys) regardless of",
        "corpus size (the 'MoR fast commit' column).",
        "The price is the broadcast anti-join on every read until",
        "compaction folds the keys away (read-back columns; the catalog",
        "plan-asserts the join broadcasts rather than reshuffling the",
        "scan), which is why Iceberg pairs MoR deletes with periodic",
        "rewrite maintenance — this repo's compact() + expire_snapshots.",
        "",
    ]
    MD.write_text("\n".join(lines))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[48000, 480000])
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()
    runs = json.loads(RUNS.read_text()) if RUNS.exists() else []
    for n in args.sizes:
        r = run(n, args.cores)
        print(json.dumps(r), file=sys.stderr)
        runs.append(r)
        RUNS.write_text(json.dumps(runs, indent=1))
        write_md(runs)
    print(f"wrote {MD}", file=sys.stderr)


if __name__ == "__main__":
    main()
