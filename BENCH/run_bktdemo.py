#!/usr/bin/env python
"""Bucket-transform probe demo (round 5): what does the catalog's
bucket(n, cols) layout buy ONCE THE BATCH IS TOO BIG TO BROADCAST?

BENCH/IMHDEMO.md's finding was that at demo scale AQE broadcasts the
fixed-size batch band keys, so plain and bucketed index layouts measure
the same — the bucket layout is "insurance" for the regime where the
probe batch outgrows the broadcast threshold. This demo MEASURES that
regime instead of asserting it from the plan: broadcast is disabled
(`spark.sql.autoBroadcastJoinThreshold=-1`, which also turns off AQE's
runtime broadcast conversion), so the equi-join must satisfy its
distribution requirement the hard way.

  * INDEX: (band, bh, doc_id) rows — the persisted MinHash band-index
    shape — committed to a SnapshotCatalog twice: plain parquet append
    vs `append(bucket_by=(32, [band, bh]))`.
  * PROBE: a batch of band keys ~1/16 the index size joined on
    (band, bh), aggregated to one count (full materialization, no
    collect).
  * MEASURE: shuffle write bytes (Spark REST stage metrics, diffed
    around each run) + best-of-3 wall per layout.

Expectation at any scale: the PLAIN layout shuffles BOTH sides — the
index side grows with corpus history, which is exactly the cost an
every-batch probe cannot afford at 10^12 docs — while the BUCKETED
layout shuffles ONLY the probe (index-side shuffle ~0), so probe cost
is bounded by batch size. Writes BENCH/BKTDEMO.md + one JSON line.
"""

from __future__ import annotations

import json
import pathlib
import shutil
import sys
import time
import urllib.request

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

UI_PORT = 4078
INDEX_ROWS = 8_000_000
PROBE_ROWS = 500_000
BUCKETS = 32


def stage_totals() -> dict[str, int]:
    base = f"http://localhost:{UI_PORT}/api/v1"
    with urllib.request.urlopen(f"{base}/applications", timeout=10) as r:
        app_id = json.load(r)[0]["id"]
    with urllib.request.urlopen(
        f"{base}/applications/{app_id}/stages", timeout=10
    ) as r:
        stages = json.load(r)
    tot = {"shuffleReadBytes": 0, "shuffleWriteBytes": 0}
    for s in stages:
        for k in tot:
            tot[k] += int(s.get(k) or 0)
    return tot


def main() -> None:
    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    from streamcorpus_filter_spark.catalog import SnapshotCatalog

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("bktdemo")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # the regime under test: nothing is broadcastable (AQE's runtime
    # conversion honors the same -1)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    # deterministic synthetic band index in the persisted-sketch shape
    idx = spark.range(INDEX_ROWS).select(
        (F.col("id") % 16).alias("band"),
        F.xxhash64("id").alias("bh"),
        F.col("id").alias("doc_id"),
    )
    probe = spark.range(PROBE_ROWS).select(
        (F.col("id") % 16).alias("band"),
        F.xxhash64(F.col("id") * 7).alias("bh"),
        F.col("id").alias("new_id"),
    ).localCheckpoint(eager=True)  # fixed input, not part of the timing

    roots = {}
    for layout in ("plain", "bucketed"):
        root = REPO / ".cache" / f"bktdemo_{layout}"
        shutil.rmtree(root, ignore_errors=True)
        cat = SnapshotCatalog(str(root))
        if layout == "bucketed":
            cat.append(idx, bucket_by=(BUCKETS, ["band", "bh"]))
        else:
            cat.append(idx.repartition(BUCKETS))  # same file count
        roots[layout] = cat

    def probe_once(layout: str) -> int:
        index = roots[layout].read(spark)
        j = index.join(probe, ["band", "bh"]).select("doc_id", "new_id")
        return j.groupBy().count().collect()[0][0]

    out = {"index_rows": INDEX_ROWS, "probe_rows": PROBE_ROWS,
           "buckets": BUCKETS}
    expected = None
    for layout in ("plain", "bucketed"):
        probe_once(layout)  # warm (JVM + file listing)
        best, sbytes, hits = float("inf"), None, 0
        for _ in range(3):
            before = stage_totals()
            t0 = time.perf_counter()
            hits = probe_once(layout)
            wall = time.perf_counter() - t0
            after = stage_totals()
            if wall < best:
                best = wall
                sbytes = {k: after[k] - before[k] for k in after}
        if expected is None:
            expected = hits
        if hits != expected:  # layout is metadata: it must never
            # change answers (explicit raise survives python -O)
            raise AssertionError((layout, hits, expected))
        out[layout] = {
            "probe_s": round(best, 2),
            "shuffle_write_mb": round(sbytes["shuffleWriteBytes"] / 1e6, 1),
            "join_hits": hits,
        }

    ratio = (out["plain"]["shuffle_write_mb"]
             / max(out["bucketed"]["shuffle_write_mb"], 0.1))
    out["shuffle_reduction_x"] = round(ratio, 1)

    md = [
        "# Bucket-transform probe demo (round 5)", "",
        "The too-big-to-broadcast regime, measured (protocol:",
        "BENCH/run_bktdemo.py; broadcast disabled so the equi-join must",
        "satisfy its distribution the hard way; local[16]).",
        "",
        f"{INDEX_ROWS:,}-row persisted band index probed by a",
        f"{PROBE_ROWS:,}-row batch on (band, bh), through the catalog",
        "read path in both layouts:",
        "",
        "| layout | probe best-of-3 (s) | shuffle write MB | join hits |",
        "| --- | --- | --- | --- |",
    ]
    for layout in ("plain", "bucketed"):
        r = out[layout]
        md.append(
            f"| {layout} | {r['probe_s']} | {r['shuffle_write_mb']} | "
            f"{r['join_hits']:,} |"
        )
    md += [
        "",
        f"The plain layout shuffles {out['shuffle_reduction_x']}x more",
        "bytes: BOTH join sides move, and the index side is the corpus-",
        "history term — it grows with every crawl while the batch stays",
        "fixed, which is the cost curve a 10^12-doc probe-every-batch",
        "pipeline cannot ride. The bucketed layout",
        f"(`append(bucket_by=({BUCKETS}, [band, bh]))`) moves only the",
        "batch: the index is read in place because the catalog re-",
        "exposes the bucket layout to the planner (no index-side",
        "Exchange — plan-guarded in tests/test_compaction.py and the",
        "scan_bucketed driver row). Identical join hits in both",
        "layouts: the transform is metadata, never semantics.",
        "",
        "Complements BENCH/IMHDEMO.md, which measures the broadcastable-",
        "batch regime (layouts tie there because AQE broadcasts the",
        "batch — the index never shuffles in either layout).",
    ]
    (REPO / "BENCH" / "BKTDEMO.md").write_text("\n".join(md) + "\n")
    print(json.dumps({"bktdemo": out}))
    spark.stop()


if __name__ == "__main__":
    main()
