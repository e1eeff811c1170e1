#!/usr/bin/env python
"""Corpus quality-filter pipeline CLI (EP-T1/EP-T3, SURVEY.md §3.2).

Cluster form (the north rule's launch contract, BASELINE.json:14):

    spark-submit --py-files scfs.zip run_pipeline.py \
        --input <pages table dir> --table <catalog root> \
        [--resume] [--from-html] [--partition-by keep,ds]

Sandbox form (local[N] master picked up from $SPARK_GRAFT_CPUS):

    python run_pipeline.py --input ... --table ...

A `--master` passed to spark-submit (yarn, k8s, local-cluster[...]) is
honored end-to-end: the session factory defers to the launcher-provided
master instead of overriding it (session.py; regression-tested in
tests/test_spark_submit.py).

Behavior:
  * reads the Common-Crawl-style pages table
    (url, warc_ts, html, text, lang);
  * ``--resume`` anti-selects input files already recorded in the
    catalog's snapshot manifests (the checkpoint), so a killed run
    restarted with --resume processes exactly the remainder — final
    table state is identical to a one-shot run (tested in
    tests/test_resume.py);
  * runs the fused quality pipeline (extract -> structural -> langid /
    perplexity / entity-match / PII+toxicity scrub -> keep/drop);
  * records per-input-file lineage and counter metrics (docs seen,
    langid drops, perplexity drops, patterns matched, bytes scrubbed)
    via df.observe — no second pass over the data;
  * appends one snapshot: partitioned parquet + manifest with lineage,
    metrics, and a per-input-file metrics table under <table>/metrics/.

Build the --py-files zip with:  python run_pipeline.py --make-zip scfs.zip
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))


def make_zip(dest: str) -> None:
    import zipfile

    pkg = REPO / "streamcorpus_filter_spark"
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted(pkg.rglob("*.py")):
            z.write(p, p.relative_to(REPO))
    print(f"wrote {dest}")


def run(
    spark,
    input_path: str,
    table: str,
    *,
    resume: bool = False,
    from_html: bool = False,
    partition_by: str = "keep",
    max_files: int = 0,
) -> dict:
    """One pipeline run -> one snapshot (or up-to-date no-op); returns a
    status dict. The CLI below is a thin wrapper; tests drive this
    directly with a shared session."""
    import pyspark.sql.functions as F
    from pyspark.sql import Observation

    from streamcorpus_filter_spark.catalog import SnapshotCatalog

    cat = SnapshotCatalog(table)

    candidates = sorted(spark.read.parquet(input_path).inputFiles())
    todo = candidates
    if resume:
        done = cat.processed_inputs()
        todo = [f for f in candidates if f not in done]
    if max_files:
        todo = todo[:max_files]
    if not todo:
        return {"status": "up-to-date", "snapshot": None}

    # lineage BEFORE any repartition/shuffle (input_file_name() is empty
    # after an exchange); partition_id is the post-shuffle task partition.
    from streamcorpus_filter_spark.operators.quality import run_quality_pipeline

    pages = spark.read.parquet(*todo).withColumn(
        "input_file", F.input_file_name()
    )
    out = run_quality_pipeline(
        spark, pages, extract_from_html=from_html
    ).withColumn("partition_id", F.spark_partition_id())

    obs = Observation()
    out = out.observe(
        obs,
        F.count(F.lit(1)).alias("docs_seen"),
        F.sum(F.col("keep").cast("long")).alias("docs_kept"),
        F.sum((F.col("drop_reason") == "lang_uncertain").cast("long")).alias("langid_drops"),
        F.sum((F.col("drop_reason") == "high_ppl").cast("long")).alias("ppl_drops"),
        F.sum((F.col("drop_reason") == "toxic").cast("long")).alias("toxic_drops"),
        F.sum(F.coalesce("patterns_matched", F.lit(0)).cast("long")).alias("patterns_matched"),
        F.sum(F.coalesce("bytes_scrubbed", F.lit(0))).alias("bytes_scrubbed"),
    )

    parts = [p for p in partition_by.split(",") if p]
    if "ds" in parts:
        out = out.withColumn("ds", F.to_date("warc_ts"))

    manifest = cat.append(
        out, input_files=todo, metrics={}, partition_by=parts or None
    )
    metrics = obs.get

    # per-input-file lineage metrics table (tiny; one row per input file);
    # re-read just this snapshot's data dir — cheaper than re-running the
    # pipeline for a second aggregation pass
    lineage = (
        spark.read.parquet(manifest["data_dir"])
        .groupBy("input_file")
        .agg(
            F.count(F.lit(1)).alias("docs_seen"),
            # keep may be a directory-encoded partition value (string)
            F.sum((F.col("keep").cast("string") == "true").cast("long")).alias("docs_kept"),
            F.sum(F.coalesce("bytes_scrubbed", F.lit(0))).alias("bytes_scrubbed"),
            F.countDistinct("partition_id").alias("n_partitions"),
        )
        .withColumn("snapshot_id", F.lit(manifest["snapshot_id"]))
    )
    mdir = pathlib.Path(table) / "metrics" / manifest["snapshot_id"]
    lineage.coalesce(1).write.mode("errorifexists").parquet(str(mdir))

    # fold observed metrics into the committed manifest — via tmp +
    # os.rename, mirroring SnapshotCatalog.append's commit protocol: a
    # crash mid-rewrite must not leave truncated JSON (which would break
    # every later snapshots()/processed_inputs()/--resume read)
    mpath = pathlib.Path(table) / "snapshots" / f"{manifest['sequence']:08d}.json"
    manifest["metrics"] = metrics
    mtmp = mpath.with_name(f".tmp-metrics-{manifest['snapshot_id']}")
    mtmp.write_text(json.dumps(manifest, indent=2))
    os.rename(mtmp, mpath)

    return {
        "status": "committed",
        "snapshot": manifest["snapshot_id"],
        "input_files": len(todo),
        "metrics": metrics,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="pages parquet dir (url, warc_ts, html, text, lang)")
    ap.add_argument("--table", help="output catalog root")
    ap.add_argument("--resume", action="store_true",
                    help="skip input files recorded in existing snapshots")
    ap.add_argument("--from-html", action="store_true",
                    help="re-extract text from the html column")
    ap.add_argument("--partition-by", default="keep",
                    help="comma-separated output partition columns "
                         "(supports the derived day column 'ds')")
    ap.add_argument("--max-files", type=int, default=0,
                    help="process at most N input files this run "
                         "(crash/kill simulation + controlled backfill)")
    ap.add_argument("--make-zip", metavar="DEST",
                    help="write the --py-files zip and exit")
    args = ap.parse_args()

    if args.make_zip:
        make_zip(args.make_zip)
        return
    if not args.input or not args.table:
        ap.error("--input and --table are required")

    from streamcorpus_filter_spark.session import get_spark

    spark = get_spark(app_name="quality-pipeline")
    spark.sparkContext.setLogLevel("WARN")
    result = run(
        spark,
        args.input,
        args.table,
        resume=args.resume,
        from_html=args.from_html,
        partition_by=args.partition_by,
        max_files=args.max_files,
    )
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
