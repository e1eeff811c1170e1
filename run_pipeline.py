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
  * commits through the catalog's WRITE-AUDIT-PUBLISH gate: the batch
    lands staged (invisible), the audit checks its own observed metrics
    (null urls; ``--min-keep-ratio``), and only a clean batch is
    published — a poisoned batch is aborted with its inputs left
    re-ingestable, never visible table state; batches left pending by a
    crashed prior run are settled (re-audited from the durable staged
    rows) at the start of the next run;
  * the published snapshot: partitioned parquet + manifest with
    lineage, metrics, and a per-input-file metrics table under
    <table>/metrics/.

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


def _audit_aggs():
    """The ONE list of audit aggregation expressions, shared by run()'s
    live Observation and _settle_pending's re-audit of durable staged
    rows — two hand-maintained copies drifted once (keep cast long vs
    string-compare), and a drift here means a batch that aborts live
    could publish when settled after a crash. The string compare works
    on BOTH shapes: the pre-write boolean column stringifies to
    'true'/'false', and the read-back partition-encoded value already
    IS the string."""
    import pyspark.sql.functions as F

    return [
        F.count(F.lit(1)).alias("docs_seen"),
        F.sum((F.col("keep").cast("string") == "true").cast("long")).alias("docs_kept"),
        F.sum((F.col("drop_reason") == "lang_uncertain").cast("long")).alias("langid_drops"),
        F.sum((F.col("drop_reason") == "high_ppl").cast("long")).alias("ppl_drops"),
        F.sum((F.col("drop_reason") == "toxic").cast("long")).alias("toxic_drops"),
        F.sum(F.coalesce("patterns_matched", F.lit(0)).cast("long")).alias("patterns_matched"),
        F.sum(F.coalesce("bytes_scrubbed", F.lit(0))).alias("bytes_scrubbed"),
        F.sum(F.col("url").isNull().cast("long")).alias("null_urls"),
    ]


def _audit_metrics(metrics: dict, min_keep_ratio: float) -> list[str]:
    """The WAP audit: decide from the batch's own observed metrics
    whether it may become visible table state. Violations:
      * null_urls — any row lost its key (a corrupted WARC slice);
      * keep_ratio below ``min_keep_ratio`` — a batch the quality rules
        near-uniformly reject is far likelier a poisoned input
        (mojibake, wrong charset, spam mirror) than real signal.
    An EMPTY batch is NOT a violation: publishing it records the input
    lineage so --resume won't re-feed the empty files forever."""
    violations = []
    null_urls = metrics.get("null_urls") or 0
    if null_urls:
        violations.append(f"null_urls={null_urls}")
    seen = metrics.get("docs_seen") or 0
    if seen and min_keep_ratio > 0:
        ratio = (metrics.get("docs_kept") or 0) / seen
        if ratio < min_keep_ratio:
            violations.append(f"keep_ratio={ratio:.4f}<{min_keep_ratio}")
    return violations


def _fold_metrics(table: str, manifest: dict, metrics: dict) -> None:
    """Rewrite a committed manifest with observed metrics folded in —
    via tmp + os.rename, mirroring SnapshotCatalog.append's commit
    protocol: a crash mid-rewrite must not leave truncated JSON (which
    would break every later snapshots()/processed_inputs() read)."""
    mpath = pathlib.Path(table) / "snapshots" / f"{manifest['sequence']:08d}.json"
    manifest["metrics"] = {**manifest.get("metrics", {}), **metrics}
    mtmp = mpath.with_name(f".tmp-metrics-{manifest['snapshot_id']}")
    mtmp.write_text(json.dumps(manifest, indent=2))
    os.rename(mtmp, mpath)


def _write_lineage(spark, cat, table: str, head: dict) -> None:
    """Per-input-file lineage metrics table (tiny; one row per input
    file), re-read from the published snapshot's data dir — cheaper
    than re-running the pipeline for a second aggregation pass."""
    import shutil

    import pyspark.sql.functions as F
    from pyspark.sql.types import StructType

    mdir = pathlib.Path(table) / "metrics" / head["snapshot_id"]
    if (mdir / "_SUCCESS").exists():
        return  # settle retry after a crash mid-lineage-write
    if mdir.exists():
        # crash mid-write left a partial dir (_temporary, no _SUCCESS):
        # clear it so the rewrite below can commit cleanly
        shutil.rmtree(mdir)
    # the manifest schema makes the read total even for a ZERO-row
    # published batch (an empty batch publishes by design so --resume
    # stops re-feeding its files, but Spark writes it as _SUCCESS with
    # no footers — a schemaless read would throw and, worse, the settle
    # heal loop would then retry the throw on every later run forever)
    schema = StructType.fromJson(json.loads(head["schema_json"]))
    lineage = (
        spark.read.schema(schema).parquet(cat._data_dir(head))
        .groupBy("input_file")
        .agg(
            F.count(F.lit(1)).alias("docs_seen"),
            # keep may be a directory-encoded partition value (string)
            F.sum((F.col("keep").cast("string") == "true").cast("long")).alias("docs_kept"),
            F.sum(F.coalesce("bytes_scrubbed", F.lit(0))).alias("bytes_scrubbed"),
            F.countDistinct("partition_id").alias("n_partitions"),
        )
        .withColumn("snapshot_id", F.lit(head["snapshot_id"]))
    )
    lineage.coalesce(1).write.mode("errorifexists").parquet(str(mdir))


def _settle_pending(spark, cat, table: str, min_keep_ratio: float) -> list[dict]:
    """Finish WAP decisions a crashed prior run left PENDING: a batch
    staged but neither published nor aborted would otherwise stay
    invisible forever while its input lineage blocks --resume from
    re-feeding the files — silent data loss. The staged rows are
    durable, so the audit re-runs from THEM (one aggregation scan),
    then the idempotent publish/abort lands the decision."""
    import pyspark.sql.functions as F

    settled = []
    for s in cat.snapshots():
        if s.get("operation") != "staged":
            continue
        if "pipeline_wap" not in s.get("metrics", {}):
            continue  # someone else's staged batch: not ours to decide
        df = cat._read_snapshots(spark, [s])
        m = df.select(*_audit_aggs()).first().asDict()
        # re-audit with the threshold the ORIGINAL run staged the batch
        # under (it rides in the staged metrics): settling with the
        # NEXT invocation's flag — possibly the 0.0 default of an
        # unrelated cron entry — would publish a batch the run that
        # staged it was about to abort
        ratio = s["metrics"].get("min_keep_ratio", min_keep_ratio)
        violations = _audit_metrics(m, ratio)
        if violations:
            cat.abort_staged(s["snapshot_id"])
            settled.append({
                "snapshot": s["snapshot_id"], "decision": "aborted",
                "violations": violations,
            })
        else:
            _fold_metrics(table, s, m)
            head = cat.publish(s["snapshot_id"])
            _write_lineage(spark, cat, table, head)
            settled.append({
                "snapshot": head["snapshot_id"], "decision": "published",
            })
    # heal the publish-then-crash window too: a head whose staged
    # manifest publish() already unlinked never re-enters the loop
    # above, so a crash between publish() and _write_lineage() would
    # otherwise strand the published snapshot without its lineage
    # side-table forever (_write_lineage is idempotent via _SUCCESS)
    for s in cat.snapshots():
        m = s.get("metrics", {})
        if "pipeline_wap" not in m or "published_from" not in m:
            continue
        if not (pathlib.Path(table) / "metrics" / s["snapshot_id"]
                / "_SUCCESS").exists():
            _write_lineage(spark, cat, table, s)
            settled.append({
                "snapshot": s["snapshot_id"],
                "decision": "lineage_healed",
            })
    return settled


def run(
    spark,
    input_path: str,
    table: str,
    *,
    resume: bool = False,
    from_html: bool = False,
    partition_by: str = "keep",
    max_files: int = 0,
    min_keep_ratio: float = 0.0,
) -> dict:
    """One pipeline run -> one PUBLISHED snapshot (or an aborted batch,
    or an up-to-date no-op); returns a status dict. The CLI below is a
    thin wrapper; tests drive this directly with a shared session.

    Every commit goes through the catalog's write-audit-publish gate:
    the batch lands STAGED (invisible), the audit checks the pipeline's
    own observed metrics (_audit_metrics), and only then publish() makes
    it table state — a poisoned batch is aborted with its input files
    left re-ingestable, never visible to any reader. Pending batches
    from a crashed prior run are settled first (_settle_pending)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Observation

    from streamcorpus_filter_spark.catalog import SnapshotCatalog

    cat = SnapshotCatalog(table)
    settled = (
        _settle_pending(spark, cat, table, min_keep_ratio)
        if cat.snapshots() else []
    )

    candidates = sorted(spark.read.parquet(input_path).inputFiles())
    todo = candidates
    if resume:
        done = cat.processed_inputs()
        todo = [f for f in candidates if f not in done]
    if max_files:
        todo = todo[:max_files]
    if not todo:
        out = {"status": "up-to-date", "snapshot": None}
        if settled:
            out["settled"] = settled
        return out

    # lineage BEFORE any repartition/shuffle (input_file_name() is empty
    # after an exchange); partition_id is the post-shuffle task partition.
    from streamcorpus_filter_spark.operators.quality import run_quality_pipeline

    # basePath keeps directory-encoded partition columns of the input
    # table visible in the per-file read (a bare leaf-file read drops
    # them silently — the column would vanish from every output)
    pages = (
        spark.read.option("basePath", input_path).parquet(*todo)
        .withColumn("input_file", F.input_file_name())
    )
    out = run_quality_pipeline(
        spark, pages, extract_from_html=from_html
    ).withColumn("partition_id", F.spark_partition_id())

    obs = Observation()
    out = out.observe(obs, *_audit_aggs())

    parts = [p for p in partition_by.split(",") if p]
    if "ds" in parts:
        out = out.withColumn("ds", F.to_date("warc_ts"))

    # WRITE-AUDIT-PUBLISH (VERDICT r4 task 5): the batch is fully
    # written + committed STAGED (invisible to read()/--resume-as-
    # published), the audit runs on the observation the stage write
    # itself populated (no second pass), and only a clean batch is
    # published. Crash windows all converge: before the decision ->
    # the next run's _settle_pending re-audits the durable staged rows;
    # after publish but before the lineage side-table -> _write_lineage
    # is retried idempotently by settle; abort leaves the inputs
    # re-ingestable (the tombstone carries no lineage).
    staged = cat.stage(
        out, input_files=todo,
        # min_keep_ratio rides in the staged manifest so a crash-settle
        # re-audits under THIS run's threshold, not the next caller's
        metrics={"pipeline_wap": True, "min_keep_ratio": min_keep_ratio},
        partition_by=parts or None,
    )
    metrics = obs.get
    violations = _audit_metrics(metrics, min_keep_ratio)
    if violations:
        try:
            cat.abort_staged(staged["snapshot_id"])
        except ValueError:
            # a concurrent run's settle pass already re-audited and
            # DECIDED this batch (the catalog verbs converge races to
            # one outcome); report the decision instead of crashing —
            # with the threshold persisted above, its audit verdict
            # matches ours, so this arm is publish-vs-abort of the
            # same conclusion racing, not a disagreement
            pass
        result = {
            "status": "aborted",
            "snapshot": None,
            "input_files": len(todo),
            "violations": violations,
            "metrics": metrics,
        }
        if settled:
            result["settled"] = settled
        return result

    # fold observed metrics into the STAGED manifest first: publish
    # inherits staged metrics into the head, so they survive on the
    # published manifest without a second rewrite
    _fold_metrics(table, staged, metrics)
    head = cat.publish(staged["snapshot_id"])
    _write_lineage(spark, cat, table, head)

    result = {
        "status": "committed",
        "snapshot": head["snapshot_id"],
        "input_files": len(todo),
        "metrics": metrics,
    }
    if settled:
        result["settled"] = settled
    return result


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
    ap.add_argument("--min-keep-ratio", type=float, default=0.0,
                    help="WAP audit threshold: abort (stage-then-discard) "
                         "any batch whose keep ratio falls below this — "
                         "a near-uniformly-rejected batch is a poisoned "
                         "input, not signal; 0 disables the ratio check "
                         "(the null-url audit always runs)")
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
        min_keep_ratio=args.min_keep_ratio,
    )
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
