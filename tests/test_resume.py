"""L4 pipeline invariants (SURVEY.md §5.2): checkpoint/resume equivalence,
determinism, metrics conservation, lineage completeness.

Reference analog: the filter's process-per-chunk-file model meant a killed
corpus run was resumed by re-feeding only unprocessed chunks [RECALL,
SURVEY.md §3.1]; here the snapshot manifest records processed input files
and --resume anti-selects them.
"""

from __future__ import annotations

import json
import pathlib

import pytest

from run_pipeline import run
from streamcorpus_filter_spark.catalog import SnapshotCatalog
from streamcorpus_filter_spark.synth import write_pages_parquet

N_PAGES = 320
N_FILES = 4


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory) -> str:
    """The pages corpus split across N_FILES parquet files (separate seeds
    so files differ), like a crawl's per-chunk layout."""
    d = tmp_path_factory.mktemp("pages")
    per = N_PAGES // N_FILES
    for i in range(N_FILES):
        write_pages_parquet(str(d / f"chunk-{i}.parquet"), per, seed=100 + i)
    return str(d)


def _rows(spark, table: str):
    cat = SnapshotCatalog(table)
    df = cat.read(spark).select(
        "url", "input_file", "keep", "drop_reason", "scrubbed_text",
        "bytes_scrubbed", "lang_pred", "ppl",
    )
    # url is not unique (the synth corpus plants duplicate urls with
    # different content), so sort by the entire row
    return sorted(tuple(str(x) for x in r) for r in df.collect())


def test_resume_equals_oneshot(spark, pages_dir, tmp_path):
    one = tmp_path / "oneshot"
    res = tmp_path / "resumed"

    r1 = run(spark, pages_dir, str(one), from_html=True)
    assert r1["status"] == "committed" and r1["input_files"] == N_FILES

    # "crash" after 1 file, resume twice (1 more, then the rest)
    k1 = run(spark, pages_dir, str(res), from_html=True, max_files=1)
    assert k1["input_files"] == 1
    k2 = run(spark, pages_dir, str(res), from_html=True, resume=True, max_files=1)
    assert k2["input_files"] == 1
    k3 = run(spark, pages_dir, str(res), from_html=True, resume=True)
    assert k3["input_files"] == N_FILES - 2

    # fully caught up -> no-op
    k4 = run(spark, pages_dir, str(res), from_html=True, resume=True)
    assert k4 == {"status": "up-to-date", "snapshot": None}

    assert _rows(spark, str(one)) == _rows(spark, str(res))


def test_determinism(spark, pages_dir, tmp_path):
    a = run(spark, pages_dir, str(tmp_path / "a"), from_html=True)
    b = run(spark, pages_dir, str(tmp_path / "b"), from_html=True)
    assert _rows(spark, str(tmp_path / "a")) == _rows(spark, str(tmp_path / "b"))
    assert a["metrics"] == b["metrics"]


def test_metrics_conservation_and_lineage(spark, pages_dir, tmp_path):
    table = tmp_path / "t"
    r = run(spark, pages_dir, str(table), from_html=True)
    m = r["metrics"]
    assert m["docs_seen"] == N_PAGES

    cat = SnapshotCatalog(str(table))
    out = cat.read(spark)
    by_reason = {
        row["drop_reason"]: row["n"]
        for row in out.groupBy("drop_reason").count().withColumnRenamed("count", "n").collect()
    }
    kept = by_reason.pop(None, 0)
    assert kept == m["docs_kept"]
    assert kept + sum(by_reason.values()) == m["docs_seen"]
    assert by_reason.get("lang_uncertain", 0) == m["langid_drops"]
    assert by_reason.get("high_ppl", 0) == m["ppl_drops"]
    assert by_reason.get("toxic", 0) == m["toxic_drops"]

    # manifest carries the observed metrics and the full input-file lineage
    snap = cat.latest_snapshot()
    assert snap["metrics"]["docs_seen"] == N_PAGES
    assert len(snap["input_files"]) == N_FILES

    # per-input-file metrics table: every input file accounted for, and
    # its docs_seen sums back to the total
    mdir = pathlib.Path(table) / "metrics" / snap["snapshot_id"]
    lineage = spark.read.parquet(str(mdir))
    rows = lineage.collect()
    assert len(rows) == N_FILES
    assert sum(x["docs_seen"] for x in rows) == N_PAGES
    assert all(x["snapshot_id"] == snap["snapshot_id"] for x in rows)


def test_snapshot_time_travel_and_incremental(spark, pages_dir, tmp_path):
    table = str(tmp_path / "t")
    run(spark, pages_dir, table, from_html=True, max_files=2)
    cat = SnapshotCatalog(table)
    s1 = cat.latest_snapshot()["snapshot_id"]
    n1 = cat.read(spark).count()
    run(spark, pages_dir, table, from_html=True, resume=True)
    s2 = cat.latest_snapshot()["snapshot_id"]
    assert s2 != s1

    # time travel: as-of s1 is unchanged by the later append
    assert cat.read(spark, s1).count() == n1
    assert cat.read(spark).count() == N_PAGES
    # incremental scan: exactly the rows appended after s1
    assert cat.read_incremental(spark, s1).count() == N_PAGES - n1


def test_partitioned_write_layout(spark, pages_dir, tmp_path):
    table = str(tmp_path / "t")
    run(spark, pages_dir, table, from_html=True, partition_by="keep,ds")
    cat = SnapshotCatalog(table)
    snap = cat.latest_snapshot()
    assert snap["partition_by"] == ["keep", "ds"]
    data_dir = pathlib.Path(snap["data_dir"])
    keep_dirs = sorted(p.name for p in data_dir.glob("keep=*"))
    assert keep_dirs == ["keep=false", "keep=true"]
    # partition pruning reaches the file index (the keep predicate lands
    # in PartitionFilters, not a post-scan Filter), and the restored
    # partition column keeps its written type
    df = cat.read(spark)
    assert dict(df.dtypes)["keep"] == "boolean"
    assert dict(df.dtypes)["ds"] == "date"
    plan = df.where("keep = true")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(keep" in plan


def test_concurrent_append_collision_serializes(spark, tmp_path):
    """Two writers that both read the same parent must serialize into a
    parent->child chain (optimistic commit via os.link), not silently
    shadow each other with the same sequence number."""
    table = str(tmp_path / "t")
    df = spark.range(3).toDF("v")
    m0 = SnapshotCatalog(table).append(df)

    # second writer with a stale view: its first latest_snapshot() call
    # (pre-commit read) sees the table as it was before m0 committed
    stale = SnapshotCatalog(table)
    real = stale.latest_snapshot
    calls = {"n": 0}

    def stale_once():
        calls["n"] += 1
        return None if calls["n"] == 1 else real()

    stale.latest_snapshot = stale_once  # type: ignore[method-assign]
    m1 = stale.append(df)

    assert m0["sequence"] == 0 and m1["sequence"] == 1
    assert m1["parent_id"] == m0["snapshot_id"]
    cat = SnapshotCatalog(table)
    assert [s["snapshot_id"] for s in cat.snapshots()] == [
        m0["snapshot_id"], m1["snapshot_id"],
    ]
    assert cat.read(spark).count() == 6
