"""Multi-batch Structured Streaming semantics (SURVEY.md §2.10) that the
single-batch driver queries can't show: watermark late-data drops, session
windows, and stateful accumulation across micro-batches.

Micro-batch boundaries are controlled with maxFilesPerTrigger=1 + explicit
file mtimes (the file source orders batches by modification time).
"""

from __future__ import annotations

import os
import time
import uuid

import pandas as pd
import pyspark.sql.functions as F
import pytest

SCHEMA = "ts timestamp, user_id bigint, value double"


def _write_file(spark, d: str, rows: list[tuple], mtime: float) -> None:
    """One parquet FILE directly in d (the stream source doesn't recurse
    into write.parquet's output dirs), with a controlled mtime."""
    import shutil

    tmp = f"{d}/.tmp{uuid.uuid4().hex[:8]}"
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(tmp)
    part = next(
        p for p in os.listdir(tmp) if p.endswith(".parquet") and not p.startswith(".")
    )
    dest = f"{d}/f{uuid.uuid4().hex[:8]}.parquet"
    shutil.move(os.path.join(tmp, part), dest)
    shutil.rmtree(tmp)
    os.utime(dest, (mtime, mtime))


def _drain(stream_df, output_mode: str, max_files: int = 1):
    name = "t" + uuid.uuid4().hex[:12]
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


def _ts(s: str):
    import datetime as dt

    return dt.datetime.fromisoformat(s)


def test_watermark_drops_late_rows(spark, tmp_path):
    """A row older than (max event time - watermark) arriving in a later
    micro-batch is dropped from the windowed aggregation; append mode only
    emits windows the watermark has closed."""
    d = str(tmp_path / "src")
    os.makedirs(d)
    now = time.time()
    # batch 0: events at 10:00 and 10:07 -> watermark will advance to 09:57
    _write_file(
        spark, d,
        [(_ts("2024-01-01T10:00:00"), 1, 1.0), (_ts("2024-01-01T10:07:00"), 1, 1.0)],
        now - 400,
    )
    # batch 1: spacer — the late-row filter uses the watermark committed
    # BEFORE the current batch, so the 09:57 watermark only filters rows
    # arriving from batch 2 onward
    _write_file(spark, d, [(_ts("2024-01-01T10:30:00"), 1, 1.0)], now - 300)
    # batch 2: a LATE event at 08:00 (behind the 09:57 watermark ->
    # dropped) plus 12:00 which advances the watermark past the 10:xx rows
    _write_file(
        spark, d,
        [(_ts("2024-01-01T08:00:00"), 1, 1.0), (_ts("2024-01-01T12:00:00"), 1, 1.0)],
        now - 200,
    )
    # batch 3: closed windows are emitted in the batch after the watermark
    # passes them, so one more batch flushes the remaining closed windows
    _write_file(spark, d, [(_ts("2024-01-01T13:00:00"), 1, 1.0)], now - 100)

    s = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("win_start"), "n")
    )
    rows = {r["win_start"].isoformat(): r["n"] for r in _drain(s, "append").collect()}
    # all closed windows emitted; the late 08:00 row was dropped (its
    # window — long closed — would otherwise appear here); the 13:00
    # window is still open at stream end (not emitted)
    assert rows == {
        "2024-01-01T10:00:00": 1,
        "2024-01-01T10:05:00": 1,
        "2024-01-01T10:30:00": 1,
        "2024-01-01T12:00:00": 1,
    }


def test_session_window_batch_and_stream_agree(spark, tmp_path):
    """session_window (gap-close) semantics: batch computation is the
    oracle; a single-batch stream run must agree."""
    rows = [
        (_ts("2024-01-01T10:00:00"), 1, 1.0),
        (_ts("2024-01-01T10:04:00"), 1, 1.0),   # same session (gap 5m)
        (_ts("2024-01-01T10:20:00"), 1, 1.0),   # new session
        (_ts("2024-01-01T10:01:00"), 2, 1.0),
    ]
    batch = (
        spark.createDataFrame(rows, SCHEMA)
        .groupBy(F.session_window("ts", "5 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n"))
        .select("user_id", F.col("w.start").alias("start"), "n")
    )
    expect = {(r["user_id"], r["start"].isoformat(), r["n"]) for r in batch.collect()}
    assert expect == {
        (1, "2024-01-01T10:00:00", 2),
        (1, "2024-01-01T10:20:00", 1),
        (2, "2024-01-01T10:01:00", 1),
    }

    d = str(tmp_path / "src")
    os.makedirs(d)
    _write_file(spark, d, rows, time.time() - 60)
    s = (
        spark.readStream.schema(SCHEMA)
        .parquet(d)
        .withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "5 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n"))
        .select("user_id", F.col("w.start").alias("start"), "n")
    )
    got = {
        (r["user_id"], r["start"].isoformat(), r["n"])
        for r in _drain(s, "complete").collect()
    }
    assert got == expect


def test_stateful_counts_accumulate_across_batches(spark, tmp_path):
    """applyInPandasWithState keeps per-key state between micro-batches:
    the second batch's emission includes the first batch's counts."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    d = str(tmp_path / "src")
    os.makedirs(d)
    now = time.time()
    _write_file(spark, d, [(_ts("2024-01-01T10:00:00"), 1, 2.0),
                           (_ts("2024-01-01T10:01:00"), 1, 3.0)], now - 300)
    _write_file(spark, d, [(_ts("2024-01-01T11:00:00"), 1, 5.0),
                           (_ts("2024-01-01T11:01:00"), 2, 7.0)], now - 100)

    def update(key, pdfs, state: GroupState):
        n, total = (state.get if state.exists else (0, 0.0))
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame({"user_id": [key[0]], "n": [n], "total": [total]})

    s = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="user_id bigint, n bigint, total double",
            stateStructType="n bigint, total double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    out = _drain(s, "update").toPandas()
    # user 1 emitted twice (once per batch), cumulative: (2, 5.0) then (3, 10.0)
    u1 = out[out.user_id == 1].sort_values("n")
    assert list(map(tuple, u1[["n", "total"]].values)) == [(2, 5.0), (3, 10.0)]
    u2 = out[out.user_id == 2]
    assert list(map(tuple, u2[["n", "total"]].values)) == [(1, 7.0)]

def test_stream_static_join_invariant_to_batch_boundaries(spark, tmp_path):
    """The stream-static dedup probe must emit row-identical output no
    matter how the input splits into micro-batches: the stream side is
    stateless and the static side is a fixed batch table, so 1-file and
    per-file-trigger runs must agree exactly (the property that makes
    the probe safe to run per crawl-hour)."""
    import uuid as _uuid

    docs_schema = "new_id bigint, text string"
    seen_rows = [(1, "alpha beta gamma"), (2, "delta epsilon zeta"),
                 (3, "eta theta iota")]
    seen = spark.createDataFrame(seen_rows, "doc_id bigint, text string")
    static = seen.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("src_doc")
    )

    batch_rows = [
        (100, "alpha beta gamma"),        # dup of 1
        (101, "totally novel content"),   # novel
        (102, "eta theta iota"),          # dup of 3
        (103, "another novel page"),      # novel
    ]

    def run(split: bool):
        d = str(tmp_path / f"src{_uuid.uuid4().hex[:6]}")
        os.makedirs(d)
        t0 = time.time() - 100
        if split:
            _write_one(spark, d, docs_schema, batch_rows[:2], t0)
            _write_one(spark, d, docs_schema, batch_rows[2:], t0 + 10)
        else:
            _write_one(spark, d, docs_schema, batch_rows, t0)
        s = spark.readStream.schema(docs_schema)
        s = (
            s.option("maxFilesPerTrigger", "1").parquet(d)
            if split
            else s.parquet(d)
        )
        out = (
            s.withColumn("h", F.md5("text"))
            .join(static, "h", "left")
            .select(
                "new_id", F.col("src_doc").isNotNull().alias("is_dup"), "src_doc"
            )
        )
        rows = _drain(out, "append").collect()
        return sorted((r.new_id, r.is_dup, r.src_doc) for r in rows)

    one, many = run(split=False), run(split=True)
    assert one == many
    assert one == [
        (100, True, 1), (101, False, None), (102, True, 3), (103, False, None)
    ]


def _write_one(spark, d: str, schema: str, rows: list[tuple], mtime: float) -> None:
    """_write_file for an arbitrary schema."""
    import shutil
    import uuid as _uuid

    tmp = f"{d}/.tmp{_uuid.uuid4().hex[:8]}"
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(tmp)
    part = next(
        p for p in os.listdir(tmp) if p.endswith(".parquet") and not p.startswith(".")
    )
    dest = f"{d}/f{_uuid.uuid4().hex[:8]}.parquet"
    shutil.move(os.path.join(tmp, part), dest)
    shutil.rmtree(tmp)
    os.utime(dest, (mtime, mtime))



def test_catalog_ingest_multibatch_exactly_once(spark, tmp_path):
    """stream_sink_catalog's batch-id idempotence under MULTIPLE
    micro-batches (the registered row is single-batch by staging): three
    input files at maxFilesPerTrigger=1 become three append snapshots
    with distinct batch ids; a replayed MIDDLE batch (foreachBatch's
    at-least-once contract) must not re-commit, and the table holds each
    row exactly once."""
    from streamcorpus_filter_spark.catalog import SnapshotCatalog

    src = tmp_path / "src"
    for i in range(3):
        spark.createDataFrame(
            [(i * 10 + j, i) for j in range(5)], "event_id bigint, part bigint"
        ).coalesce(1).write.parquet(f"{src}/f{i}")
    cat = SnapshotCatalog(str(tmp_path / "tbl"))

    def commit_batch(bdf, bid):
        done = {s["metrics"].get("stream_batch_id") for s in cat.snapshots()}
        if bid in done:
            return
        cat.append(bdf, metrics={"stream_batch_id": bid})

    q = (
        spark.readStream.schema("event_id bigint, part bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
        .writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    snaps = cat.snapshots()
    bids = sorted(s["metrics"]["stream_batch_id"] for s in snaps)
    assert bids == [0, 1, 2], bids
    n = len(snaps)
    # replay the middle batch out-of-band -> must be a no-op
    commit_batch(spark.range(5).selectExpr(
        "id + 10 AS event_id", "CAST(1 AS BIGINT) AS part"), 1)
    assert len(cat.snapshots()) == n
    rows = sorted(r.event_id for r in cat.read(spark).collect())
    assert rows == sorted(i * 10 + j for i in range(3) for j in range(5))
