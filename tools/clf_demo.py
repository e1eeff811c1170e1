#!/usr/bin/env python
"""Classifier-training scale demo: measure ql_classifier_train /
ql_classifier_eval over a 10x corpus growth at local[32], with shuffle
bytes read off the Spark REST API (same harness as tools/big_demo.py).

The design claims these measurements make concrete:
  * TRAIN shuffles a BOUNDED byte volume regardless of corpus size —
    the 256-bucket key space means map-side combine collapses every
    task to <= 256 rows before the exchange, so shuffle bytes are
    O(partitions x 256), not O(tokens). Growing the corpus 10x should
    leave train shuffle bytes ~flat.
  * EVAL shuffle grows LINEARLY in docs, not tokens: the <= 256-row
    weight table broadcasts to the scoring join (the exploded token
    stream never exchanges on bucket), leaving only the per-doc logit
    rollup and the docs-to-logits join on doc_id.

Corpus: the same deterministic synthetic crawl pages big_demo builds
(chunked, seed-per-chunk), projected once per size to a documents.parquet
of (doc_id, text, lang, n_chars) so the REGISTERED queries — not a
re-implementation — are what gets measured.

Usage: python tools/clf_demo.py [--sizes 48000 480000] [--cores 32]
Appends runs to BENCH/clfdemo_runs.json, regenerates BENCH/CLFDEMO.md.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

import big_demo  # noqa: E402  (harness reuse: corpus, session, REST metrics)

RUNS = REPO / "BENCH" / "clfdemo_runs.json"
MD = REPO / "BENCH" / "CLFDEMO.md"


def build_documents(spark, n_pages: int, cores: int) -> str:
    """Project the synthetic crawl corpus to the documents shape the
    registered queries load: (doc_id, text, lang, n_chars)."""
    import pyspark.sql.functions as F

    out = REPO / ".cache" / f"clfdemo_docs_n{n_pages}"
    if not (out / "documents.parquet").exists():
        corpus = big_demo.build_corpus(n_pages, workers=min(16, cores))
        (
            spark.read.parquet(corpus)
            .select(
                F.xxhash64("url", "warc_ts").alias("doc_id"),
                "text",
                "lang",
                F.length("text").cast("long").alias("n_chars"),
            )
            .write.mode("overwrite")
            .parquet(str(out / "documents.parquet"))
        )
    return str(out)


def timed_phase(fn) -> tuple[float, dict]:
    """Warm pass, then best-of-2 timed passes with shuffle-byte deltas
    (the sandbox VM's host-steal bursts swing identical runs ~2-3x)."""
    big_demo.force(fn())
    best_wall, best_m = float("inf"), None
    for _ in range(2):
        before = big_demo.stage_totals()
        t0 = time.perf_counter()
        big_demo.force(fn())
        wall = time.perf_counter() - t0
        if wall < best_wall:
            best_wall = wall
            best_m = {
                k: v - before[k] for k, v in big_demo.stage_totals().items()
            }
    return best_wall, best_m


def run(n_pages: int, cores: int) -> dict:
    from streamcorpus_filter_spark import queries as q

    spark = big_demo.build_spark(cores)
    try:
        docs_dir = build_documents(spark, n_pages, cores)
        n_docs = spark.read.parquet(f"{docs_dir}/documents.parquet").count()

        train_wall, train_m = timed_phase(
            lambda: q.QUERIES["ql_classifier_train"](spark, docs_dir)
        )
        eval_wall, eval_m = timed_phase(
            lambda: q.QUERIES["ql_classifier_eval"](spark, docs_dir)
        )
        return {
            "n_docs": n_docs,
            "cores": cores,
            "train_wall_s": round(train_wall, 2),
            "train_docs_per_sec": int(n_docs / train_wall),
            "train_shuffle_write": train_m["shuffleWriteBytes"],
            "eval_wall_s": round(eval_wall, 2),
            "eval_docs_per_sec": int(n_docs / eval_wall),
            "eval_shuffle_write": eval_m["shuffleWriteBytes"],
            "eval_shuffle_bytes_per_doc": round(
                eval_m["shuffleWriteBytes"] / max(n_docs, 1), 1
            ),
        }
    finally:
        spark.stop()


def write_md(runs: list[dict]) -> None:
    by_docs = sorted(
        {r["n_docs"]: r for r in runs}.values(), key=lambda r: r["n_docs"]
    )
    lines = [
        "# Classifier training/eval scale demo — measured at local[32]",
        "",
        "`python tools/clf_demo.py` measures the REGISTERED",
        "`ql_classifier_train` / `ql_classifier_eval` queries over a 10x",
        "corpus growth (synthetic crawl pages projected to the documents",
        "shape), shuffle bytes from the Spark REST API, best-of-2 timed",
        "passes after a warm pass (this VM's walls swing ~2-3x).",
        "",
        "## ql_classifier_train (explode -> 256-bucket groupBy)",
        "",
        "| docs | wall (s) | docs/sec | shuffle write |",
        "| --- | --- | --- | --- |",
    ]
    for r in by_docs:
        lines.append(
            f"| {r['n_docs']:,} | {r['train_wall_s']} | "
            f"{r['train_docs_per_sec']:,} | {r['train_shuffle_write']:,} B |"
        )
    lines += [
        "",
        "Train shuffle bytes are BOUNDED by the 256-bucket key space",
        "(map-side combine collapses each task to <= 256 rows before the",
        "exchange): corpus growth changes scan work, not shuffle volume —",
        "the property that makes one-shuffle training viable at 10^12",
        "docs.",
        "",
        "## ql_classifier_eval (broadcast weights -> per-doc logits -> confusion)",
        "",
        "| docs | wall (s) | docs/sec | shuffle write | shuffle B/doc |",
        "| --- | --- | --- | --- | --- |",
    ]
    for r in by_docs:
        lines.append(
            f"| {r['n_docs']:,} | {r['eval_wall_s']} | "
            f"{r['eval_docs_per_sec']:,} | {r['eval_shuffle_write']:,} B | "
            f"{r['eval_shuffle_bytes_per_doc']} |"
        )
    lines += [
        "",
        "Eval shuffle grows linearly in DOCS, not tokens: the <=256-row",
        "weight table broadcasts to the scoring join (the exploded token",
        "stream never exchanges on bucket — plan-guarded in",
        "tests/test_curation.py), so what ships is the per-doc logit",
        "rollup plus the docs-to-logits join. Near-constant bytes/doc",
        "across the 10x growth is that claim measured.",
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
