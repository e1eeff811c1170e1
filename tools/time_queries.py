"""Time each driver-contract query (Spark side + DuckDB oracle side) at sf0.01.

Mimics the driver's per-query work so we can see where its time box goes.
Usage: python tools/time_queries.py [master]
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import duckdb

import __spark_entry__ as e
from streamcorpus_filter_spark.session import get_spark


def main() -> None:
    master = sys.argv[1] if len(sys.argv) > 1 else "local[32]"
    spark = get_spark(app_name="timing", master=master, shuffle_partitions=32)
    qs, os_ = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf0.01/{t}.parquet'"
        )
    rows = []
    for name, fn in qs.items():  # registration order, like the driver
        t0 = time.perf_counter()
        err = None
        try:
            fn(spark, "/root/testdata/sf0.01").toPandas()
        except Exception as exc:  # noqa: BLE001
            err = repr(exc)[:120]
        t_spark = time.perf_counter() - t0
        t_oracle = 0.0
        if name in os_ and err is None:
            t0 = time.perf_counter()
            try:
                con.execute(os_[name]).df()
            except Exception as exc:  # noqa: BLE001
                err = "oracle: " + repr(exc)[:120]
            t_oracle = time.perf_counter() - t0
        rows.append((name, t_spark, t_oracle, err))
        print(
            f"{name:28s} spark={t_spark:7.2f}s oracle={t_oracle:7.2f}s"
            + (f"  ERR {err}" if err else ""),
            flush=True,
        )
    total_s = sum(r[1] for r in rows)
    total_o = sum(r[2] for r in rows)
    print(f"TOTAL spark={total_s:.1f}s oracle={total_o:.1f}s n={len(rows)}")
    out = [
        {"name": n, "spark_s": round(s, 3), "oracle_s": round(o, 3), "err": err}
        for n, s, o, err in rows
    ]
    pathlib.Path("tools/timings.json").write_text(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
