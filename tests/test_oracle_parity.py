"""L3 — mirror of the driver's DuckDB-oracle harness, run at sf0.001 so
failures are debuggable locally before the driver sees them at sf0.01.

For every key in queries() with an oracle_sql() entry: row count, column
name set, and order-insensitive value comparison (floats to 6 sig figs).
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from tests.conftest import SF_SMALL


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    # round floats so summation order can't flip the comparison
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].map(
                lambda v: 0.0
                if (v is not None and not (isinstance(v, float) and math.isnan(v)) and abs(v) < 1e-9)
                else (round(v, 6) if v == v else None)
            )
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _pairs():
    from streamcorpus_filter_spark import queries as reg

    return sorted(set(reg.QUERIES) & set(reg.ORACLE_SQL))


@pytest.mark.parametrize("name", _pairs())
def test_query_matches_duckdb(spark, duck, name):
    from streamcorpus_filter_spark import queries as reg

    got = reg.QUERIES[name](spark, SF_SMALL).toPandas()
    want = duck.execute(reg.ORACLE_SQL[name]).df()

    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: cols {sorted(got.columns)} != {sorted(want.columns)}"
    )
    g, w = _canon(got), _canon(want)
    for c in g.columns:
        gv, wv = g[c], w[c]
        if pd.api.types.is_float_dtype(gv) or pd.api.types.is_float_dtype(wv):
            ok = [
                (a == b)
                or (a is None and b is None)
                or (a != a and b != b)
                or (
                    a is not None
                    and b is not None
                    and a == a
                    and b == b
                    and math.isclose(float(a), float(b), rel_tol=1e-6, abs_tol=1e-9)
                )
                for a, b in zip(gv.tolist(), wv.tolist())
            ]
            assert all(ok), f"{name}.{c}: first diff at {ok.index(False)}"
        else:
            pd.testing.assert_series_equal(
                gv, wv, check_dtype=False, check_names=False, obj=f"{name}.{c}"
            )


def test_entry_smoke(spark):
    from streamcorpus_filter_spark import queries as reg

    df = reg.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"lang", "docs", "pats", "hits"} == set(df.columns)
