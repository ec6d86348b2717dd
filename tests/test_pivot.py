"""Pivot operator tests: count and sum reshapes cross-checked against
SQL CASE-WHEN aggregates, null keys/values, deterministic columns."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from etl_framework_ray.stages.pivot import pivot


def _events() -> pa.Table:
    rng = np.random.default_rng(9)
    n = 600
    keys = rng.integers(0, 20, n).astype(object)
    keys[::17] = None  # null keys form their own group
    pv = rng.choice(["a", "b", "c"], n).astype(object)
    pv[::23] = None  # null pivot values are skipped
    vals = rng.normal(10, 3, n)
    vals[::11] = np.nan
    return pa.table(
        {
            "k": pa.array(keys.tolist(), pa.int64()),
            "t": pa.array(pv.tolist(), pa.string()),
            "v": pa.array([None if np.isnan(x) else x for x in vals], pa.float64()),
        }
    )


_SQL = """
SELECT k,
       CAST(COUNT(CASE WHEN t = 'a' THEN 1 END) AS BIGINT) AS n_a,
       CAST(COUNT(CASE WHEN t = 'b' THEN 1 END) AS BIGINT) AS n_b,
       CAST(COUNT(CASE WHEN t = 'c' THEN 1 END) AS BIGINT) AS n_c,
       SUM(CASE WHEN t = 'a' THEN v END) AS sum_a,
       SUM(CASE WHEN t = 'b' THEN v END) AS sum_b,
       SUM(CASE WHEN t = 'c' THEN v END) AS sum_c
FROM e WHERE t IS NOT NULL GROUP BY k ORDER BY k NULLS LAST
"""


@pytest.mark.usefixtures("ray_session")
def test_pivot_count_and_sum_match_duckdb():
    import ray.data

    t = _events()
    con = duckdb.connect()
    con.register("e", t)
    exp = con.sql(_SQL).df()
    cnt = (
        pivot(ray.data.from_arrow(t).repartition(5), "k", "t", agg="count",
              shuffle_buckets=3)
        .to_pandas()
        .sort_values("k", na_position="last")
        .reset_index(drop=True)
    )
    for c in ("n_a", "n_b", "n_c"):
        assert cnt[c].tolist() == exp[c].tolist(), c
    sm = (
        pivot(ray.data.from_arrow(t).repartition(4), "k", "t", value_col="v",
              agg="sum", shuffle_buckets=4)
        .to_pandas()
        .sort_values("k", na_position="last")
        .reset_index(drop=True)
    )
    for c in ("sum_a", "sum_b", "sum_c"):
        a, b = sm[c].to_numpy(dtype=float), exp[c].to_numpy(dtype=float)
        assert np.allclose(a, b, rtol=0, atol=1e-9, equal_nan=True), c


@pytest.mark.usefixtures("ray_session")
def test_pivot_int_sum_stays_int64_and_explicit_values():
    import ray
    import ray.data

    t = pa.table(
        {
            "k": pa.array([1, 1, 2], pa.int64()),
            "t": pa.array(["x", "y", "x"], pa.string()),
            "v": pa.array([5, 7, 9], pa.int64()),
        }
    )
    ds = pivot(
        ray.data.from_arrow(t), "k", "t", value_col="v", agg="sum",
        pivot_values=["x", "y", "z"], shuffle_buckets=2,
    )
    out = pa.concat_tables(
        [tb for tb in ray.get(ds.to_arrow_refs()) if tb.num_rows]
    ).sort_by("k")
    assert out.column("sum_x").type == pa.int64()
    assert out.column("sum_x").to_pylist() == [5, 9]
    assert out.column("sum_y").to_pylist() == [7, None]  # SUM of nothing is NULL
    assert out.column("sum_z").to_pylist() == [None, None]  # explicit unseen value


@pytest.mark.usefixtures("ray_session")
def test_pivot_validation():
    import ray.data

    ds = ray.data.from_arrow(_events())
    with pytest.raises(ValueError):
        pivot(ds, "k", "t", agg="avg")
    with pytest.raises(ValueError):
        pivot(ds, "k", "t", agg="sum")  # needs value_col
    with pytest.raises(KeyError):
        pivot(ds, "k", "missing")
    with pytest.raises(ValueError):
        pivot(ds, "k", "t", max_pivot_values=1)  # discovery cap fails loud
