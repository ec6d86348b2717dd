"""unpivot (wide → long) vs DuckDB UNPIVOT: NULL-drop parity, type
widening, melt mode, validation."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from etl_framework_ray.stages.pivot import unpivot


def _frame(seed=13, n=800):
    rng = np.random.default_rng(seed)
    a = pd.Series(rng.normal(size=n))
    a[rng.random(n) < 0.2] = np.nan
    b = pd.Series(rng.normal(size=n))
    b[rng.random(n) < 0.2] = np.nan
    return pd.DataFrame({
        "k": np.arange(n, dtype="int64"),
        "g": rng.choice(["x", "y"], n),
        "a": a, "b": b, "c": rng.integers(0, 9, n).astype("int64"),
    })


def _norm(df):
    return (
        df.sort_values(["k", "name"]).reset_index(drop=True)
        .astype({"k": "int64", "value": "float64"})
    )


@pytest.mark.usefixtures("ray_session")
def test_matches_duckdb_unpivot():
    df = _frame()
    ds = ray.data.from_pandas(df).repartition(5)
    got = _norm(unpivot(ds, ["k", "g"], ["a", "b", "c"]).to_pandas())
    con = duckdb.connect()
    con.register("t", df)
    exp = _norm(con.sql(
        "SELECT k, g, name, value FROM t UNPIVOT (value FOR name IN (a, b, c))"
    ).df())
    pd.testing.assert_frame_equal(got[exp.columns], exp)


@pytest.mark.usefixtures("ray_session")
def test_melt_mode_keeps_nulls():
    df = _frame(n=100)
    ds = ray.data.from_pandas(df)
    got = unpivot(ds, ["k"], ["a", "b"], drop_null=False).to_pandas()
    assert len(got) == 200
    assert got["value"].isna().sum() == df["a"].isna().sum() + df["b"].isna().sum()


@pytest.mark.usefixtures("ray_session")
def test_validation():
    ds = ray.data.from_pandas(_frame(n=20))
    with pytest.raises(ValueError, match="value_cols"):
        unpivot(ds, ["k"], [])
    with pytest.raises(ValueError, match="collide"):
        unpivot(ds, ["k"], ["a"], var_name="k")
    with pytest.raises(KeyError):
        unpivot(ds, ["k"], ["nope"])
    with pytest.raises(ValueError, match="incompatible"):
        unpivot(ds, ["k"], ["a", "g"])  # float + string
