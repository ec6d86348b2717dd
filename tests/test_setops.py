"""Set operations vs DuckDB: bag semantics of INTERSECT/EXCEPT ALL,
NULL-equality, distinct forms, schema validation, partition invariance."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray

from etl_framework_ray.stages.setops import (
    except_,
    except_all,
    intersect,
    intersect_all,
    union_distinct,
)

OPS = {
    "INTERSECT": intersect,
    "INTERSECT ALL": intersect_all,
    "EXCEPT": except_,
    "EXCEPT ALL": except_all,
    "UNION": union_distinct,
}


def _frames(seed=19, n=3000):
    rng = np.random.default_rng(seed)

    def mk(m, hi):
        g = pd.Series(rng.choice(["x", "y", None], m), dtype=object)
        v = pd.Series(rng.integers(0, hi, m).astype("float64"))
        v[rng.random(m) < 0.1] = np.nan
        return pd.DataFrame({"g": g, "v": v})

    # left's wider domain keeps EXCEPT [ALL] non-empty
    return mk(n, 60), mk(n // 2, 25)


def _norm(df):
    return (
        df.sort_values(["g", "v"], na_position="first")
        .reset_index(drop=True)
        .astype({"v": "float64"})
    )


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("sql_op", list(OPS))
def test_matches_duckdb(sql_op):
    a, b = _frames()
    con = duckdb.connect()
    con.register("a", a)
    con.register("b", b)
    exp = _norm(con.sql(f"SELECT * FROM a {sql_op} SELECT * FROM b").df())
    got = _norm(
        OPS[sql_op](
            ray.data.from_pandas(a).repartition(7),
            ray.data.from_pandas(b).repartition(4),
        ).to_pandas()
    )
    assert len(exp) > 0
    pd.testing.assert_frame_equal(got[exp.columns], exp)


@pytest.mark.usefixtures("ray_session")
def test_partition_invariance_and_column_order():
    a, b = _frames(seed=5, n=600)
    b = b[["v", "g"]]  # reordered right side must still align by name
    one = _norm(intersect_all(ray.data.from_pandas(a), ray.data.from_pandas(b)).to_pandas())
    many = _norm(
        intersect_all(
            ray.data.from_pandas(a).repartition(13),
            ray.data.from_pandas(b).repartition(9),
            shuffle_buckets=5,
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(one, many)


@pytest.mark.usefixtures("ray_session")
def test_schema_mismatch_fails_loud():
    a, _ = _frames(n=50)
    bad = a.rename(columns={"v": "w"})
    with pytest.raises(ValueError, match="matching column names"):
        intersect(ray.data.from_pandas(a), ray.data.from_pandas(bad))
