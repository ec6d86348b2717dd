"""Global total-order ranking vs DuckDB window functions: heavy ties,
NULL keys (both positions), descending, peer-prefix semantics, partition
invariance, and empty input."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from etl_framework_ray.stages.ranking import global_ranks


def _frame(seed=17, n=5000, null_frac=0.1):
    rng = np.random.default_rng(seed)
    v = pd.Series(rng.integers(0, 40, n).astype("float64"))  # heavy ties
    v[rng.random(n) < null_frac] = np.nan
    return pd.DataFrame(
        {"v": v, "k": np.arange(n, dtype="int64"), "s": rng.normal(size=n)}
    )


def _oracle(df, desc: bool, nulls: str) -> pd.DataFrame:
    d = "DESC" if desc else "ASC"
    nl = "NULLS LAST" if nulls == "last" else "NULLS FIRST"
    con = duckdb.connect()
    con.register("t", df)
    return con.sql(
        f"""SELECT v, k, s,
               ROW_NUMBER() OVER (ORDER BY v {d} {nl}, k) AS row_number,
               RANK()       OVER (ORDER BY v {d} {nl})    AS rank,
               DENSE_RANK() OVER (ORDER BY v {d} {nl})    AS dense_rank
            FROM t"""
    ).df()


def _norm(df):
    return (
        df.sort_values("k")
        .reset_index(drop=True)
        .astype({"row_number": "int64", "rank": "int64", "dense_rank": "int64"})
    )


def _run(df, desc, nulls, parallelism=9, buckets=None):
    ds = ray.data.from_pandas(df).repartition(parallelism)
    out = global_ranks(
        ds, ["v", "k"], descending=[desc, False], peer_cols=1, nulls=nulls,
        shuffle_buckets=buckets,
    )
    return out.to_pandas()


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("desc,nulls", [(False, "last"), (True, "last"), (False, "first")])
def test_matches_duckdb(desc, nulls):
    df = _frame()
    got = _norm(_run(df, desc, nulls))
    exp = _norm(_oracle(df, desc, nulls))
    pd.testing.assert_frame_equal(got[exp.columns], exp)


@pytest.mark.usefixtures("ray_session")
def test_bucket_and_partition_invariance():
    df = _frame(seed=3, n=1500)
    a = _norm(_run(df, False, "last", parallelism=1, buckets=2))
    b = _norm(_run(df, False, "last", parallelism=17, buckets=11))
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.usefixtures("ray_session")
def test_output_streams_in_global_order():
    df = _frame(seed=9, n=2000, null_frac=0.0)
    ds = ray.data.from_pandas(df).repartition(7)
    out = global_ranks(ds, ["v", "k"], shuffle_buckets=8).to_pandas()
    # block concatenation order IS ascending rank order (range exchange)
    assert (np.diff(out["row_number"].to_numpy()) == 1).all()
    assert out["row_number"].iloc[0] == 1


@pytest.mark.usefixtures("ray_session")
def test_full_peer_default_and_validation():
    df = _frame(seed=5, n=300, null_frac=0.0)
    ds = ray.data.from_pandas(df)
    out = global_ranks(ds, ["v", "k"]).to_pandas()  # total order: no peers
    assert (out["rank"].to_numpy() == out["row_number"].to_numpy()).all()

    with pytest.raises(ValueError, match="order_cols"):
        global_ranks(ds, [])
    with pytest.raises(ValueError, match="peer_cols"):
        global_ranks(ds, ["v"], peer_cols=2)
    with pytest.raises(ValueError, match="unknown rank"):
        global_ranks(ds, ["v"], ranks=("percentile",))
    with pytest.raises(ValueError, match="already has a column"):
        global_ranks(ds.map_batches(
            lambda t: t.append_column("rank", pa.nulls(t.num_rows, pa.int64())),
            batch_format="pyarrow"), ["v"])


@pytest.mark.usefixtures("ray_session")
def test_empty_input():
    schema = pa.schema([("v", pa.float64()), ("k", pa.int64())])
    out = global_ranks(ray.data.from_arrow(schema.empty_table()), ["v", "k"])
    assert out.count() == 0
    assert set(out.schema().names) == {"v", "k", "row_number", "rank", "dense_rank"}
