"""Window/analytic stage tests: every function cross-checked against
DuckDB window SQL on a frame with ties, nulls, a null partition key and
multiple input blocks."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from etl_framework_ray.stages.analytic import (
    cume_dist,
    dense_rank,
    first_value,
    lag,
    last_value,
    lead,
    ntile,
    percent_rank,
    rank,
    row_number,
    running_sum,
    window,
)


def _frame() -> pa.Table:
    # partitions: 1 (4 rows, tied order values), 2 (1 row), NULL (2 rows);
    # v carries a NULL to exercise SUM's null rule; ts is temporal
    return pa.table(
        {
            "pid": pa.array([1, 1, 1, 1, 2, None, None], pa.int64()),
            "o": pa.array([10, 10, 20, 30, 5, 7, 7], pa.int32()),
            "u": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),  # tie-break
            "v": pa.array([1.5, None, 2.0, 4.0, 9.0, 1.0, 2.0], pa.float64()),
            "ts": pa.array(
                pd.to_datetime(
                    [
                        "2024-01-01",
                        "2024-01-02",
                        "2024-01-03",
                        "2024-01-04",
                        "2024-01-05",
                        "2024-01-06",
                        "2024-01-07",
                    ]
                ),
                pa.timestamp("us"),
            ),
            "s": pa.array(["a", "b", None, "d", "e", "f", "g"], pa.string()),
        }
    )


_ORACLE = """
SELECT pid, o, u, v, ts, s,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS seq,
       CAST(RANK() OVER (PARTITION BY pid ORDER BY o) AS BIGINT) AS rk,
       CAST(DENSE_RANK() OVER (PARTITION BY pid ORDER BY o) AS BIGINT) AS drk,
       LAG(ts, 1) OVER w AS prev_ts,
       LEAD(s, 2) OVER w AS next2_s,
       SUM(v) OVER (PARTITION BY pid ORDER BY o, u
                    ROWS UNBOUNDED PRECEDING) AS v_sum,
       FIRST_VALUE(s) OVER w AS fs,
       LAST_VALUE(s) OVER (PARTITION BY pid ORDER BY o, u
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND UNBOUNDED FOLLOWING) AS ls,
       PERCENT_RANK() OVER (PARTITION BY pid ORDER BY o) AS prk,
       CUME_DIST() OVER (PARTITION BY pid ORDER BY o) AS cd,
       CAST(NTILE(3) OVER w AS BIGINT) AS nt
FROM t
WINDOW w AS (PARTITION BY pid ORDER BY o, u)
ORDER BY u
"""


@pytest.mark.usefixtures("ray_session")
def test_window_matches_duckdb():
    import ray.data

    specs = [
        row_number("seq"),
        rank("rk", on=1),
        dense_rank("drk", on=1),
        lag("ts", "prev_ts"),
        lead("s", "next2_s", offset=2),
        running_sum("v", "v_sum"),
        first_value("s", "fs"),
        last_value("s", "ls"),
        percent_rank("prk", on=1),
        cume_dist("cd", on=1),
        ntile(3, "nt"),
    ]
    out = (
        window(ray.data.from_arrow(_frame()).repartition(3), "pid", ["o", "u"], specs,
               shuffle_buckets=4)
        .to_pandas()
        .sort_values("u")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", _frame())
    exp = con.sql(_ORACLE).df()
    for c in ("seq", "rk", "drk", "v_sum", "prk", "cd", "nt"):
        assert out[c].tolist() == pytest.approx(exp[c].tolist(), nan_ok=True), c
    assert out["prev_ts"].tolist() == exp["prev_ts"].tolist()
    for c in ("next2_s", "fs", "ls"):
        assert [x if pd.notna(x) else None for x in out[c]] == [
            x if pd.notna(x) else None for x in exp[c]
        ], c


@pytest.mark.usefixtures("ray_session")
def test_window_types_and_block_invariance():
    import ray.data

    specs = [row_number("seq"), lag("u", "prev_u"), running_sum("u", "u_sum")]
    one = window(ray.data.from_arrow(_frame()), "pid", ["o", "u"], specs,
                 shuffle_buckets=1).to_pandas()
    many = window(ray.data.from_arrow(_frame()).repartition(5), "pid", ["o", "u"],
                  specs, shuffle_buckets=7).to_pandas()
    a = one.sort_values("u").reset_index(drop=True)
    b = many.sort_values("u").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # lag of an int64 column stays int64-typed (no float64 round-trip)
    t = window(ray.data.from_arrow(_frame()), "pid", ["o", "u"], specs,
               shuffle_buckets=2).schema()
    types = dict(zip(t.names, t.types))
    assert types["prev_u"] == pa.int64()
    assert types["u_sum"] == pa.int64()
    assert types["seq"] == pa.int64()


@pytest.mark.usefixtures("ray_session")
def test_window_big_int64_exact_through_lag():
    import ray.data

    # values beyond float64's 2^53 integer range must survive lag exactly
    big = 9_007_199_254_740_993  # 2^53 + 1
    t = pa.table(
        {
            "p": pa.array([1, 1], pa.int64()),
            "o": pa.array([1, 2], pa.int64()),
            "x": pa.array([big, big + 2], pa.int64()),
        }
    )
    import ray

    ds = window(ray.data.from_arrow(t), "p", ["o"], [lag("x", "px")], shuffle_buckets=2)
    out = pa.concat_tables(
        [tb for tb in ray.get(ds.to_arrow_refs()) if tb.num_rows]
    ).sort_by("o")
    assert out.column("px").type == pa.int64()
    assert out.column("px").to_pylist() == [None, big]


@pytest.mark.usefixtures("ray_session")
def test_window_validation_and_descending():
    import ray.data

    ds = ray.data.from_arrow(_frame())
    with pytest.raises(ValueError):
        window(ds, "pid", [], [row_number()])
    with pytest.raises(ValueError):
        window(ds, "pid", ["o"], [])
    with pytest.raises(ValueError):
        window(ds, "pid", ["o"], [row_number("o")])  # collides with input
    with pytest.raises(KeyError):
        window(ds, "pid", ["o"], [lag("nope")])
    with pytest.raises(ValueError):
        window(ds, "pid", ["o"], [rank(on=2)])
    out = (
        window(ds, "pid", ["o", "u"], [row_number("seq")], descending=[True, False],
               shuffle_buckets=2)
        .to_pandas()
    )
    # pid=1 descending by o: o=30 is seq 1
    r = out[(out.pid == 1) & (out.o == 30)]
    assert r["seq"].tolist() == [1]


@pytest.mark.usefixtures("ray_session")
def test_ntile_remainder_sizing_matches_duckdb():
    import duckdb
    import ray.data

    # 7 rows, 3 buckets → sizes 3,2,2; also 2 rows, 5 buckets → each its own
    t = pa.table(
        {
            "p": pa.array([1] * 7 + [2] * 2, pa.int64()),
            "o": pa.array(list(range(7)) + [0, 1], pa.int64()),
        }
    )
    out = (
        window(ray.data.from_arrow(t).repartition(3), "p", ["o"],
               [ntile(3, "n3"), ntile(5, "n5")], shuffle_buckets=2)
        .to_pandas()
        .sort_values(["p", "o"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", t)
    exp = con.sql(
        """SELECT p, o, CAST(NTILE(3) OVER w AS BIGINT) AS n3,
                  CAST(NTILE(5) OVER w AS BIGINT) AS n5
           FROM t WINDOW w AS (PARTITION BY p ORDER BY o) ORDER BY p, o"""
    ).df()
    assert out["n3"].tolist() == exp["n3"].tolist()
    assert out["n5"].tolist() == exp["n5"].tolist()


@pytest.mark.usefixtures("ray_session")
def test_rolling_frames_match_duckdb():
    """ROWS BETWEEN w-1 PRECEDING AND CURRENT ROW aggregates — sum/avg/
    count/min/max — vs DuckDB, with NULL values, a NULL partition key,
    tied order values and an int64 column big enough to break a float64
    round-trip."""
    import ray.data

    from etl_framework_ray.stages.analytic import (
        rolling_avg,
        rolling_count,
        rolling_max,
        rolling_min,
        rolling_sum,
    )

    big = 2**55  # exactness canary: 2**55 + k is not float64-representable
    t = pa.table(
        {
            "pid": pa.array([1, 1, 1, 1, 1, 2, None, None], pa.int64()),
            "u": pa.array([1, 2, 3, 4, 5, 6, 7, 8], pa.int64()),
            "v": pa.array([1.5, None, 2.0, -4.0, 9.0, 1.0, None, 3.0], pa.float64()),
            "b": pa.array(
                [big + 3, big + 1, None, big + 7, big + 2, big, big + 9, big + 4],
                pa.int64(),
            ),
            "ts": pa.array(
                pd.to_datetime(
                    ["2024-01-0%d" % d for d in (5, 3, 8, 1, 2, 4, 6, 7)]
                ),
                pa.timestamp("us"),
            ),
        }
    )
    got = (
        window(
            ray.data.from_arrow(t).repartition(3),
            "pid",
            ["u"],
            [
                rolling_sum("v", 3, "sv"),
                rolling_avg("v", 3, "av"),
                rolling_count("v", 3, "cv"),
                rolling_min("b", 2, "mnb"),
                rolling_max("b", 2, "mxb"),
                rolling_min("ts", 3, "mnts"),
                rolling_sum("v", 1, "sv1"),  # frame of exactly one row
            ],
            shuffle_buckets=3,
        )
        .to_pandas()
        .sort_values("u")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", t)
    exp = con.sql(
        """
        SELECT u,
            SUM(v)   OVER w3 AS sv,
            AVG(v)   OVER w3 AS av,
            CAST(COUNT(v) OVER w3 AS BIGINT) AS cv,
            MIN(b)   OVER w2 AS mnb,
            MAX(b)   OVER w2 AS mxb,
            MIN(ts)  OVER w3 AS mnts,
            SUM(v)   OVER (PARTITION BY pid ORDER BY u
                           ROWS BETWEEN 0 PRECEDING AND CURRENT ROW) AS sv1
        FROM t
        WINDOW
          w3 AS (PARTITION BY pid ORDER BY u
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
          w2 AS (PARTITION BY pid ORDER BY u
                 ROWS BETWEEN 1 PRECEDING AND CURRENT ROW)
        ORDER BY u
        """
    ).df()
    for c in ("sv", "av", "cv", "mnb", "mxb", "mnts", "sv1"):
        a = [x if pd.notna(x) else None for x in got[c]]
        b = [x if pd.notna(x) else None for x in exp[c]]
        assert a == b, (c, a, b)
    # int64 exactness: values near 2**55 came through un-rounded
    assert got["mnb"].dropna().astype("int64").min() == big

    with pytest.raises(ValueError, match="rolling window"):
        rolling_sum("v", 0)
    t2 = t.append_column("s", pa.array(list("abcdefgh"), pa.string()))
    with pytest.raises(TypeError, match="numeric"):
        window(ray.data.from_arrow(t2), "pid", ["u"], [rolling_min("s", 2, "x")])
