"""Medallion operator parity vs DuckDB oracles at sf0.001 (SURVEY.md §2)."""

import duckdb
import pandas as pd
import pytest

from etl_framework_ray.pipelines import medallion as m

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["orders", "lineitem", "part", "supplier", "nation", "region", "events"]:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _cmp(ray_ds, sql, con, sort_cols):
    got = ray_ds.to_pandas().sort_values(sort_cols).reset_index(drop=True)
    exp = con.sql(sql).df().sort_values(sort_cols).reset_index(drop=True)
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=False, rtol=1e-9)


@pytest.mark.usefixtures("ray_session")
def test_clean_orders(con):
    _cmp(
        m.clean_orders(SF),
        """SELECT o_orderkey, CAST(o_custkey AS INT) AS o_custkey,
                  o_orderstatus AS order_status, o_totalprice,
                  o_orderpriority AS order_priority FROM orders""",
        con,
        ["o_orderkey"],
    )


@pytest.mark.usefixtures("ray_session")
def test_clean_parts_regex(con):
    _cmp(
        m.clean_parts(SF),
        """SELECT p_partkey, p_name, p_type, CAST(p_size AS BIGINT) AS p_size
           FROM part WHERE regexp_matches(p_type, '^PROMO')""",
        con,
        ["p_partkey"],
    )


@pytest.mark.usefixtures("ray_session")
def test_supplier_star_join(con):
    _cmp(
        m.supplier_nation_region(SF),
        """SELECT s_suppkey, s_name, n_name AS nation_name, r_name AS region_name
           FROM supplier JOIN nation ON s_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey""",
        con,
        ["s_suppkey"],
    )


@pytest.mark.usefixtures("ray_session")
def test_revenue_by_brand(con):
    _cmp(
        m.revenue_by_brand(SF),
        """SELECT p_brand,
                  CAST(ROUND(SUM(l_extendedprice * (1 - l_discount)) * 100) AS BIGINT) / 100.0
                      AS revenue
           FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY p_brand""",
        con,
        ["p_brand"],
    )


@pytest.mark.usefixtures("ray_session")
def test_pricing_summary(con):
    _cmp(
        m.pricing_summary(SF),
        """SELECT l_returnflag, l_linestatus,
                  CAST(ROUND(SUM(l_quantity) * 100) AS BIGINT) / 100.0 AS sum_qty,
                  CAST(ROUND(SUM(l_extendedprice) * 100) AS BIGINT) / 100.0 AS sum_base_price,
                  CAST(ROUND(SUM(l_extendedprice * (1 - l_discount)) * 100) AS BIGINT) / 100.0
                      AS sum_disc_price,
                  COUNT(*) AS count_order
           FROM lineitem GROUP BY l_returnflag, l_linestatus""",
        con,
        ["l_returnflag", "l_linestatus"],
    )


@pytest.mark.usefixtures("ray_session")
def test_events_timeliness(con):
    _cmp(
        m.events_timeliness(SF),
        """SELECT event_type, COUNT(*) AS n_events,
                  SUM(CASE WHEN EXTRACT(hour FROM ts) < 9 THEN 1 ELSE 0 END) AS n_before_9
           FROM events GROUP BY event_type""",
        con,
        ["event_type"],
    )


@pytest.mark.usefixtures("ray_session")
def test_distinct_and_dups_and_topk(con):
    _cmp(
        m.distinct_order_status(SF),
        "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
        con,
        ["o_orderstatus", "o_orderpriority"],
    )
    assert m.lineitem_pk_dups(SF).count() == con.sql(
        """SELECT COUNT(*) FROM (SELECT l_orderkey, l_linenumber FROM lineitem
           GROUP BY 1,2 HAVING COUNT(*) > 1)"""
    ).fetchone()[0]
    _cmp(
        m.top_orders(SF, 10),
        """SELECT o_orderkey, o_totalprice FROM orders
           ORDER BY o_totalprice DESC, o_orderkey DESC LIMIT 10""",
        con,
        ["o_orderkey"],
    )


@pytest.mark.usefixtures("ray_session")
def test_latest_event_per_user(con):
    _cmp(
        m.latest_event_per_user(SF),
        """SELECT user_id, event_id, ts, event_type, value FROM (
             SELECT user_id, event_id, ts, event_type, value,
                    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
             FROM events) WHERE rn = 1""",
        con,
        ["user_id"],
    )
