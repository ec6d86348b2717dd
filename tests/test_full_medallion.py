"""End-to-end full_medallion job over F5-style dirty CSVs (SURVEY.md §3.1):
bronze ingest → silver cleaning (dirty rows filtered, warn logged) → gold
star join (error rule aborts on bad price) → metadata quality rollup."""

import pytest

from etl_framework_ray.functions.quality import DQError
from etl_framework_ray.pipelines.medallion_steps import (
    AISLES,
    ORDER_FACT,
    ORDERS,
    PRODUCT_DIMENSION,
    PRODUCTS,
    run_full_medallion,
)


def _write_csvs(d, bad_price=False):
    (d / "aisles.csv").write_text("aisle_id,aisle\n1,bakery\n2,dairy\n")
    (d / "departments.csv").write_text("department_id,department\n10,fresh\n20,frozen\n")
    price = "-9.99" if bad_price else "3.50"
    (d / "products.csv").write_text(
        "product_id,product_name,aisle_id,department_id,price\n"
        "100,baguette,1,10,2.50\n"
        f"101,milk,2,20,{price}\n"
        "102,ghost,oops,10,1.00\n"  # dirty aisle_id → filtered in silver
    )
    (d / "orders.csv").write_text(
        "order_id,user_id,product_id,order_number,order_dow,order_hour_of_day,days_since_prior_order\n"
        "1,7,100,1,2,9,0\n"
        "2,7,101,2,3,14,-5\n"  # negative → WARN rule logs, row kept
    )


@pytest.mark.usefixtures("ray_session")
def test_full_medallion_happy_path(tmp_path):
    src = tmp_path / "raw"
    src.mkdir()
    _write_csvs(src)
    lake = str(tmp_path / "lake")

    counts = run_full_medallion(
        str(src), lake, events_path="/root/testdata/sf0.001/events.parquet"
    )
    assert counts["silver.products"] == 2  # dirty row filtered (regex ^\d+$)
    assert counts["silver.orders"] == 2  # warn row LOGGED but kept
    assert counts["gold.product_dimension"] == 2
    assert counts["gold.order_fact"] == 2  # re-projection keeps both orders
    assert counts["metadata.timeliness"] > 0  # timeliness chained into the job

    # order_fact content: declared-order projection of silver orders with
    # the fact columns only (order_fact.py:75-88)
    from etl_framework_ray.pipelines.cdc import CDCEngine as _OF

    fact = _OF(f"{lake}/gold/order_fact", ORDER_FACT).snapshot_arrow()
    assert fact.column_names == [
        "order_id", "user_id", "product_id", "order_number",
        "order_day_of_week", "order_hour", "days_since_prior_order",
    ]
    fact_rows = {r["order_id"]: r for r in fact.to_pylist()}
    assert fact_rows[2]["days_since_prior_order"] == -5  # WARN logs, keeps
    from etl_framework_ray.functions.quality import read_audit as _ra

    fact_audit = _ra(f"{lake}/gold/order_fact/_metrics/dq").to_pylist()
    assert any(
        r["rule_name"] == "days_since_prior_order_is_in_range" and r["failed_rows"] == 1
        for r in fact_audit
    )

    from etl_framework_ray.pipelines.cdc import CDCEngine

    gold = CDCEngine(f"{lake}/gold/product_dimension", PRODUCT_DIMENSION).snapshot_arrow().to_pylist()
    by_id = {r["product_id"]: r for r in gold}
    assert by_id[100]["aisle_name"] == "bakery" and by_id[100]["department_name"] == "fresh"
    assert by_id[101]["aisle_name"] == "dairy" and by_id[101]["department_name"] == "frozen"

    # silver orders rename happened and warn was audited
    orders = CDCEngine(f"{lake}/silver/orders", ORDERS).snapshot_arrow()
    assert "order_day_of_week" in orders.column_names and "order_hour" in orders.column_names
    from etl_framework_ray.functions.quality import read_audit

    audit = read_audit(f"{lake}/silver/orders/_metrics/dq")
    warn = audit.to_pylist()
    assert any(r["rule_name"] == "days_since_prior_order_is_in_range" and r["failed_rows"] == 1 for r in warn)

    # metadata quality table rolled up the gold audit
    from etl_framework_ray.pipelines.slo import QUALITY
    from etl_framework_ray.pipelines.cdc import CDCEngine as _E

    q = _E(f"{lake}/metadata/quality", QUALITY).snapshot_arrow()
    assert q.num_rows <= 1  # zero rows if gold had no failures, one otherwise


@pytest.mark.usefixtures("ray_session")
def test_full_medallion_error_gate_aborts_gold(tmp_path):
    src = tmp_path / "raw"
    src.mkdir()
    _write_csvs(src, bad_price=True)  # negative price reaches the gold ERROR rule
    lake = str(tmp_path / "lake")
    with pytest.raises(DQError, match="price_is_in_range"):
        run_full_medallion(str(src), lake)
    # gold table never materialized
    import os

    assert not os.path.exists(f"{lake}/gold/product_dimension/_manifest/CURRENT") or (
        len(
            __import__("etl_framework_ray.state.manifest", fromlist=["ManifestStore"])
            .ManifestStore(f"{lake}/gold/product_dimension")
            .load()
            .data_files()
        )
        == 0
    )
