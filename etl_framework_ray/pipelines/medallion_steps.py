"""The full_medallion job: bronze CSVs → silver cleaners → gold star
schema → metadata, as reference-shaped step modules.

Each step is the reference's step-module shape (SURVEY.md §2.10): a
declared ``TableSpec`` + a pure ``clean_*(batch) -> batch`` transform + a
``run_*`` entry — mirroring /root/reference/src/silver/*.py and
/root/reference/src/gold/*.py semantics (cast/rename/regex-filter, star
joins, DQ gates that warn or abort) on the instacart-like mini-schema of
FIXTURES.md F5. ``run_full_medallion`` chains the stages the way the
reference's job-of-jobs DAG does (databricks/jobs/full_medallion.yml),
except state crosses stages through committed lake tables in ONE process.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray

from ..context import RunContext
from ..functions.transforms import cast_columns, filter_regex, rename_columns
from ..pipelines.cdc import CDCEngine
from ..pipelines.writer import LakeWriter
from ..sources.csv import ingest_directory
from ..state.schema import ColumnSpec, ForeignKey, QualityRule, TableSpec

# ---------------------------------------------------------------------------
# silver step: aisles (/root/reference/src/silver/aisle.py:17-54 shape)
# ---------------------------------------------------------------------------

AISLES = TableSpec(
    name="aisles",
    columns=(
        ColumnSpec("aisle_id", pa.int32(), nullable=False),
        ColumnSpec("aisle_name", pa.string()),
    ),
    primary_key=("aisle_id",),
)


def clean_aisles(batch: pa.Table) -> pa.Table:
    batch = cast_columns(batch, {"aisle_id": pa.int32()})
    return rename_columns(batch, {"aisle": "aisle_name"})


# ---------------------------------------------------------------------------
# silver step: departments (/root/reference/src/silver/department.py:40-45)
# ---------------------------------------------------------------------------

DEPARTMENTS = TableSpec(
    name="departments",
    columns=(
        ColumnSpec("department_id", pa.int32(), nullable=False),
        ColumnSpec("department_name", pa.string()),
    ),
    primary_key=("department_id",),
)


def clean_departments(batch: pa.Table) -> pa.Table:
    batch = cast_columns(batch, {"department_id": pa.int32()})
    return rename_columns(batch, {"department": "department_name"})


# ---------------------------------------------------------------------------
# silver step: products — regex filter of dirty string ids then cast
# (/root/reference/src/silver/product.py:70-84, regex at :19)
# ---------------------------------------------------------------------------

PRODUCTS = TableSpec(
    name="products",
    columns=(
        ColumnSpec("product_id", pa.int32(), nullable=False),
        ColumnSpec("product_name", pa.string()),
        ColumnSpec("aisle_id", pa.int32()),
        ColumnSpec("department_id", pa.int32()),
        ColumnSpec("price", pa.float32()),
    ),
    primary_key=("product_id",),
)


def clean_products(batch: pa.Table) -> pa.Table:
    # CSV inference leaves dirty ids as strings; rows whose ids are not
    # purely numeric are dropped before the cast (product.py semantics)
    batch = cast_columns(batch, {"aisle_id": pa.string(), "department_id": pa.string()})
    batch = filter_regex(batch, "aisle_id", r"^\d+$")
    batch = filter_regex(batch, "department_id", r"^\d+$")
    return cast_columns(
        batch,
        {
            "product_id": pa.int32(),
            "aisle_id": pa.int32(),
            "department_id": pa.int32(),
            "price": pa.float32(),
        },
    )


# ---------------------------------------------------------------------------
# silver step: orders (/root/reference/src/silver/order.py:73-83)
# ---------------------------------------------------------------------------

ORDERS = TableSpec(
    name="orders",
    columns=(
        ColumnSpec("order_id", pa.int32(), nullable=False),
        ColumnSpec("user_id", pa.int32()),
        ColumnSpec("product_id", pa.int32()),
        ColumnSpec("order_number", pa.int32()),
        ColumnSpec("order_day_of_week", pa.int32()),
        ColumnSpec("order_hour", pa.int32()),
        ColumnSpec(
            "days_since_prior_order",
            pa.int32(),
            quality=QualityRule(criticality="warn", min_value=0),  # order_fact.py:65-70
        ),
    ),
    primary_key=("order_id",),
)


def clean_orders(batch: pa.Table) -> pa.Table:
    batch = cast_columns(
        batch,
        {
            "order_id": pa.int32(),
            "user_id": pa.int32(),
            "product_id": pa.int32(),
            "order_number": pa.int32(),
            "order_dow": pa.int32(),
            "order_hour_of_day": pa.int32(),
            "days_since_prior_order": pa.int32(),
        },
    )
    return rename_columns(
        batch, {"order_dow": "order_day_of_week", "order_hour_of_day": "order_hour"}
    )


# ---------------------------------------------------------------------------
# gold step: product_dimension — star join with an ERROR price rule
# (/root/reference/src/gold/product_dimension.py:20-93)
# ---------------------------------------------------------------------------

PRODUCT_DIMENSION = TableSpec(
    name="product_dimension",
    columns=(
        ColumnSpec("product_id", pa.int32(), nullable=False),
        ColumnSpec("product_name", pa.string()),
        ColumnSpec("aisle_name", pa.string()),
        ColumnSpec("department_name", pa.string()),
        ColumnSpec(
            "price",
            pa.float32(),
            quality=QualityRule(criticality="error", min_value=0),  # product_dimension.py:51-57
        ),
    ),
    primary_key=("product_id",),
)


def build_product_dimension(lake_root: str) -> "ray.data.Dataset":
    """products ⋈ aisles ⋈ departments — dims broadcast (J1): ``ray.put``
    once, one Arrow hash join per batch (no shuffle, no pandas
    round-trip; dims are tiny)."""
    from .cdc import _single_threaded_arrow

    aisles = CDCEngine(os.path.join(lake_root, "silver", "aisles"), AISLES).snapshot_arrow()
    deps = CDCEngine(os.path.join(lake_root, "silver", "departments"), DEPARTMENTS).snapshot_arrow()
    dim_ref = ray.put((aisles, deps))

    def join(batch: pa.Table) -> pa.Table:
        _single_threaded_arrow()
        a, d = ray.get(dim_ref)
        out = batch.join(a, keys="aisle_id", join_type="inner")
        out = out.join(d, keys="department_id", join_type="inner")
        return out.select(
            ["product_id", "product_name", "aisle_name", "department_name", "price"]
        )

    products = CDCEngine(os.path.join(lake_root, "silver", "products"), PRODUCTS).snapshot()
    return products.map_batches(join, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# gold step: order_fact — pure re-projection of silver orders with a WARN
# rule and an FK to product_dimension
# (/root/reference/src/gold/order_fact.py:20-88)
# ---------------------------------------------------------------------------

ORDER_FACT = TableSpec(
    name="order_fact",
    columns=(
        ColumnSpec("order_id", pa.int32(), nullable=False),
        ColumnSpec("user_id", pa.int32(), nullable=False),
        ColumnSpec(
            "product_id",
            pa.int32(),
            foreign_key=ForeignKey("product_dimension", "product_id"),  # order_fact.py:44-49
        ),
        ColumnSpec("order_number", pa.int32(), nullable=False),
        ColumnSpec("order_day_of_week", pa.int32(), nullable=False),
        ColumnSpec("order_hour", pa.int32(), nullable=False),
        ColumnSpec(
            "days_since_prior_order",
            pa.int32(),
            quality=QualityRule(criticality="warn", min_value=0),  # order_fact.py:65-70
        ),
    ),
    primary_key=("order_id",),
)


def build_order_fact(lake_root: str) -> "ray.data.Dataset":
    """silver.orders → declared-column re-projection (order_fact.py:75-88:
    the reference's main() is a select of the fact columns + gated
    overwrite; the select happens via the writer's declared-order
    projection, so this is a pure read of the silver table)."""
    return CDCEngine(os.path.join(lake_root, "silver", "orders"), ORDERS).snapshot()


SILVER_STEPS = [
    ("aisles", AISLES, clean_aisles),
    ("departments", DEPARTMENTS, clean_departments),
    ("products", PRODUCTS, clean_products),
    ("orders", ORDERS, clean_orders),
]


def run_full_medallion(
    csv_dir: str,
    lake_root: str,
    run_context: RunContext | None = None,
    events_path: str | None = None,
) -> dict:
    """bronze → silver → gold (product_dimension + order_fact) →
    metadata (quality + optional timeliness), end to end — the reference's
    job-of-jobs DAG (databricks/jobs/full_medallion.yml). Returns row
    counts. ``events_path`` (a parquet of ``ts``/``event_type`` events)
    chains the SLO timeliness roll-up into the metadata layer the way the
    reference's DAG runs its timeliness step after the gold builds."""
    rc = run_context or RunContext()
    counts: dict[str, int] = {}

    # bronze: raw append of source files, schema inferred+frozen (S1)
    bronze_specs = ingest_directory(csv_dir, os.path.join(lake_root, "bronze"), rc)

    # silver: read bronze → pure clean fn → gated overwrite (§3.1 step trace)
    for name, spec, clean in SILVER_STEPS:
        if name not in bronze_specs:
            continue
        src = CDCEngine(os.path.join(lake_root, "bronze", name), bronze_specs[name]).snapshot()
        cleaned = src.map_batches(clean, batch_format="pyarrow")
        writer = LakeWriter(os.path.join(lake_root, "silver", name), spec, run_context=rc)
        counts[f"silver.{name}"] = writer.overwrite(cleaned)

    # gold: star-schema dimension, DQ-gated (ERROR price rule aborts)
    gold = build_product_dimension(lake_root)
    writer = LakeWriter(os.path.join(lake_root, "gold", "product_dimension"), PRODUCT_DIMENSION, run_context=rc)
    counts["gold.product_dimension"] = writer.overwrite(gold)

    # gold: order_fact re-projection, WARN rule on days_since_prior_order
    if "orders" in bronze_specs:
        fact_writer = LakeWriter(
            os.path.join(lake_root, "gold", "order_fact"), ORDER_FACT, run_context=rc
        )
        counts["gold.order_fact"] = fact_writer.overwrite(build_order_fact(lake_root))

    # metadata: roll the run's DQ audit into the quality table (§3.3)
    from .slo import track_quality, track_timeliness

    audit_root = os.path.join(lake_root, "gold", "product_dimension", "_metrics", "dq")
    track_quality(audit_root, lake_root, rc)
    if events_path is not None:
        counts["metadata.timeliness"] = track_timeliness(events_path, lake_root, rc).count()
    return counts
