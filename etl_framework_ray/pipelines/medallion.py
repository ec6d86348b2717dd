"""Reference-parity medallion pipelines over the TPC-H-ish test tables.

Each function is the Ray-Data-first re-expression of one operator family
from SURVEY.md §2, shaped ``fn(sf_dir) -> ray.data.Dataset`` so the driver
can compare it against an ANSI-SQL oracle on the same Parquet files
(``__ray_entry__.queries`` / ``oracle_sql``). Column names are part of the
contract — they must match the oracle's aliases exactly.

The reference's own tables (instacart orders/products/aisles/departments)
don't exist here; the *operators* are what is ported — project/cast/rename
(silver cleaners, /root/reference/src/silver/*.py), regex row filters
(product.py:70-84), star joins (gold/product_dimension.py:62-74),
conditional aggregates and temporal filters (metadata/slo/*.py), MERGE's
per-key latest-event reduction (models/writer.py:42-67 → LWW).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..functions.transforms import cast_columns, filter_regex, project, rename_columns
from ..stages.lww import lww_reduce


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    return ray.data.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


def _round_cols(names: list[str]):
    """Snap float aggregates to cents, bit-identically across engines.

    Reduce order makes the low bits of a float sum nondeterministic, and
    ``round(x, 2)`` itself differs between numpy/Arrow and DuckDB at the
    ULP level. ``int64(round(x*100)) / 100.0`` is the same double on both
    sides (oracle: ``CAST(ROUND(x*100) AS BIGINT) / 100.0``)."""

    def fn(batch: pa.Table) -> pa.Table:
        for n in names:
            i = batch.schema.get_field_index(n)
            cents = pc.round(pc.multiply(batch.column(n), pa.scalar(100.0)), 0)
            snapped = pc.divide(pc.cast(cents, pa.int64()).cast(pa.float64()), pa.scalar(100.0))
            batch = batch.set_column(i, n, snapped)
        return batch

    return fn


# ---------------------------------------------------------------------------
# M1: project + cast + rename (clean_orders analogue,
# /root/reference/src/silver/order.py:73-83)
# ---------------------------------------------------------------------------


def clean_orders(sf_dir: str) -> "ray.data.Dataset":
    """Silver cleaner: narrow casts + renames + declared column order."""

    def clean(batch: pa.Table) -> pa.Table:
        batch = cast_columns(batch, {"o_custkey": pa.int32()})
        batch = rename_columns(
            batch, {"o_orderpriority": "order_priority", "o_orderstatus": "order_status"}
        )
        return project(batch, ["o_orderkey", "o_custkey", "order_status", "o_totalprice", "order_priority"])

    return _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]
    ).map_batches(clean, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# M2: regex row filter + cast (clean_products analogue,
# /root/reference/src/silver/product.py:70-84, regex at :19)
# ---------------------------------------------------------------------------


def clean_parts(sf_dir: str) -> "ray.data.Dataset":
    """Rows whose p_name contains a 'digit-run' token pattern, then cast."""

    def clean(batch: pa.Table) -> pa.Table:
        batch = filter_regex(batch, "p_type", "^PROMO")
        return cast_columns(batch, {"p_size": pa.int64()})

    return _read(sf_dir, "part", ["p_partkey", "p_name", "p_type", "p_size"]).map_batches(
        clean, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# J1: star-schema dimension join — small sides broadcast
# (/root/reference/src/gold/product_dimension.py:62-74)
# ---------------------------------------------------------------------------


def supplier_nation_region(sf_dir: str) -> "ray.data.Dataset":
    """supplier ⋈ nation ⋈ region with both dims broadcast (ray.put once,
    one Arrow hash join per batch — no shuffle, no pandas round-trip;
    dims are tiny)."""
    import pyarrow.parquet as pq

    from .cdc import _single_threaded_arrow

    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name", "n_regionkey"],
    )
    region = pq.read_table(
        os.path.join(sf_dir, "region.parquet"), columns=["r_regionkey", "r_name"]
    )
    dim = nation.join(region, keys="n_regionkey", right_keys="r_regionkey").select(
        ["n_nationkey", "n_name", "r_name"]
    )
    dim_ref = ray.put(dim)

    def join(batch: pa.Table) -> pa.Table:
        _single_threaded_arrow()
        d = ray.get(dim_ref)
        out = batch.join(d, keys="s_nationkey", right_keys="n_nationkey", join_type="inner")
        out = out.select(["s_suppkey", "s_name", "n_name", "r_name"])
        return out.rename_columns(["s_suppkey", "s_name", "nation_name", "region_name"])

    return _read(sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey"]).map_batches(
        join, batch_format="pyarrow"
    )


def revenue_by_brand(sf_dir: str) -> "ray.data.Dataset":
    """Fact ⋈ broadcast dim ⋈ aggregate: lineitem joined to part (small),
    revenue per brand. The join is a per-batch Arrow hash join against a
    broadcast dim (no pandas round-trip on the fact side); the groupby
    shuffles one partial row per (brand, block)."""
    import pyarrow.parquet as pq

    from .cdc import _single_threaded_arrow

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_brand"]
    )
    part_ref = ray.put(part)

    def partial(batch: pa.Table) -> pa.Table:
        _single_threaded_arrow()
        rev = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
        )
        t = pa.table({"l_partkey": batch.column("l_partkey"), "revenue": rev})
        d = ray.get(part_ref)
        j = t.join(d, keys="l_partkey", right_keys="p_partkey", join_type="inner")
        g = j.group_by("p_brand").aggregate([("revenue", "sum")])
        return g.select(["p_brand", "revenue_sum"]).rename_columns(["p_brand", "revenue"])

    from ray.data.aggregate import Sum

    return (
        _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("p_brand")
        .aggregate(Sum("revenue", alias_name="revenue"))
        .map_batches(_round_cols(["revenue"]), batch_format="pyarrow")
    )


def revenue_by_mktsegment(sf_dir: str) -> "ray.data.Dataset":
    """Large-large hash join: orders ⋈ customer on custkey via the
    engine's own direct-exchange :func:`~..stages.joins.equi_join`, then
    revenue per market segment. The broadcast pattern (J1) doesn't apply
    when neither side fits a worker — this is the shuffle-join path for
    that case (``Dataset.join`` here measured 4.1 s of sort-exchange
    fixed cost at sf0.1 against <0.5 s of merge compute)."""
    from ..stages.joins import equi_join

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    customer = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    joined = equi_join(
        orders, customer, left_on="o_custkey", right_on="c_custkey",
        right_cols=["c_mktsegment"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        from .cdc import _single_threaded_arrow

        _single_threaded_arrow()
        g = batch.group_by("r_c_mktsegment", use_threads=False).aggregate(
            [("o_totalprice", "sum")]
        )
        return g.rename_columns(["c_mktsegment", "revenue"])

    from ray.data.aggregate import Sum

    return (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(Sum("revenue", alias_name="revenue"))
        .map_batches(_round_cols(["revenue"]), batch_format="pyarrow")
    )


def segment_order_coverage(sf_dir: str, cutoff: str = "1995-06-01") -> "ray.data.Dataset":
    """RIGHT OUTER join: recent orders ⋈ customer on custkey with EVERY
    customer preserved — per market segment, how many customers exist and
    how many recent orders they placed (customers with none still count,
    via the NULL left payload a right join keeps). Exercises
    ``equi_join(how="right")`` end-to-end against a SQL RIGHT JOIN."""
    import datetime as _dt

    from ..stages.joins import equi_join

    cut = _dt.date.fromisoformat(cutoff)
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"]).map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("o_orderdate"), pa.scalar(cut))),
        batch_format="pyarrow",
    )
    customer = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    joined = equi_join(
        orders, customer, left_on="o_custkey", right_on="c_custkey",
        right_cols=["c_mktsegment"], how="right",
    )

    def partial(batch: pa.Table) -> pa.Table:
        from .cdc import _single_threaded_arrow

        _single_threaded_arrow()
        seg = batch.column("r_c_mktsegment")
        has_order = pc.is_valid(batch.column("o_orderdate")).cast(pa.int64())
        t = pa.table({"c_mktsegment": seg, "n_orders": has_order})
        g = t.group_by("c_mktsegment", use_threads=False).aggregate(
            [("n_orders", "sum"), ("n_orders", "count")]
        )
        return g.rename_columns(["c_mktsegment", "n_orders", "n_rows"])

    from ray.data.aggregate import Sum

    return (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(Sum("n_orders", alias_name="n_orders"), Sum("n_rows", alias_name="n_rows"))
    )


def shipping_priority(sf_dir: str, segment: str = "BUILDING", cutoff: str = "1998-01-01") -> "ray.data.Dataset":
    """TPC-H Q3-shaped composition: filter + broadcast semi-join + shuffle
    join + grouped aggregate + global top-k.

    customer(segment) ⋉ orders(date < cutoff) ⋈ lineitem(ship > cutoff) →
    revenue per order → top 10. The customer side reduces to a key SET
    broadcast into the orders filter (semi-join pattern); orders⋈lineitem
    is the shuffle join."""
    import datetime as _dt

    import numpy as np
    import pyarrow.parquet as pq_mod

    cut = _dt.datetime.fromisoformat(cutoff)
    cust = pq_mod.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_mktsegment"]
    )
    keys = cust.filter(pc.equal(cust.column("c_mktsegment"), segment)).column("c_custkey")
    keyset_ref = ray.put(keys.to_numpy(zero_copy_only=False))

    def filter_orders(batch: pa.Table) -> pa.Table:
        ks = ray.get(keyset_ref)
        mask = pc.and_(
            pc.less(batch.column("o_orderdate"), pa.scalar(cut)),
            pa.array(np.isin(batch.column("o_custkey").to_numpy(zero_copy_only=False), ks)),
        )
        return batch.filter(mask).select(["o_orderkey", "o_orderdate"])

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        filter_orders, batch_format="pyarrow"
    )
    items = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]
    ).map_batches(
        lambda t: t.filter(pc.greater(t.column("l_shipdate"), pa.scalar(cut))),
        batch_format="pyarrow",
    )
    from ..stages.joins import equi_join

    joined = equi_join(
        items, orders, left_on="l_orderkey", right_on="o_orderkey",
        right_cols=["o_orderdate"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        from .cdc import _single_threaded_arrow

        _single_threaded_arrow()
        rev = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
        )
        t = pa.table(
            {
                "l_orderkey": batch.column("l_orderkey"),
                "o_orderdate": batch.column("r_o_orderdate"),
                "revenue": rev,
            }
        )
        g = t.group_by(["l_orderkey", "o_orderdate"], use_threads=False).aggregate(
            [("revenue", "sum")]
        )
        return g.rename_columns(["l_orderkey", "o_orderdate", "revenue"])

    from ray.data.aggregate import Sum

    return (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_orderkey", "o_orderdate"])
        .aggregate(Sum("revenue", alias_name="revenue"))
        # Ray's Aggregate sort path downcasts the timestamp key to second
        # precision; the query's published schema (and the oracle's) is µs
        .map_batches(
            lambda t: t.set_column(
                t.schema.get_field_index("o_orderdate"),
                "o_orderdate",
                t.column("o_orderdate").cast(pa.timestamp("us")),
            ),
            batch_format="pyarrow",
        )
        .map_batches(_round_cols(["revenue"]), batch_format="pyarrow")
        .sort(["revenue", "l_orderkey"], descending=[True, True])
        .limit(10)
    )


def events_props_k(sf_dir: str) -> "ray.data.Dataset":
    """JSON-ish field extraction from the props column (regex on both
    engines — RE2 parity like text_stats): mean value per extracted k."""

    def partial(batch: pa.Table) -> pa.Table:
        from .cdc import _single_threaded_arrow

        _single_threaded_arrow()
        k = pc.extract_regex(batch.column("props"), r'"k": (?P<k>\d+)')
        kv = pc.struct_field(k, "k").cast(pa.int64())
        t = pa.table({"k": kv, "value": batch.column("value")})
        # unmatched-regex rows have NULL k; the previous pandas groupby
        # dropped them (dropna default) — keep that contract explicitly
        t = t.filter(pc.is_valid(kv))
        g = t.group_by("k", use_threads=False).aggregate(
            [("value", "count", pc.CountOptions(mode="all")), ("value", "sum")]
        )
        return g.rename_columns(["k", "n", "sum_value"])

    from ray.data.aggregate import Sum

    return (
        _read(sf_dir, "events", ["props", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("n", alias_name="n"), Sum("sum_value", alias_name="sum_value"))
        .map_batches(_round_cols(["sum_value"]), batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# A1/A2: grouped + conditional aggregates (TPC-H Q1 shape; SLO conditional
# counts /root/reference/src/metadata/slo/quality.py:43-59)
# ---------------------------------------------------------------------------


def pricing_summary(sf_dir: str) -> "ray.data.Dataset":
    """Per (returnflag, linestatus): sums and counts, partial-aggregated
    per batch before the shuffle."""

    def partial(batch: pa.Table) -> pa.Table:
        from .cdc import _single_threaded_arrow

        _single_threaded_arrow()
        disc = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
        )
        t = pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "l_quantity": batch.column("l_quantity"),
                "l_extendedprice": batch.column("l_extendedprice"),
                "disc_price": disc,
            }
        )
        g = t.group_by(["l_returnflag", "l_linestatus"], use_threads=False).aggregate(
            [
                ("l_quantity", "sum"),
                ("l_extendedprice", "sum"),
                ("disc_price", "sum"),
                ("l_quantity", "count", pc.CountOptions(mode="all")),
            ]
        )
        return g.rename_columns(
            [
                "l_returnflag",
                "l_linestatus",
                "sum_qty",
                "sum_base_price",
                "sum_disc_price",
                "count_order",
            ]
        )

    from ray.data.aggregate import Sum

    return (
        _read(
            sf_dir,
            "lineitem",
            ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_price", alias_name="sum_base_price"),
            Sum("sum_disc_price", alias_name="sum_disc_price"),
            Sum("count_order", alias_name="count_order"),
        )
        .map_batches(_round_cols(["sum_qty", "sum_base_price", "sum_disc_price"]), batch_format="pyarrow")
    )


def pricing_rollup(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q1 at EVERY subtotal level in one scan: ``GROUP BY
    ROLLUP(l_returnflag, l_linestatus)`` with SQL ``GROUPING()`` parity
    (stages/rollup.grouping_sets — raw rows never shuffle, only
    replicated per-block partials)."""
    from ..stages.rollup import grouping_sets, rollup_sets

    ds = _read(
        sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"]
    )
    out = grouping_sets(
        ds,
        rollup_sets(["l_returnflag", "l_linestatus"]),
        {
            "count_order": ("count", None),
            "sum_qty": ("sum", "l_quantity"),
            "sum_base_price": ("sum", "l_extendedprice"),
            "avg_price": ("avg", "l_extendedprice"),
        },
    )
    return out.map_batches(
        _round_cols(["sum_qty", "sum_base_price", "avg_price"]), batch_format="pyarrow"
    )


def lineitem_price_stats(sf_dir: str) -> "ray.data.Dataset":
    """Dispersion report: exact second-moment aggregates (var_samp /
    stddev_samp / var_pop) per return flag from mergeable (n, Σx, Σx²)
    partials — the grouping_sets machinery with a single set, so the raw
    240k-row columns never shuffle, only 3 partial rows per block. Snap
    at cents on both sides (pairwise summation keeps the cancellation
    error ~1e-4 absolute on ~5e8 variances — far inside the snap)."""
    from ..stages.rollup import grouping_sets

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice", "l_quantity"])
    out = grouping_sets(
        ds,
        [("l_returnflag",)],
        {
            "n_price": ("count_col", "l_extendedprice"),
            "var_price": ("var_samp", "l_extendedprice"),
            "std_price": ("stddev_samp", "l_extendedprice"),
            "varp_qty": ("var_pop", "l_quantity"),
        },
    )
    snap = _round_cols(["var_price", "std_price", "varp_qty"])
    return out.map_batches(
        lambda b: snap(b.drop_columns(["grouping_id"])), batch_format="pyarrow"
    )


def forecast_revenue(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q6 shape: pure filter + global sum — the query every engine
    must make I/O-bound. Pruned 4-column read, one vectorized filter +
    partial sum per block, native sum; the column never shuffles."""
    import datetime as _dt

    from ray.data.aggregate import Sum

    lo = _dt.datetime(1996, 1, 1)
    hi = _dt.datetime(1997, 1, 1)

    def partial(batch: pa.Table) -> pa.Table:
        from .cdc import _single_threaded_arrow

        _single_threaded_arrow()
        sd = batch.column("l_shipdate")
        keep = pc.and_(
            pc.and_(pc.greater_equal(sd, pa.scalar(lo)), pc.less(sd, pa.scalar(hi))),
            pc.and_(
                pc.and_(
                    pc.greater_equal(batch.column("l_discount"), pa.scalar(0.03)),
                    pc.less_equal(batch.column("l_discount"), pa.scalar(0.07)),
                ),
                pc.less(batch.column("l_quantity"), pa.scalar(24.0)),
            ),
        )
        f = batch.filter(keep)
        rev = pc.sum(pc.multiply(f.column("l_extendedprice"), f.column("l_discount")))
        return pa.table({"revenue": pa.array([rev.as_py() or 0.0], pa.float64())})

    total = (
        _read(sf_dir, "lineitem", ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"])
        .map_batches(partial, batch_format="pyarrow")
        .aggregate(Sum("revenue", alias_name="revenue"))
    )
    out = pa.table({"revenue": pa.array([float(total["revenue"])], pa.float64())})
    return ray.data.from_arrow(
        _round_cols(["revenue"])(out)
    )


def late_shipment_priority(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q4 shape (EXISTS with a cross-table condition): orders placed
    in 1996 counted per priority when ANY line item shipped >60 days
    after the order date. The EXISTS references both sides' columns, so
    it runs as equi-join (carrying only l_shipdate) → vectorized
    condition → exact distinct on (orderkey, priority) via the hash
    exchange → per-priority counts."""
    import datetime as _dt

    from ..stages.joins import _direct_grouped_apply, equi_join

    lo = _dt.datetime(1996, 1, 1)
    hi = _dt.datetime(1997, 1, 1)

    def keep_1996(batch: pa.Table) -> pa.Table:
        od = batch.column("o_orderdate")
        return batch.filter(
            pc.and_(pc.greater_equal(od, pa.scalar(lo)), pc.less(od, pa.scalar(hi)))
        )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]).map_batches(
        keep_1996, batch_format="pyarrow"
    )
    lineitem = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    joined = equi_join(
        orders, lineitem, "o_orderkey", "l_orderkey", ["l_shipdate"]
    )

    def late_pairs(batch: pa.Table) -> pa.Table:
        from .cdc import _single_threaded_arrow

        _single_threaded_arrow()
        lag = pc.subtract(
            batch.column("r_l_shipdate").cast(pa.int64()),
            batch.column("o_orderdate").cast(pa.int64()),
        )
        late = pc.greater(lag, pa.scalar(60 * 86_400_000_000))  # 60 days in µs
        f = batch.filter(late)
        # block-local dedup before the exchange (duplicates collapse early)
        return (
            f.select(["o_orderkey", "o_orderpriority"])
            .group_by(["o_orderkey", "o_orderpriority"], use_threads=False)
            .aggregate([])
        )

    pairs = joined.map_batches(late_pairs, batch_format="pyarrow")

    def count_kernel(df) -> pa.Table:
        d = df.drop_duplicates(["o_orderkey"])
        g = d.groupby("o_orderpriority", sort=False).size().reset_index(name="n_late")
        return pa.table(
            {
                "o_orderpriority": pa.Array.from_pandas(
                    g["o_orderpriority"], type=pa.string()
                ),
                "n_late": pa.Array.from_pandas(g["n_late"], type=pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    return (
        _direct_grouped_apply(pairs, "o_orderkey", count_kernel)
        .groupby("o_orderpriority")
        .aggregate(Sum("n_late", alias_name="n_late"))
    )


def promo_revenue(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q14 shape: promo revenue share in one calendar year — fact ⋈
    broadcast part-type map, two conditional partial sums per block, one
    driver division, snapped ratio."""
    import datetime as _dt

    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    from .cdc import _single_threaded_arrow

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_type"]
    )
    part_ref = ray.put(part)
    lo = _dt.datetime(1996, 1, 1)
    hi = _dt.datetime(1997, 1, 1)

    def partial(batch: pa.Table) -> pa.Table:
        _single_threaded_arrow()
        sd = batch.column("l_shipdate")
        f = batch.filter(
            pc.and_(pc.greater_equal(sd, pa.scalar(lo)), pc.less(sd, pa.scalar(hi)))
        )
        d = ray.get(part_ref)
        j = f.join(d, keys="l_partkey", right_keys="p_partkey", join_type="inner")
        rev = pc.multiply(
            j.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), j.column("l_discount"))
        )
        promo = pc.if_else(
            pc.equal(j.column("p_type"), pa.scalar("PROMO")), rev, pa.scalar(0.0)
        )
        return pa.table(
            {
                "promo": pa.array([pc.sum(promo).as_py() or 0.0], pa.float64()),
                "total": pa.array([pc.sum(rev).as_py() or 0.0], pa.float64()),
            }
        )

    agg = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"])
        .map_batches(partial, batch_format="pyarrow")
        .aggregate(Sum("promo", alias_name="promo"), Sum("total", alias_name="total"))
    )
    ratio = 100.0 * float(agg["promo"]) / float(agg["total"])
    out = pa.table({"promo_pct": pa.array([ratio], pa.float64())})
    return ray.data.from_arrow(_round_cols(["promo_pct"])(out))


def events_timeliness(sf_dir: str) -> "ray.data.Dataset":
    """Conditional counts per event_type: total + how many before 09:00
    (hour() filter + when/otherwise counting — timeliness.py:81-89,
    quality.py:43-59)."""

    def partial(batch: pa.Table) -> pa.Table:
        from .cdc import _single_threaded_arrow

        _single_threaded_arrow()
        before9 = pc.less(pc.hour(batch.column("ts")), 9)
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "before_9": pc.if_else(before9, pa.scalar(1, pa.int64()), pa.scalar(0, pa.int64())),
            }
        )
        g = t.group_by("event_type", use_threads=False).aggregate(
            [
                ("event_type", "count", pc.CountOptions(mode="all")),
                ("before_9", "sum"),
            ]
        )
        return g.rename_columns(["event_type", "n_events", "n_before_9"])

    from ray.data.aggregate import Sum

    return (
        _read(sf_dir, "events", ["event_type", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n_events", alias_name="n_events"), Sum("n_before_9", alias_name="n_before_9"))
    )


# ---------------------------------------------------------------------------
# A3/A4/A5/O: distinct, dup check, top-k
# ---------------------------------------------------------------------------


def distinct_order_status(sf_dir: str) -> "ray.data.Dataset":
    """``df.distinct()`` (A3) via groupby over all projected columns."""
    from ray.data.aggregate import Count

    return (
        _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority"])
        .groupby(["o_orderstatus", "o_orderpriority"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )


def lineitem_pk_dups(sf_dir: str) -> "ray.data.Dataset":
    """A4 PK-uniqueness: duplicated (l_orderkey, l_linenumber) tuples."""
    from ray.data.aggregate import Count

    return (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])
        .groupby(["l_orderkey", "l_linenumber"])
        .aggregate(Count(alias_name="n"))
        .filter(expr="n > 1")
    )


def top_orders(sf_dir: str, k: int = 10) -> "ray.data.Dataset":
    """A5/O2: global top-k by total price (deterministic tiebreak on key)."""
    return (
        _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
        .sort(["o_totalprice", "o_orderkey"], descending=[True, True])
        .limit(k)
    )


# ---------------------------------------------------------------------------
# The MERGE/LWW kernel on generic data: latest event per user (J3/S4
# semantics — per-key "latest wins", /root/reference/src/models/writer.py:42-67)
# ---------------------------------------------------------------------------


def latest_event_per_user(
    sf_dir: str, shuffle_buckets: int | None = None
) -> "ray.data.Dataset":
    """Per user_id, the event with max (ts, event_id) — batch-level LWW
    combiner then per-bucket reduce; same kernel as the CDC apply.

    Keys co-locate by ``hash(user_id)`` on the DIRECT exchange
    (:func:`~..stages.joins._direct_grouped_apply`; round 4 retired the
    ``groupby("_cb").map_groups`` sort exchange) and one vectorized
    ``lww_reduce`` per bucket handles ALL of its users (the kernel is
    multi-key already) — one UDF dispatch per bucket, not per user, which
    is the difference between ~2×CPU dispatches and millions at corpus
    scale (the group_topk pattern, stages/joins.py)."""
    from ..stages.joins import _direct_grouped_apply

    def combine(batch: pa.Table) -> pa.Table:
        return lww_reduce(batch, ("user_id",), ("ts", "event_id"))

    def reduce_bucket(group: pa.Table) -> pa.Table:
        return lww_reduce(group, ("user_id",), ("ts", "event_id"))

    return _direct_grouped_apply(
        _read(sf_dir, "events", ["user_id", "event_id", "ts", "event_type", "value"])
        .map_batches(combine, batch_format="pyarrow"),
        "user_id",
        reduce_bucket,
        shuffle_buckets,
        kernel_format="pyarrow",
    )
