"""As-of (temporal) join — a custom operator Ray Data lacks natively.

``asof_join(left, right, ...)``: for each left row, attach the LATEST
right row of the same key whose time is ≤ the left row's time (backward
direction; LEFT-join semantics — unmatched left rows keep nulls). The
classic "attach the dimension version in effect at event time" /
point-in-time-correct lookup of feature-store and market-data pipelines.

Execution shape (the documented composition pattern for operators Ray
Data lacks): both sides are normalized onto ONE union schema (left
payload + right payload + shared ``_key``/``_t`` columns, absent side
nulled), tagged, unioned, and coarse-bucketed by the hashed key — one
UDF dispatch per coarse bucket, not per key. Inside a bucket the right
side is sorted once and every left row resolves with one
``searchsorted`` per key — no per-row Python, no driver materialization.
Partitioning assumption: all rows of ONE key fit a worker (the same
co-location contract as the CDC applier).

Determinism: if the right side can hold several rows with the SAME
(key, time), pre-reduce it first (the oracle query does the same) —
"which of the tied rows" is otherwise engine-defined, matching DuckDB
ASOF JOIN's unspecified tie behavior.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..functions.hashing import stable_hash_array


def _union_keyed(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    left_by: str,
    right_by: str,
    left_on: str,
    right_on: str,
    right_cols: list[str],
    shuffle_buckets: int,
):
    """Shared plumbing for keyed temporal joins: normalize both sides onto
    ONE union schema (shared ``_key``/``_t``, left payload ``_l_*``, right
    payload ``_r_*``, absent side nulled), tag, union, coarse-bucket by
    hashed key. Returns ``(tagged_ds, l_names, r_cols)``."""
    l_schema = left.schema()  # ray.data Schema wrapper: .names / .types
    r_schema = right.schema()
    if l_schema is None:
        raise ValueError("left dataset has no schema (empty input?)")
    l_types = dict(zip(l_schema.names, l_schema.types))
    r_cols = [c for c in dict.fromkeys(right_cols) if c != right_by]
    if r_schema is None:
        # a fully EMPTY right side: no rows will ever match, and there is
        # no schema to type the payload — emit consistently null-typed
        # r_* columns (uniform across blocks, so unification still works)
        r_types = {c: pa.null() for c in r_cols}
        right = None
    else:
        r_types = dict(zip(r_schema.names, r_schema.types))
    l_names = list(l_schema.names)
    key_t = l_types[left_by]
    # time comparisons happen on a COMMON comparable type
    t_t = pa.timestamp("us") if pa.types.is_temporal(l_types[left_on]) else pa.float64()

    union_fields = (
        [("_key", key_t), ("_t", t_t), ("_side", pa.int8()), ("_cb", pa.int64())]
        + [(f"_l_{c}", l_types[c]) for c in l_names]
        + [(f"_r_{c}", r_types[c]) for c in r_cols]
    )
    union_schema = pa.schema(union_fields)

    def tag(side: int, by: str, on: str, payload_prefix: str):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cb = (stable_hash_array(batch.column(by)) % np.uint64(shuffle_buckets)).astype(
                np.int64
            )
            cols = {
                "_key": batch.column(by).cast(key_t),
                "_t": batch.column(on).cast(t_t),
                "_side": pa.array(np.full(n, side, dtype=np.int8)),
                "_cb": pa.array(cb),
            }
            for f in union_schema:
                if f.name in cols:
                    continue
                src = f.name[len(payload_prefix) :] if f.name.startswith(payload_prefix) else None
                if src is not None and src in batch.column_names:
                    cols[f.name] = batch.column(src).cast(f.type)
                else:
                    cols[f.name] = pa.nulls(n, f.type)
            return pa.table({f.name: cols[f.name] for f in union_schema})

        return fn

    tagged = left.map_batches(tag(0, left_by, left_on, "_l_"), batch_format="pyarrow")
    if right is not None:
        tagged = tagged.union(
            right.map_batches(tag(1, right_by, right_on, "_r_"), batch_format="pyarrow")
        )
    return tagged, l_names, r_cols, l_types, r_types


def _typed_out(lhs: pd.DataFrame, l_names, l_types, extra: dict) -> pa.Table:
    """Build the bucket UDF's output as an Arrow table with EXPLICIT field
    types: a coarse bucket with zero left rows (or zero matches) must
    still emit int64/timestamp columns, never pandas-inferred null/object
    types that break downstream schema unification."""
    cols = {}
    for c in l_names:
        cols[c] = pa.Array.from_pandas(lhs[f"_l_{c}"], type=l_types[c])
    for name, (values, typ) in extra.items():
        # numpy value arrays convert directly; object arrays (asof match
        # results holding None) go through from_pandas for null handling
        if isinstance(values, np.ndarray) and values.dtype != object:
            cols[name] = pa.array(values, type=typ)
        else:
            cols[name] = pa.Array.from_pandas(pd.Series(values), type=typ)
    return pa.table(cols)


def asof_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    left_by: str,
    right_by: str,
    left_on: str,
    right_on: str,
    right_cols: list[str],
    shuffle_buckets: int = 32,
) -> "ray.data.Dataset":
    """Backward as-of LEFT join. Output = all left columns + one
    ``r_<col>`` per entry of ``right_cols`` (nulls where no right row
    precedes the left row's time).

    ``left_by``/``right_by`` are the equality keys, ``left_on``/
    ``right_on`` the ordering (time) columns; the two time columns must
    be mutually comparable after Arrow casting."""
    tagged, l_names, r_cols, l_types, r_types = _union_keyed(
        left, right, left_by, right_by, left_on, right_on, right_cols, shuffle_buckets
    )

    def bucket_asof(df: pd.DataFrame) -> pa.Table:
        lhs = df[df["_side"] == 0].reset_index(drop=True)
        rhs = df[df["_side"] == 1]
        matched: dict[str, np.ndarray] = {
            c: np.full(len(lhs), None, dtype=object) for c in r_cols
        }
        if len(rhs) and len(lhs):
            rhs = rhs.sort_values(["_key", "_t"])
            r_groups = {k: g for k, g in rhs.groupby("_key", sort=False)}
            lt = lhs["_t"].to_numpy()
            for k, lg in lhs.groupby("_key", sort=False):  # one pass, no per-key scans
                rg = r_groups.get(k)
                if rg is None:
                    continue
                sel = lg.index.to_numpy()
                idx = np.searchsorted(rg["_t"].to_numpy(), lt[sel], side="right") - 1
                hit = idx >= 0
                for c in r_cols:
                    vals = rg[f"_r_{c}"].to_numpy()
                    matched[c][sel[hit]] = vals[idx[hit]]
        return _typed_out(
            lhs, l_names, l_types, {f"r_{c}": (matched[c], r_types[c]) for c in r_cols}
        )

    return tagged.groupby("_cb").map_groups(bucket_asof, batch_format="pandas")


def group_topk(
    ds: "ray.data.Dataset",
    group_col: str,
    order_cols: list[str],
    k: int,
    descending: bool | list[bool] = True,
    shuffle_buckets: int = 32,
) -> "ray.data.Dataset":
    """Top-k rows PER GROUP by ``order_cols`` (the generic form of A5's
    argmax; deterministic when ``order_cols`` ends in a unique
    tie-breaker). Coarse-bucketed: groups co-locate via
    ``hash(group) % shuffle_buckets`` and one pandas sort+head per bucket
    handles ALL of its groups — one UDF dispatch per bucket, not per
    group. Pre-trim: each input block keeps only its own per-group top-k
    before the shuffle, so at most ``k × groups`` rows per block move."""
    if isinstance(descending, bool):
        descending = [descending] * len(order_cols)
    ascending = [not d for d in descending]

    def trim(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        df = batch.to_pandas()
        out = (
            df.sort_values(order_cols, ascending=ascending, kind="mergesort")
            .groupby(group_col, sort=False, dropna=False)  # SQL keeps the NULL partition
            .head(k)
        )
        # bucket routing must be DTYPE-STABLE under nulls: hash only the
        # valid keys at their true Arrow dtype (a pandas conversion flips
        # int64→float64 when a batch happens to hold a null, splitting one
        # group across buckets); null-key rows get a dedicated bucket
        arr = pa.Array.from_pandas(out[group_col], type=batch.schema.field(group_col).type)
        valid = pc.is_valid(arr).to_numpy(zero_copy_only=False)
        cb = np.full(len(out), shuffle_buckets, dtype=np.int64)  # null bucket
        vv = arr.drop_null().to_numpy(zero_copy_only=False)
        if len(vv):
            cb[np.flatnonzero(valid)] = (
                stable_hash_array(vv) % np.uint64(shuffle_buckets)
            ).astype(np.int64)
        out = out.assign(_cb=cb)
        return pa.Table.from_pandas(out, preserve_index=False)

    def bucket_topk(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.drop(columns=["_cb"])
            .sort_values(order_cols, ascending=ascending, kind="mergesort")
            .groupby(group_col, sort=False, dropna=False)
            .head(k)
        )

    return (
        ds.map_batches(trim, batch_format="pyarrow")
        .groupby("_cb")
        .map_groups(bucket_topk, batch_format="pandas")
    )


def trailing_window_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    left_by: str,
    right_by: str,
    left_on: str,
    right_on: str,
    value_col: str,
    span_s: float,
    count_name: str = "n_right",
    sum_name: str = "sum_value",
    shuffle_buckets: int = 32,
) -> "ray.data.Dataset":
    """Range (interval) join + aggregate: for each left row, COUNT and SUM
    the right rows of the same key whose time lies in the trailing window
    ``(t − span_s, t]`` — "orders in the last 7 days per event", the
    feature-engineering staple. LEFT semantics: rows with no right match
    get count 0 / sum 0.0.

    Same union/bucket plumbing as :func:`asof_join`; inside a bucket each
    key's right side is sorted once, a prefix-sum array is built, and
    every left row resolves with TWO ``searchsorted`` calls — O((L+R) log
    R) per key, no row pairing ever materialized (a naive inequality join
    would be O(L×R) rows before aggregation, which is how the SQL oracle
    states it)."""
    tagged, l_names, r_cols, l_types, _r_types = _union_keyed(
        left, right, left_by, right_by, left_on, right_on, [value_col], shuffle_buckets
    )
    vcol = f"_r_{value_col}"

    def bucket_window(df: pd.DataFrame) -> pa.Table:
        lhs = df[df["_side"] == 0].reset_index(drop=True)
        rhs = df[df["_side"] == 1]
        counts = np.zeros(len(lhs), dtype=np.int64)
        sums = np.zeros(len(lhs), dtype=np.float64)
        if len(rhs) and len(lhs):
            rhs = rhs.sort_values(["_key", "_t"])
            r_groups = {k: g for k, g in rhs.groupby("_key", sort=False)}
            lt = lhs["_t"].to_numpy()
            span = (
                np.timedelta64(int(span_s * 1_000_000), "us")
                if np.issubdtype(lt.dtype, np.datetime64)
                else span_s
            )
            for k, lg in lhs.groupby("_key", sort=False):
                rg = r_groups.get(k)
                if rg is None:
                    continue
                sel = lg.index.to_numpy()
                rt = rg["_t"].to_numpy()
                cs = np.concatenate(
                    [[0.0], np.cumsum(rg[vcol].to_numpy(dtype=np.float64))]
                )
                lo = np.searchsorted(rt, lt[sel] - span, side="right")  # > t−span
                hi = np.searchsorted(rt, lt[sel], side="right")  # ≤ t
                counts[sel] = hi - lo
                sums[sel] = cs[hi] - cs[lo]
        return _typed_out(
            lhs,
            l_names,
            l_types,
            {count_name: (counts, pa.int64()), sum_name: (sums, pa.float64())},
        )

    return tagged.groupby("_cb").map_groups(bucket_window, batch_format="pandas")
