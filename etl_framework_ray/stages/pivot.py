"""Pivot (wide aggregate): ``GROUP BY key`` with one output column per
pivot-column value — SQL's ``COUNT/SUM(CASE WHEN pivot = v THEN ... END)``
per value, or DuckDB ``PIVOT``. The reshaping step feature pipelines use
to turn an event log into a per-entity feature row (counts and sums per
event type).

Execution shape: classic combiner + exchange. Each input block
pre-aggregates to NARROW partial rows ``(key, pivot_value, n, …)`` —
at most keys×values rows per block, the column's raw rows never
shuffle — then the partials co-locate by key on the direct exchange
(:func:`~.joins._direct_grouped_apply`) and one kernel per bucket sums
and reshapes to the wide layout.

Pivot values are either caller-supplied (``pivot_values``) or discovered
with a cheap distinct pass, capped by ``max_pivot_values`` (fail-loud —
a wide table with 10^5 columns is an error, not a layout). Column order
is the sorted value list, so the output schema is deterministic.

Semantics (SQL parity): NULL pivot values are skipped (a ``CASE WHEN
pivot = v`` never matches NULL). Count columns are 0 when a key has no
such rows (``COUNT`` semantics); sum columns are NULL when there are no
non-null values to add (``SUM`` semantics).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .analytic import _sum_dtype
from .joins import _direct_grouped_apply, _ensure_arrow, _mat_arrow


def _col_name(prefix: str, v) -> str:
    return f"{prefix}_{v}"


def pivot(
    ds: "object",
    key_col: str,
    pivot_col: str,
    value_col: str | None = None,
    agg: str = "count",
    pivot_values: list | None = None,
    max_pivot_values: int = 1000,
    shuffle_buckets: int | None = None,
):
    """One row per ``key_col`` value; per pivot value ``v`` a column
    ``n_<v>`` (agg="count") or ``sum_<v>`` (agg="sum" over
    ``value_col``). Returns a streaming Dataset."""
    if agg not in ("count", "sum"):
        raise ValueError("agg must be 'count' or 'sum'")
    if agg == "sum" and not value_col:
        raise ValueError("agg='sum' needs a value_col")

    ds, schema = _mat_arrow(ds)
    if schema is None:
        raise ValueError("pivot needs a non-empty schema")
    in_types = dict(zip(schema.names, schema.types))
    for c in (key_col, pivot_col, *( [value_col] if value_col else [] )):
        if c not in in_types:
            raise KeyError(f"column {c!r} not in dataset schema")
    key_t = in_types[key_col]
    pv_t = in_types[pivot_col]
    sum_t = _sum_dtype(in_types[value_col]) if agg == "sum" else None

    if pivot_values is None:
        # discovery: per-block distincts are tiny (≤ values per block);
        # the union lands on the driver as one small list
        def uniq(batch: pa.Table) -> pa.Table:
            u = pc.unique(batch.column(pivot_col).drop_null())
            return pa.table({"v": u})

        seen: set = set()
        for b in ds.map_batches(uniq, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ):
            seen.update(b.column("v").to_pylist())
            if len(seen) > max_pivot_values:
                raise ValueError(
                    f"pivot_col {pivot_col!r} has >{max_pivot_values} distinct "
                    "values — pass pivot_values explicitly or raise the cap"
                )
        pivot_values = sorted(seen)
    if not pivot_values:
        raise ValueError("no pivot values (empty input?) — pass pivot_values")
    pv_index = {v: i for i, v in enumerate(pivot_values)}
    prefix = "n" if agg == "count" else "sum"
    out_cols = [_col_name(prefix, v) for v in pivot_values]

    def partial(batch: pa.Table) -> pa.Table:
        cols = [key_col, pivot_col] + ([value_col] if agg == "sum" else [])
        df = batch.select(cols).to_pandas()
        df = df[df[pivot_col].notna()]
        if agg == "sum":
            g = df.groupby([key_col, pivot_col], sort=False, dropna=False).agg(
                _n=(value_col, "size"),
                _ns=(value_col, "count"),  # non-null values
                _s=(value_col, "sum"),
            )
        else:
            g = (
                df.groupby([key_col, pivot_col], sort=False, dropna=False)
                .size()
                .to_frame("_n")
            )
        g = g.reset_index()
        out = {
            key_col: pa.Array.from_pandas(g[key_col], type=key_t),
            "_pv": pa.Array.from_pandas(g[pivot_col], type=pv_t),
            "_n": pa.Array.from_pandas(g["_n"], type=pa.int64()),
        }
        if agg == "sum":
            out["_ns"] = pa.Array.from_pandas(g["_ns"], type=pa.int64())
            out["_s"] = pa.Array.from_pandas(g["_s"].fillna(0), type=sum_t)
        return pa.table(out)

    def kernel(df: pd.DataFrame) -> pa.Table:
        if len(df):
            agg_map = {"_n": "sum"} | (
                {"_ns": "sum", "_s": "sum"} if agg == "sum" else {}
            )
            w = df.groupby([key_col, "_pv"], sort=False, dropna=False).agg(agg_map)
            w = w.reset_index()
            # factorize, not a dict: NULL keys form their own group (SQL
            # GROUP BY parity) and NaN dict keys don't round-trip equality
            rows, keys = pd.factorize(w[key_col], use_na_sentinel=False)
            nk = len(keys)
            cols_ix = np.fromiter(
                (pv_index[v] for v in w["_pv"]), dtype=np.int64, count=len(w)
            )
            n_mat = np.zeros((nk, len(pivot_values)), dtype=np.int64)
            n_mat[rows, cols_ix] = w["_n"].to_numpy(dtype=np.int64)
            out = {key_col: pa.Array.from_pandas(pd.Series(keys), type=key_t)}
            if agg == "count":
                for j, c in enumerate(out_cols):
                    out[c] = pa.array(n_mat[:, j], type=pa.int64())
            else:
                ns_mat = np.zeros((nk, len(pivot_values)), dtype=np.int64)
                ns_mat[rows, cols_ix] = w["_ns"].to_numpy(dtype=np.int64)
                # accumulate at the OUTPUT dtype — int64 sums must not
                # round-trip through float64 (2^53 precision cliff)
                np_t = np.int64 if pa.types.is_integer(sum_t) else np.float64
                s_mat = np.zeros((nk, len(pivot_values)), dtype=np_t)
                s_mat[rows, cols_ix] = w["_s"].to_numpy(dtype=np_t)
                for j, c in enumerate(out_cols):
                    out[c] = pc.if_else(
                        pa.array(ns_mat[:, j] > 0),
                        pa.array(s_mat[:, j], type=sum_t),
                        pa.scalar(None, sum_t),
                    )
            return pa.table(out)
        empty_t = pa.int64() if agg == "count" else sum_t
        return pa.table(
            {
                key_col: pa.nulls(0, key_t),
                **{c: pa.nulls(0, empty_t) for c in out_cols},
            }
        )

    return _direct_grouped_apply(
        ds.map_batches(partial, batch_format="pyarrow"),
        key_col,
        kernel,
        shuffle_buckets,
    )


def unpivot(
    ds: "object",
    id_cols: list[str],
    value_cols: list[str],
    var_name: str = "name",
    value_name: str = "value",
    drop_null: bool = True,
):
    """Wide → long reshape: one output row per (input row, value column)
    — SQL's ``UNPIVOT (value FOR name IN (...))`` / pandas ``melt``, the
    inverse of :func:`pivot`. Embarrassingly parallel: a pure
    ``map_batches`` Arrow kernel (one zero-copy column slice per value
    column, concatenated), no shuffle, streams at any scale.

    Semantics (DuckDB UNPIVOT parity): NULL cells are dropped when
    ``drop_null`` (SQL's default — a row whose every value column is
    NULL vanishes); pass ``drop_null=False`` for pandas-``melt``
    behavior. Value columns unify to one common Arrow type (int → float
    widening; fails loud on incompatible types). Output column order:
    ``id_cols + [var_name, value_name]``; row order within a block is
    column-major (all of value_cols[0], then [1], …), which SQL never
    promises anyway."""
    if not value_cols:
        raise ValueError("value_cols must be non-empty")
    if var_name in id_cols or value_name in id_cols or var_name == value_name:
        raise ValueError("var_name/value_name collide with id_cols or each other")
    ds = _ensure_arrow(ds)  # no barrier: unpivot is a pure map stage
    schema = ds.schema()
    if schema is None:
        raise ValueError("unpivot needs a non-empty schema")
    types = dict(zip(schema.names, schema.types))
    for c in (*id_cols, *value_cols):
        if c not in types:
            raise KeyError(f"column {c!r} not in dataset schema")
    vts = [types[c] for c in value_cols]
    if all(t.equals(vts[0]) for t in vts):
        vt = vts[0]
    elif all(pa.types.is_integer(t) or pa.types.is_floating(t) for t in vts):
        # fail-loud unification: mixed numerics widen like SQL UNPIVOT
        vt = (
            pa.float64()
            if any(pa.types.is_floating(t) for t in vts)
            else pa.int64()
        )
    else:
        raise ValueError(f"value columns mix incompatible types: {vts}")

    def kernel(batch: pa.Table) -> pa.Table:
        parts = []
        for c in value_cols:
            v = batch.column(c).cast(vt)
            t = pa.table(
                {
                    **{i: batch.column(i) for i in id_cols},
                    var_name: pa.array([c] * batch.num_rows, pa.string()),
                    value_name: v,
                }
            )
            if drop_null:
                t = t.filter(pc.is_valid(v))
            parts.append(t)
        return pa.concat_tables(parts)

    return ds.map_batches(kernel, batch_format="pyarrow")
