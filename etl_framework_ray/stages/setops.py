"""Relational set operations — SQL ``INTERSECT [ALL]`` / ``EXCEPT
[ALL]`` / ``UNION`` (distinct) over two datasets with a common schema,
with exact BAG semantics for the ``ALL`` forms (multiplicity min /
saturating difference), which no composition of joins reproduces once
duplicates exist. The audit primitives: "rows in yesterday's export but
not today's", "events present in both shards", regression diffs between
pipeline versions.

Execution shape: combiner + one exchange. Each input block reduces to
DISTINCT rows + a count per side (``_n0``/``_n1``) — duplicates collapse
before the shuffle, so the exchange carries at most one row per distinct
value per block. Rows co-locate on the direct hash exchange
(:func:`~.joins._direct_grouped_apply`) via a dtype-safe encoded key of
ALL columns, and one kernel per bucket merges counts and emits each
row's output multiplicity:

- ``intersect_all``: ``min(n0, n1)`` copies; ``intersect``: 1 if both.
- ``except_all``: ``max(0, n0 - n1)`` copies; ``except_``: 1 if only
  left (SQL EXCEPT DISTINCT: present left, absent right).
- ``union_distinct``: 1 copy if present anywhere.

Semantics (SQL parity): NULLs compare equal inside set ops (two
``(1, NULL)`` rows ARE the same row — unlike joins), and the encoded
routing key preserves that. Output column types follow the LEFT side;
the right side must carry the same column NAMES (reordered is fine) and
castable types — fail-loud otherwise.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from .joins import _direct_grouped_apply, _mat_arrow_unified
from .util import null_safe_from_pandas

_SEP = "\x1f"
_NULL = "\x00"

_MODES = ("intersect", "intersect_all", "except", "except_all", "union")


def _encode_key(df: pd.DataFrame, cols: list[str]) -> pd.Series:
    """Deterministic equality-preserving routing string over all columns
    (NULL-safe; collisions only co-bucket, never merge)."""
    key = pd.Series("", index=df.index, dtype=object)
    for c in cols:
        col = df[c]
        enc = col.astype(str).where(col.notna(), _NULL)
        key = key + _SEP + enc
    return key


def _set_op(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    mode: str,
    shuffle_buckets: int | None = None,
) -> "ray.data.Dataset":
    assert mode in _MODES
    left, l_schema = _mat_arrow_unified(left)
    right, r_schema = _mat_arrow_unified(right)
    if l_schema is None:
        raise ValueError("left dataset has no schema (empty input?)")
    cols = list(l_schema.names)
    types = dict(zip(l_schema.names, l_schema.types))
    if r_schema is not None and sorted(r_schema.names) != sorted(cols):
        raise ValueError(
            f"set ops need matching column names: {sorted(cols)} vs "
            f"{sorted(r_schema.names)}"
        )
    if r_schema is not None:
        # a side whose column is all-NULL infers Arrow `null`; take the
        # other side's real type so casts stay possible in both partials
        r_types = dict(zip(r_schema.names, r_schema.types))
        for c in cols:
            if pa.types.is_null(types[c]) and not pa.types.is_null(r_types[c]):
                types[c] = r_types[c]
    for rc in ("_n0", "_n1", "_gk"):
        if rc in cols:
            raise ValueError(f"dataset may not contain a column named {rc!r}")

    def make_partial(side: int):
        def partial(batch: pa.Table) -> pa.Table:
            from ..pipelines.cdc import _single_threaded_arrow

            _single_threaded_arrow()
            df = batch.select(cols).to_pandas()
            g = df.groupby(cols, dropna=False, sort=False).size().reset_index(name="_n")
            out = {c: null_safe_from_pandas(g[c], types[c]) for c in cols}
            n = g["_n"].to_numpy(np.int64)
            zero = np.zeros(len(g), np.int64)
            out["_n0"] = pa.array(n if side == 0 else zero)
            out["_n1"] = pa.array(n if side == 1 else zero)
            out["_gk"] = pa.Array.from_pandas(_encode_key(g, cols), type=pa.string())
            return pa.table(out)

        return partial

    l_part = left.map_batches(make_partial(0), batch_format="pyarrow", batch_size=None)
    parts = l_part
    if r_schema is not None:
        # cast the right side onto the left's types inside its partial
        def r_cast(batch: pa.Table) -> pa.Table:
            return pa.table({c: batch.column(c).cast(types[c]) for c in cols})

        r_part = right.map_batches(
            r_cast, batch_format="pyarrow", batch_size=None
        ).map_batches(make_partial(1), batch_format="pyarrow", batch_size=None)
        parts = l_part.union(r_part)

    def kernel(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return pa.table({c: pa.nulls(0, types[c]) for c in cols})
        g = (
            df.groupby(cols, dropna=False, sort=False)
            .agg(_n0=("_n0", "sum"), _n1=("_n1", "sum"))
            .reset_index()
        )
        n0 = g["_n0"].to_numpy(np.int64)
        n1 = g["_n1"].to_numpy(np.int64)
        if mode == "intersect":
            reps = ((n0 > 0) & (n1 > 0)).astype(np.int64)
        elif mode == "intersect_all":
            reps = np.minimum(n0, n1)
        elif mode == "except":
            reps = ((n0 > 0) & (n1 == 0)).astype(np.int64)
        elif mode == "except_all":
            reps = np.maximum(n0 - n1, 0)
        else:  # union (distinct)
            reps = ((n0 > 0) | (n1 > 0)).astype(np.int64)
        idx = np.repeat(np.arange(len(g), dtype=np.int64), reps)
        return pa.table(
            {c: null_safe_from_pandas(g[c].iloc[idx], types[c]) for c in cols}
        )

    return _direct_grouped_apply(parts, "_gk", kernel, shuffle_buckets)


def intersect(left, right, shuffle_buckets=None):
    """SQL ``INTERSECT`` (distinct rows present on BOTH sides)."""
    return _set_op(left, right, "intersect", shuffle_buckets)


def intersect_all(left, right, shuffle_buckets=None):
    """SQL ``INTERSECT ALL`` (each row ``min(count_left, count_right)`` times)."""
    return _set_op(left, right, "intersect_all", shuffle_buckets)


def except_(left, right, shuffle_buckets=None):
    """SQL ``EXCEPT`` (distinct left rows absent from the right)."""
    return _set_op(left, right, "except", shuffle_buckets)


def except_all(left, right, shuffle_buckets=None):
    """SQL ``EXCEPT ALL`` (each row ``max(0, count_left - count_right)`` times)."""
    return _set_op(left, right, "except_all", shuffle_buckets)


def union_distinct(left, right, shuffle_buckets=None):
    """SQL ``UNION`` (distinct rows of both sides)."""
    return _set_op(left, right, "union", shuffle_buckets)
