"""Vectorized last-writer-wins (LWW) reduction over Arrow tables.

The CDC engine's core per-key semantics: among all change events (and the
existing lake row) for a key ``(conv_id, turn_idx)``, the one with the
greatest ``(ts, lsn)`` wins; delete events are tombstones. This generalizes
the reference's MERGE upsert — ``whenMatchedUpdateAll`` / ``whenNotMatched
InsertAll`` on PK equality (/root/reference/src/models/writer.py:42-67) —
replacing Spark's "source wins" with an explicit commutative LWW order so
replay of any permutation of a batch converges (SURVEY.md §2.9).

Everything here is Arrow/numpy-vectorized: sort → adjacent-diff group
boundaries → filter. No per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["lww_reduce", "last_per_key_mask"]


def _codes(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Integer codes such that equal values get equal codes (for adjacent
    comparison on a sorted table)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if pa.types.is_dictionary(t):
        return col.indices.to_numpy(zero_copy_only=False)
    if (
        pa.types.is_string(t)
        or pa.types.is_large_string(t)
        or pa.types.is_binary(t)
        or pa.types.is_large_binary(t)
    ):
        return pc.dictionary_encode(col).indices.to_numpy(zero_copy_only=False)
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        return col.cast(pa.int64()).to_numpy(zero_copy_only=False)
    return col.to_numpy(zero_copy_only=False)


def last_per_key_mask(sorted_tbl: pa.Table, key_cols: tuple[str, ...]) -> np.ndarray:
    """Boolean mask selecting the LAST row of each key group of a table
    already sorted by ``key_cols`` (+ any order columns)."""
    n = sorted_tbl.num_rows
    if n == 0:
        return np.zeros(0, dtype=bool)
    mask = np.zeros(n, dtype=bool)
    mask[-1] = True
    for k in key_cols:
        vals = _codes(sorted_tbl.column(k))
        mask[:-1] |= vals[:-1] != vals[1:]
    return mask


def lww_survivor_indices(
    tbl: pa.Table,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    order_cols: tuple[str, ...] = ("ts", "lsn"),
) -> np.ndarray:
    """Original-row indices of the per-key winners, in key-sorted order.

    Touches ONLY the narrow key/order columns (sort + boundary mask) — no
    payload bytes move. Callers decide when to pay the single wide gather,
    and can fuse it with other reorderings (e.g. the hash-partition split)
    so the text column is copied exactly once per stage.
    """
    narrow = tbl.select([*key_cols, *order_cols])
    sort_keys = [(k, "ascending") for k in (*key_cols, *order_cols)]
    idx = pc.sort_indices(narrow, sort_keys=sort_keys)
    keys_sorted = narrow.select(list(key_cols)).take(idx)
    mask = last_per_key_mask(keys_sorted, key_cols)
    return idx.to_numpy(zero_copy_only=False)[mask]


def lww_reduce(
    tbl: pa.Table,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    order_cols: tuple[str, ...] = ("ts", "lsn"),
) -> pa.Table:
    """Keep, per key tuple, the single row with the greatest order tuple.

    Stable under duplicate delivery: two rows with identical
    ``(key, order)`` are the same event re-delivered, so either copy is
    correct. Used both as the per-batch shuffle *combiner* (cuts shuffle
    bytes for hot conversations before the groupby) and as the
    per-partition merge reduction.
    """
    if tbl.num_rows <= 1:
        return tbl
    return tbl.take(pa.array(lww_survivor_indices(tbl, key_cols, order_cols)))
