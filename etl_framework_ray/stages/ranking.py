"""Global total-order ranking — the distributed ORDER BY: SQL's
``ROW_NUMBER()/RANK()/DENSE_RANK() OVER (ORDER BY ...)`` with an EMPTY
partition clause, which a Dataset ``sort()`` + driver enumeration cannot
express and a ``groupby().map_groups`` cannot shard (one global group).
The capability training pipelines use for corpus-wide ordering: quality
percentile cuts, "take the global top N%", deterministic curriculum
order, leaderboard exports.

Execution shape — the classic range exchange (TeraSort lineage;
cf. Dean & Ghemawat's sort benchmarks and every warehouse's ORDER BY):

1. SAMPLE: a bounded, deterministic per-block sample of the leading
   order column lands on the driver (O(sample), never the column) and
   yields ``nb-1`` range boundaries at sample quantiles.
2. ROUTE: one map round per ~CPU-sized group of blocks buckets rows by
   ``searchsorted(boundaries, value)`` — a pure function of the VALUE,
   so peer rows (equal leading keys) always co-locate, which is what
   makes per-bucket rank arithmetic exact, boundary collisions included.
   NULL keys route to a dedicated edge bucket (SQL NULLS LAST/FIRST).
3. LOCAL RANK: one task per bucket sorts its slice by the full
   ``order_cols`` and computes local row_number / rank / dense_rank,
   returning the ranked block PLUS a tiny ``(n_rows, n_peer_groups)``
   stats tuple (``num_returns=2`` — the data never revisits the driver).
4. OFFSET: the driver prefix-sums the O(buckets) stats and one trivial
   task per bucket adds ``(rows_before, groups_before)`` to the local
   ranks. Exact because step 2 guarantees no peer group spans buckets.

Ranks are computed over the ``peer_cols`` PREFIX of ``order_cols``
(default: all of them): ``row_number`` uses the full list — pass a
unique tie-breaker last to make it deterministic, exactly SQL's
contract — while ``rank``/``dense_rank`` treat rows equal on the prefix
as peers, i.e. ``RANK() OVER (ORDER BY prefix...)``.

Skew note (the scale contract): bucket population follows the sampled
distribution of the LEADING column; a single value holding >1/nb of all
rows forms one oversized bucket that cannot be split (its peers must
co-locate). If a leading column is that hot, rank on a finer composite.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .joins import (
    _block_refs,
    _mat_arrow_unified,
    _single_threaded_arrow,
    resolve_buckets,
)
from .util import null_safe_from_pandas

_RANKS = ("row_number", "rank", "dense_rank")


def _sample_boundaries(ds, col: str, nb: int, per_block: int) -> np.ndarray:
    """Deterministic evenly-spaced per-block sample of ``col`` → sorted
    ``nb-1`` range boundaries (driver memory O(blocks × per_block))."""

    def sample(batch: pa.Table) -> pa.Table:
        c = batch.column(col).drop_null()
        n = len(c)
        if n == 0:
            return pa.table({"v": pa.nulls(0, batch.schema.field(col).type)})
        idx = np.unique(np.linspace(0, n - 1, min(per_block, n)).astype(np.int64))
        return pa.table({"v": c.take(pa.array(idx))})

    vals: list = []
    for b in ds.map_batches(sample, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        vals.append(b.column("v").to_numpy(zero_copy_only=False))
    v = np.sort(np.concatenate(vals)) if vals else np.array([])
    if len(v) == 0:
        return v
    qpos = (np.arange(1, nb) * len(v)) // nb
    return np.unique(v[qpos])


@ray.remote
def _range_split_task(
    col: str,
    names: list[str],
    types: dict,
    bounds,
    nb_val: int,
    desc: bool,
    nulls_last: bool,
    *blocks,
):
    """Map round: bucket a group of blocks by range of the leading order
    column (value buckets 0..nb_val-1, plus one edge bucket for NULLs)
    and return ``nb_val+1`` slices, ``_split_side_task``-style."""
    _single_threaded_arrow()
    nb = nb_val + 1

    def norm(b) -> pa.Table | None:
        t = pa.Table.from_pandas(b, preserve_index=False) if isinstance(b, pd.DataFrame) else b
        if t.num_rows == 0:
            return None
        return pa.table({c: t.column(c).cast(types[c]) for c in names})

    slims = [s for s in (norm(b) for b in blocks) if s is not None]
    if not slims:
        empty = pa.table({c: pa.nulls(0, types[c]) for c in names})
        return tuple(empty for _ in range(nb)) if nb > 1 else empty
    t = pa.concat_tables(slims) if len(slims) > 1 else slims[0]
    import pyarrow.compute as pc

    arr = t.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    valid = pc.is_valid(arr).to_numpy(zero_copy_only=False)
    null_bucket = nb - 1 if nulls_last else 0
    val_base = 0 if nulls_last else 1
    pid = np.full(t.num_rows, null_bucket, dtype=np.int64)
    vv = arr.drop_null().to_numpy(zero_copy_only=False)
    if len(vv):
        idx = np.searchsorted(bounds, vv, side="left") if len(bounds) else np.zeros(len(vv), np.int64)
        if desc:
            idx = (nb_val - 1) - idx
        pid[np.flatnonzero(valid)] = val_base + idx
    order = np.argsort(pid, kind="stable")
    t = t.take(pa.array(order))
    cuts = np.searchsorted(pid[order], np.arange(nb + 1))
    slices = tuple(t.slice(cuts[i], cuts[i + 1] - cuts[i]) for i in range(nb))
    return slices if nb > 1 else slices[0]


@ray.remote(num_returns=2)
def _rank_bucket_task(
    order_cols: list[str],
    ascending: list[bool],
    n_peer: int,
    ranks: tuple,
    names: list[str],
    types: dict,
    nulls_last: bool,
    *pieces: pa.Table,
):
    """Reduce round: sort this bucket by the full order, compute LOCAL
    ranks, and return ``(ranked_table, (n_rows, n_peer_groups))``."""
    _single_threaded_arrow()
    t = pa.concat_tables(pieces)
    if t.num_rows == 0:
        empty = pa.table(
            {**{c: pa.nulls(0, types[c]) for c in names},
             **{r: pa.nulls(0, pa.int64()) for r in ranks}}
        )
        return empty, (0, 0)
    df = t.to_pandas()
    df = df.sort_values(
        order_cols,
        ascending=ascending,
        kind="mergesort",
        na_position="last" if nulls_last else "first",
    ).reset_index(drop=True)
    n = len(df)
    peers = df[order_cols[:n_peer]]
    new_grp = (~peers.duplicated()).to_numpy()
    dense_local = np.cumsum(new_grp)  # 1-based
    starts = np.flatnonzero(new_grp)  # 0-based first row of each peer group
    out = {c: null_safe_from_pandas(df[c], types[c]) for c in names}
    for r in ranks:  # caller's order — every bucket must agree on schema
        if r == "row_number":
            out[r] = pa.array(np.arange(1, n + 1, dtype=np.int64))
        elif r == "rank":
            out[r] = pa.array((starts[dense_local - 1] + 1).astype(np.int64))
        else:
            out[r] = pa.array(dense_local.astype(np.int64))
    return pa.table(out), (n, int(dense_local[-1]))


@ray.remote
def _shift_task(ranks: tuple, row_off: int, grp_off: int, t: pa.Table) -> pa.Table:
    """Add this bucket's global offsets to its local ranks."""
    _single_threaded_arrow()
    import pyarrow.compute as pc

    for r in ranks:
        off = grp_off if r == "dense_rank" else row_off
        if off:
            i = t.schema.get_field_index(r)
            t = t.set_column(i, r, pc.add(t.column(r), pa.scalar(off, pa.int64())))
    return t


def global_ranks(
    ds: "ray.data.Dataset",
    order_cols: list[str],
    descending: bool | list[bool] = False,
    peer_cols: int | None = None,
    ranks: tuple = _RANKS,
    nulls: str = "last",
    sample_per_block: int = 64,
    shuffle_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Append global ``row_number`` / ``rank`` / ``dense_rank`` columns
    under one total ``ORDER BY order_cols``.

    ``peer_cols``: how many leading order columns define rank peers
    (default all). ``nulls``: ``"last"`` / ``"first"`` — position of
    NULL leading keys, matching the oracle's NULLS LAST/FIRST. Output is
    a streaming Dataset of the input columns + requested rank columns;
    block order follows bucket order (ascending global rank).
    """
    if not order_cols:
        raise ValueError("order_cols must be non-empty")
    if isinstance(descending, bool):
        descending = [descending] * len(order_cols)
    if len(descending) != len(order_cols):
        raise ValueError("descending must match order_cols")
    n_peer = len(order_cols) if peer_cols is None else int(peer_cols)
    if not 1 <= n_peer <= len(order_cols):
        raise ValueError("peer_cols must be a non-empty prefix of order_cols")
    ranks = tuple(ranks)
    for r in ranks:
        if r not in _RANKS:
            raise ValueError(f"unknown rank spec {r!r} (use {_RANKS})")
    if nulls not in ("last", "first"):
        raise ValueError("nulls must be 'last' or 'first'")

    ds, schema = _mat_arrow_unified(ds)
    if schema is None:
        raise ValueError("global_ranks needs a non-empty schema")
    names = list(schema.names)
    types = dict(zip(schema.names, schema.types))
    for c in order_cols:
        if c not in types:
            raise KeyError(f"order column {c!r} not in dataset schema")
    for r in ranks:
        if r in names:
            raise ValueError(f"dataset already has a column named {r!r}")

    refs = _block_refs(ds)
    if not refs:
        return ray.data.from_arrow(
            pa.table({**{c: pa.nulls(0, types[c]) for c in names},
                      **{r: pa.nulls(0, pa.int64()) for r in ranks}})
        )
    lead = order_cols[0]
    nb_val = resolve_buckets(shuffle_buckets)
    bounds = _sample_boundaries(ds, lead, nb_val, sample_per_block)
    nb_val = len(bounds) + 1  # distinct boundaries define the real ranges
    nb = nb_val + 1  # + NULL edge bucket
    nulls_last = nulls == "last"

    cpus = int(ray.cluster_resources().get("CPU", 8))
    n_tasks = min(len(refs), max(1, cpus))
    groups = [refs[i::n_tasks] for i in range(n_tasks)]
    outs = [
        _range_split_task.options(num_returns=nb).remote(
            lead, names, types, bounds, nb_val, descending[0], nulls_last, *grp
        )
        for grp in groups
    ]
    splits = [[o] for o in outs] if nb == 1 else outs
    ascending = [not d for d in descending]
    ranked, stats = [], []
    for i in range(nb):
        tref, sref = _rank_bucket_task.remote(
            order_cols, ascending, n_peer, ranks, names, types, nulls_last,
            *[s[i] for s in splits],
        )
        ranked.append(tref)
        stats.append(sref)
    counts = ray.get(stats)  # O(buckets) tuples — the only driver traffic
    if not ranks:  # pure global sort: no offsets to apply
        return ray.data.from_arrow_refs(ranked)
    row_off = np.concatenate([[0], np.cumsum([c[0] for c in counts])[:-1]])
    grp_off = np.concatenate([[0], np.cumsum([c[1] for c in counts])[:-1]])
    shifted = [
        _shift_task.remote(ranks, int(row_off[i]), int(grp_off[i]), ranked[i])
        for i in range(nb)
    ]
    return ray.data.from_arrow_refs(shifted)


def global_sort(
    ds: "ray.data.Dataset",
    order_cols: list[str],
    descending: bool | list[bool] = False,
    nulls: str = "last",
    sample_per_block: int = 64,
    shuffle_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Distributed total-order SORT: the same range exchange as
    :func:`global_ranks` without the rank columns — output blocks stream
    in global ``ORDER BY order_cols`` order (bucket ``i``'s every row
    precedes bucket ``i+1``'s; rows are sorted within each bucket), the
    shape an ordered export consumes directly. Unlike ``Dataset.sort``
    this pins the boundary sample deterministically and keeps the
    one-map-one-reduce exchange of the rest of the engine."""
    return global_ranks(
        ds,
        order_cols,
        descending=descending,
        ranks=(),
        nulls=nulls,
        sample_per_block=sample_per_block,
        shuffle_buckets=shuffle_buckets,
    )


def export_sorted(
    ds: "ray.data.Dataset",
    out_dir: str,
    order_cols: list[str],
    descending: bool | list[bool] = False,
    nulls: str = "last",
    shuffle_buckets: int | None = None,
) -> dict:
    """Distributed ORDER BY → resumable ordered parquet export: sort with
    :func:`global_sort`, then write one ``part-NNNNN.parquet`` per range
    bucket IN GLOBAL ORDER (reading parts in filename order replays the
    total order), committed atomically per part (tmp + rename) with a
    final ``_SUCCESS`` marker naming the part list — a crashed export
    rewrites only missing parts on rerun. Returns ``{parts, rows}``."""
    import json
    import os

    done_marker = os.path.join(out_dir, "_SUCCESS")
    os.makedirs(out_dir, exist_ok=True)
    srt = global_sort(
        ds, order_cols, descending=descending, nulls=nulls,
        shuffle_buckets=shuffle_buckets,
    )
    refs = _block_refs(srt)

    @ray.remote
    def _write_part(i: int, t: pa.Table) -> tuple:
        _single_threaded_arrow()
        import pyarrow.parquet as pq

        name = f"part-{i:05d}.parquet"
        path = os.path.join(out_dir, name)
        if os.path.exists(path):  # resume: finished parts are skipped
            return name, -1
        tmp = path + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, path)  # atomic commit point per part
        return name, t.num_rows

    results = ray.get([_write_part.remote(i, r) for i, r in enumerate(refs)])
    parts = [n for n, _ in results]
    rows = sum(max(r, 0) for _, r in results)
    tmp = done_marker + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"parts": parts, "order_cols": order_cols}, fh)
    os.replace(tmp, done_marker)
    return {"parts": len(parts), "rows": rows}
