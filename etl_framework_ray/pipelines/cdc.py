"""The CDC apply pipeline: changelog epoch → hash exchange by conv_id →
per-partition LWW merge-on-read deltas → exactly-once commit.

Ray-first realization of the reference's MERGE upsert
(/root/reference/src/models/writer.py:42-67) at binlog scale:

1. **Map round** — one task per changelog segment: zero-copy Arrow read,
   normalize to the (possibly evolved) epoch schema, vectorized LWW
   *combiner* (drops superseded events before any exchange — the
   partial-aggregation pattern, and the salting story for hot
   conversations: each key collapses to ≤1 row per segment), hash-split
   by ``siphash(conv_id) % P`` into P sub-tables (``num_returns=P``).
2. **Reduce round** — one task per partition: concat its pieces from all
   segments, LWW-reduce on ``(conv_id, turn_idx)`` by ``(ts, _lsn)``, and
   write ONE file: a *delta* (just this epoch's reduced changes — apply
   never touches existing data) or, past ``compact_every`` live files, a
   *base* that folds the partition's stack (LSM merge-on-read; write
   volume O(changes) + O(table)/compact_every). Tombstones stay in lake
   files so late re-delivery of an older event cannot resurrect a deleted
   key. Retries are idempotent: deterministic content + path, atomic
   replace.
3. **Commit** — the driver collects the tiny per-partition meta rows,
   writes lineage metrics, and atomically publishes one new manifest
   version. Readers only see manifest-listed files, so a kill at ANY
   point either replays a not-yet-visible epoch or skips a committed one —
   exactly-once.

Snapshot reads are per-partition merge-on-read (base+deltas → LWW →
drop tombstones), key-sorted within partitions (stable turn ordering is
partition-local by design).

Two exchange implementations (``exchange=`` ctor arg):
- ``"ray"`` (default): the direct two-round map/reduce above — minimal
  scheduling rounds; assumes segments_per_epoch × num_partitions object
  refs stay bounded.
- ``"sort"``: ``Dataset.groupby("pid").map_groups`` sort-shuffle — more
  fixed cost per epoch, but consolidates for cluster-scale epochs where
  the ref-matrix would explode.

The crossover is MEASURED, not assumed (``bench --refmatrix``: one 1M-
event epoch of 32 segments at P ∈ {64…4096} under both exchanges): the
direct exchange wins through 8 192 refs/epoch, loses from 32 768
(1.75 s vs 1.33 s) and collapses at 131 072 (7.7 s vs 2.4 s — the
scheduler knees on the ref matrix). ``auto_sort_refs`` (ctor, default
the measured 32 768 knee) routes any epoch past the bound through the
sort exchange automatically — counted in ``auto_sort_switches`` and
logged, never silent; pipelined replay/tail gate their prefetch on the
same bound.

Scale notes (100 TB): ``num_partitions`` bounds the merge unit — size it
so one partition's live data fits a worker (4096+ partitions for a 100 TB
table); an epoch only writes partitions it touches, and compaction
amortizes the full rewrite across ``compact_every`` epochs.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from ..context import DEFAULT_NUM_PARTITIONS, RunContext
from ..functions.hashing import partition_ids, salted_partition_ids, stable_hash_array
from ..sources.changelog import ChangeLog, Epoch
from ..stages.lww import lww_reduce, lww_survivor_indices
from ..state.manifest import CommitConflict, Manifest, ManifestStore, PartitionState
from ..state.planner import plan_evolution
from ..state import zonemap as zone
from ..state.schema import (
    DELETED_COL,
    LSN_COL,
    TRANSCRIPTS,
    TableSpec,
    lake_schema,
    merge_schemas,
    normalize_table,
    schema_to_b64,
)
from . import metrics as metrics_mod

def _single_threaded_arrow() -> None:
    """Pin Arrow's intra-kernel thread pool to 1 inside Ray workers.

    Ray schedules one task per CPU; pyarrow kernels (sort_indices, take,
    parquet encode) otherwise fan out onto Arrow's global pool sized to ALL
    cores, so N concurrent tasks × N Arrow threads oversubscribe the node
    quadratically — measured 3× slowdown at 32 CPUs. Idempotent, per
    worker process."""
    if pa.cpu_count() != 1:
        pa.set_cpu_count(1)
        pa.set_io_thread_count(1)
        try:
            # keep jemalloc pages resident per worker: the default (decay 0)
            # returns every large allocation to the OS immediately, so each
            # task re-faults its whole working set — measurable contention
            # when many memory-heavy tasks start together
            pa.jemalloc_set_decay_ms(-1)
        except (NotImplementedError, OSError):  # non-jemalloc builds
            pass


_META_SCHEMA = pa.schema(
    [
        pa.field("pid", pa.int64()),
        pa.field("path", pa.string()),
        pa.field("mode", pa.string()),  # delta | base (compaction)
        pa.field("rows_live", pa.int64()),
        pa.field("tombstones", pa.int64()),
        pa.field("bytes", pa.int64()),
        pa.field("events", pa.int64()),
        #: set when a compacting apply also persisted the epoch's changes
        #: as a retained changefeed delta
        pa.field("retained_path", pa.string()),
        #: JSON zone-map stats of the written file (state/zonemap shape)
        pa.field("zone_stats", pa.string()),
        #: partial images (op="P") discarded by the patch fold: late, on a
        #: deleted base, or with no base at all (never silent)
        pa.field("patches_discarded", pa.int64()),
    ]
)


def _zone_cols(lake_sch: pa.Schema) -> list[str]:
    """Columns tracked by zone-map stats: the public (payload + ts)
    columns — bookkeeping columns prune by file NAMING (epoch ranges),
    not stats. Unsupported types are dropped by the stats kernel."""
    return [n for n in lake_sch.names if n not in (LSN_COL, DELETED_COL)]

#: changelog envelope columns that are not row payload
_ENVELOPE = ("lsn", "op")

#: CDCEngine(changefeed_retention_lsn=INHERIT) — use the horizon persisted
#: in the table manifest (the default). The horizon is TABLE config, not
#: per-process config: a maintenance engine (CLI replay/compact/vacuum)
#: that omits the argument must not silently disable retention and destroy
#: the retained-deltas registry. Pass an explicit ``None`` to disable.
INHERIT = "__inherit__"


@dataclass
class ReplayStats:
    epochs_applied: int = 0
    epochs_skipped: int = 0
    events: int = 0
    seconds: float = 0.0
    schema_changes: list[str] = field(default_factory=list)

    @property
    def events_per_sec(self) -> float:
        return self.events / self.seconds if self.seconds > 0 else 0.0


def _changes_to_lake_rows(changes: pa.Table, lake_sch: pa.Schema) -> pa.Table:
    """Changelog rows → lake-row form: payload + ts + _lsn + _deleted."""
    cols = []
    for f in lake_sch:
        if f.name == LSN_COL:
            cols.append(changes.column("lsn").cast(pa.int64()))
        elif f.name == DELETED_COL:
            cols.append(pc.equal(changes.column("op"), "D"))
        else:
            cols.append(changes.column(f.name).cast(f.type))
    return pa.Table.from_arrays(cols, schema=lake_sch)


def _lww_order(schema: pa.Schema, lsn_col: str) -> tuple[str, ...]:
    """LWW order columns: event-time ``ts`` (when the table has one) broken
    by log position; pure-LSN order for tables without an event-time
    column (e.g. metadata/SLO tables keyed on natural keys)."""
    return ("ts", lsn_col) if "ts" in schema.names else (lsn_col,)


def pruned_lake_schema(
    lake_sch: pa.Schema, key_cols: tuple[str, ...], columns: list[str]
) -> pa.Schema:
    """Lake schema restricted to what a column-projected merge-on-read
    still needs: the primary key, the LWW order columns, the tombstone
    flag, and the REQUESTED payload columns — everything else (at 100 TB,
    usually the wide ``text`` column) never leaves the parquet files."""
    need = (
        set(key_cols)
        | set(_lww_order(lake_sch, LSN_COL))
        | {LSN_COL, DELETED_COL}
        | set(columns)
    )
    return pa.schema([f for f in lake_sch if f.name in need])


def merge_partition_files(
    files: list[str],
    lake_sch: pa.Schema,
    key_cols: tuple[str, ...],
    conjuncts=None,
) -> pa.Table:
    """Merge-on-read of one partition: concat its base+delta files (oldest
    first), LWW-reduce on the key. Output is key-sorted and still carries
    tombstones + bookkeeping columns. ``conjuncts`` skip row groups by
    footer stats (PK-only under merge — see _iter_file_chunks)."""
    if not files:
        return lake_sch.empty_table()

    def read_pruned(f: str) -> pa.Table:
        pf = pq.ParquetFile(f)
        have = set(pf.schema_arrow.names)
        cols = [n for n in lake_sch.names if n in have]
        keep = zone.qualifying_row_groups(pf, conjuncts) if conjuncts else None
        if keep == []:
            return pf.schema_arrow.empty_table().select(cols)
        if keep is None:
            return pf.read(columns=cols)
        return pf.read_row_groups(keep, columns=cols)

    tables = [normalize_table(read_pruned(f), lake_sch) for f in files]
    t = pa.concat_tables(tables) if len(tables) > 1 else tables[0]
    if not key_cols:
        return t  # PK-less (append-only) table: plain concat, no reduce
    return lww_reduce(t, key_cols, _lww_order(lake_sch, LSN_COL))


def _iter_side_chunks(
    files: list[str], lake_sch: pa.Schema, key_cols: tuple[str, ...], chunk_rows: int
):
    """Key-sorted, unique-key, key-COMPLETE chunk stream of one version's
    partition stack: the streamed k-way merge when the layout allows
    (engine-written files, ≤2-col PK), else one whole-partition chunk."""
    if files and key_cols and len(key_cols) <= 2 and _is_cdc_sorted(list(files)):
        yield from iter_merged_partition(list(files), lake_sch, key_cols, chunk_rows=chunk_rows)
    else:
        t = merge_partition_files(list(files), lake_sch, key_cols)
        if t.num_rows:
            yield t


def _diff_tables(
    w0: pa.Table,
    w1: pa.Table,
    lake_sch: pa.Schema,
    key_cols: tuple[str, ...],
    public: list[str],
    out_schema: pa.Schema,
) -> pa.Table:
    """I/U/D compare of two key-aligned LWW states (tombstones included).
    The join runs on NARROW columns only; I/U payload is gathered once
    from the newer side."""
    import numpy as np

    narrow = [*key_cols, *(["ts"] if "ts" in lake_sch.names else []), LSN_COL, DELETED_COL]
    n0 = w0.select(narrow).to_pandas()
    n0["_i0"] = np.arange(len(n0))
    n1 = w1.select(narrow).to_pandas()
    n1["_i1"] = np.arange(len(n1))
    m = n0.merge(n1, on=list(key_cols), how="outer", suffixes=("_0", "_1"))
    # eq(False) is NaN-safe: an absent side is never "live"
    live0 = m["_i0"].notna() & m[f"{DELETED_COL}_0"].eq(False)
    live1 = m["_i1"].notna() & m[f"{DELETED_COL}_1"].eq(False)
    changed = m[f"{LSN_COL}_0"] != m[f"{LSN_COL}_1"]
    if "ts" in lake_sch.names:
        changed |= m["ts_0"] != m["ts_1"]
    ins = live1 & ~live0
    upd = live1 & live0 & changed
    dele = live0 & ~live1
    pieces: list[pa.Table] = []
    for mask, tag in ((ins, "I"), (upd, "U")):
        idx = m.loc[mask, "_i1"].to_numpy(dtype=np.int64)
        if len(idx):
            rows = w1.select(public).take(pa.array(np.sort(idx)))
            pieces.append(rows.add_column(0, "diff_op", pa.array([tag] * len(idx))))
    if dele.any():
        kd = m.loc[dele, list(key_cols)].sort_values(list(key_cols))
        cols: dict = {"diff_op": pa.array(["D"] * len(kd))}
        for name in public:
            if name in key_cols:
                cols[name] = pa.Array.from_pandas(kd[name], type=lake_sch.field(name).type)
            else:
                cols[name] = pa.nulls(len(kd), lake_sch.field(name).type)
        pieces.append(pa.table(cols, schema=out_schema))
    return pa.concat_tables(pieces) if pieces else out_schema.empty_table()


def _diff_partition_chunks(
    files0: list[str],
    files1: list[str],
    lake_sch: pa.Schema,
    key_cols: tuple[str, ...],
    public: list[str],
    out_schema: pa.Schema,
    chunk_rows: int = 65536,
):
    """STREAMING two-version diff of one partition: walk both stacks'
    merged chunk streams in lockstep, slicing both at the lexicographic
    min of their buffers' LAST keys — every key ≤ the pivot is complete
    on BOTH sides (each stream is key-sorted with unique keys), so the
    chunk compare is exact. Peak memory O(chunk × files per side), same
    bound as the snapshot merge — a diff never holds a partition."""
    import numpy as np

    two = len(key_cols) == 2
    sources = [
        _iter_side_chunks(files0, lake_sch, key_cols, chunk_rows),
        _iter_side_chunks(files1, lake_sch, key_cols, chunk_rows),
    ]
    bufs: list[pa.Table | None] = [None, None]

    def refill(i: int) -> None:
        if bufs[i] is not None and bufs[i].num_rows:
            return
        bufs[i] = next(sources[i], None)
        while bufs[i] is not None and bufs[i].num_rows == 0:
            bufs[i] = next(sources[i], None)

    for i in (0, 1):
        refill(i)
    while True:
        active = [i for i in (0, 1) if bufs[i] is not None]
        if not active:
            return
        lasts = []
        for i in active:
            b = bufs[i]
            k0 = b.column(key_cols[0])[b.num_rows - 1].as_py()
            k1 = b.column(key_cols[1])[b.num_rows - 1].as_py() if two else None
            lasts.append((k0, k1))
        p0, p1 = min(lasts, key=lambda x: (x[0], x[1]) if two else (x[0],))
        sides = []
        for i in (0, 1):
            b = bufs[i]
            if b is None:
                sides.append(lake_sch.empty_table())
                continue
            a0 = _np_col(b, key_cols[0])
            if two:
                j0 = int(np.searchsorted(a0, p0, "left"))
                hi = int(np.searchsorted(a0, p0, "right"))
                a1 = _np_col(b.slice(j0, hi - j0), key_cols[1])
                cut = j0 + int(np.searchsorted(a1, p1, "right"))
            else:
                cut = int(np.searchsorted(a0, p0, "right"))
            sides.append(b.slice(0, cut))
            rest = b.slice(cut)
            bufs[i] = rest if rest.num_rows else None
            refill(i)
        chunk = _diff_tables(sides[0], sides[1], lake_sch, key_cols, public, out_schema)
        if chunk.num_rows:
            yield chunk


def _has_patches(t: pa.Table) -> bool:
    """True iff the change batch carries any PARTIAL row image (op="P")."""
    return bool(pc.any(pc.equal(t.column("op"), "P")).as_py())


def _pair_codes(t: pa.Table, key_cols: tuple[str, ...]) -> pa.ChunkedArray | pa.Array:
    """String codes for composite-key membership tests (equal key tuples →
    equal codes; keys are NULL-rejected upstream so the join is total)."""
    parts = [t.column(k).cast(pa.string()) for k in key_cols]
    if len(parts) == 1:
        return parts[0]
    return pc.binary_join_element_wise(*parts, "\x1f")


def _read_prior_rows(
    files: list[str],
    lake_sch: pa.Schema,
    key_cols: tuple[str, ...],
    keys_of: pa.Table,
) -> pa.Table:
    """Per-key LWW winners (INCLUDING tombstones) from a partition's file
    stack, restricted to the keys present in ``keys_of`` — the prior-state
    lookup the patch fold resolves against. Row groups prune on the
    leading key via parquet stats (base files are PK-sorted, so the
    predicate decodes only the matching slices)."""
    if not files:
        return lake_sch.empty_table()
    k0 = key_cols[0]
    vals = pc.unique(keys_of.column(k0)).to_pylist()
    tables = []
    for f in files:
        t = pq.read_table(f, filters=[(k0, "in", vals)])
        if t.num_rows:
            tables.append(normalize_table(t, lake_sch))
    if not tables:
        return lake_sch.empty_table()
    t = pa.concat_tables(tables)
    want = pc.unique(_pair_codes(keys_of, key_cols))
    t = t.filter(pc.is_in(_pair_codes(t, key_cols), value_set=want))
    return lww_reduce(t, key_cols, _lww_order(lake_sch, LSN_COL))


def _fold_epoch_patches(
    changes: pa.Table,
    key_cols: tuple[str, ...],
    existing: list[str],
    lake_sch: pa.Schema,
) -> tuple[pa.Table, int]:
    """Patch-aware epoch fold: change rows (op ∈ I/U/D/P) → lake rows.

    PARTIAL row images (op="P") carry only the changed payload columns;
    NULL means "unchanged" (a patch can never set NULL — emit a full U
    for that). Resolution semantics — equivalent to folding the key's
    known events in (ts, lsn) order:

    - the key's events fold against its current LWW state (``existing``
      merge-on-read stack, tombstones included);
    - the BASE is the greatest-(ts,lsn) full image (I/U/D or the prior
      lake row); patches ordered after the base apply column-wise,
      later patch winning per column;
    - patches that do not reach the resolved image — at-or-below the
      base (late or shadowed by a later full image), on a deleted base,
      or with no base at all — are DISCARDED (returned count, never
      silent);
    - the resolved row is a FULL image stamped with the last applied
      event's (ts, lsn), so downstream merge-on-read/changefeed/IVM see
      ordinary rows and need no patch logic.

    Cross-epoch caveat (documented semantics, same as the engine's
    late-event rule): a full image arriving in a LATER epoch with
    (ts, lsn) BELOW an already-resolved patch loses LWW at read time —
    patches are resolved once, not retro-rebased. Keys without patches
    take the plain vectorized LWW path; the pandas fold below touches
    ONLY patch keys (trickle-sized by assumption).
    """
    import numpy as np
    import pandas as pd

    from ..stages.util import null_safe_from_pandas

    chg_schema = changes.schema
    order_cols = _lww_order(chg_schema, "lsn")
    codes = _pair_codes(changes, key_cols)
    patch_keys = pc.unique(pc.filter(codes, pc.equal(changes.column("op"), "P")))
    member = pc.is_in(codes, value_set=patch_keys)
    plain = changes.filter(pc.invert(member))
    patch = changes.filter(member)

    plain_rows = _changes_to_lake_rows(lww_reduce(plain, key_cols, order_cols), lake_sch)

    prior = _read_prior_rows(existing, lake_sch, key_cols, patch)
    pr_cols = []
    for f in chg_schema:
        if f.name == "lsn":
            pr_cols.append(prior.column(LSN_COL).cast(pa.int64()))
        elif f.name == "op":
            pr_cols.append(
                pc.if_else(prior.column(DELETED_COL), pa.scalar("D"), pa.scalar("U"))
            )
        elif f.name in prior.schema.names:
            pr_cols.append(prior.column(f.name).cast(f.type))
        else:
            pr_cols.append(pa.nulls(prior.num_rows, f.type))
    prior_chg = pa.Table.from_arrays(pr_cols, schema=chg_schema)

    ev = patch.to_pandas()
    ev["_src"] = 1  # epoch event
    pr = prior_chg.to_pandas()
    pr["_src"] = 0  # prior lake state (re-delivered duplicates sort after it)
    df = pd.concat([pr, ev], ignore_index=True)
    df = df.sort_values([*key_cols, *order_cols, "_src"], kind="stable", ignore_index=True)

    n = len(df)
    gid = df.groupby(list(key_cols), sort=False).ngroup().to_numpy()
    idx = np.arange(n)
    ops = df["op"].to_numpy()
    is_p = ops == "P"
    n_patches = int(is_p.sum())
    base_idx = np.where(~is_p, idx, -1)
    last_base = pd.Series(base_idx).groupby(gid).transform("max").to_numpy()
    has_base = last_base >= 0
    base_op = np.full(n, "", dtype=object)
    base_op[has_base] = ops[last_base[has_base].astype(np.int64)]
    # keep the base and everything after it; drop patches on a deleted base
    keep = has_base & (idx >= last_base) & ~((base_op == "D") & is_p)

    kept = df.loc[keep]
    kgid = gid[keep]
    n_applied = int(is_p[keep].sum())
    payload = [
        f.name
        for f in chg_schema
        if f.name not in ("lsn", "op", *key_cols, *order_cols)
    ]
    if payload and len(kept):
        kept = kept.copy()
        kept[payload] = kept.groupby(kgid)[payload].ffill()
    last = np.zeros(len(kept), dtype=bool)
    if len(kept):
        last[-1] = True
        last[:-1] = kgid[:-1] != kgid[1:]
    res = kept.loc[last]
    res = res[res["_src"] == 1]  # result == prior → nothing new to write
    if len(res):
        res = res.copy()
        res.loc[res["op"] == "P", "op"] = "U"  # a resolved patch is a full update

    folded = pa.Table.from_arrays(
        [null_safe_from_pandas(res[f.name], f.type) for f in chg_schema],
        schema=chg_schema,
    )
    out = pa.concat_tables([plain_rows, _changes_to_lake_rows(folded, lake_sch)])
    out = out.sort_by([(k, "ascending") for k in key_cols])  # delta files are key-sorted
    return out, n_patches - n_applied


#: CDC file naming — files written by the engine are LWW-reduced and
#: key-sorted with UNIQUE keys, which is what the streamed merge relies on
import re as _re_mod

#: CDC data-file naming — THE single pattern (file checks, changefeed
#: listing, fsck all match against this)
_CDC_FILE_RE = _re_mod.compile(r"^(delta|base)-(\d+)-(\d+)(-from\d+)?\.parquet$")


def _is_cdc_sorted(files: list[str]) -> bool:
    """True iff every file was written by the CDC apply/compact/salt paths
    (key-sorted, unique keys) — the precondition for the streamed k-way
    merge. Writer overwrite/append staging files are unsorted → full merge."""
    return all(_CDC_FILE_RE.match(os.path.basename(f)) for f in files)


def _iter_file_chunks(path: str, lake_sch: pa.Schema, chunk_rows: int, conjuncts=None):
    # prune at the read: only the target schema's columns leave the file —
    # with a pruned lake schema (column-projected snapshot) the payload
    # columns a consumer didn't ask for are never decoded. ``conjuncts``
    # (PK-only under merge-on-read — zonemap.qualifying_row_groups doc)
    # additionally skip row groups by footer stats: base files are
    # PK-SORTED, so their groups carry tight disjoint key ranges and a
    # key predicate decodes only the matching slice of each file
    pf = pq.ParquetFile(path)
    have = set(pf.schema_arrow.names)
    cols = [n for n in lake_sch.names if n in have]
    keep = zone.qualifying_row_groups(pf, conjuncts) if conjuncts else None
    if keep == []:
        return
    for rb in pf.iter_batches(batch_size=chunk_rows, columns=cols, row_groups=keep):
        yield normalize_table(pa.Table.from_batches([rb]), lake_sch)


def _iter_table_chunks(t: pa.Table, chunk_rows: int):
    for off in range(0, t.num_rows, chunk_rows):
        yield t.slice(off, chunk_rows)


def _np_col(t: pa.Table, name: str):
    return t.column(name).to_pandas().to_numpy()


def iter_merged_partition(
    files: list[str],
    lake_sch: pa.Schema,
    key_cols: tuple[str, ...],
    extra_sorted: pa.Table | None = None,
    chunk_rows: int = 65536,
    conjuncts=None,
):
    """STREAMING merge-on-read of one partition: k-way chunk merge over the
    key-sorted base/delta files (plus an optional in-memory key-sorted
    table, e.g. an epoch's reduced changes), yielding key-sorted,
    LWW-reduced, key-COMPLETE chunks — no key ever spans two yields.

    Peak memory is O(chunk_rows × open files) instead of O(partition), so
    partitions can be sized well past worker heap (the 100-TB sizing knob
    in the module docstring). Relies on engine-written files having
    strictly-increasing unique keys (every file is an ``lww_reduce``
    output); supports 1- and 2-column PKs — wider PKs and writer-staged
    (unsorted) files take the full-table path in the callers.

    Merge rule per round: pivot = min over streams of each buffer's LAST
    key; every stream's rows ≤ pivot are complete (future chunks of a
    sorted unique-key stream are strictly greater), so slicing at the
    pivot and LWW-reducing the concatenation is exact."""
    import numpy as np

    order_cols = _lww_order(lake_sch, LSN_COL)
    two = len(key_cols) == 2
    sources = [_iter_file_chunks(f, lake_sch, chunk_rows, conjuncts) for f in files]
    if extra_sorted is not None and extra_sorted.num_rows:
        sources.append(_iter_table_chunks(normalize_table(extra_sorted, lake_sch), chunk_rows))
    bufs: list[pa.Table | None] = [None] * len(sources)

    def refill(i: int) -> None:
        if bufs[i] is not None and bufs[i].num_rows:
            return
        bufs[i] = next(sources[i], None)
        while bufs[i] is not None and bufs[i].num_rows == 0:
            bufs[i] = next(sources[i], None)

    for i in range(len(sources)):
        refill(i)
    while True:
        active = [i for i in range(len(sources)) if bufs[i] is not None]
        if not active:
            return
        # pivot: lexicographic min of the buffers' LAST keys
        lasts = []
        for i in active:
            b = bufs[i]
            k0 = b.column(key_cols[0])[b.num_rows - 1].as_py()
            k1 = b.column(key_cols[1])[b.num_rows - 1].as_py() if two else None
            lasts.append((k0, k1, i))
        p0, p1, _ = min(lasts, key=lambda x: (x[0], x[1]) if two else (x[0],))
        parts = []
        for i in active:
            b = bufs[i]
            a0 = _np_col(b, key_cols[0])
            if two:
                j0 = int(np.searchsorted(a0, p0, "left"))
                hi = int(np.searchsorted(a0, p0, "right"))
                a1 = _np_col(b.slice(j0, hi - j0), key_cols[1])
                cut = j0 + int(np.searchsorted(a1, p1, "right"))
            else:
                cut = int(np.searchsorted(a0, p0, "right"))
            if cut:
                parts.append(b.slice(0, cut))
                rest = b.slice(cut)
                bufs[i] = rest if rest.num_rows else None
                refill(i)
        merged = parts[0] if len(parts) == 1 else pa.concat_tables(parts)
        yield lww_reduce(merged, key_cols, order_cols)


def _write_merged_stream(
    tmp_path: str,
    files: list[str],
    lake_sch: pa.Schema,
    key_cols: tuple[str, ...],
    extra_sorted: pa.Table | None = None,
    epoch_id: int = 0,
    ttl: int | None = None,
) -> tuple[int, int, dict]:
    """Stream the partition merge to ``tmp_path`` — one parquet row group
    per merged chunk, so compaction peak memory is O(chunk × files), not
    O(partition). Applies the tombstone-TTL filter chunk-locally. Returns
    ``(rows_written, tombstones, zone_stats)`` — zone-map column stats
    accumulated chunk-wise over exactly what was written. Wide PKs /
    non-CDC layouts fall back to the full in-memory merge."""

    def chunks():
        if key_cols and len(key_cols) <= 2 and _is_cdc_sorted(list(files)):
            yield from iter_merged_partition(list(files), lake_sch, key_cols, extra_sorted)
        else:
            t = merge_partition_files(list(files), lake_sch, key_cols)
            if extra_sorted is not None and extra_sorted.num_rows:
                t = lww_reduce(
                    pa.concat_tables([t, extra_sorted]), key_cols, _lww_order(lake_sch, LSN_COL)
                )
            yield t

    writer = None
    rows = tomb = 0
    zcols = _zone_cols(lake_sch)
    stats: dict | None = None
    try:
        for chunk in chunks():
            if ttl is not None:
                # GC tombstones older than the out-of-orderness horizon: an
                # event that could resurrect the key can no longer arrive
                expired = pc.and_(
                    chunk.column(DELETED_COL), pc.less(chunk.column(LSN_COL), epoch_id - ttl)
                )
                chunk = chunk.filter(pc.invert(expired))
            if writer is None:
                writer = pq.ParquetWriter(tmp_path, chunk.schema)
            writer.write_table(chunk)
            rows += chunk.num_rows
            tomb += pc.sum(chunk.column(DELETED_COL)).as_py() or 0
            stats = zone.merge_stats(stats, zone.table_stats(chunk, zcols))
        if writer is None:  # empty partition still needs a valid file
            writer = pq.ParquetWriter(tmp_path, lake_sch)
    finally:
        if writer is not None:
            writer.close()
    return rows, tomb, stats or {}


def make_partition_applier(ctx_ref: "ray.ObjectRef", key_cols: tuple[str, ...]):
    """Build the per-partition merge fn for ``groupby('pid').map_groups``.

    ``ctx_ref`` is a ``ray.put`` broadcast of the (small) apply context —
    partition→files map, target lake schema, epoch id, table dir — fetched
    once per task from the local object store instead of re-shipped per
    group (SURVEY.md §4.2 broadcast pattern).
    """

    def apply_partition(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _META_SCHEMA.empty_table()
        _single_threaded_arrow()
        ctx = ray.get(ctx_ref)
        lake_sch = ctx["lake_schema"]
        pid = group.column("pid")[0].as_py()
        n_events = group.num_rows

        grp = group.drop_columns(["pid"])
        existing = ctx["part_files"].get(pid, [])
        patches_discarded = 0
        if _has_patches(grp):
            changes, patches_discarded = _fold_epoch_patches(
                grp, key_cols, existing, lake_sch
            )
        else:
            changes = _changes_to_lake_rows(grp, lake_sch)
            changes = lww_reduce(
                changes, key_cols, _lww_order(lake_sch, LSN_COL)
            )  # key-sorted
        compacting = len(existing) + 1 > ctx["compact_every"]
        mode = "base" if compacting else "delta"
        out_dir = os.path.join(
            ctx["table_dir"], "data", f"part={pid:05d}", f"epoch={ctx['epoch_id']:012d}"
        )
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, f"{mode}-{pid:05d}-{ctx['epoch_id']:012d}.parquet")
        tmp = f"{path}.tmp-{os.getpid()}"
        retained_path = None
        if compacting:
            # compaction: STREAM base+deltas+changes into one base file —
            # write volume amortizes to changes + table/compact_every per
            # epoch (LSM merge-on-read), peak memory O(chunk × files)
            rows, tombstones, zstats = _write_merged_stream(
                tmp,
                existing,
                lake_sch,
                key_cols,
                extra_sorted=changes,
                epoch_id=ctx["epoch_id"],
                ttl=ctx.get("tombstone_ttl_lsn"),
            )
            if ctx.get("retain_changefeed"):
                # the epoch's changes fold straight into the base, so also
                # persist them as a retained changefeed delta
                retained_path = os.path.join(
                    out_dir, f"delta-{pid:05d}-{ctx['epoch_id']:012d}.parquet"
                )
                tmpd = f"{retained_path}.tmp-{os.getpid()}"
                pq.write_table(changes, tmpd)
                os.replace(tmpd, retained_path)
        else:
            # delta write: the epoch's reduced changes only — apply never
            # touches existing data outside compaction epochs
            pq.write_table(changes, tmp)
            rows = changes.num_rows
            tombstones = pc.sum(changes.column(DELETED_COL)).as_py() or 0
            zstats = zone.table_stats(changes, _zone_cols(lake_sch))
        os.replace(tmp, path)  # idempotent under retry: deterministic content+path

        return pa.Table.from_pylist(
            [
                {
                    "pid": pid,
                    "path": path,
                    "mode": mode,
                    "rows_live": rows - tombstones,
                    "tombstones": tombstones,
                    "bytes": os.path.getsize(path),
                    "events": n_events,
                    "retained_path": retained_path,
                    "zone_stats": json.dumps(zstats),
                    "patches_discarded": patches_discarded,
                }
            ],
            schema=_META_SCHEMA,
        )

    return apply_partition


# ---------------------------------------------------------------------------
# Direct hash exchange (raw Ray tasks)
#
# The Dataset route (`groupby("pid").map_groups`) is a sort-based all-to-all:
# sample → sort-map → sort-reduce → apply, four scheduling rounds with a
# barrier, which measures at <20% CPU utilization for epoch-sized inputs on
# this machine. Since the apply only needs *hash grouping* (never a global
# order), the exchange is expressible as one map round (a task per segment
# file, returning P hash-split sub-tables via ``num_returns``) and one
# reduce round (a task per partition consuming its B pieces) — the classic
# Ray map-reduce shuffle. Partitioning assumption: B×P object refs per
# epoch must stay bounded (segments_per_epoch × num_partitions ≲ 1e5); for
# cluster-scale epochs beyond that, pass ``exchange="sort"`` to use Ray
# Data's sort shuffle, which consolidates via push-based exchange.
# ---------------------------------------------------------------------------


def _reject_null_keys(t: pa.Table, key_cols, what: str) -> None:
    """Null keys would silently co-group in the hash partitioner and the
    LWW boundary mask treats NaN codes as distinct — refuse the feed
    instead of committing PK-violating rows (shared by BOTH exchange
    paths; a malformed feed must fail identically under either)."""
    for k in key_cols:
        nc = t.column(k).null_count
        if nc:
            raise ValueError(f"{what} has {nc} NULL values in key column {k!r}")


def _dq_gate_changes(
    t: pa.Table,
    checks: list,
    mode: str,
    failure_dir: str,
    table_name: str,
    key_cols: tuple,
    tag: str,
    rc: dict,
) -> pa.Table:
    """Declared-rule DQ gate on an epoch's change rows, fused into the
    map round (the reference gates its bronze ingest the same way —
    /root/reference/src/models/data_quality_evaluator.py:88-102).
    DELETE tombstones are exempt: they carry key + op + ts only, so
    payload rules must not judge their null row images. Per-failing-row
    detail lands under ``_metrics/dq_failures`` (``quality.read_failures``
    is the audit surface). ``mode``: rows failing an ERROR rule are
    dropped pre-apply (``"quarantine"``) or abort the epoch pre-commit
    (``"error"`` — the 2PC keeps the table untouched); WARN failures are
    recorded and applied either way."""
    from ..functions.quality import FAILURE_SCHEMA, DQError, _row_keys

    not_del = pc.fill_null(pc.invert(pc.equal(t.column("op"), "D")), False)
    err_mask = None
    detail: list[pa.Table] = []
    keys = None
    for chk in checks:
        m = pc.and_(pc.fill_null(chk.fail_mask(t), False), not_del)
        n = pc.sum(m).as_py() or 0
        if not n:
            continue
        if keys is None:
            keys = _row_keys(t, key_cols)
        failed = pc.filter(keys, m)
        failed = failed.combine_chunks() if isinstance(failed, pa.ChunkedArray) else failed
        detail.append(
            pa.table(
                {
                    "table_name": pa.array([table_name] * n, pa.string()),
                    "rule_name": pa.array([chk.name] * n, pa.string()),
                    "column": pa.array([chk.column] * n, pa.string()),
                    "criticality": pa.array([chk.criticality] * n, pa.string()),
                    "row_key": failed,
                    "job_id": pa.array([rc.get("job_id")] * n, pa.string()),
                    "run_id": pa.array([rc.get("run_id")] * n, pa.string()),
                    "date": pa.array([rc.get("date")] * n, pa.string()),
                },
                schema=FAILURE_SCHEMA,
            )
        )
        if chk.criticality == "error":
            err_mask = m if err_mask is None else pc.or_(err_mask, m)
    if detail:
        os.makedirs(failure_dir, exist_ok=True)
        # 'failures-' prefix: quality.read_failures is the read surface
        out = os.path.join(failure_dir, f"failures-{tag}.parquet")
        tmp = f"{out}.tmp-{os.getpid()}"
        pq.write_table(pa.concat_tables(detail), tmp)
        os.replace(tmp, out)  # deterministic per tag: retry-idempotent
    if err_mask is not None:
        n_bad = pc.sum(err_mask).as_py() or 0
        if mode == "error":
            raise DQError(
                f"{n_bad} change rows failed ERROR-criticality rules in {tag} "
                f"(detail under {failure_dir})"
            )
        t = t.filter(pc.invert(err_mask))
    return t


@ray.remote
def _prep_segment_task(
    path: str,
    chg_schema: pa.Schema,
    key_cols: tuple,
    num_partitions: int,
    salt_map: dict | None = None,
    dq: tuple | None = None,
    transform=None,
):
    """Read one changelog segment, LWW-combine (adaptively), hash-split by
    the leading key into ``num_partitions`` sub-tables.

    The wide ``text`` column is gathered exactly ONCE: survivor selection
    runs on narrow key/order columns only, the hash-partition order is
    composed with the survivor indices, and a single fused ``take``
    produces the pid-grouped table (two separate gathers measured ~2×
    this stage's wall at 8-way concurrency — gathers of wide strings are
    the memory-bandwidth hot spot). The combiner only reorders-by-key when
    it actually shrinks the batch (hot logs); otherwise rows route in
    arrival order and the per-partition reduce performs the dedup.
    """
    import numpy as np

    _single_threaded_arrow()
    t = pq.read_table(path)
    if transform is not None:
        # map-side event transform (see CDCEngine.event_transform): runs on
        # the RAW segment rows, before schema normalization, so derived
        # columns it adds participate in evolution like source columns
        t = transform(t)
    t = normalize_table(t, chg_schema)
    _reject_null_keys(t, key_cols, f"changelog segment {os.path.basename(path)!r}")
    if dq is not None:
        mode, checks, failure_dir, table_name, rc, epoch_id = dq
        t = _dq_gate_changes(
            t,
            checks,
            mode,
            failure_dir,
            table_name,
            key_cols,
            f"epoch-{epoch_id:012d}-{os.path.basename(path).rsplit('.', 1)[0]}",
            rc,
        )

    surv = lww_survivor_indices(t, key_cols, _lww_order(chg_schema, "lsn"))
    if _has_patches(t):
        # partial images (op="P") make the per-key fold non-associative
        # across segments (another segment's patch may interleave between
        # this segment's base and patches) — so PATCH KEYS route all their
        # rows unreduced while every other key still combines (a trickle
        # of patches must not disable the hot-key combiner for a whole
        # 500k-row segment); the per-partition reduce performs the exact
        # patch-aware fold
        member = pc.is_in(
            _pair_codes(t, key_cols),
            value_set=pc.unique(
                pc.filter(_pair_codes(t, key_cols), pc.equal(t.column("op"), "P"))
            ),
        ).to_numpy(zero_copy_only=False)
        surv = np.union1d(
            surv[~member[surv]].astype(np.int64), np.flatnonzero(member)
        )
    if len(surv) > 0.9 * t.num_rows:
        surv = np.arange(t.num_rows, dtype=np.int64)  # combiner wouldn't pay

    # partition on the FIRST primary-key column only: all turns of a
    # conversation (all rows of an entity) co-locate, which is what makes
    # per-key LWW and stable ordering partition-local (SURVEY.md §4.2).
    # Keys flagged in the manifest's salt_map fan out by the second key
    # column (full PK still single-partition — skew mitigation, §7.4).
    keys_t = t.select(list(key_cols[: 2 if len(key_cols) > 1 else 1])).take(pa.array(surv))
    pid_surv = salted_partition_ids(keys_t, key_cols, num_partitions, salt_map)
    order = np.argsort(pid_surv, kind="stable")
    t = t.take(pa.array(surv[order]))  # the single wide gather
    bounds = np.searchsorted(pid_surv[order], np.arange(num_partitions + 1))
    slices = tuple(
        t.slice(bounds[i], bounds[i + 1] - bounds[i]) for i in range(num_partitions)
    )
    # with num_returns=1 Ray treats a tuple as ONE value — return the table
    return slices if num_partitions > 1 else slices[0]


@ray.remote
def _apply_pid_task(ctx: dict, pid: int, key_cols: tuple, *pieces: pa.Table):
    """Per-partition reduce: concat this partition's pieces from every
    segment, LWW-reduce, write the delta (or compact) file. Same body
    semantics as ``make_partition_applier`` — deterministic staged file
    names keep retries idempotent."""
    import numpy as np  # noqa: F401

    _single_threaded_arrow()
    parts = [p for p in pieces if p.num_rows]
    if not parts:
        return None
    changes = pa.concat_tables(parts)
    lake_sch = ctx["lake_schema"]
    existing = ctx["part_files"].get(pid, [])
    patches_discarded = 0
    if _has_patches(changes):
        changes, patches_discarded = _fold_epoch_patches(
            changes, key_cols, existing, lake_sch
        )
    else:
        changes = lww_reduce(changes, key_cols, _lww_order(changes.schema, "lsn"))
        changes = _changes_to_lake_rows(changes, lake_sch)
    n_events = sum(p.num_rows for p in parts)
    compacting = len(existing) + 1 > ctx["compact_every"]
    mode = "base" if compacting else "delta"
    out_dir = os.path.join(
        ctx["table_dir"], "data", f"part={pid:05d}", f"epoch={ctx['epoch_id']:012d}"
    )
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{mode}-{pid:05d}-{ctx['epoch_id']:012d}.parquet")
    tmp = f"{path}.tmp-{os.getpid()}"
    retained_path = None
    if compacting:
        # streamed fold (see make_partition_applier): O(chunk) peak memory
        rows, tombstones, zstats = _write_merged_stream(
            tmp,
            existing,
            lake_sch,
            key_cols,
            extra_sorted=changes,
            epoch_id=ctx["epoch_id"],
            ttl=ctx.get("tombstone_ttl_lsn"),
        )
        if ctx.get("retain_changefeed"):
            retained_path = os.path.join(
                out_dir, f"delta-{pid:05d}-{ctx['epoch_id']:012d}.parquet"
            )
            tmpd = f"{retained_path}.tmp-{os.getpid()}"
            pq.write_table(changes, tmpd)
            os.replace(tmpd, retained_path)
    else:
        pq.write_table(changes, tmp)
        rows = changes.num_rows
        tombstones = pc.sum(changes.column(DELETED_COL)).as_py() or 0
        zstats = zone.table_stats(changes, _zone_cols(lake_sch))
    os.replace(tmp, path)
    return {
        "pid": pid,
        "path": path,
        "mode": mode,
        "rows_live": rows - tombstones,
        "tombstones": tombstones,
        "bytes": os.path.getsize(path),
        "events": n_events,
        "retained_path": retained_path,
        "zone_stats": zstats,
        "patches_discarded": patches_discarded,
    }


@ray.remote
def _copy_files_task(srcs: list[str], dsts: list[str]) -> int:
    """Deep-clone worker: copy one partition's data files into the clone's
    layout (tmp + atomic rename — a killed clone leaves no half-file that
    a retry would mistake for done). Returns the file count."""
    import shutil

    for s, d in zip(srcs, dsts):
        os.makedirs(os.path.dirname(d), exist_ok=True)
        tmp = f"{d}.tmp-{os.getpid()}"
        shutil.copyfile(s, tmp)
        os.replace(tmp, d)
    return len(srcs)


@ray.remote
def _purge_pid_task(
    table_dir: str,
    pid: int,
    files: list[tuple[str, str]],
    key0: str,
    vals: list,
    lake_sch: pa.Schema,
    new_version: int,
) -> list[dict]:
    """Rewrite one partition's files with every row of the purged keys
    physically removed (tombstones included — the key VALUE itself must
    not survive). ``files`` is ``(path, kind)`` with kind ``"live"``
    (manifest-listed) or ``"retained"`` (changefeed-retention registry).

    Returns one dict per file that actually contained a purged key:
    ``{"old", "new" (None = every row purged → drop the file), "kind",
    "live_removed", "rows", "zstats"}``. Files without a match are not
    reported — they stay in the manifest by path identity, untouched.
    Idempotent: deterministic output path + atomic replace."""
    _single_threaded_arrow()
    key_set = pa.array(sorted(vals), lake_sch.field(key0).type)
    zcols = _zone_cols(lake_sch)
    out: list[dict] = []
    out_dir = os.path.join(
        table_dir, "data", f"part={pid:05d}", f"purge=v{new_version:08d}"
    )
    for path, kind in files:
        t = normalize_table(pq.read_table(path), lake_sch)
        mask = pc.is_in(t.column(key0), value_set=key_set)
        n_match = pc.sum(mask).as_py() or 0
        if not n_match:
            continue
        kept = t.filter(pc.invert(mask))
        dropped = t.filter(mask)
        live_removed = int(
            dropped.num_rows - (pc.sum(dropped.column(DELETED_COL)).as_py() or 0)
        )
        if kept.num_rows == 0:
            out.append(
                {
                    "old": path,
                    "new": None,
                    "kind": kind,
                    "live_removed": live_removed,
                    "rows": 0,
                    "zstats": None,
                }
            )
            continue
        os.makedirs(out_dir, exist_ok=True)
        new_path = os.path.join(out_dir, os.path.basename(path))
        tmp = f"{new_path}.tmp-{os.getpid()}"
        pq.write_table(kept, tmp)
        os.replace(tmp, new_path)
        out.append(
            {
                "old": path,
                "new": new_path,
                "kind": kind,
                "live_removed": live_removed,
                "rows": int(
                    kept.num_rows - (pc.sum(kept.column(DELETED_COL)).as_py() or 0)
                ),
                "zstats": zone.table_stats(kept, zcols),
            }
        )
    return out


@ray.remote
def _hot_keys_task(
    files: list, lake_sch: pa.Schema, key_cols: tuple, min_share: float
) -> list:
    """Attribute a hot partition's volume to leading-key values: returns
    the key0 values holding ≥ min_share of the partition's live rows."""
    _single_threaded_arrow()
    merged = merge_partition_files(list(files), lake_sch, key_cols)
    live = merged.filter(pc.invert(merged.column(DELETED_COL)))
    if live.num_rows == 0:
        return []
    vc = live.column(key_cols[0]).to_pandas().value_counts()
    share = vc / live.num_rows
    return [v for v, s in share.items() if s >= min_share]


@ray.remote
def _resalt_partition_task(
    table_dir: str,
    pid: int,
    files: list,
    lake_sch: pa.Schema,
    key_cols: tuple,
    full_salt: dict,
    num_partitions: int,
    version: int,
    epoch_id: int,
) -> dict:
    """Migrate a partition's rows for newly salted keys to their salted
    partitions. The source is rewritten (compacted, minus moved rows);
    each target receives one staged file (named ``base-`` so the
    changefeed conservatively treats the migration like a compaction).
    Only staged files are written here — visibility comes from the
    driver's single manifest commit (2PC)."""
    _single_threaded_arrow()
    merged = merge_partition_files(list(files), lake_sch, key_cols)
    # PK-less tables (append-only audit logs) route by their FIRST declared
    # column — the same rule LakeWriter.append stamps pids with — so a
    # reshard re-homes their rows consistently instead of crashing
    route_cols = key_cols or (lake_sch.names[0],)
    keys_t = merged.select(list(route_cols[:2]))
    # full_salt (old + new) — rows previously salted INTO this partition
    # must keep their existing homes, only the new keys move
    pid_new = salted_partition_ids(keys_t, route_cols, num_partitions, full_salt)
    out_dir = os.path.join(table_dir, "data", f"part={pid:05d}", f"salt=v{version:08d}")

    import numpy as np

    def write_part(t: pa.Table, target: int) -> tuple[str, int, dict]:
        d = os.path.join(table_dir, "data", f"part={target:05d}", f"salt=v{version:08d}")
        os.makedirs(d, exist_ok=True)
        # 'base' prefix: read_changes must not replay migrated (old) rows
        # as fresh changes — consumers behind this point re-sync, exactly
        # the compaction-horizon contract. '-fromNNN' disambiguates two
        # sources migrating into the same target in one pass.
        path = os.path.join(d, f"base-{target:05d}-{epoch_id:012d}-from{pid:05d}.parquet")
        tmp = f"{path}.tmp-{os.getpid()}"
        pq.write_table(t, tmp)
        os.replace(tmp, path)
        live = t.num_rows - (pc.sum(t.column(DELETED_COL)).as_py() or 0)
        return path, live, zone.table_stats(t, _zone_cols(lake_sch))

    kept_mask = pid_new == pid
    moved: dict[int, tuple[str, int, dict]] = {}
    for target in np.unique(pid_new[~kept_mask]):
        sub = merged.filter(pa.array(pid_new == target))
        path, live, zstats = write_part(sub, int(target))
        moved[int(target)] = (path, live, zstats)
    kept = merged.filter(pa.array(kept_mask))
    if kept.num_rows:
        kept_path, kept_live, kept_stats = write_part(kept, pid)
    else:
        kept_path, kept_live, kept_stats = None, 0, {}
    return {
        "pid": pid,
        "kept_path": kept_path,
        "kept_live": kept_live,
        "kept_stats": kept_stats,
        "moved": moved,
    }


class CDCEngine:
    """Replays a changelog into a committed Parquet lake table.

    One instance per logical table; safe to re-create after a crash — all
    durable state lives in the table directory (manifest + data files).
    """

    def __init__(
        self,
        table_dir: str,
        spec: TableSpec = TRANSCRIPTS,
        num_partitions: int = DEFAULT_NUM_PARTITIONS,
        run_context: RunContext | None = None,
        compact_every: int = 4,
        exchange: str = "ray",  # "ray" (direct hash exchange) | "sort" (Dataset groupby)
        tombstone_ttl_lsn: int | None = None,
        create_if_missing: bool = True,
        changefeed_retention_lsn: int | None | str = INHERIT,
        dq_mode: str | None = None,
        event_transform=None,
        commit_backend=None,
        auto_sort_refs: int | None = 32_768,
    ):
        self.table_dir = table_dir
        self.spec = spec
        #: optional map-side event transform applied to every raw segment
        #: table before schema normalization / LWW (a picklable callable
        #: ``pa.Table -> pa.Table`` with a ``transform_schema(pa.Schema)
        #: -> pa.Schema`` method so epoch evolution planning sees the
        #: POST-transform payload). Powers derived-at-ingest columns —
        #: pipelines/history.py's SCD2 envelope is the flagship user.
        if event_transform is not None and not hasattr(event_transform, "transform_schema"):
            raise TypeError(
                "event_transform must expose transform_schema(schema) -> schema "
                "(evolution planning runs on the post-transform shape)"
            )
        self.event_transform = event_transform
        if dq_mode not in (None, "quarantine", "error"):
            raise ValueError(f"dq_mode must be None, 'quarantine' or 'error', got {dq_mode!r}")
        #: opt-in DQ gate on the CDC apply path: evaluate the spec's
        #: declared rules (ColumnSpec.quality + NOT NULL) inside the map
        #: round — 'quarantine' drops ERROR-failing rows pre-apply,
        #: 'error' aborts the epoch pre-commit (see _dq_gate_changes)
        self.dq_mode = dq_mode
        #: a partition compacts when it would exceed this many live files
        #: (merge-on-read depth / write-amplification trade-off)
        self.compact_every = compact_every
        if exchange not in ("ray", "sort"):
            raise ValueError(f"exchange must be 'ray' or 'sort', got {exchange!r}")
        self.exchange = exchange
        #: direct-exchange ref-matrix guard: an epoch's map round emits
        #: segments × num_partitions object refs; past this bound the
        #: scheduler knees (measured: `bench --refmatrix`, BASELINE.md
        #: round 5) and the epoch auto-routes to the "sort" exchange,
        #: counted in :attr:`auto_sort_switches` and logged once.
        #: None disables the auto-switch (always honor ``exchange``).
        self.auto_sort_refs = auto_sort_refs
        self.auto_sort_switches = 0
        self._auto_sort_warned = False
        #: tombstone GC horizon: at compaction, delete-markers whose _lsn is
        #: more than this many LSNs behind the epoch watermark are dropped.
        #: A tombstone only matters while an OLDER event for its key can
        #: still arrive (bounded out-of-orderness of the log); None keeps
        #: tombstones forever (always safe, grows with total deletes — at
        #: 10^10 events set this to the source's re-delivery horizon).
        self.tombstone_ttl_lsn = tombstone_ttl_lsn
        #: commit_backend: storage primitives for the MANIFEST LOG —
        #: None = POSIX (local/NFS); state/backend.py's CAS flavor is the
        #: object-store deployment (data files need no atomicity anywhere)
        self.store = ManifestStore(table_dir, backend=commit_backend)
        self.run_context = run_context or RunContext()
        #: per-path schema cache — segment files are immutable, so the
        #: driver reads each footer at most once per replay (the serial
        #: driver fraction between epochs is what Amdahl charges scaling)
        self._schema_cache: dict[str, pa.Schema] = {}
        man = self.store.load()
        if man is None:
            if not create_if_missing:
                # read-only callers (CLI snapshot/changes/vacuum) must not
                # conjure an empty table out of a mistyped path
                raise FileNotFoundError(
                    f"no table manifest under {table_dir!r} (create_if_missing=False)"
                )
            # create-if-missing (reference CreateExecutor semantics,
            # /root/reference/src/delta_engine/execute/create_executor.py:26-57)
            props = dict(spec.properties)
            if changefeed_retention_lsn not in (INHERIT, None):
                props["changefeed_retention_lsn"] = int(changefeed_retention_lsn)
            man = Manifest(
                table=spec.name,
                version=1,
                num_partitions=num_partitions,
                schema_b64=schema_to_b64(lake_schema(spec)),
                primary_key=list(spec.primary_key),
                properties=props,
            )
            self.store.commit(man)
        self.manifest = man
        # changefeed retention horizon: when set, delta files folded by a
        # compaction (or salt migration) are RETAINED in the manifest for
        # this many LSNs past their retirement instead of being vacuumed,
        # so ``read_changes`` keeps serving consumers that lag past a
        # compaction cycle. The horizon is persisted in the manifest and
        # inherited by default, so a maintenance engine that omits the
        # argument cannot destroy the registry; pass None to DISABLE
        # (drops the registry at the next fold — coverage break is loud).
        stored = man.properties.get("changefeed_retention_lsn")
        # equality, not identity: config plumbed through JSON delivers an
        # equal-but-not-interned "__inherit__" string (the create path
        # above already compares by equality)
        if changefeed_retention_lsn == INHERIT:
            self.changefeed_retention_lsn = stored
        else:
            self.changefeed_retention_lsn = changefeed_retention_lsn
            if stored != changefeed_retention_lsn:
                new_man = Manifest.from_json(man.to_json())
                new_man.version = man.version + 1
                if changefeed_retention_lsn is None:
                    new_man.properties.pop("changefeed_retention_lsn", None)
                else:
                    new_man.properties["changefeed_retention_lsn"] = int(
                        changefeed_retention_lsn
                    )
                self.store.commit(new_man)
                self.manifest = new_man

    # ------------------------------------------------------------------
    @property
    def key_cols(self) -> tuple[str, ...]:
        return tuple(self.manifest.primary_key)

    @property
    def salt_map(self) -> dict:
        """Hot-key fanout map (leading-key value → fanout), committed in
        the manifest so routing stays consistent across epochs/restarts."""
        return self.manifest.properties.get("salt_map", {})

    # -- changefeed retention ------------------------------------------
    def _retire_deltas(self, new_man: Manifest, old_files: list[str]) -> None:
        """Move superseded DELTA files into the manifest's retained-deltas
        registry (changefeed retention) instead of letting vacuum take
        them. Base files need no retention — the feed never reads them."""
        if self.changefeed_retention_lsn is None:
            return
        import re

        delta_re = re.compile(r"^delta-(\d+)-(\d+)\.parquet$")
        entries = new_man.properties.setdefault("retained_deltas", [])
        for f in old_files:
            m = delta_re.match(os.path.basename(f))
            if m:
                # retired_lsn = the retiring commit's watermark: retention is
                # promised "past retirement", not past creation — a delta
                # created at epoch E but folded much later stays readable
                # for the full window after the fold
                entries.append(
                    {
                        "path": f,
                        "epoch_id": int(m.group(2)),
                        "retired_lsn": int(new_man.applied_lsn),
                    }
                )

    def _prune_retained(self, new_man: Manifest) -> None:
        """Drop retained deltas past the retention horizon and advance the
        changefeed floor (the oldest since_lsn still reconstructible).
        Also stamps ``retention_since_lsn`` on the FIRST retention-enabled
        commit: folds from BEFORE that watermark were never retained, so
        ``read_changes`` must still raise for them rather than silently
        skipping their base files."""
        if self.changefeed_retention_lsn is None:
            return
        if "retention_since_lsn" not in new_man.properties:
            # everything already folded up to the PREVIOUS watermark is
            # unrecoverable; coverage starts with this commit's folds
            prev_lsn = self.manifest.applied_lsn
            new_man.properties["retention_since_lsn"] = prev_lsn
        entries = new_man.properties.get("retained_deltas", [])
        if not entries:
            return
        cutoff = new_man.applied_lsn - self.changefeed_retention_lsn
        floor = int(new_man.properties.get("changefeed_floor", 0))
        keep = []
        for e in entries:
            # prune on RETIREMENT lsn (see _retire_deltas); legacy entries
            # without the stamp fall back to creation epoch
            if int(e.get("retired_lsn", e["epoch_id"])) <= cutoff:
                floor = max(floor, int(e["epoch_id"]))
            else:
                keep.append(e)
        new_man.properties["retained_deltas"] = keep
        new_man.properties["changefeed_floor"] = floor

    def _invalidate_retention_coverage(self, new_man: Manifest, folded: bool) -> None:
        """A FOLD committed while retention is OFF breaks changefeed
        coverage for every earlier watermark (its deltas were never
        retained). Clear the activation stamp so a later re-enable
        re-stamps at its own watermark — consumers behind the off-window
        get the loud replay-from-snapshot error, never a silent gap.

        Retention OFF also drops the retained-deltas registry (advancing
        the floor past the dropped entries) — otherwise ``_prune_retained``
        never runs again and vacuum treats the retained files as live
        forever, an unbounded leak for tables that toggle retention off.
        A later re-enable sees the raised floor and fails loud."""
        if self.changefeed_retention_lsn is not None:
            return
        if folded:
            new_man.properties.pop("retention_since_lsn", None)
        entries = new_man.properties.pop("retained_deltas", None)
        if entries:
            floor = int(new_man.properties.get("changefeed_floor", 0))
            new_man.properties["changefeed_floor"] = max(
                [floor] + [int(e["epoch_id"]) for e in entries]
            )

    def _public_schema(self) -> pa.Schema:
        lake = self.manifest.schema
        return pa.schema([f for f in lake if f.name not in (LSN_COL, DELETED_COL)])

    def _epoch_schemas(
        self, epoch: Epoch, public_schema: pa.Schema | None = None
    ) -> tuple[pa.Schema, pa.Schema, list[str]]:
        """Resolve schema evolution for this epoch.

        Returns ``(changelog_schema, new_lake_schema, changes)`` where
        changelog_schema = envelope + evolved payload columns.
        ``public_schema`` overrides the manifest's current public schema —
        pipelined replay plans epoch N+1 against the schema epoch N will
        commit (evolution is schema-deterministic, independent of data).
        """
        for p in epoch.paths:
            if p not in self._schema_cache:
                self._schema_cache[p] = pq.read_schema(p)
        schemas = [self._schema_cache[p] for p in epoch.paths]
        incoming = schemas[0]
        for s in schemas[1:]:
            incoming, _ = merge_schemas(incoming, s)  # widening-aware unify
        if self.event_transform is not None:
            incoming = self.event_transform.transform_schema(incoming)
        payload = pa.schema([f for f in incoming if f.name not in _ENVELOPE])
        new_public, changes = plan_evolution(
            public_schema if public_schema is not None else self._public_schema(),
            payload,
            primary_key=self.key_cols,
        )
        new_lake = pa.schema(
            list(new_public)
            + [pa.field(LSN_COL, pa.int64(), nullable=False), pa.field(DELETED_COL, pa.bool_(), nullable=False)]
        )
        chg_schema = pa.schema(
            [incoming.field("lsn"), incoming.field("op")] + list(new_public)
        )
        return chg_schema, new_lake, changes

    def _dq_args(self, epoch_id: int) -> tuple | None:
        """Gate config shipped to the map tasks, or None when the gate is
        off or the spec declares no rules."""
        if self.dq_mode is None:
            return None
        from ..functions.quality import build_checks

        checks = build_checks(self.spec)
        if not checks:
            return None
        failure_dir = os.path.join(self.table_dir, "_metrics", "dq_failures")
        return (
            self.dq_mode,
            checks,
            failure_dir,
            self.spec.name,
            self.run_context.as_dict(),
            epoch_id,
        )

    def _submit_prep(self, epoch: Epoch, chg_schema: pa.Schema) -> list:
        """Submit the map round for an epoch (prep tasks are pure — they
        read immutable segments and never touch the manifest, so pipelined
        replay may launch them before the previous epoch commits)."""
        num_partitions = self.manifest.num_partitions
        salt_map = self.salt_map
        dq = self._dq_args(epoch.epoch_id)
        refs = [
            _prep_segment_task.options(num_returns=num_partitions).remote(
                p, chg_schema, self.key_cols, num_partitions, salt_map, dq,
                self.event_transform,
            )
            for p in epoch.paths
        ]
        if num_partitions == 1:  # num_returns=1 yields a bare ref
            refs = [[r] for r in refs]
        return refs

    # ------------------------------------------------------------------
    def _ray_refs_ok(self, n_segments: int) -> bool:
        """True when an epoch of ``n_segments`` stays within the direct
        exchange's ref-matrix bound (pure predicate — no counters)."""
        return (
            self.auto_sort_refs is None
            or n_segments * self.manifest.num_partitions <= self.auto_sort_refs
        )

    def _effective_exchange(self, n_segments: int) -> str:
        """The exchange an epoch of ``n_segments`` actually uses: "ray"
        until the ref matrix (segments × partitions) crosses
        ``auto_sort_refs``, then "sort" — counted and logged, never
        silent. Callers that prefetched a "ray" map round (pipelined
        replay/tail) gate on the same bound before prefetching."""
        if self.exchange != "ray" or self._ray_refs_ok(n_segments):
            return self.exchange
        refs = n_segments * self.manifest.num_partitions
        self.auto_sort_switches += 1
        if not self._auto_sort_warned:
            self._auto_sort_warned = True
            import logging

            logging.getLogger(__name__).warning(
                "CDCEngine: epoch ref-matrix %d (= %d segments × %d partitions) "
                "exceeds auto_sort_refs=%d — using the consolidated 'sort' "
                "exchange for such epochs (see bench --refmatrix / BASELINE.md)",
                refs, n_segments, self.manifest.num_partitions, self.auto_sort_refs,
            )
        return "sort"

    def apply_epoch(self, epoch: Epoch, _precomputed: tuple | None = None) -> dict | None:
        """Apply one epoch exactly once. Returns commit info, or ``None`` if
        the epoch is already committed (resume / duplicate delivery).

        ``_precomputed`` (pipelined replay): ``(schemas_triple, prep_refs)``
        produced by ``_epoch_schemas``/``_submit_prep`` for THIS epoch."""
        man = self.manifest
        if not self.key_cols:
            # parity with the reference's merge guard (writer.py:48-51):
            # CDC apply IS a keyed MERGE; PK-less tables are append-only
            raise ValueError(
                f"CDC apply requires a primary key on table {man.table!r}"
            )
        if epoch.epoch_id <= man.applied_lsn:
            return None
        t0 = time.perf_counter()

        if _precomputed is not None:
            (chg_schema, new_lake, schema_changes), pre_prep = _precomputed
        else:
            chg_schema, new_lake, schema_changes = self._epoch_schemas(epoch)
            pre_prep = None
        num_partitions = man.num_partitions
        key_cols = self.key_cols

        ctx_ref = ray.put(
            {
                "table_dir": self.table_dir,
                "lake_schema": new_lake,
                "epoch_id": epoch.epoch_id,
                "compact_every": self.compact_every,
                "tombstone_ttl_lsn": self.tombstone_ttl_lsn,
                "retain_changefeed": self.changefeed_retention_lsn is not None,
                "part_files": {pid: ps.files for pid, ps in man.partitions.items()},
            }
        )

        use_exchange = (
            "ray" if pre_prep is not None  # prefetched map round: already routed
            else self._effective_exchange(len(epoch.segments))
        )
        if use_exchange == "ray":
            # direct hash exchange: one map task per segment (hash-split by
            # conv_id via num_returns), one reduce task per partition
            prep_refs = pre_prep if pre_prep is not None else self._submit_prep(epoch, chg_schema)
            apply_refs = [
                _apply_pid_task.remote(
                    ctx_ref, pid, key_cols, *[refs[pid] for refs in prep_refs]
                )
                for pid in range(num_partitions)
            ]
            metas = [m for m in ray.get(apply_refs) if m is not None]
        else:
            salt_map = self.salt_map
            dq = self._dq_args(epoch.epoch_id)
            transform = self.event_transform

            def prep(batch: pa.Table) -> pa.Table:
                _single_threaded_arrow()
                if transform is not None:
                    batch = transform(batch)
                batch = normalize_table(batch, chg_schema)
                _reject_null_keys(batch, key_cols, "changelog batch")
                if dq is not None:
                    mode, checks, failure_dir, table_name, rc, epoch_id = dq
                    import uuid

                    batch = _dq_gate_changes(
                        batch, checks, mode, failure_dir, table_name, key_cols,
                        f"epoch-{epoch_id:012d}-{uuid.uuid4().hex}", rc,
                    )
                if _has_patches(batch):
                    # patch keys route unreduced (reduce-side exact fold);
                    # everything else still combines — see _prep_segment_task
                    codes = _pair_codes(batch, key_cols)
                    member = pc.is_in(
                        codes,
                        value_set=pc.unique(
                            pc.filter(codes, pc.equal(batch.column("op"), "P"))
                        ),
                    )
                    batch = pa.concat_tables(
                        [
                            lww_reduce(
                                batch.filter(pc.invert(member)),
                                key_cols,
                                _lww_order(chg_schema, "lsn"),
                            ),
                            batch.filter(member),
                        ]
                    )
                else:
                    batch = lww_reduce(batch, key_cols, _lww_order(chg_schema, "lsn"))  # shuffle combiner
                pid = salted_partition_ids(batch, key_cols, num_partitions, salt_map)
                return batch.append_column("pid", pa.array(pid, pa.int64()))

            # segment files are typically far below the 128 MiB block
            # target, so the default read yields one block per file and the
            # prep stage's parallelism would be capped at len(paths) — far
            # below the CPU count. Split the read so every core gets work.
            n_cpus = int(ray.cluster_resources().get("CPU", 8))
            blocks = max(len(epoch.paths), 2 * n_cpus)
            ds = ray.data.read_parquet(epoch.paths, override_num_blocks=blocks)
            ds = ds.map_batches(prep, batch_format="pyarrow")
            metas_ds = ds.groupby("pid").map_groups(
                make_partition_applier(ctx_ref, key_cols), batch_format="pyarrow"
            )
            metas = metas_ds.take_all()  # one small row per touched partition

        # raw change-event count for throughput accounting. Segment names
        # carry their LSN range; ranges are dense for engine-written logs
        # (generator, writer staging), so no footer read is needed —
        # metrics-only accounting, not a correctness input.
        events_raw = sum(s.max_lsn - s.min_lsn + 1 for s in epoch.segments)
        dur = time.perf_counter() - t0
        rc = self.run_context.as_dict()
        metrics_rows = [
            {
                "epoch_id": epoch.epoch_id,
                "partition": m["pid"],
                "events_applied": m["events"],
                "rows_live": m["rows_live"],
                "tombstones": m["tombstones"],
                "bytes_written": m["bytes"],
                "applied_lsn": epoch.epoch_id,
                "duration_s": dur,
                **rc,
            }
            for m in metas
        ]
        metrics_mod.write_epoch_metrics(self.table_dir, epoch.epoch_id, metrics_rows)

        new_man = Manifest.from_json(man.to_json())  # deep copy
        new_man.version = man.version + 1
        new_man.applied_lsn = epoch.epoch_id
        if schema_changes:
            new_man.set_schema(new_lake)
            new_man.schema_version += 1
        for m in metas:
            pid = int(m["pid"])
            prev = new_man.partitions.get(pid)
            # zone-map stats ride the meta row: a dict from the direct
            # exchange, JSON text from the sort exchange's Arrow meta table
            zstats = m.get("zone_stats")
            if isinstance(zstats, str):
                zstats = json.loads(zstats) if zstats else {}
            if m["mode"] == "base" or prev is None:
                if prev is not None:
                    self._retire_deltas(new_man, prev.files)
                if m.get("retained_path"):
                    new_man.properties.setdefault("retained_deltas", []).append(
                        {
                            "path": m["retained_path"],
                            "epoch_id": epoch.epoch_id,
                            "retired_lsn": epoch.epoch_id,
                        }
                    )
                files = [m["path"]]  # compaction replaces the whole stack
                fstats = {m["path"]: zstats} if zstats else {}
            else:
                files = [*prev.files, m["path"]]  # delta appends (oldest first)
                fstats = prev.pruned_stats()
                if zstats:
                    fstats[m["path"]] = zstats
            new_man.partitions[pid] = PartitionState(
                files=files,
                applied_lsn=epoch.epoch_id,
                rows=int(m["rows_live"]),
                file_stats=fstats,
            )
        new_man.history.append(
            {
                "epoch_id": epoch.epoch_id,
                "version": new_man.version,
                "events": events_raw,
                "partitions_touched": len(metas),
                "schema_changes": schema_changes,
                "duration_s": round(dur, 4),
                "patches_discarded": sum(
                    int(m.get("patches_discarded") or 0) for m in metas
                ),
                **rc,
            }
        )
        self._prune_retained(new_man)
        self._invalidate_retention_coverage(
            new_man, folded=any(m["mode"] == "base" for m in metas)
        )
        try:
            self.store.commit(new_man)
        except CommitConflict:
            # another applier committed concurrently. If ITS commit covers
            # this epoch, this was duplicate delivery by a racing tailer —
            # rebase and no-op (staged files are byte-identical: immutable
            # segments + deterministic kernels + deterministic names, so
            # the clobber during staging was harmless). A conflict from a
            # commit that does NOT cover the epoch (e.g. a writer-surface
            # append) is a real single-applier violation — re-raise.
            latest = self.store.load()
            if latest is not None and latest.applied_lsn >= epoch.epoch_id:
                self.manifest = latest
                return None
            raise
        self.manifest = new_man
        return new_man.history[-1]

    def replay(
        self,
        changelog: ChangeLog,
        segments_per_epoch: int = 4,
        vacuum: bool = True,
        pipelined: bool = False,
        auto_mitigate_skew: bool = False,
    ) -> ReplayStats:
        """Apply all not-yet-committed epochs; resumes from the manifest
        watermark (FIXTURES.md F6).

        ``pipelined=True`` (ray exchange only) overlaps epoch N+1's map
        round with epoch N's reduce+commit — the "keep tailing the binlog
        while applying" shape of a continuous ingester. Safe because prep
        tasks are pure (immutable segments, no manifest reads) and the
        schema for N+1 is computable from the schema N WILL commit
        (evolution is schema-deterministic); commits stay strictly
        serialized, so exactly-once semantics are unchanged.

        ``auto_mitigate_skew=True`` runs :meth:`mitigate_skew` after each
        committed epoch (inspecting just that epoch's lineage metrics):
        hot keys detected in epoch N are salted + migrated before epoch
        N+1 routes. In pipelined mode a successful mitigation invalidates
        the prefetched map round (it was routed with the old salt map)
        and re-submits it."""
        stats = ReplayStats()
        t0 = time.perf_counter()
        epochs = changelog.epochs(segments_per_epoch, after_lsn=self.manifest.applied_lsn)
        if not (
            pipelined and self.exchange == "ray" and self._ray_refs_ok(segments_per_epoch)
        ):
            for epoch in epochs:
                info = self.apply_epoch(epoch)
                if info is None:
                    stats.epochs_skipped += 1
                else:
                    stats.epochs_applied += 1
                    stats.events += info["events"]
                    stats.schema_changes.extend(info["schema_changes"])
                    if auto_mitigate_skew:
                        self.mitigate_skew(epoch_id=epoch.epoch_id)
        else:
            public = self._public_schema()
            pending: tuple | None = None
            for i, epoch in enumerate(epochs):
                if pending is None:
                    schemas = self._epoch_schemas(epoch, public)
                    prep = self._submit_prep(epoch, schemas[0])
                else:
                    schemas, prep = pending
                # the public schema AFTER this epoch commits (new_lake minus
                # the internal bookkeeping columns)
                next_public = pa.schema(
                    [f for f in schemas[1] if f.name not in (LSN_COL, DELETED_COL)]
                )
                if i + 1 < len(epochs):  # prefetch window = 1 epoch
                    nxt = epochs[i + 1]
                    nschemas = self._epoch_schemas(nxt, next_public)
                    pending = (nschemas, self._submit_prep(nxt, nschemas[0]))
                else:
                    pending = None
                info = self.apply_epoch(epoch, _precomputed=(schemas, prep))
                public = next_public
                if info is None:
                    stats.epochs_skipped += 1
                else:
                    stats.epochs_applied += 1
                    stats.events += info["events"]
                    stats.schema_changes.extend(info["schema_changes"])
                    if auto_mitigate_skew and self.mitigate_skew(epoch_id=epoch.epoch_id):
                        if pending is not None:
                            # prefetched prep routed with the pre-salt map;
                            # re-submit so the hot key lands salted
                            nschemas, _stale = pending
                            pending = (nschemas, self._submit_prep(epochs[i + 1], nschemas[0]))
        stats.seconds = time.perf_counter() - t0
        if vacuum and stats.epochs_applied:
            self.store.vacuum(self.manifest)
        return stats

    # ------------------------------------------------------------------
    def tail(
        self,
        changelog: ChangeLog,
        poll_s: float = 2.0,
        max_polls: int | None = None,
        idle_stop_polls: int | None = None,
        views: list | None = None,
        **replay_kw,
    ) -> ReplayStats:
        """Continuously FOLLOW the changelog: poll for segments past the
        manifest watermark and apply them — the long-running "tail the
        binlog" deployment shape (the north-star's continuous ingester;
        each poll is one exactly-once :meth:`replay`, so a killed tailer
        resumes from the last committed epoch like any other run).

        ``views``: maintained views (``pipelines.incremental``) to
        ``advance()`` after every poll that applied epochs — the one-call
        "live binlog → fresh materialized views" loop. Advancing inside
        the poll keeps each view within the changefeed retention horizon
        by construction (it can never lag more than one poll of epochs),
        which is the deployment shape the horizon contract assumes. A
        view advance failure propagates (fail-loud: the tailer's owner
        must decide between ``rebuild()`` and dropping the view) —
        the LAKE epochs it follows are already durably committed, so a
        restarted tailer resumes and the view recovers on its next
        advance.

        Stop conditions (both optional; pass neither to follow forever):
        ``max_polls`` bounds total polls, ``idle_stop_polls`` stops after
        that many CONSECUTIVE empty polls (drain-then-exit for batch
        catch-up jobs). ``replay_kw`` forwards to :meth:`replay`.

        ``pipelined=True`` (ray exchange) pipelines ACROSS poll
        boundaries, not just within one replay: while epoch N applies,
        the tailer re-lists the log and prefetches the map round of
        whatever segment arrived in the meantime — a fast producer never
        stalls the poll cycle behind reduce+commit. Epoch boundaries may
        differ from the serial tail (an epoch forms from the segments
        visible at prefetch time), which is already the resume contract —
        exactly-once is by watermark, never by boundary. Returns the
        aggregate stats over all polls."""
        if (
            replay_kw.get("pipelined")
            and self.exchange == "ray"
            and self._ray_refs_ok(replay_kw.get("segments_per_epoch", 4))
        ):
            kw = dict(replay_kw)
            kw.pop("pipelined")
            return self._tail_pipelined(
                changelog, poll_s, max_polls, idle_stop_polls, views, **kw
            )
        total = ReplayStats()
        polls = idle = 0
        while True:
            stats = self.replay(changelog, **replay_kw)
            total.epochs_applied += stats.epochs_applied
            total.epochs_skipped += stats.epochs_skipped
            total.events += stats.events
            total.seconds += stats.seconds
            total.schema_changes.extend(stats.schema_changes)
            if stats.epochs_applied and views:
                for v in views:
                    v.advance()
            polls += 1
            idle = 0 if stats.epochs_applied else idle + 1
            if max_polls is not None and polls >= max_polls:
                return total
            if idle_stop_polls is not None and idle >= idle_stop_polls:
                return total
            if poll_s > 0:
                time.sleep(poll_s)

    def _tail_pipelined(
        self,
        changelog: ChangeLog,
        poll_s: float,
        max_polls: int | None,
        idle_stop_polls: int | None,
        views: list | None,
        segments_per_epoch: int = 4,
        vacuum: bool = True,
        auto_mitigate_skew: bool = False,
    ) -> ReplayStats:
        """The cross-poll pipelined tail loop (see :meth:`tail`): one
        persistent prefetch window that survives poll boundaries. The
        re-list while an epoch applies is what removes the serial tail's
        bubble (apply → sleep → list → prep from cold); commits stay
        strictly serialized through :meth:`apply_epoch`, so exactly-once
        and crash-resume semantics are identical to the serial loop.
        A poll = one listing attempt (queue-empty at the loop top, or the
        in-flight re-list that found fresh segments); ``max_polls`` bounds
        BOTH kinds, so a sustained producer cannot keep a bounded-poll
        call alive — once the bound is hit, no further listing happens
        and the loop drains what it already listed. Views advance at
        every poll boundary (before each fresh listing and at drain), the
        same "never more than one poll of epochs behind" retention shape
        the serial tail gives — the changefeed-horizon contract rests on
        it."""
        total = ReplayStats()
        t0 = time.perf_counter()
        polls = idle = 0
        applied_since_advance = 0
        public = self._public_schema()
        queue: list = []  # listed-but-not-prepped epochs
        pending: tuple | None = None  # (epoch, schemas, prep) in flight
        listed_through = self.manifest.applied_lsn  # newest lsn we've listed
        any_applied = False

        def _drain_views() -> None:
            nonlocal applied_since_advance
            if applied_since_advance and views:
                for v in views:
                    v.advance()
            applied_since_advance = 0

        while True:
            if pending is None and not queue:
                queue = changelog.epochs(segments_per_epoch, after_lsn=listed_through)
                polls += 1
                if not queue:
                    _drain_views()
                    idle += 1
                    if max_polls is not None and polls >= max_polls:
                        break
                    if idle_stop_polls is not None and idle >= idle_stop_polls:
                        break
                    if poll_s > 0:
                        time.sleep(poll_s)
                    continue
                idle = 0
                listed_through = queue[-1].epoch_id
                if max_polls is not None and polls >= max_polls:
                    # honor the bound but finish what this poll listed
                    max_polls = polls
            if pending is None:
                ep = queue.pop(0)
                schemas = self._epoch_schemas(ep, public)
                prep = self._submit_prep(ep, schemas[0])
            else:
                ep, schemas, prep = pending
                pending = None
            next_public = pa.schema(
                [f for f in schemas[1] if f.name not in (LSN_COL, DELETED_COL)]
            )
            # prefetch the NEXT epoch while this one applies — re-listing
            # the log when the local queue is dry, so segments that arrive
            # DURING the apply overlap with it instead of waiting a poll.
            # The re-list is a POLL: it respects max_polls (else a
            # sustained producer would keep a bounded call alive forever)
            # and advances views first, so a view never lags more than
            # one poll of epochs (the retention-horizon contract).
            if not queue and (max_polls is None or polls < max_polls):
                fresh = changelog.epochs(segments_per_epoch, after_lsn=listed_through)
                if fresh:
                    _drain_views()
                    queue = fresh
                    listed_through = queue[-1].epoch_id
                    polls += 1
                    idle = 0
            if queue:
                nxt = queue.pop(0)
                nschemas = self._epoch_schemas(nxt, next_public)
                pending = (nxt, nschemas, self._submit_prep(nxt, nschemas[0]))
            info = self.apply_epoch(ep, _precomputed=(schemas, prep))
            public = next_public
            if info is None:
                total.epochs_skipped += 1
            else:
                any_applied = True
                applied_since_advance += 1
                total.epochs_applied += 1
                total.events += info["events"]
                total.schema_changes.extend(info["schema_changes"])
                if auto_mitigate_skew and self.mitigate_skew(epoch_id=ep.epoch_id):
                    if pending is not None:
                        nxt, nschemas, _stale = pending
                        pending = (nxt, nschemas, self._submit_prep(nxt, nschemas[0]))
            if pending is None and not queue:
                _drain_views()
                if max_polls is not None and polls >= max_polls:
                    break
        total.seconds = time.perf_counter() - t0
        if vacuum and any_applied:
            self.store.vacuum(self.manifest)
        return total

    def snapshot(
        self,
        pids: list[int] | None = None,
        columns: list[str] | None = None,
        predicate: list | None = None,
        prune_stats: dict | None = None,
        version: int | None = None,
        as_of_ts: float | None = None,
    ) -> "ray.data.Dataset":
        """Committed live rows as a streaming Dataset.

        ``version`` / ``as_of_ts`` time-travel the STREAMING reader to an
        older committed manifest (same semantics as ``snapshot_arrow``:
        every commit leaves its manifest snapshot; valid until vacuum
        removes the superseded data files) — at 100 TB this path, not the
        driver-side Arrow read, is how time travel is actually consumed.
        The projected schema is the RESOLVED version's (a snapshot taken
        before a schema evolution has the old columns).

        Merge-on-read: each task resolves ONE hash partition — reads its
        manifest-listed base+delta files, LWW-reduces, drops tombstones,
        projects public columns. Rows are key-sorted WITHIN a partition
        (stable turn ordering is partition-local; ``publish_snapshot``
        preserves it per partition directory).

        ``pids`` prunes the read to the given hash partitions — the
        partition-pushdown path for consumers that know the routing
        (incremental view maintenance, key-range scans): at 100 TB a
        reader interested in one entity class touches its partitions'
        files only, never the table.

        ``columns`` prunes the read to the given payload columns (output
        order follows the argument): only the PK, LWW-order and tombstone
        columns plus the requested payload are decoded from parquet — a
        consumer reading 2 of 6 columns never pulls the wide ``text``
        bytes through the merge.

        ``predicate`` — conjunction of ``(column, op, value)`` triples
        (``state/zonemap``) pushed down FOUR ways before the residual
        row filter runs inside the merge tasks:

        1. partition skip via manifest zone maps (always merge-safe:
           a merged row is a version of some file's row);
        2. per-file skip on PRIMARY-KEY conjuncts (LWW survivorship is
           per key, so a file whose key range excludes a key cannot
           affect it); PK-less append tables file-skip on ANY conjunct
           (concat, not merge);
        3. per-ROW-GROUP skip inside each opened file via footer stats
           (same conjunct-safety rule as 2) — base files are PK-sorted,
           so a key predicate decodes only the matching slice of the
           base even on a hash-spread table where tiers 1-2 can't bite;
        4. residual ``filter`` on each merged chunk — applied before
           the public projection, so predicate columns need not be in
           ``columns``.

        ``prune_stats`` (optional dict) receives the skip counters:
        ``partitions_total/read``, ``files_total/read``."""
        if as_of_ts is not None:
            if version is not None:
                raise ValueError("pass version or as_of_ts, not both")
            version = self.store.version_at(as_of_ts)
            if version is None:
                raise ValueError(
                    f"no version of {self.table_dir!r} was committed at or "
                    f"before ts={as_of_ts}"
                )
        man = self.manifest if version is None else self.store.load(version)
        full_public = pa.schema(
            [f for f in man.schema if f.name not in (LSN_COL, DELETED_COL)]
        )
        public = full_public
        if columns is not None:
            bad = [c for c in columns if c not in public.names]
            if bad:
                raise ValueError(
                    f"unknown or internal columns {bad}; available: {public.names}"
                )
            public = pa.schema([public.field(c) for c in columns])
        predicate = list(predicate or [])
        if predicate:
            zone.validate_predicate(predicate)
            bad = [c[0] for c in predicate if c[0] not in full_public.names]
            if bad:
                raise ValueError(
                    f"predicate on unknown or internal columns {bad}; "
                    f"available: {full_public.names}"
                )
        key_cols = tuple(man.primary_key)
        # PK conjuncts may prune FILES under merge-on-read; on a PK-less
        # (append-only, concat) table every conjunct is file-safe
        file_cj, _ = (
            zone.split_key_conjuncts(predicate, key_cols) if key_cols else (predicate, [])
        )
        want = None if pids is None else set(pids)
        counters = {"partitions_total": 0, "partitions_read": 0,
                    "files_total": 0, "files_read": 0}
        parts = []
        for pid in sorted(man.partitions):
            ps = man.partitions[pid]
            if not ps.files or (want is not None and pid not in want):
                continue
            counters["partitions_total"] += 1
            counters["files_total"] += len(ps.files)
            fstats = ps.pruned_stats()
            if predicate and not zone.partition_can_match(fstats, ps.files, predicate):
                continue
            files = ps.files
            if file_cj:
                files = [f for f in files if zone.file_can_match(fstats.get(f), file_cj)]
                if not files:
                    continue
            counters["partitions_read"] += 1
            counters["files_read"] += len(files)
            parts.append({"pid": pid, "files": files})
        if prune_stats is not None:
            prune_stats.update(counters)
        if not parts:
            return ray.data.from_arrow(public.empty_table())
        lake = man.schema
        if columns is not None:
            # predicate columns must survive the projected merge even when
            # the caller's output columns don't include them
            pred_cols = [c[0] for c in predicate if c[0] not in columns]
            lake = pruned_lake_schema(lake, key_cols, columns + pred_cols)

        def post(t: pa.Table) -> pa.Table:
            if predicate:
                t = zone.filter_table(t, predicate)
            return t.select(public.names)

        def resolve(batch: pa.Table):
            _single_threaded_arrow()
            yielded = False
            for row in batch.to_pylist():
                files = list(row["files"])
                if key_cols and len(key_cols) <= 2 and _is_cdc_sorted(files):
                    # streamed row-group merge: peak memory O(chunk × files),
                    # so partition size is not bounded by worker heap.
                    # file_cj (PK conjuncts; ANY conjunct on PK-less) also
                    # skips row groups INSIDE each file via footer stats —
                    # base files are PK-sorted, so a key predicate decodes
                    # only the matching slice of the base
                    for chunk in iter_merged_partition(
                        files, lake, key_cols, conjuncts=file_cj
                    ):
                        out = post(chunk.filter(pc.invert(chunk.column(DELETED_COL))))
                        if out.num_rows:
                            yielded = True
                            yield out
                else:  # writer-staged (unsorted) or wide-PK table: full merge
                    t = merge_partition_files(files, lake, key_cols, conjuncts=file_cj)
                    t = post(t.filter(pc.invert(t.column(DELETED_COL))))
                    if t.num_rows:
                        yielded = True
                        yield t
            if not yielded:
                yield public.empty_table()

        return ray.data.from_items(parts).map_batches(
            resolve, batch_format="pyarrow", batch_size=1
        )

    def column_bounds(self, column: str) -> tuple | None:
        """Global (min, max) of a public column from the manifest zone
        maps alone — no file opens, O(live files) driver work. The
        metadata answer to "what's the table's time watermark" /
        "what key range does it span". Returns None when any live file
        lacks stats for the column (pre-upgrade files, untracked type)
        or when no live rows carry a value — a conservative caller falls
        back to a scan. Bounds may be slightly WIDER than the live data
        (tombstoned rows count, truncated string maxima are bumped):
        correct for pruning decisions, not an exact aggregate."""
        man = self.manifest
        lo = hi = None
        unbounded_hi = False
        for ps in man.partitions.values():
            stats = ps.pruned_stats()
            for f in ps.files:
                s = stats.get(f, {}).get(column)
                if s is None:
                    return None  # a file we know nothing about
                if s["min"] is None:
                    continue  # all-null file for this column
                lo = s["min"] if lo is None else min(lo, s["min"])
                if s["open"] or s["max"] is None:
                    unbounded_hi = True
                else:
                    hi = s["max"] if hi is None else max(hi, s["max"])
        if lo is None:
            return None
        return (lo, None if unbounded_hi else hi)

    def compact(
        self,
        pids: list[int] | None = None,
        sort_by: list[str] | None = None,
        target_file_rows: int | None = None,
        cluster: str = "sort",
    ) -> int:
        """Maintenance compaction (the OPTIMIZE analogue): fold every
        multi-file partition's base+delta stack into one base file,
        regardless of the automatic threshold. One Ray task per partition;
        commits a single new manifest version. Returns partitions folded.

        ``sort_by`` — clustering for PK-LESS (append-only) tables: each
        partition is rewritten sorted by these columns and split into
        files of at most ``target_file_rows`` rows (default: one file),
        so consecutive files carry tight, non-overlapping zone-map ranges
        and a range predicate on the cluster column skips whole files
        (``state/zonemap``: append tables file-skip on ANY conjunct).
        This is the OPTIMIZE-with-clustering pass an append-heavy audit
        table needs after many small commits. Refused on keyed tables —
        their base files must stay PK-sorted for the streamed k-way LWW
        merge; re-clustering them would break merge-on-read.

        ``cluster`` — the layout within a clustering pass: ``"sort"``
        (default) is lexicographic on ``sort_by`` (tight ranges on the
        FIRST column — right when predicates hit one leading column);
        ``"zorder"`` interleaves the columns' rank bits (Morton order, ≥2
        columns) so every file's zone ranges are narrow on ALL the
        clustered columns and selective predicates on ANY of them skip
        files (see :func:`~..state.zonemap.zorder_permutation`).

        Note: folding ends the changefeed availability for watermarks older
        than the current applied LSN (read_changes documents the horizon)."""
        man = self.manifest
        if cluster not in ("sort", "zorder"):
            raise ValueError(f"cluster must be 'sort' or 'zorder', got {cluster!r}")
        if cluster == "zorder" and (not sort_by or len(sort_by) < 2):
            raise ValueError("cluster='zorder' needs sort_by with at least 2 columns")
        if sort_by:
            if self.key_cols:
                raise ValueError(
                    "sort_by clustering is only for PK-less (append-only) tables: "
                    "a keyed table's base files must stay PK-sorted for the "
                    "streamed LWW merge"
                )
            bad = [c for c in sort_by if c not in man.schema.names]
            if bad:
                raise ValueError(f"sort_by columns {bad} not in schema {man.schema.names}")
        min_files = 0 if sort_by else 1  # re-cluster even single-file partitions
        targets = [
            pid
            for pid in sorted(man.partitions)
            if (pids is None or pid in pids) and len(man.partitions[pid].files) > min_files
        ]
        if not targets:
            return 0
        lake = man.schema
        key_cols = self.key_cols
        table_dir = self.table_dir
        epoch_id = man.applied_lsn
        ttl = self.tombstone_ttl_lsn
        zcols = _zone_cols(lake)
        # output dir is salted with the TARGET manifest version: applied_lsn
        # does not advance on append-table commits, so two maintenance
        # compactions at the same watermark would otherwise os.replace the
        # previous run's LIVE committed files in place (corrupting time
        # travel, and the committed table itself on a crash mid-fold). The
        # version always advances per commit; a crashed attempt's orphans
        # are unreferenced and safely overwritten by its own retry.
        new_version = man.version + 1

        @ray.remote
        def fold(pid: int, files: list[str]) -> dict:
            _single_threaded_arrow()
            out_dir = os.path.join(
                table_dir,
                "data",
                f"part={pid:05d}",
                f"epoch={epoch_id:012d}",
                f"fold=v{new_version:08d}",
            )
            os.makedirs(out_dir, exist_ok=True)
            if sort_by:
                # cluster pass: concat (PK-less), order, split into bounded
                # files — each slice zero-copies the ordered table
                t = merge_partition_files(files, lake, key_cols)
                if cluster == "zorder":
                    from ..state.zonemap import zorder_permutation

                    t = t.take(zorder_permutation(t, sort_by))  # ONE wide gather
                else:
                    t = t.sort_by([(c, "ascending") for c in sort_by])
                per = int(target_file_rows or max(t.num_rows, 1))
                out = []
                for i in range(max(1, -(-t.num_rows // per))):
                    sub = t.slice(i * per, per)
                    path = os.path.join(
                        out_dir, f"sorted-{pid:05d}-{epoch_id:012d}-c{i:04d}.parquet"
                    )
                    tmp = f"{path}.tmp-{os.getpid()}"
                    pq.write_table(sub, tmp)
                    os.replace(tmp, path)
                    live = sub.num_rows - (pc.sum(sub.column(DELETED_COL)).as_py() or 0)
                    out.append((path, int(live), zone.table_stats(sub, zcols)))
                return {"pid": pid, "files": out}
            path = os.path.join(out_dir, f"base-{pid:05d}-{epoch_id:012d}.parquet")
            tmp = f"{path}.tmp-{os.getpid()}"
            rows, tombstones, zstats = _write_merged_stream(
                tmp, files, lake, key_cols, epoch_id=epoch_id, ttl=ttl
            )
            os.replace(tmp, path)
            return {
                "pid": pid,
                "files": [(path, int(rows - tombstones), zstats)],
            }

        metas = ray.get([fold.remote(pid, man.partitions[pid].files) for pid in targets])
        new_man = Manifest.from_json(man.to_json())
        new_man.version = new_version
        for m in metas:
            self._retire_deltas(new_man, new_man.partitions[m["pid"]].files)
            new_man.partitions[m["pid"]] = PartitionState(
                files=[p for p, _, _ in m["files"]],
                applied_lsn=epoch_id,
                rows=sum(live for _, live, _ in m["files"]),
                file_stats={p: z for p, _, z in m["files"] if z},
            )
        self._prune_retained(new_man)
        self._invalidate_retention_coverage(new_man, folded=bool(metas))
        new_man.history.append(
            {
                "op": "compact",
                "version": new_man.version,
                "partitions": len(metas),
                **({"sort_by": list(sort_by), "cluster": cluster} if sort_by else {}),
                **self.run_context.as_dict(),
            }
        )
        self.store.commit(new_man)
        self.manifest = new_man
        return len(metas)

    def mitigate_skew(
        self,
        factor: float = 4.0,
        fanout: int | None = None,
        min_share: float = 0.25,
        epoch_id: int | None = None,
    ) -> dict:
        """Detect → salt → migrate: the response half of ``detect_skew``
        (SURVEY.md §4.2/§7.4 — salting is a north-star requirement, not
        just a metric).

        1. Partitions whose latest-epoch ``events_applied`` exceeds
           ``factor`` × median are inspected for dominant leading-key
           values (≥ ``min_share`` of the partition's live rows).
        2. Each new hot key is added to the manifest's ``salt_map`` with
           ``fanout`` sub-partitions — future epochs route its rows by
           ``hash(key0) + hash(key1) % fanout`` (full PK still
           single-partition, so per-key LWW is untouched).
        3. One task per affected partition migrates the key's EXISTING
           rows to their salted homes (tombstones included), staged files
           + one atomic manifest commit. Changefeed consumers behind the
           migration must re-sync (moved files read as ``base``), same as
           after a compaction.

        Single-column-PK tables return {} (≤1 live row per key — no
        residual skew to split). Returns the newly salted keys."""
        if len(self.key_cols) < 2:
            return {}
        man = self.manifest
        num_partitions = man.num_partitions
        fanout = fanout or min(8, num_partitions)
        if fanout < 2 or num_partitions < 2:
            return {}
        hot = metrics_mod.detect_skew(self.table_dir, factor, epoch_id=epoch_id)
        affected = [
            h["partition"]
            for h in hot
            if man.partitions.get(h["partition"]) and man.partitions[h["partition"]].files
        ]
        if not affected:
            return {}
        lake = man.schema
        key_cols = self.key_cols
        known = self.salt_map

        cand = ray.get(
            [
                _hot_keys_task.remote(man.partitions[pid].files, lake, key_cols, min_share)
                for pid in affected
            ]
        )
        new_keys = {
            str(v): fanout for vals in cand for v in vals if str(v) not in known
        }
        if not new_keys:
            return {}

        table_dir = self.table_dir
        version = man.version + 1
        metas = ray.get(
            [
                _resalt_partition_task.remote(
                    table_dir,
                    pid,
                    man.partitions[pid].files,
                    lake,
                    key_cols,
                    {**known, **new_keys},
                    num_partitions,
                    version,
                    man.applied_lsn,
                )
                for pid in affected
            ]
        )
        new_man = Manifest.from_json(man.to_json())
        new_man.version = version
        new_man.properties = {**new_man.properties, "salt_map": {**known, **new_keys}}
        # TWO PHASES: replace every migrated source's file list first, THEN
        # append moved files. A migrated partition can itself be another
        # migration's TARGET (two hot partitions salting into each other);
        # interleaving replace/append would drop the earlier append.
        for m in metas:
            src = int(m["pid"])
            self._retire_deltas(new_man, new_man.partitions[src].files)
            new_man.partitions[src] = PartitionState(
                files=[m["kept_path"]] if m["kept_path"] else [],
                applied_lsn=man.applied_lsn,
                rows=int(m["kept_live"]),
                file_stats={m["kept_path"]: m["kept_stats"]}
                if m["kept_path"] and m.get("kept_stats")
                else {},
            )
        for m in metas:
            for tpid, (path, live, zstats) in m["moved"].items():
                st = new_man.partitions.setdefault(int(tpid), PartitionState())
                st.files.append(path)
                st.rows += int(live)
                st.applied_lsn = man.applied_lsn
                if zstats:
                    st.file_stats[path] = zstats
        new_man.history.append(
            {
                "op": "salt",
                "version": version,
                "keys": sorted(new_keys),
                "fanout": fanout,
                "partitions_migrated": len(metas),
                **self.run_context.as_dict(),
            }
        )
        self._prune_retained(new_man)
        self._invalidate_retention_coverage(new_man, folded=bool(metas))
        self.store.commit(new_man)
        self.manifest = new_man
        return new_keys

    def reshard(self, new_num_partitions: int) -> dict:
        """Change the table's hash-partition count in ONE atomic commit —
        the explicit repartitioning operation for a cluster-size change
        (grow the cluster 4× → widen the merge/commit unit to match; the
        north rule's "partitioning handled explicitly" at the lifecycle
        level, not just per-epoch).

        One migration task per non-empty OLD partition (the same staged
        two-phase machinery as salt migration, ``_resalt_partition_task``):
        merge the partition's file stack, route every row by
        ``hash(key) % NEW_P`` (salt fanout preserved — a salted key's
        sub-partitions re-home under the new modulus), write one staged
        ``base-…-fromNNN`` file per target. Visibility is the single
        manifest swap; a crash before commit leaves only unreferenced
        staged files (vacuumed later). Subsequent epochs route with the
        committed manifest's partition count automatically.

        Consumer contract: migrated rows read as ``base`` — changefeed
        consumers behind this point must re-sync (the compaction-horizon
        rule), and IVM views detect the partition-count change and demand
        a ``rebuild()``. Task memory is O(old partition), same as
        compaction. Returns a summary dict."""
        man = self.manifest
        old_p = int(man.num_partitions)
        new_p = int(new_num_partitions)
        if new_p < 1:
            raise ValueError(f"new_num_partitions must be >= 1, got {new_p}")
        if new_p == old_p:
            return {"num_partitions": old_p, "partitions_migrated": 0}
        salt_map = self.salt_map
        if salt_map and max(int(v) for v in salt_map.values()) > new_p:
            raise ValueError(
                "salt fanout exceeds the new partition count; unsalt or pick "
                f"new_num_partitions >= {max(int(v) for v in salt_map.values())}"
            )
        lake = man.schema
        version = man.version + 1
        affected = [pid for pid in sorted(man.partitions) if man.partitions[pid].files]
        metas = ray.get(
            [
                _resalt_partition_task.remote(
                    self.table_dir,
                    pid,
                    man.partitions[pid].files,
                    lake,
                    self.key_cols,
                    salt_map,
                    new_p,
                    version,
                    man.applied_lsn,
                )
                for pid in affected
            ]
        )
        new_man = Manifest.from_json(man.to_json())
        new_man.version = version
        new_man.num_partitions = new_p
        # every old file retires (retention registry) and the partition map
        # is rebuilt from scratch at the new modulus
        for pid in affected:
            self._retire_deltas(new_man, man.partitions[pid].files)
        new_man.partitions = {}
        rows_moved = 0
        for m in metas:
            src = int(m["pid"])
            if m["kept_path"]:
                # 'kept' = new pid happens to equal the old number (only
                # possible when src < new_p)
                st = new_man.partitions.setdefault(src, PartitionState())
                st.files.append(m["kept_path"])
                st.rows += int(m["kept_live"])
                st.applied_lsn = man.applied_lsn
                if m.get("kept_stats"):
                    st.file_stats[m["kept_path"]] = m["kept_stats"]
            for tpid, (path, live, zstats) in m["moved"].items():
                st = new_man.partitions.setdefault(int(tpid), PartitionState())
                st.files.append(path)
                st.rows += int(live)
                st.applied_lsn = man.applied_lsn
                rows_moved += int(live)
                if zstats:
                    st.file_stats[path] = zstats
        new_man.history.append(
            {
                "op": "reshard",
                "version": version,
                "from_partitions": old_p,
                "to_partitions": new_p,
                "partitions_migrated": len(metas),
                **self.run_context.as_dict(),
            }
        )
        self._prune_retained(new_man)
        self._invalidate_retention_coverage(new_man, folded=bool(metas))
        self.store.commit(new_man)
        self.manifest = new_man
        return {
            "num_partitions": new_p,
            "partitions_migrated": len(metas),
            "rows_moved": rows_moved,
        }

    def vacuum(self, grace_s: float = 0.0) -> int:
        """Delete data files not referenced by the CURRENT manifest (ends
        time travel to superseded versions). ``grace_s`` spares younger
        unreferenced files — pass a few minutes when other writers may be
        staging concurrently (see ``ManifestStore.vacuum``)."""
        return self.store.vacuum(self.manifest, grace_s=grace_s)

    def purge(self, keys: list, vacuum_grace_s: float = 0.0) -> dict:
        """Right-to-be-forgotten HARD delete by leading primary-key
        value(s): physically remove every row of the given keys —
        current versions, superseded versions and tombstones alike —
        from the table directory. Unlike a CDC delete event (which
        writes a tombstone that *records the key* forever), after a
        purge the key value itself no longer exists in any file the
        table owns.

        Mechanics: keys route to partitions exactly like :meth:`lookup`
        (salt fanout included); one Ray task per touched partition
        rewrites ONLY the files whose zone maps / content actually
        contain a purged key (basename preserved — epoch lineage and the
        merge-on-read stack order survive; a file whose every row is
        purged is dropped from the manifest), covering both the live
        stack and the changefeed retention registry. Purged keys leave
        the salt map (keeping the VALUE there would defeat the purge).
        One OCC manifest commit publishes the result, then an immediate
        :meth:`vacuum` erases every superseded file — this is the point,
        not a side effect: without it, pre-purge versions would still
        hold the data. Consequences, by design:

        - time travel / RESTORE to pre-purge versions fails loud
          (vacuum's documented contract);
        - downstream consumers and maintained views that already read
          the key hold copies this table cannot reach — IVM views must
          be ``rebuild()``-ed, exported changefeed windows re-created;
        - shallow clones referencing this table's files break (their
          ``fsck`` pinpoints it) — deep-clone before purging if needed;
        - the history row records COUNTS only, never the key values.

        ``vacuum_grace_s`` > 0 spares young unreferenced files when
        concurrent writers may be staging (their grace rule) — the purge
        of committed data is still immediate.

        Returns counts: rows/files touched, plus ``vacuumed``."""
        import numpy as np

        if not self.key_cols:
            raise ValueError("purge requires a primary-keyed table")
        if not keys:
            return {"rows_removed": 0, "files_rewritten": 0, "vacuumed": 0}
        man = self.manifest
        lake = man.schema
        key0 = self.key_cols[0]
        arr = self._coerce_key_array(keys)
        vals = arr.to_pylist()
        h = stable_hash_array(arr)
        salt_map = self.salt_map
        per_pid: dict[int, set] = {}
        for i, v in enumerate(vals):
            fan = int(salt_map.get(v) or salt_map.get(str(v)) or 1)
            for s in range(fan):
                pid = int((h[i] + np.uint64(s)) % np.uint64(man.num_partitions))
                per_pid.setdefault(pid, set()).add(v)
        # retained changefeed deltas live outside partitions[].files but
        # still carry the rows — route them by the pid in their basename
        retained_by_pid: dict[int, list[str]] = {}
        for e in man.properties.get("retained_deltas", []) or []:
            m = _CDC_FILE_RE.match(os.path.basename(e["path"]))
            if m:
                retained_by_pid.setdefault(int(m.group(2)), []).append(e["path"])
        new_version = man.version + 1
        task = _purge_pid_task
        futs = []
        for pid in sorted(per_pid):
            pfiles: list[tuple[str, str]] = []
            ps = man.partitions.get(pid)
            flt = [(key0, "in", sorted(per_pid[pid]))]
            if ps is not None:
                fstats = ps.pruned_stats()
                pfiles += [
                    (f, "live")
                    for f in ps.files
                    if zone.file_can_match(fstats.get(f), flt)
                ]
            pfiles += [(f, "retained") for f in retained_by_pid.get(pid, [])]
            if pfiles:
                futs.append(
                    task.remote(
                        self.table_dir,
                        pid,
                        pfiles,
                        key0,
                        sorted(per_pid[pid]),
                        lake,
                        new_version,
                    )
                )
        results = [r for rs in ray.get(futs) for r in rs]
        if not results:
            # keys absent from the current stack — nothing to commit, but
            # superseded versions may still hold them: vacuum regardless
            return {
                "rows_removed": 0,
                "files_rewritten": 0,
                "files_dropped": 0,
                "partitions_touched": 0,
                "vacuumed": self.store.vacuum(man, grace_s=vacuum_grace_s),
            }
        live_repl = {r["old"]: r for r in results if r["kind"] == "live"}
        ret_repl = {r["old"]: r for r in results if r["kind"] == "retained"}
        new_man = Manifest.from_json(man.to_json())
        new_man.version = new_version
        pids_touched = set()
        rows_removed = 0
        for pid, ps in new_man.partitions.items():
            if not any(f in live_repl for f in ps.files):
                continue
            pids_touched.add(pid)
            new_files: list[str] = []
            for f in ps.files:
                r = live_repl.get(f)
                if r is None:
                    new_files.append(f)
                    continue
                ps.file_stats.pop(f, None)
                ps.rows -= r["live_removed"]
                rows_removed += r["live_removed"]
                if r["new"] is not None:
                    new_files.append(r["new"])
                    if r["zstats"]:
                        ps.file_stats[r["new"]] = r["zstats"]
            ps.files = new_files
        if ret_repl:
            kept_entries = []
            for e in new_man.properties.get("retained_deltas", []):
                r = ret_repl.get(e["path"])
                if r is None:
                    kept_entries.append(e)
                elif r["new"] is not None:
                    kept_entries.append({**e, "path": r["new"]})
                # fully-purged retained delta: nothing left to serve
            new_man.properties["retained_deltas"] = kept_entries
        sm = dict(new_man.properties.get("salt_map", {}) or {})
        before = len(sm)
        for v in vals:
            sm.pop(v, None)
            sm.pop(str(v), None)
        if len(sm) != before:
            if sm:
                new_man.properties["salt_map"] = sm
            else:
                new_man.properties.pop("salt_map", None)
        new_man.history.append(
            {
                "op": "purge",
                "version": new_man.version,
                "keys": len(vals),  # counts only — never the values
                "rows_removed": rows_removed,
                "files_rewritten": sum(1 for r in results if r["new"] is not None),
                "files_dropped": sum(1 for r in results if r["new"] is None),
                **self.run_context.as_dict(),
            }
        )
        self.store.commit(new_man)
        self.manifest = new_man
        return {
            "version": new_man.version,
            "rows_removed": rows_removed,
            "files_rewritten": sum(1 for r in results if r["new"] is not None),
            "files_dropped": sum(1 for r in results if r["new"] is None),
            "retained_rewritten": len(ret_repl),
            "partitions_touched": len(pids_touched),
            "vacuumed": self.store.vacuum(new_man, grace_s=vacuum_grace_s),
        }

    def describe(self) -> dict:
        """Operational table summary from the MANIFEST alone (plus file
        ``stat`` + parquet FOOTER reads — never row data, safe on a live
        table): identity,
        version/watermark, partition/file/byte totals, merge-on-read
        depth (files per partition — the compaction health signal),
        retention state, salt map, and the last commit. The ops
        counterpart of :meth:`fsck` (which verifies; this reports)."""
        man = self.manifest
        n_files = 0
        n_bytes = 0
        rows_physical = 0
        depth_max = 0
        missing = 0
        for part in man.partitions.values():
            n_files += len(part.files)
            depth_max = max(depth_max, len(part.files))
            for f in part.files:
                try:
                    n_bytes += os.path.getsize(f)
                    # footer metadata only — physical rows INCLUDE
                    # superseded versions + tombstones in the delta stack
                    # (exact LIVE rows require the merge: snapshot().count())
                    rows_physical += pq.ParquetFile(f).metadata.num_rows
                except OSError:
                    missing += 1
        retained = man.properties.get("retained_deltas", []) or []
        return {
            "table": man.table,
            "table_dir": self.table_dir,
            "version": man.version,
            "schema_version": man.schema_version,
            "applied_lsn": man.applied_lsn,
            "num_partitions": man.num_partitions,
            "partitions_populated": len(man.partitions),
            "primary_key": list(man.primary_key),
            "columns": list(man.schema.names),
            "rows_physical": rows_physical,
            "data_files": n_files,
            "data_bytes": n_bytes,
            "files_missing": missing,  # nonzero → run fsck
            "max_files_per_partition": depth_max,  # merge-on-read depth
            "compact_every": self.compact_every,
            "retained_deltas": len(retained),
            "changefeed_floor": int(man.properties.get("changefeed_floor", 0)),
            "changefeed_retention_lsn": man.properties.get("changefeed_retention_lsn"),
            "salted_keys": len(self.salt_map),
            "commits": len(man.history),
            "last_commit": (man.history[-1] if man.history else None),
        }

    # -- table lifecycle: RESTORE / CLONE -------------------------------
    def restore(self, version: int) -> dict:
        """RESTORE the table to an earlier manifest version as a NEW
        commit (Delta-style rollback: history is preserved, the rollback
        itself is versioned and OCC-safe, readers flip atomically).

        Semantics and contracts:

        - the restored state is exactly ``snapshot(version=version)``;
          ``applied_lsn`` rolls BACK, so a subsequent ``replay`` of the
          same changelog re-applies the undone epochs (rebuilding the
          timeline — which also means time travel into the ABANDONED
          timeline is only sound until the next write, as re-applied
          epochs deterministically overwrite the abandoned staged files);
        - fails loud if vacuum already reclaimed any file the target
          version references (vacuum ends time travel — and therefore
          restore — to superseded versions);
        - the changefeed retention registry is DROPPED and the floor
          raised to the restored watermark: coverage across a timeline
          rollback would be a lie, so lagging consumers get the loud
          re-seed error, never silently inconsistent deltas. Maintained
          views (IVM) ahead of the restored watermark refuse to advance
          (their continuity guard) — ``rebuild()`` recovers them.
        """
        man = self.manifest
        if version >= man.version:
            raise ValueError(
                f"restore target {version} is not an earlier version "
                f"(current {man.version})"
            )
        old = self.store.load(version)
        if old is None:
            raise ValueError(f"version {version} not found for {man.table!r}")
        missing = [f for f in old.data_files() if not os.path.exists(f)]
        if missing:
            raise ValueError(
                f"cannot restore to version {version}: {len(missing)} data "
                f"files were vacuumed (first: {os.path.basename(missing[0])!r})"
            )
        new_man = Manifest.from_json(old.to_json())
        new_man.version = man.version + 1
        # lineage continues from the CURRENT head — a restore is an event
        # in this table's history, not a history rewrite
        new_man.history = list(man.history)
        new_man.history.append(
            {
                "op": "restore",
                "version": new_man.version,
                "restored_version": version,
                "from_lsn": man.applied_lsn,
                "to_lsn": old.applied_lsn,
                **self.run_context.as_dict(),
            }
        )
        new_man.properties.pop("retained_deltas", None)
        new_man.properties.pop("retention_since_lsn", None)
        new_man.properties["changefeed_floor"] = max(
            int(new_man.properties.get("changefeed_floor", 0)), old.applied_lsn
        )
        # retention horizon is table config — keep the CURRENT setting,
        # not the historical one (same rule as the ctor's INHERIT)
        cur_ret = man.properties.get("changefeed_retention_lsn")
        if cur_ret is None:
            new_man.properties.pop("changefeed_retention_lsn", None)
        else:
            new_man.properties["changefeed_retention_lsn"] = cur_ret
        self.store.commit(new_man)
        self.manifest = new_man
        return {
            "version": new_man.version,
            "restored_version": version,
            "applied_lsn": new_man.applied_lsn,
        }

    def clone(
        self,
        dst_dir: str,
        version: int | None = None,
        shallow: bool = False,
        commit_backend=None,
    ) -> dict:
        """CLONE this table (at ``version``, default current) into a new
        independent table at ``dst_dir`` — Delta-style CREATE TABLE CLONE.

        - **deep** (default): data files copy into the clone's own layout,
          one Ray task per partition — the clone shares nothing with the
          source. Cost O(live bytes), embarrassingly parallel.
        - **shallow**: the clone's manifest references the SOURCE's files
          in place (zero copy, O(1)). Hazard — same as Delta shallow
          clones: a later ``vacuum``/``compact`` on the SOURCE retires
          files the clone still lists; ``fsck()`` on the clone detects
          the breakage. Use for short-lived dev branches only.

        Either way the clone is a full CDC table: writes (replay, merge,
        compaction) land under ITS directory (copy-on-write), so the
        source is never mutated through a clone. The changefeed retention
        registry is not cloned (floor = cloned watermark: changefeed
        coverage starts at the clone point). Returns the clone's commit
        info; fails loud if ``dst_dir`` already holds a table.

        ``commit_backend``: manifest-log backend for the CLONE (defaults
        to the SOURCE engine's backend, so a CAS-backed table clones onto
        the same commit primitives; pass explicitly to cross stores).
        """
        src_man = self.store.load(version) if version is not None else self.manifest
        if src_man is None:
            raise ValueError(f"version {version} not found for {self.manifest.table!r}")
        missing = [f for f in src_man.data_files() if not os.path.exists(f)]
        if missing:
            raise ValueError(
                f"cannot clone version {src_man.version}: {len(missing)} data "
                f"files were vacuumed (first: {os.path.basename(missing[0])!r})"
            )
        dst_store = ManifestStore(
            dst_dir,
            backend=commit_backend if commit_backend is not None else self.store.backend,
        )
        if dst_store.load() is not None:
            raise ValueError(f"{dst_dir!r} already holds a table — refusing to clone over it")

        src_root = os.path.abspath(self.table_dir)
        new_man = Manifest.from_json(src_man.to_json())
        new_man.version = 1
        files_copied = 0
        if not shallow:
            copy_refs = []
            remap: dict[int, list[str]] = {}
            for pid, part in src_man.partitions.items():
                dsts = []
                for f in part.files:
                    rel = os.path.relpath(os.path.abspath(f), src_root)
                    if rel.startswith(".."):
                        # foreign path (e.g. cloning a shallow clone) —
                        # flatten into the clone's own data dir
                        rel = os.path.join(
                            "data", f"part={pid:05d}", os.path.basename(f)
                        )
                    dsts.append(os.path.join(dst_dir, rel))
                remap[pid] = dsts
                copy_refs.append(_copy_files_task.remote(list(part.files), dsts))
            files_copied = sum(ray.get(copy_refs))
            for pid, part in new_man.partitions.items():
                old_files = list(part.files)
                part.files[:] = remap[pid]
                part.file_stats = {
                    new: part.file_stats[old]
                    for old, new in zip(old_files, remap[pid])
                    if old in part.file_stats
                }
        new_man.history = list(src_man.history)
        new_man.history.append(
            {
                "op": "clone",
                "src_table_dir": src_root,
                "src_version": src_man.version,
                "shallow": shallow,
                **self.run_context.as_dict(),
            }
        )
        new_man.properties.pop("retained_deltas", None)
        new_man.properties.pop("retention_since_lsn", None)
        new_man.properties["changefeed_floor"] = max(
            int(new_man.properties.get("changefeed_floor", 0)), src_man.applied_lsn
        )
        dst_store.commit(new_man)
        return {
            "dst": dst_dir,
            "src_version": src_man.version,
            "shallow": shallow,
            "files_copied": files_copied,
            "applied_lsn": new_man.applied_lsn,
        }

    def diff(
        self, from_version: int, to_version: int | None = None
    ) -> "ray.data.Dataset":
        """Row-level DIFF between two committed versions (Delta's
        ``table_changes`` by version): a streaming Dataset of every key
        whose LWW state differs, tagged ``diff_op`` —

        - ``"I"``: live in ``to`` but not in ``from`` (new row payload);
        - ``"U"``: live in both with a different winning ``(ts, lsn)``
          (new row payload);
        - ``"D"``: live in ``from`` but deleted/absent in ``to`` (key
          columns only, payload NULL).

        Unlike :meth:`changefeed` this needs no retained deltas — it
        compares the two manifests' merge-on-read stacks directly, one
        task per partition (nothing lands on the driver), so it works
        across any gap as long as ``vacuum`` has not reclaimed the older
        version's files (fails loud if it has). Both versions must share
        the partition layout (no reshard/salt change in between — fail
        loud; diff across a reshard would need a full re-exchange).
        Output schema: key columns + ``diff_op`` + public payload + ts.
        """
        man1 = self.store.load(to_version) if to_version is not None else self.manifest
        man0 = self.store.load(from_version)
        if man0 is None or man1 is None:
            raise ValueError(
                f"version not found (from={from_version}, to={to_version})"
            )
        if man0.num_partitions != man1.num_partitions or (
            man0.properties.get("salt_map", {}) != man1.properties.get("salt_map", {})
        ):
            raise ValueError(
                "diff across a reshard or salt-map change is not supported — "
                "keys moved between partitions; use snapshot-level compare"
            )
        missing = [f for f in man0.data_files() if not os.path.exists(f)]
        if missing:
            raise ValueError(
                f"cannot diff from version {from_version}: {len(missing)} data "
                f"files were vacuumed (first: {os.path.basename(missing[0])!r})"
            )
        lake = man1.schema  # diff is reported in the NEWER schema
        key_cols = self.key_cols
        public = [f.name for f in lake if f.name not in (LSN_COL, DELETED_COL)]
        out_schema = pa.schema(
            [pa.field("diff_op", pa.string())]
            + [lake.field(n) for n in public]
        )
        pids = sorted(set(man0.partitions) | set(man1.partitions))
        parts = [
            {
                "pid": pid,
                "files0": (man0.partitions.get(pid).files if pid in man0.partitions else []),
                "files1": (man1.partitions.get(pid).files if pid in man1.partitions else []),
            }
            for pid in pids
        ]
        if not parts:
            return ray.data.from_arrow(out_schema.empty_table())

        def resolve(batch: pa.Table):
            _single_threaded_arrow()
            yielded = False
            for row in batch.to_pylist():
                for chunk in _diff_partition_chunks(
                    list(row["files0"]), list(row["files1"]),
                    lake, key_cols, public, out_schema,
                ):
                    yielded = True
                    yield chunk
            if not yielded:
                yield out_schema.empty_table()

        return ray.data.from_items(parts).map_batches(
            resolve, batch_format="pyarrow", batch_size=1
        )

    def fsck(self) -> dict:
        """Consistency audit of the committed table — fsck for the lake.

        One Ray task per partition verifies the manifest's claims against
        the files: every listed file exists with a readable footer, file
        names carry this partition's id and epoch LSNs at or below the
        watermarks, and every row's ``hash(conv_id) % P`` routes to the
        partition holding it (salt fanout respected). Files with zone-map
        stats in the manifest get a containment audit: the recorded
        bounds must CONTAIN the file's actual values (too-tight bounds
        are the failure that makes predicate pushdown silently drop
        rows), and the recorded row/null counts must match exactly.
        Driver-side checks cover the manifest itself: schema decodes,
        partition ids are in range, per-partition watermarks never
        exceed the table watermark.

        Returns ``{"ok": bool, "partitions_checked": n, "files_checked":
        n, "issues": [str, ...]}``; read-only, safe on a live table (a
        concurrent commit can only surface as a transient missing-file
        issue — rerun to confirm). Cost is one column-pruned scan of the
        key column, parallel across partitions."""
        man = self.manifest
        issues: list[str] = []
        try:
            man.schema  # decodes schema_b64
        except Exception as e:
            issues.append(f"manifest schema undecodable: {e}")
        # routing key: the leading PK, or the first declared column for
        # PK-less tables (the same rule reshard uses)
        key0 = self.key_cols[0] if self.key_cols else man.schema.names[0]
        n_files = 0
        refs = []
        salt_json = {str(k): int(v) for k, v in self.salt_map.items()}
        # the retention registry's files serve lagging consumers — a
        # missing one passes silently today and crashes a poll later
        for e_ in man.properties.get("retained_deltas", []) or []:
            n_files += 1
            if not os.path.exists(e_["path"]):
                issues.append(f"retained delta missing: {os.path.basename(e_['path'])}")
        for pid, part in man.partitions.items():
            if not (0 <= int(pid) < int(man.num_partitions)):
                issues.append(f"partition id {pid} out of range 0..{man.num_partitions - 1}")
            n_files += len(part.files)
            stale = set(part.file_stats) - set(part.files)
            if stale:
                issues.append(
                    f"pid {pid}: zone stats for retired files "
                    f"{sorted(os.path.basename(s) for s in stale)[:3]}"
                )
            refs.append(
                _fsck_partition_task.remote(
                    int(pid),
                    list(part.files),
                    int(part.applied_lsn),
                    int(man.applied_lsn),
                    int(man.num_partitions),
                    salt_json,
                    key0,
                    part.pruned_stats(),
                )
            )
        for r in ray.get(refs):
            issues.extend(r)
        return {
            "ok": not issues,
            "partitions_checked": len(man.partitions),
            "files_checked": n_files,
            "issues": issues,
        }

    def _changefeed_files(
        self, since_lsn: int, up_to_lsn: int | None = None
    ) -> list[tuple[int, str]]:
        """Validate the watermark and list the qualifying delta files as
        ``(pid, path)`` pairs (pid parsed from the engine's file naming) —
        shared by :meth:`changefeed` and :meth:`read_changes`. Raises the
        retention-floor / compaction-horizon errors; never reads data.
        ``up_to_lsn`` bounds the window's upper end (epochs committed
        after a consumer read its head are excluded, so the window
        matches the range its name claims even under a concurrent
        committer)."""
        import re

        man = self.manifest
        retention_on = self.changefeed_retention_lsn is not None
        floor = int(man.properties.get("changefeed_floor", 0))
        if retention_on and since_lsn < floor:
            raise RuntimeError(
                f"changes since {since_lsn} are past the retention floor "
                f"({floor}); replay from a snapshot"
            )
        cdc_name = _CDC_FILE_RE
        delta_files: list[tuple[int, str]] = []
        for pid in sorted(man.partitions):
            for f in man.partitions[pid].files:
                m = cdc_name.match(os.path.basename(f))
                if m is None:
                    # overwrite/append writer files carry no epoch lineage
                    raise RuntimeError(
                        f"table contains non-CDC file {os.path.basename(f)!r}; "
                        "the changefeed is only defined for CDC-applied tables"
                    )
                mode, epoch_id = m.group(1), int(m.group(3))
                if epoch_id <= since_lsn:
                    continue
                # NOTE: the up_to bound is applied to DELTA files only,
                # BELOW the base handling — a base newer than the bound
                # still means changes inside (since, up_to] were folded
                # into it, and skipping it here would silently drop them
                # from the window instead of raising the horizon error
                if mode == "base":
                    retention_since = man.properties.get("retention_since_lsn")
                    if (
                        retention_on
                        and retention_since is not None
                        and since_lsn >= int(retention_since)
                    ):
                        # this base's content above since_lsn was folded
                        # AFTER retention activated → fully covered by
                        # retained + live deltas (floor check passed)
                        continue
                    raise RuntimeError(
                        f"changes since {since_lsn} were compacted into "
                        f"{os.path.basename(f)}; replay from a snapshot or "
                        "poll within the compaction horizon"
                    )
                if up_to_lsn is not None and epoch_id > up_to_lsn:
                    continue
                delta_files.append((pid, f))
        if retention_on:
            for e in man.properties.get("retained_deltas", []):
                if up_to_lsn is not None and int(e["epoch_id"]) > up_to_lsn:
                    continue
                if int(e["epoch_id"]) > since_lsn:
                    m = cdc_name.match(os.path.basename(e["path"]))
                    delta_files.append((int(m.group(2)) if m else -1, e["path"]))
        return delta_files

    def changefeed_since_ts(self, ts: float) -> "ray.data.Dataset":
        """Changefeed of everything committed AFTER the given wall-clock
        time: resolves the newest version committed at or before ``ts``
        (the same commit stamps as timestamp time travel) and streams the
        changes past that version's LSN watermark — "what changed since I
        looked on Tuesday" without the consumer tracking LSNs. A ``ts``
        older than the first commit yields the feed from LSN 0 (subject
        to the same retention-floor errors as :meth:`changefeed`)."""
        v = self.store.version_at(ts)
        wm = 0 if v is None else int(self.store.load(v).applied_lsn)
        return self.changefeed(since_lsn=wm)

    def changefeed(
        self, since_lsn: int, up_to_lsn: int | None = None
    ) -> "ray.data.Dataset":
        """Changefeed for downstream consumers as a STREAMING Dataset: the
        net row-level changes committed after ``since_lsn`` (delta files
        with epoch > watermark), LWW-reduced per key, tombstones INCLUDED
        (``_deleted`` marks downstream deletes).

        One task per partition merges that partition's qualifying delta
        stack (the same streamed k-way chunk merge as :meth:`snapshot`,
        peak memory O(chunk × files)), so a consumer lagging N epochs on a
        100-TB table never lands O(changes) on the driver. Keys are unique
        within a partition's output; a key whose partition changed inside
        the window (salt migration) can surface once per routing era —
        consumers applying the feed's own (ts, lsn) LWW contract converge
        identically, and the Arrow convenience wrapper
        (:meth:`read_changes`) resolves it with a final reduce.

        Retention: with ``changefeed_retention_lsn`` set, delta files
        folded by compactions/salt migrations stay readable from the
        manifest's retained-deltas registry for that many LSNs past their
        retirement, so consumers may lag past compaction cycles; polling
        BEHIND the retention floor raises. Without retention (default),
        the horizon is the compaction cadence — a folded base newer than
        ``since_lsn`` raises immediately."""
        lake = self.manifest.schema
        by_pid: dict[int, list[str]] = {}
        for pid, f in self._changefeed_files(since_lsn, up_to_lsn):
            by_pid.setdefault(pid, []).append(f)
        if not by_pid:
            return ray.data.from_arrow(lake.empty_table())
        parts = [{"pid": pid, "files": by_pid[pid]} for pid in sorted(by_pid)]
        key_cols = self.key_cols

        def resolve(batch: pa.Table):
            _single_threaded_arrow()
            yielded = False
            for row in batch.to_pylist():
                files = list(row["files"])
                if key_cols and len(key_cols) <= 2 and _is_cdc_sorted(files):
                    for chunk in iter_merged_partition(files, lake, key_cols):
                        if chunk.num_rows:
                            yielded = True
                            yield chunk
                else:
                    t = merge_partition_files(files, lake, key_cols)
                    if t.num_rows:
                        yielded = True
                        yield t
            if not yielded:
                yield lake.empty_table()

        return ray.data.from_items(parts).map_batches(
            resolve, batch_format="pyarrow", batch_size=1
        )

    def read_changes(self, since_lsn: int) -> pa.Table:
        """Driver-side Arrow convenience form of :meth:`changefeed` for
        small windows/tables (tests, oracles, the CLI) — same validation
        and content, plus a final global LWW-reduce for one canonical row
        per key even across salt-migration routing eras."""
        lake = self.manifest.schema
        delta_files = [f for _pid, f in self._changefeed_files(since_lsn)]
        if not delta_files:
            return lake.empty_table()
        t = pa.concat_tables([normalize_table(pq.read_table(f), lake) for f in delta_files])
        return lww_reduce(t, self.key_cols, _lww_order(lake, LSN_COL))

    def _coerce_key_array(self, keys: list) -> pa.Array:
        """Coerce leading-PK value(s) to the key column's dtype. CLI /
        JSON callers pass strings; the coercion mirrors the manifest-JSON
        round-trip ``salted_partition_ids`` handles
        (functions/hashing.py:66-73)."""
        lake = self.manifest.schema
        key0 = self.key_cols[0]
        ktype = lake.field(key0).type
        vals = list(keys)
        try:
            return pa.array(vals, ktype)
        except (pa.ArrowInvalid, pa.ArrowTypeError):
            try:
                if pa.types.is_integer(ktype):
                    vals = [int(v) for v in vals]
                elif pa.types.is_floating(ktype):
                    vals = [float(v) for v in vals]
                return pa.array(vals, ktype)
            except ValueError as e:
                raise ValueError(
                    f"key(s) {vals!r} not coercible to key column "
                    f"{key0!r} of type {ktype}"
                ) from e

    def lookup(self, keys: list) -> pa.Table:
        """Point read by LEADING primary-key value(s) — the CDC lake's
        key-value GET. Touches ONLY the partitions the keys hash to (salt
        fanout included) and reads their files with a parquet predicate on
        the key column: engine files are PK-sorted, so row-group
        statistics prune everything outside each key's range — a point
        lookup on a 100-TB table reads O(row groups containing the key),
        not O(partition). The merged result is LWW-reduced, tombstones
        dropped, public columns, PK-sorted.

        Driver-side by contract: point results are small (a handful of
        entities); for bulk key-range scans use
        ``snapshot(pids=...)`` + a filter stage instead."""
        import numpy as np

        man = self.manifest
        lake = man.schema
        public = pa.schema([f for f in lake if f.name not in (LSN_COL, DELETED_COL)])
        if not self.key_cols:
            raise ValueError("lookup requires a primary-keyed table")
        key0 = self.key_cols[0]
        if not keys:
            return public.empty_table()
        arr = self._coerce_key_array(keys)
        h = stable_hash_array(arr)
        salt_map = self.salt_map
        per_pid: dict[int, set] = {}
        for i, v in enumerate(arr.to_pylist()):
            fan = int(salt_map.get(v) or salt_map.get(str(v)) or 1)
            for s in range(fan):
                pid = int((h[i] + np.uint64(s)) % np.uint64(man.num_partitions))
                per_pid.setdefault(pid, set()).add(v)
        parts = []
        for pid in sorted(per_pid):
            if pid not in man.partitions:
                continue
            ps = man.partitions[pid]
            fstats = ps.pruned_stats()
            flt = [(key0, "in", sorted(per_pid[pid]))]
            for f in ps.files:
                # manifest zone maps first (no file open at all), then the
                # parquet reader's row-group statistics prune within the file
                if not zone.file_can_match(fstats.get(f), flt):
                    continue
                t = normalize_table(pq.read_table(f, filters=flt), lake)
                if t.num_rows:
                    parts.append(t)
        if not parts:
            return public.empty_table()
        t = lww_reduce(pa.concat_tables(parts), self.key_cols, _lww_order(lake, LSN_COL))
        t = t.filter(pc.invert(t.column(DELETED_COL))).select(public.names)
        return t.sort_by([(k, "ascending") for k in self.key_cols])

    def snapshot_arrow(
        self,
        version: int | None = None,
        as_of_ts: float | None = None,
        predicate: list | None = None,
    ) -> pa.Table:
        """Driver-side committed state (no Ray) — for tests/oracles on small
        tables. Sorted by primary key (stable turn ordering).

        ``version`` time-travels to an older committed manifest (every
        commit leaves its manifest snapshot on disk; valid until ``vacuum``
        removes the superseded data files — standard lakehouse semantics).
        ``as_of_ts`` (unix seconds) resolves the newest version committed
        at or before that wall-clock time (``VERSION AS OF TIMESTAMP``);
        mutually exclusive with ``version``."""
        if as_of_ts is not None:
            if version is not None:
                raise ValueError("pass version or as_of_ts, not both")
            version = self.store.version_at(as_of_ts)
            if version is None:
                raise ValueError(
                    f"no version of {self.table_dir!r} was committed at or before "
                    f"ts={as_of_ts}"
                )
        man = self.manifest if version is None else self.store.load(version)
        lake = man.schema
        public = pa.schema([f for f in lake if f.name not in (LSN_COL, DELETED_COL)])
        if predicate:
            zone.validate_predicate(predicate)
            bad = [c[0] for c in predicate if c[0] not in public.names]
            if bad:
                raise ValueError(
                    f"predicate on unknown or internal columns {bad}; "
                    f"available: {public.names}"
                )
        # row-group-level pushdown, same safety rule as snapshot(): PK
        # conjuncts under merge, any conjunct on a PK-less concat table
        file_cj = (
            zone.split_key_conjuncts(predicate or [], self.key_cols)[0]
            if self.key_cols
            else list(predicate or [])
        )
        parts = []
        for pid in sorted(man.partitions):
            ps = man.partitions[pid]
            files = ps.files
            if not files:
                continue
            if predicate and not zone.partition_can_match(
                ps.pruned_stats(), files, predicate
            ):
                continue
            t = merge_partition_files(files, lake, self.key_cols, conjuncts=file_cj)
            t = t.filter(pc.invert(t.column(DELETED_COL)))
            if predicate:
                t = zone.filter_table(t, predicate)
            parts.append(t.select(public.names))
        if not parts:
            return public.empty_table()
        t = pa.concat_tables(parts)
        if not self.key_cols:
            return t  # PK-less table: no ordering contract
        return t.sort_by([(k, "ascending") for k in self.key_cols])


@ray.remote
def _fsck_partition_task(
    pid: int,
    files: list,
    part_lsn: int,
    table_lsn: int,
    num_partitions: int,
    salt_json: dict,
    key0: str,
    file_stats: dict | None = None,
) -> list:
    """Audit ONE partition's manifest-listed files: existence, readable
    footer, row-level partition routing (every row's leading-key hash
    must map to this pid — directly or via its salt fanout), per-file
    epoch LSNs at or below the watermarks, and zone-map stats
    containment (see :meth:`CDCEngine.fsck`). Returns a list of issue
    strings."""
    import numpy as np

    _single_threaded_arrow()
    issues: list[str] = []
    cdc_name = _CDC_FILE_RE
    for f in files:
        base = os.path.basename(f)
        if not os.path.exists(f):
            issues.append(f"pid {pid}: missing file {base}")
            continue
        try:
            t = pq.read_table(f, columns=[key0])
        except Exception as e:  # unreadable footer/corruption
            issues.append(f"pid {pid}: unreadable {base}: {e}")
            continue
        issues.extend(_fsck_zone_stats(pid, f, (file_stats or {}).get(f)))
        m = cdc_name.match(base)
        if m:
            epoch_id = int(m.group(3))
            if epoch_id > table_lsn:
                issues.append(
                    f"pid {pid}: {base} epoch {epoch_id} above table watermark {table_lsn}"
                )
            if int(m.group(2)) != pid:
                issues.append(f"pid {pid}: {base} names partition {m.group(2)}")
        if t.num_rows:
            h = stable_hash_array(t.column(key0))
            home = (h % np.uint64(num_partitions)).astype(np.int64)
            bad = home != pid
            if bad.any():
                # salted conversations legitimately land on fanout pids —
                # validate each UNIQUE off-home value once, not per row (a
                # hot salted conversation contributes thousands of rows)
                uniq_vals, first_idx = np.unique(
                    np.asarray(t.column(key0).to_numpy(zero_copy_only=False))[bad],
                    return_index=True,
                )
                bad_h = h[bad][first_idx]
                for v, hv in zip(uniq_vals, bad_h):
                    fan = int(salt_json.get(str(v)) or 1)  # keys pre-stringified
                    ok = any(
                        int((hv + np.uint64(s)) % np.uint64(num_partitions)) == pid
                        for s in range(fan)
                    )
                    if not ok:
                        issues.append(
                            f"pid {pid}: row {key0}={v!r} routed to wrong partition"
                        )
                        break  # one example per partition is enough
    if part_lsn > table_lsn:
        issues.append(f"pid {pid}: partition watermark {part_lsn} above table {table_lsn}")
    return issues


def _fsck_zone_stats(pid: int, path: str, recorded: dict | None) -> list:
    """Containment audit of one file's manifest zone-map stats: recorded
    bounds must contain the file's recomputed bounds (equal
    canonicalization on both sides, so ``recorded_min <= actual_min`` and
    ``actual_max <= recorded_max`` is exact, not heuristic), and row/null
    counts must match. Reads tracked columns ONE at a time to bound
    memory. Files without stats pass (written before the upgrade)."""
    if not recorded:
        return []
    issues: list[str] = []
    base = os.path.basename(path)
    for col, s in recorded.items():
        try:
            keys = {"f", "min", "max", "open", "nulls", "rows"}
            if not keys <= set(s):
                issues.append(f"pid {pid}: {base} zone stats for {col!r} malformed")
                continue
            try:
                t = pq.read_table(path, columns=[col])
            except (KeyError, pa.ArrowInvalid, OSError):
                issues.append(f"pid {pid}: {base} zone stats for absent column {col!r}")
                continue
            actual = zone.table_stats(t, [col]).get(col)
            if actual is None:  # untrackable type cannot have honest stats
                issues.append(f"pid {pid}: {base} zone stats for untracked type {col!r}")
                continue
            if s["rows"] != actual["rows"] or s["nulls"] != actual["nulls"]:
                issues.append(
                    f"pid {pid}: {base} zone stats {col!r} counts "
                    f"{s['rows']}/{s['nulls']} != actual {actual['rows']}/{actual['nulls']}"
                )
            if actual["min"] is not None:
                if s["min"] is None or s["min"] > actual["min"]:
                    issues.append(f"pid {pid}: {base} zone stats {col!r} min too tight")
                if not s["open"] and (
                    s["max"] is None
                    or (actual["max"] is not None and s["max"] < actual["max"])
                    or (actual["max"] is None and actual["open"])
                ):
                    issues.append(f"pid {pid}: {base} zone stats {col!r} max too tight")
        except Exception as e:  # audit must report, never crash
            issues.append(f"pid {pid}: {base} zone stats {col!r} audit error: {e}")
    return issues
