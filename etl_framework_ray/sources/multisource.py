"""Multi-source CDC: merge N independent changelog shards into ONE
canonical changelog the engine replays/tails unchanged.

Real ingestion rarely has one binlog: a sharded source database, a
Kafka topic with partitions, or several regional feeds each publish an
independent LSN sequence. The engine's exactly-once resume, epoch
planning and (ts, lsn) LWW all key on ONE monotone LSN space, so the
merge layer — not the engine — owns the composition (the reference's
analogue is the single bronze ingest directory,
/root/reference/src/bronze/ingest.py:28-55; multi-feed union is out of
its scope entirely):

- Each poll lists every source's NEW segments (per-source converted
  sets are durable), interleaves them by a k-way merge on
  ``(segment min ts, source index, segment min lsn)`` — per-source
  segment order is never violated, and time-adjacent segments from
  different shards land near each other — and assigns each row a dense
  GLOBAL LSN in that order. Planning reads only parquet FOOTERS
  (row counts + ts column statistics); no data IO on the driver.
- Rewrites are one Ray task per source segment: stamp the global-LSN
  range, optionally append ``src_id``/``src_lsn`` lineage columns, and
  write the output segment atomically (tmp+rename).
- The single state file ``_sources.json`` is the commit point, replaced
  atomically AFTER every output of the poll has landed. A crash before
  the commit leaves residue a re-poll deterministically overwrites
  byte-for-byte (same plan → same ranges → same bytes); a crash after
  is a completed poll. Re-delivered source segments are skipped by the
  converted set.

Ordering contract (what "merged" means for LWW):
- Events with DISTINCT timestamps order by timestamp — global-LSN
  assignment is irrelevant to their LWW outcome.
- Same-timestamp events WITHIN one source keep their source-LSN order
  (global LSNs are monotone per source when segments arrive in order —
  a source segment arriving after a later-LSN sibling is still merged,
  but its intra-timestamp ties then resolve by arrival order; WAL
  shippers deliver in order, so this is the documented edge, not the
  norm).
- Same-timestamp events for the same key ACROSS sources have no
  defined winner a priori (two masters wrote "simultaneously"); the
  merge makes the outcome deterministic and stable across crash-reruns
  (the state file pins the plan) by the interleave order above.
- PARTIAL row images (op="P") compose with the merge only when each
  key's cross-source events respect event-time order at segment
  granularity (true when shards own disjoint key sets or disjoint time
  ranges — the usual sharding shapes). When shards interleave a key's
  timeline, epoch-ordered patch resolution (pipelines/cdc.
  _fold_epoch_patches, which resolves each patch ONCE against the
  then-current state) is still deterministic and crash-stable, but may
  differ from a global event-time fold — the same class of multi-master
  ambiguity as the same-timestamp edge above.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from .changelog import ChangeLog, Segment

_STATE = "_sources.json"


def _footer_meta(path: str, ts_col: str = "ts") -> tuple[int, int | None]:
    """(num_rows, min ts as int64 µs or None) from the parquet footer —
    planning never reads data pages."""
    md = pq.read_metadata(path)
    lo = None
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            if col.path_in_schema == ts_col and col.statistics is not None:
                st = col.statistics
                if st.has_min_max:
                    v = st.min
                    v = int(v.timestamp() * 1_000_000) if hasattr(v, "timestamp") else int(v)
                    lo = v if lo is None else min(lo, v)
    return md.num_rows, lo


@ray.remote
def _rewrite_segment_task(
    src_path: str,
    out_path: str,
    glsn_start: int,
    src_id: int,
    keep_lineage: bool,
) -> int:
    """Stamp one source segment with its dense global-LSN range and write
    it atomically. Row order is preserved, and global LSNs are assigned
    by SOURCE-LSN RANK within the segment (not row position): segments
    written from out-of-order row streams still map higher source LSNs to
    higher global LSNs, so same-timestamp LWW ties keep source order."""
    from ..pipelines.cdc import _single_threaded_arrow

    _single_threaded_arrow()
    import numpy as np

    t = pq.read_table(src_path)
    sl = t.column("lsn").to_numpy(zero_copy_only=False)
    order = np.argsort(sl, kind="stable")
    g = np.empty(t.num_rows, dtype=np.int64)
    g[order] = np.arange(glsn_start, glsn_start + t.num_rows, dtype=np.int64)
    glsn = pa.array(g, pa.int64())
    i = t.schema.get_field_index("lsn")
    src_lsn = t.column("lsn")
    t = t.set_column(i, "lsn", glsn)
    if keep_lineage:
        t = t.append_column("src_id", pa.array([src_id] * t.num_rows, pa.int32()))
        t = t.append_column("src_lsn", src_lsn.cast(pa.int64()))
    tmp = f"{out_path}.tmp-{os.getpid()}"
    pq.write_table(t, tmp)
    os.replace(tmp, out_path)
    return t.num_rows


class MultiSourceFeed(ChangeLog):
    """A ChangeLog view over N source changelog directories: every
    ``segments()`` call first merges newly arrived source segments into
    this directory's canonical log (see module doc), then lists the
    canonical segments. Plug it straight into ``CDCEngine.replay`` /
    ``tail`` — each poll merges the new arrivals, then applies them
    exactly-once like any other epoch batch.

    ``keep_lineage=True`` appends ``src_id``/``src_lsn`` columns to every
    merged event; they evolve into the lake as ordinary payload columns,
    so the committed row for each key records which shard's event won.
    """

    def __init__(self, sources: list[str], out_dir: str, keep_lineage: bool = False):
        if not sources:
            raise ValueError("at least one source changelog directory is required")
        if len(set(os.path.abspath(s) for s in sources)) != len(sources):
            raise ValueError("duplicate source directories")
        super().__init__(out_dir)
        self.sources = [os.path.abspath(s) for s in sources]
        self.keep_lineage = bool(keep_lineage)

    # -- durable state ---------------------------------------------------
    def _state_path(self) -> str:
        return os.path.join(self.log_dir, _STATE)

    def _load_state(self) -> dict:
        p = self._state_path()
        if not os.path.exists(p):
            return {
                "next_lsn": 1,
                "keep_lineage": self.keep_lineage,
                "sources": [{"dir": d, "converted": {}} for d in self.sources],
            }
        with open(p) as f:
            state = json.load(f)
        dirs = [s["dir"] for s in state["sources"]]
        if dirs != self.sources:
            raise RuntimeError(
                f"merged log at {self.log_dir!r} was built from sources {dirs}; "
                f"reconfiguring to {self.sources} would corrupt the global LSN "
                "assignment — use a fresh out_dir"
            )
        if bool(state.get("keep_lineage")) != self.keep_lineage:
            raise RuntimeError(
                "keep_lineage differs from the merged log's configuration; "
                "use a fresh out_dir"
            )
        return state

    def _commit_state(self, state: dict) -> None:
        p = self._state_path()
        tmp = f"{p}.tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, p)

    # -- merge -----------------------------------------------------------
    def merge_new(self) -> dict:
        """Merge every source's newly arrived segments into the canonical
        log. Returns ``{"segments_merged", "rows_merged", "next_lsn"}``.
        Single-writer per out_dir (same contract as the engine's
        committer); crash-idempotent (state file is the commit point)."""
        state = self._load_state()
        # crash-residue sweep BEFORE planning: a crashed attempt may have
        # written outputs under a plan that no longer holds (more source
        # segments arrived since) — any canonical segment the committed
        # state does not reference is residue and must not survive into a
        # directory listing, or replay would double-apply its rows under
        # stale LSNs. Consume the merged log THROUGH this class (or after
        # a clean merge_new()) so the sweep always runs first.
        referenced = {
            out for src in state["sources"] for out in src["converted"].values()
        }
        for s in ChangeLog(self.log_dir).segments():
            if os.path.basename(s.path) not in referenced:
                os.remove(s.path)
        per_source: list[list[Segment]] = []
        for i, src in enumerate(state["sources"]):
            conv = src["converted"]
            segs = [
                s
                for s in ChangeLog(src["dir"]).segments()
                if os.path.basename(s.path) not in conv
            ]
            per_source.append(segs)  # ChangeLog.segments() is min_lsn-sorted

        # plan: k-way interleave by (segment min ts, source idx, min lsn);
        # never reorders one source's queue, so per-source LSN order holds
        import heapq

        heap = []
        metas: dict[str, tuple[int, int | None]] = {}
        for i, segs in enumerate(per_source):
            if segs:
                nrows, ts_lo = _footer_meta(segs[0].path)
                metas[segs[0].path] = (nrows, ts_lo)
                heapq.heappush(heap, ((ts_lo or 0, i, segs[0].min_lsn), i, 0))
        plan: list[tuple[Segment, int, int]] = []  # (seg, src_idx, glsn_start)
        nxt = int(state["next_lsn"])
        while heap:
            _key, i, j = heapq.heappop(heap)
            seg = per_source[i][j]
            nrows, _ts = metas[seg.path]
            plan.append((seg, i, nxt))
            nxt += nrows
            if j + 1 < len(per_source[i]):
                s2 = per_source[i][j + 1]
                metas[s2.path] = _footer_meta(s2.path)
                heapq.heappush(
                    heap, ((metas[s2.path][1] or 0, i, s2.min_lsn), i, j + 1)
                )
        if not plan:
            return {
                "segments_merged": 0,
                "rows_merged": 0,
                "next_lsn": int(state["next_lsn"]),
            }

        refs, outs = [], []
        for seg, i, start in plan:
            nrows = metas[seg.path][0]
            out = os.path.join(
                self.log_dir, f"segment-{start:012d}-{start + nrows - 1:012d}.parquet"
            )
            outs.append((seg, i, out))
            refs.append(
                _rewrite_segment_task.remote(
                    seg.path, out, start, i, self.keep_lineage
                )
            )
        rows = ray.get(refs)  # all outputs land before the state commit

        for (seg, i, out), n in zip(outs, rows):
            exp = metas[seg.path][0]
            if n != exp:  # footer/data disagreement would corrupt the plan
                raise RuntimeError(
                    f"{seg.path}: footer claims {exp} rows, data has {n}"
                )
            state["sources"][i]["converted"][os.path.basename(seg.path)] = (
                os.path.basename(out)
            )
        state["next_lsn"] = nxt
        self._commit_state(state)
        return {
            "segments_merged": len(plan),
            "rows_merged": int(sum(rows)),
            "next_lsn": nxt,
        }

    def segments(self):
        self.merge_new()
        return super().segments()
