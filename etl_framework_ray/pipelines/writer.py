"""Lake table writer: overwrite / append / MERGE — the reference writer API.

Port of ``DeltaWriter`` semantics (/root/reference/src/models/writer.py):

- ``overwrite`` — DQ gate first (ERROR aborts before any file lands,
  writer.py:31-36), project to the declared column order (writer.py:37),
  replace the whole table atomically (manifest swap instead of Delta ACID).
- ``merge`` — PK upsert: ``whenMatchedUpdateAll + whenNotMatchedInsertAll``
  (writer.py:42-67); errors if the spec declares no primary key
  (writer.py:48-51). Implemented by synthesizing a changelog segment from
  the source rows (op='U', next LSN range — newer LSN ⇒ "source wins")
  and running it through the CDC engine's exactly-once apply, so MERGE
  inherits partitioned execution, idempotent retries and lineage for free.
- ``append`` — audit-log append for PK-less tables
  (/root/reference/src/models/data_quality_evaluator.py:67-68): new delta
  files join the manifest; merge-on-read concatenates (no LWW).

All tables written here share the CDC lake layout, so ``CDCEngine.snapshot``
reads any of them.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray

from ..context import RunContext
from ..functions.hashing import partition_ids
from ..functions.quality import DQGate
from ..sources.changelog import Epoch, Segment
from ..state.manifest import Manifest, PartitionState
from ..state.schema import DELETED_COL, LSN_COL, TableSpec
from .cdc import CDCEngine


class LakeWriter:
    def __init__(
        self,
        table_dir: str,
        spec: TableSpec,
        num_partitions: int = 16,
        run_context: RunContext | None = None,
    ):
        self.spec = spec
        self.engine = CDCEngine(
            table_dir, spec, num_partitions=num_partitions, run_context=run_context
        )
        self.run_context = self.engine.run_context

    @classmethod
    def from_engine(cls, engine: CDCEngine) -> "LakeWriter":
        """Wrap an EXISTING engine/table (shares its manifest state) —
        lets the writer surface (merge/delete/append) operate on a table
        a CDC replay owns without re-opening it."""
        w = cls.__new__(cls)
        w.spec = engine.spec
        w.engine = engine
        w.run_context = engine.run_context
        return w

    # ------------------------------------------------------------------
    def read(self) -> "ray.data.Dataset":
        """Committed table as a Dataset in declared column order (S2)."""
        return self.engine.snapshot()

    def _make_gate(self) -> DQGate:
        audit_dir = os.path.join(self.engine.table_dir, "_metrics", "dq")
        return DQGate(self.spec, audit_dir, self.run_context)

    # ------------------------------------------------------------------
    def overwrite(self, ds: "ray.data.Dataset") -> int:
        """Gate + project + replace the table in ONE source pass: DQ
        evaluation is fused into the staging map (``DQGate.wrap_stage``)
        and ``finalize`` raises BEFORE the manifest commit — the 2PC keeps
        the staged files invisible, so ERROR-before-visibility matches the
        reference's pre-pass gate (writer.py:31-40) at half the cost.
        Returns rows written."""
        man = self.engine.manifest
        version = man.version + 1
        names = self.spec.column_names
        key0 = self.spec.primary_key[0] if self.spec.primary_key else names[0]
        num_partitions = man.num_partitions
        lake_sch = man.schema

        def stage(batch: pa.Table) -> pa.Table:
            batch = batch.select(names)  # declared order (writer.py:37)
            n = batch.num_rows
            batch = batch.append_column(LSN_COL, pa.array([0] * n, pa.int64()))
            batch = batch.append_column(DELETED_COL, pa.array([False] * n, pa.bool_()))
            pid = partition_ids(batch.column(key0), num_partitions)
            return batch.append_column("pid", pa.array(pid, pa.int64()))

        gate = self._make_gate()
        fused, handle = gate.wrap_stage(stage)
        out_dir = os.path.join(self.engine.table_dir, "data", f"overwrite-v{version:08d}")
        if os.path.isdir(out_dir):
            # a previously ABORTED attempt (gate error / crash) left staged
            # files under the same uncommitted version — clear them so the
            # file glob below can't double-count
            import shutil

            shutil.rmtree(out_dir)
        ds.map_batches(fused, batch_format="pyarrow").write_parquet(
            out_dir, partition_cols=["pid"]
        )
        gate.finalize(handle)  # DQError propagates pre-commit; staged files stay invisible

        new_man = Manifest.from_json(man.to_json())
        new_man.version = version
        new_man.partitions = {}
        rows = 0
        for f in sorted(glob.glob(os.path.join(out_dir, "**", "*.parquet"), recursive=True)):
            pid = int(f.split("pid=")[1].split(os.sep)[0])
            st = new_man.partitions.setdefault(pid, PartitionState())
            st.files.append(f)
            n = pq.read_metadata(f).num_rows
            st.rows += n
            rows += n
        new_man.history.append(
            {"op": "overwrite", "version": version, "rows": rows, **self.run_context.as_dict()}
        )
        self.engine.store.commit(new_man)
        self.engine.manifest = new_man
        self.engine.store.vacuum(new_man)
        return rows

    # ------------------------------------------------------------------
    def _stage_changelog(self, ds: "ray.data.Dataset", op: str) -> Epoch | None:
        """Materialize source rows as a changelog segment with the next LSN
        range (driver-side staging; source batches stream through). The DQ
        gate runs INLINE over the same stream — counts/detail accumulate
        per batch and the verdict lands before the segment file exists, so
        an ERROR write stages nothing at all (single pass)."""
        import time as _time

        from ..functions.quality import (
            _write_failure_file,
            build_checks,
            evaluate_batch_detail,
        )

        man = self.engine.manifest
        start = man.applied_lsn + 1
        names = self.spec.column_names
        seg_dir = os.path.join(self.engine.table_dir, "_writer_log")
        os.makedirs(seg_dir, exist_ok=True)

        schema_names = set(ds.schema().names)
        if op == "D":
            # deletes carry only the key (+ optional event time): payload
            # columns are nulled, a missing ts is stamped once with the
            # delete time so the tombstone wins (ts,lsn) LWW "now"
            required = list(self.spec.primary_key)
        else:
            required = names
        missing = [n for n in required if n not in schema_names]
        if missing:
            raise ValueError(
                f"source is missing declared columns {missing} of table {self.spec.name!r}"
            )
        gate = self._make_gate()
        # tombstones have no payload to validate — gating them against
        # payload rules would spuriously trip NOT NULL checks
        checks = build_checks(self.spec) if op != "D" else []
        key_cols = tuple(self.spec.primary_key) or (names[0],)
        rc = self.run_context.as_dict()
        agg: dict[str, int] = {}
        t0 = _time.perf_counter()

        tables = []
        offset = 0
        for batch in ds.iter_batches(batch_format="pyarrow"):
            batch = pa.Table.from_batches([batch]) if not isinstance(batch, pa.Table) else batch
            n = batch.num_rows
            if checks:
                counts, detail = evaluate_batch_detail(
                    batch, checks, key_cols, self.spec.name, rc
                )
                for k, v in counts.items():
                    agg[k] = agg.get(k, 0) + v
                if detail.num_rows:
                    _write_failure_file(gate.failure_dir, self.run_context.run_id, detail)
            lsn = pa.array(range(start + offset, start + offset + n), pa.int64())
            cols = {"lsn": lsn, "op": pa.array([op] * n, pa.string())}
            for name in names:
                if name in batch.column_names:
                    cols[name] = batch.column(name)
                elif name == "ts":
                    import datetime

                    now = datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)
                    cols[name] = pa.array([now] * n, self.spec.column(name).dtype)
                else:
                    cols[name] = pa.nulls(n, self.spec.column(name).dtype)
            tables.append(pa.table(cols))
            offset += n
        if checks and offset:
            # audit + ERROR raise before ANY file is staged
            gate._report(agg, offset, _time.perf_counter() - t0, checks)
        if offset == 0:
            return None  # empty source → nothing to merge
        seg = pa.concat_tables(tables)
        lo, hi = start, start + offset - 1
        path = os.path.join(seg_dir, f"segment-{lo:012d}-{hi:012d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(seg, tmp)
        os.replace(tmp, path)
        return Epoch((Segment(path, lo, hi),))

    def merge(self, ds: "ray.data.Dataset") -> dict:
        """PK upsert of ``ds`` into the table.

        Match resolution is the engine's LWW order: for tables WITHOUT an
        event-time ``ts`` column the staged rows carry the newest LSN, so
        the source unconditionally wins (reference
        ``whenMatchedUpdateAll`` semantics, /root/reference/src/models/writer.py:52-63).
        For ``ts``-bearing tables event-time dominates — ``(ts, lsn)`` LWW
        — so a source row whose ``ts`` is OLDER than the lake row's does
        not overwrite it. That is deliberate: one consistent order governs
        merge-on-read, late-redelivery discard, and permutation
        convergence; callers wanting unconditional source-wins on a
        ``ts`` table should stamp ``ts`` with the merge time."""
        if not self.spec.primary_key:
            # parity: /root/reference/src/models/writer.py:48-51
            raise ValueError(
                f"MERGE requires a primary key on table {self.spec.name!r}"
            )
        epoch = self._stage_changelog(ds, op="U")  # gate runs inline (one pass)
        if epoch is None:
            return {}  # empty source is a no-op merge
        info = self.engine.apply_epoch(epoch)
        return info or {}

    def delete(self, ds: "ray.data.Dataset") -> dict:
        """Delete by primary key: stages ``op='D'`` tombstone events for
        the source rows' keys and applies them through the CDC engine —
        merge-on-read hides the keys, late redelivery of older events
        cannot resurrect them, and tombstone-TTL GC applies. The source
        needs only the PK columns (an optional ``ts`` column sets the
        delete's event time; otherwise the delete is stamped "now" so it
        wins LWW). Extends the reference writer surface — its MERGE has
        no delete clause — with the engine's native tombstone path."""
        if not self.spec.primary_key:
            raise ValueError(
                f"DELETE requires a primary key on table {self.spec.name!r}"
            )
        epoch = self._stage_changelog(ds, op="D")
        if epoch is None:
            return {}
        return self.engine.apply_epoch(epoch) or {}

    def append(self, ds: "ray.data.Dataset") -> int:
        """Append rows (PK-less audit-table semantics): new delta files join
        the manifest; no LWW on read. DQ gate fused into the staging pass
        (see :meth:`overwrite`)."""
        man = self.engine.manifest
        version = man.version + 1
        names = self.spec.column_names
        key0 = names[0]
        num_partitions = man.num_partitions
        next_lsn = man.applied_lsn + 1

        def stage(batch: pa.Table) -> pa.Table:
            batch = batch.select(names)
            n = batch.num_rows
            batch = batch.append_column(LSN_COL, pa.array([next_lsn] * n, pa.int64()))
            batch = batch.append_column(DELETED_COL, pa.array([False] * n, pa.bool_()))
            pid = partition_ids(batch.column(key0), num_partitions)
            return batch.append_column("pid", pa.array(pid, pa.int64()))

        gate = self._make_gate()
        fused, handle = gate.wrap_stage(stage)
        out_dir = os.path.join(
            self.engine.table_dir, "data", f"append-v{version:08d}"
        )
        if os.path.isdir(out_dir):  # aborted-attempt hygiene (see overwrite)
            import shutil

            shutil.rmtree(out_dir)
        ds.map_batches(fused, batch_format="pyarrow").write_parquet(
            out_dir, partition_cols=["pid"]
        )
        gate.finalize(handle)  # DQError propagates pre-commit
        new_man = Manifest.from_json(man.to_json())
        new_man.version = version
        rows = 0
        for f in sorted(glob.glob(os.path.join(out_dir, "**", "*.parquet"), recursive=True)):
            pid = int(f.split("pid=")[1].split(os.sep)[0])
            st = new_man.partitions.setdefault(pid, PartitionState())
            st.files.append(f)
            n = pq.read_metadata(f).num_rows
            st.rows += n
            rows += n
        new_man.history.append(
            {"op": "append", "version": version, "rows": rows, **self.run_context.as_dict()}
        )
        self.engine.store.commit(new_man)
        self.engine.manifest = new_man
        return rows
