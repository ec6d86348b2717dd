"""Downstream replica of a maintained view, applied from its changefeed.

``ReplicaTable`` is the RECEIVING end of view replication: the view emits
per-conversation REPLACE deltas (``emit_changes=True``), a
``ViewDeltaConsumer`` transports them as exactly-once version-range
windows, and this class applies each window into a durable
hash-partitioned parquet table — the "other cluster's" copy of the view,
kept fresh without ever reading the view itself.

Apply semantics mirror the delta contract: for every conversation in the
window, drop its existing replica rows, then insert the window's ``U``
rows (``D`` rows carry no payload and just drop). Application is
idempotent by version: a window whose end version is ≤ the replica's
committed version is a no-op, so crash/retry and duplicate delivery are
safe — the transport's exactly-once plus this guard give end-to-end
exactly-once application.

Scale shape: a window is O(touched conversations); the driver routes its
rows to ``hash(conv_id) % P`` buckets (same stable hash as the engine)
and ONE Ray task per touched partition rewrites that partition's file —
untouched partitions carry forward by reference, exactly like the view's
own splice. Commit is an atomic manifest swap; superseded files are
pruned after it.
"""

from __future__ import annotations

import json
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from ..functions.hashing import stable_hash_array

_MANIFEST = "_replica_manifest.json"


@ray.remote
def _splice_task(rows_ref, pid: int, old_file: str | None, out: str) -> dict:
    """Rewrite ONE replica partition: drop every conversation present in
    the window's rows for this pid, insert its U rows, carry the rest of
    the old file forward. Raw task (not a Dataset stage): the fan-out is
    O(touched partitions) driver-listed items carrying object refs."""
    from .cdc import _single_threaded_arrow

    _single_threaded_arrow()
    import pyarrow.compute as pc

    d = rows_ref
    convs = pc.unique(d.column("conv_id"))
    ins = d.filter(pc.equal(d.column("op"), "U")).drop_columns(["op", "version"])
    pieces = [ins]
    if old_file:
        old = pq.read_table(old_file)
        kept = old.filter(pc.invert(pc.is_in(old.column("conv_id"), value_set=convs)))
        if kept.num_rows:
            pieces.append(kept)
    t = pa.concat_tables(pieces, promote_options="permissive").sort_by("conv_id")
    tmp = f"{out}.tmp-{os.getpid()}"
    pq.write_table(t, tmp)
    os.replace(tmp, out)
    return {"pid": pid, "rows": t.num_rows, "path": out}


class ReplicaTable:
    """One instance per replica directory; durable state (manifest +
    partition files) lives in the directory. Single applier per replica,
    matching the view's single-writer contract."""

    def __init__(self, out_dir: str, num_partitions: int = 16):
        self.out_dir = out_dir
        self.num_partitions = int(num_partitions)
        os.makedirs(out_dir, exist_ok=True)

    # -- durable state -------------------------------------------------
    def _load_state(self) -> dict | None:
        path = os.path.join(self.out_dir, _MANIFEST)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def _commit(self, state: dict) -> None:
        path = os.path.join(self.out_dir, _MANIFEST)
        tmp = f"{path}.tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, path)
        live = {os.path.basename(p) for p in state["files"].values()} | {_MANIFEST}
        for name in os.listdir(self.out_dir):
            if name not in live and name.endswith(".parquet"):
                os.remove(os.path.join(self.out_dir, name))

    @property
    def version(self) -> int:
        state = self._load_state()
        return int(state["version"]) if state else 0

    # -- public API ----------------------------------------------------
    def seed(self, table: pa.Table, version: int) -> dict:
        """Full resync from a seed window ('replace everything'): the
        view's complete state at ``version`` replaces the replica."""
        state = self._load_state()
        if state is not None and version <= int(state["version"]):
            return {"applied": False, "version": int(state["version"])}
        pids = (
            stable_hash_array(table.column("conv_id")) % np.uint64(self.num_partitions)
        ).astype(np.int64)
        files: dict[str, str] = {}
        for pid in np.unique(pids):
            part = table.filter(pa.array(pids == pid)).sort_by("conv_id")
            path = os.path.join(
                self.out_dir, f"part-{int(pid):05d}-v{version:06d}-{uuid.uuid4().hex[:8]}.parquet"
            )
            tmp = f"{path}.tmp-{os.getpid()}"
            pq.write_table(part, tmp)
            os.replace(tmp, path)
            files[str(int(pid))] = path
        self._commit({"version": int(version), "files": files})
        return {"applied": True, "version": int(version), "rows": table.num_rows}

    def apply(self, delta: pa.Table, version: int) -> dict:
        """Apply one changefeed window (netted ``op``/``version`` rows up
        to ``version``). Idempotent: a window ending at or before the
        replica's committed version is a no-op."""
        state = self._load_state()
        if state is None:
            raise RuntimeError("replica has no seed; apply a seed window first")
        if version <= int(state["version"]):
            return {"applied": False, "version": int(state["version"])}
        old_files = dict(state["files"])
        if delta.num_rows == 0:
            self._commit({"version": int(version), "files": old_files})
            return {"applied": True, "version": int(version), "rows": 0}

        pids = (
            stable_hash_array(delta.column("conv_id")) % np.uint64(self.num_partitions)
        ).astype(np.int64)
        refs = []
        for pid in np.unique(pids):
            part = delta.filter(pa.array(pids == pid))
            refs.append(
                _splice_task.remote(
                    ray.put(part),  # O(touched convs in this pid)
                    int(pid),
                    old_files.get(str(int(pid))),
                    os.path.join(
                        self.out_dir,
                        f"part-{int(pid):05d}-v{version:06d}-{uuid.uuid4().hex[:8]}.parquet",
                    ),
                )
            )
        results = ray.get(refs)  # O(touched partitions) meta rows
        files = dict(old_files)
        touched_rows = 0
        for r in results:
            touched_rows += int(r["rows"])
            if r["rows"]:
                files[str(r["pid"])] = r["path"]
            else:
                files.pop(str(r["pid"]), None)
                os.remove(r["path"])
        self._commit({"version": int(version), "files": files})
        return {
            "applied": True,
            "version": int(version),
            "rows": touched_rows,
            "touched_partitions": len(results),
        }

    def read(self) -> "ray.data.Dataset":
        state = self._load_state()
        files = sorted(state["files"].values()) if state else []
        if not files:
            return ray.data.from_items([])
        return ray.data.read_parquet(files)

    def read_arrow(self) -> pa.Table:
        state = self._load_state()
        files = sorted(state["files"].values()) if state else []
        if not files:
            return pa.table({})
        return pa.concat_tables([pq.read_table(f) for f in files]).sort_by("conv_id")

    def follow(self, consumer) -> dict:
        """Drain a :class:`~.consumer.ViewDeltaConsumer`'s sink into the
        replica: apply every committed window past the replica's version
        in range order (seeds as full resync). The one-call transport →
        apply loop for a replica living beside the sink."""
        import re

        pat = re.compile(r"^window-(\d{12,})-(\d{12,})(-seed)?$")
        windows = []
        for d in os.listdir(consumer.out_dir):
            m = pat.match(d)
            if m:
                windows.append((int(m.group(1)), int(m.group(2)), bool(m.group(3)), d))
        applied = 0
        for _lo, hi, is_seed, name in sorted(windows):
            if hi <= self.version and not (is_seed and self.version == 0):
                continue
            t = consumer.read_window(name)
            if is_seed:
                r = self.seed(t, hi)
            else:
                r = self.apply(t, hi)
            applied += 1 if r["applied"] else 0
        return {"windows_applied": applied, "version": self.version}
