"""Durable changefeed delivery — the downstream half of the CDC contract.

``ChangefeedConsumer`` exports the net changes of a ``CDCEngine`` table to
a sink directory in exactly-once WINDOWS: each ``poll()`` streams
``engine.changefeed(since_lsn=watermark)`` (one merge task per partition,
nothing on the driver) into a window directory named by its LSN range,
then atomically commits the directory AND the advanced watermark. A crash
anywhere before the commit leaves the previous watermark in place; the
re-poll first SWEEPS any window directory whose end LSN exceeds the
committed watermark (a committed window's end is always ≤ it), so a window
renamed into place just before a crash can never be delivered alongside
the regenerated one — even when the table advanced in between and the
regenerated window covers a wider range under a different name. Downstream
readers that process window directories in LSN order therefore see each
change exactly once.

This is the generic form of the engine's own ``IncrementalRollup``
(pipelines/incremental.py): where the view folds the feed into an
aggregate, the consumer hands the raw net-change stream to external
systems (search indexers, caches, feature stores — the reference's
analogue is the gold-layer publish job,
/root/reference/src/gold/product_dimension.py:62-93, made continuous).

Scale shape: the export is ``Dataset.write_parquet`` over the streaming
feed — per-partition tasks write their own files under the window
directory; the driver sees only the commit. Window size is bounded by the
poll cadence, not the table.
"""

from __future__ import annotations

import json
import os
import re
import shutil

import pyarrow as pa

#: {12,} not {12}: '{:012d}' is a MINIMUM width — names past 10^12 LSNs
#: grow a 13th digit and must still match the sweep
_WINDOW_RE = re.compile(r"^window-(\d{12,})-(\d{12,})(-seed)?(\.tmp)?$")


def _dir_rows(d: str) -> int:
    """Row count of a window directory from parquet FOOTERS only."""
    import pyarrow.parquet as pq

    return sum(
        pq.ParquetFile(os.path.join(d, f)).metadata.num_rows
        for f in os.listdir(d)
        if f.endswith(".parquet")
    )


class ChangefeedConsumer:
    """One instance per (table, sink) pair; all durable state lives in the
    sink directory (``_consumer_state.json`` + window dirs), so it is safe
    to re-create after a crash. Single consumer per sink directory."""

    _STATE = "_consumer_state.json"

    def __init__(self, engine, out_dir: str):
        self.engine = engine
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)

    # -- durable state -------------------------------------------------
    @property
    def watermark(self) -> int:
        path = os.path.join(self.out_dir, self._STATE)
        if not os.path.exists(path):
            return 0
        with open(path) as f:
            return int(json.load(f)["watermark_lsn"])

    def _commit(self, watermark: int, window: str | None, rows: int) -> None:
        path = os.path.join(self.out_dir, self._STATE)
        tmp = f"{path}.tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"watermark_lsn": watermark, "last_window": window, "last_rows": rows}, f)
        os.replace(tmp, path)

    def _sweep_uncommitted(self, wm: int) -> None:
        """Remove window dirs the watermark never recorded. A crash between
        ``os.replace(tmp, final)`` and ``_commit`` leaves a final-named dir;
        if the table advances before the re-poll, the regenerated window
        gets a DIFFERENT name and the stale one would hand downstream its
        LSN range twice. Invariant: every committed window's end LSN is ≤
        the watermark, so end > watermark (and any ``.tmp``) is residue."""
        for d in os.listdir(self.out_dir):
            m = _WINDOW_RE.match(d)
            if m and (int(m.group(2)) > wm or m.group(4)):
                shutil.rmtree(os.path.join(self.out_dir, d), ignore_errors=True)

    # -- public API ----------------------------------------------------
    def poll(self) -> dict:
        """Export one window of net changes ``(watermark, applied_lsn]``.
        Returns ``{"window": dir_or_None, "rows": n, "watermark_lsn": w}``;
        a no-op poll (nothing committed since the last one) writes
        nothing. Raises the engine's changefeed horizon errors when the
        consumer lagged past retention — re-seed from a snapshot export
        and resume from its LSN (``seed_from_snapshot``)."""
        wm = self.watermark
        self._sweep_uncommitted(wm)  # crash-leftover finals and tmps
        cur = int(self.engine.manifest.applied_lsn)
        if cur <= wm:
            return {"window": None, "rows": 0, "watermark_lsn": wm}
        feed = self.engine.changefeed(since_lsn=wm)  # validates the horizon
        name = f"window-{wm + 1:012d}-{cur:012d}"
        final = os.path.join(self.out_dir, name)
        tmp = final + ".tmp"
        feed.write_parquet(tmp)
        rows = _dir_rows(tmp)
        os.replace(tmp, final)
        self._commit(cur, name, rows)
        return {"window": name, "rows": rows, "watermark_lsn": cur}

    def seed_from_snapshot(self) -> dict:
        """Bootstrap (or retention-recovery) path: export the CURRENT
        committed state as window 0..applied_lsn and set the watermark —
        the documented re-seed when ``poll()`` raises past the retention
        floor. Downstream treats a seed window as 'replace everything'."""
        self._sweep_uncommitted(self.watermark)
        cur = int(self.engine.manifest.applied_lsn)
        name = f"window-{0:012d}-{cur:012d}-seed"
        final = os.path.join(self.out_dir, name)
        tmp = final + ".tmp"
        self.engine.snapshot().write_parquet(tmp)
        rows = _dir_rows(tmp)
        # a COMMITTED seed has end == watermark, so the sweep keeps it; a
        # re-seed without a table advance regenerates the same name and
        # must replace it (idempotent recovery), not crash on ENOTEMPTY
        shutil.rmtree(final, ignore_errors=True)
        os.replace(tmp, final)
        self._commit(cur, name, rows)
        return {"window": name, "rows": rows, "watermark_lsn": cur}

    def read_window(self, window: str) -> pa.Table:
        """Driver-side convenience read of one exported window (tests /
        small windows)."""
        import pyarrow.parquet as pq

        d = os.path.join(self.out_dir, window)
        parts = [
            pq.read_table(os.path.join(d, f)) for f in sorted(os.listdir(d)) if f.endswith(".parquet")
        ]
        return pa.concat_tables(parts) if parts else pa.table({})


class ViewDeltaConsumer:
    """Exactly-once delivery of a maintained VIEW's changefeed — the
    downstream half of view composition, mirroring
    :class:`ChangefeedConsumer` with the view VERSION as the cursor.

    Each ``poll()`` exports ``view.changes(cursor)`` (netted
    per-conversation REPLACE deltas) into a window directory named by its
    version range, then atomically commits the directory AND the advanced
    cursor; the same sweep invariant as the lake consumer makes a crash
    between rename and commit safe. When the view's continuity floor has
    passed the cursor (a rebuild or a non-emitting advance), ``poll()``
    propagates the view's fail-loud error — recover with
    :meth:`seed_from_view`, which exports the full view state as a seed
    window ("replace everything" downstream) and restarts the cursor at
    the current version.

    The consumer only READS the view; delta GC (``prune_changes``) stays
    with the view's single writer, which can prune up to the consumer's
    committed :attr:`cursor`."""

    _STATE = "_consumer_state.json"

    def __init__(self, view, out_dir: str):
        self.view = view
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)

    # -- durable state -------------------------------------------------
    @property
    def cursor(self) -> int:
        path = os.path.join(self.out_dir, self._STATE)
        if not os.path.exists(path):
            return 0
        with open(path) as f:
            return int(json.load(f)["version"])

    def _commit(self, version: int, window: str | None, rows: int) -> None:
        path = os.path.join(self.out_dir, self._STATE)
        tmp = f"{path}.tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"version": version, "last_window": window, "last_rows": rows}, f)
        os.replace(tmp, path)

    def _sweep_uncommitted(self, cur: int) -> None:
        """Same invariant as the lake consumer: every committed window's
        end version is ≤ the cursor, so end > cursor (and any .tmp) is
        crash residue that would double-deliver its range."""
        for d in os.listdir(self.out_dir):
            m = _WINDOW_RE.match(d)
            if m and (int(m.group(2)) > cur or m.group(4)):
                shutil.rmtree(os.path.join(self.out_dir, d), ignore_errors=True)

    # -- public API ----------------------------------------------------
    def poll(self) -> dict:
        """Export one window of view deltas ``(cursor, view.version]``.
        Returns ``{"window": dir_or_None, "rows": n, "version": v}``; a
        no-op poll writes nothing. Raises the view's continuity error when
        the cursor lagged past the delta floor — re-seed with
        :meth:`seed_from_view`."""
        cur = self.cursor
        self._sweep_uncommitted(cur)
        head = self.view.version
        if head <= cur:
            return {"window": None, "rows": 0, "version": cur}
        ds = self.view.changes(cur)  # validates the continuity floor
        name = f"window-{cur + 1:012d}-{head:012d}"
        final = os.path.join(self.out_dir, name)
        tmp = final + ".tmp"
        ds.write_parquet(tmp)
        rows = _dir_rows(tmp)
        os.replace(tmp, final)
        self._commit(head, name, rows)
        return {"window": name, "rows": rows, "version": head}

    def seed_from_view(self) -> dict:
        """Bootstrap / floor-recovery: export the CURRENT view state as a
        seed window (downstream: replace everything) and restart the
        cursor at the view's version."""
        self._sweep_uncommitted(self.cursor)
        head = self.view.version
        name = f"window-{0:012d}-{head:012d}-seed"
        final = os.path.join(self.out_dir, name)
        tmp = final + ".tmp"
        self.view.read().write_parquet(tmp)
        rows = _dir_rows(tmp)
        shutil.rmtree(final, ignore_errors=True)  # idempotent re-seed
        os.replace(tmp, final)
        self._commit(head, name, rows)
        return {"window": name, "rows": rows, "version": head}

    def read_window(self, window: str) -> pa.Table:
        import pyarrow.parquet as pq

        d = os.path.join(self.out_dir, window)
        parts = [
            pq.read_table(os.path.join(d, f))
            for f in sorted(os.listdir(d))
            if f.endswith(".parquet")
        ]
        return pa.concat_tables(parts) if parts else pa.table({})
