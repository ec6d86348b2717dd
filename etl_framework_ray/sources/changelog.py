"""Binlog/WAL changelog: Parquet segment files + epoch planning.

The changelog directory holds immutable Parquet segment files named
``segment-<first_lsn:012d>-<last_lsn:012d>.parquet``; LSN ranges are encoded
in the filename so epoch planning never opens file footers. An *epoch* is a
contiguous LSN range covering one or more whole segments — replay is a loop
of ordinary batch pipelines, one per epoch (SURVEY.md §2.9 micro-batch
model; the reference's analogue is the cron-scheduled bronze ingest of raw
files, /root/reference/src/bronze/ingest.py:28-55).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.parquet as pq

_SEG_RE = re.compile(r"^segment-(\d{12})-(\d{12})\.parquet$")


@dataclass(frozen=True)
class Segment:
    path: str
    min_lsn: int
    max_lsn: int


@dataclass(frozen=True)
class Epoch:
    """A contiguous run of whole segments. ``epoch_id`` == ``max_lsn`` — a
    monotone watermark, so "epoch committed" is a single int comparison."""

    segments: tuple[Segment, ...]

    @property
    def paths(self) -> list[str]:
        return [s.path for s in self.segments]

    @property
    def min_lsn(self) -> int:
        return min(s.min_lsn for s in self.segments)

    @property
    def max_lsn(self) -> int:
        return max(s.max_lsn for s in self.segments)

    @property
    def epoch_id(self) -> int:
        return self.max_lsn


class ChangeLog:
    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)

    def write_segments(self, log: pa.Table, segment_rows: int) -> list[str]:
        """Split a change-event table into segment files of ~segment_rows.

        Rows keep their generated order (which may be LSN-shuffled in the
        out-of-order fixture); the filename range uses actual min/max LSN of
        the slice.
        """
        paths = []
        for start in range(0, log.num_rows, segment_rows):
            chunk = log.slice(start, segment_rows)
            lsns = chunk.column("lsn")
            import pyarrow.compute as pc

            lo = pc.min(lsns).as_py()
            hi = pc.max(lsns).as_py()
            path = os.path.join(self.log_dir, f"segment-{lo:012d}-{hi:012d}.parquet")
            tmp = path + ".tmp"
            pq.write_table(chunk, tmp)
            os.replace(tmp, path)
            paths.append(path)
        return paths

    def segments(self) -> list[Segment]:
        segs = []
        for name in os.listdir(self.log_dir):
            m = _SEG_RE.match(name)
            if m:
                segs.append(
                    Segment(os.path.join(self.log_dir, name), int(m.group(1)), int(m.group(2)))
                )
        segs.sort(key=lambda s: s.min_lsn)
        return segs

    def prune(self, upto_lsn: int) -> int:
        """Log truncation: delete segment files whose ENTIRE LSN range is
        at or below ``upto_lsn`` (a straddling segment is kept whole —
        segments are the atomic unit). Returns the number removed.

        ``upto_lsn`` must be the MINIMUM applied watermark across every
        consumer of this log (lake engines, history tables, lagging
        tailers) — the caller owns that computation; the log has no
        consumer registry by design (any number of independent readers
        may attach without coordination). The CLI ``prune-log`` derives
        it from ``--table`` manifests. Removal is safe against concurrent
        replays of THOSE consumers: their resume path skips
        ``max_lsn <= applied_lsn`` segments without opening them, and
        epoch planning lists the directory fresh each poll."""
        removed = 0
        for seg in self.segments():
            if seg.max_lsn <= upto_lsn:
                try:
                    os.remove(seg.path)
                    removed += 1
                except FileNotFoundError:
                    pass  # racing pruner — already gone
        return removed

    def epochs(self, segments_per_epoch: int = 4, after_lsn: int = 0) -> list[Epoch]:
        """Group segments into epochs, skipping segments fully applied
        (``max_lsn <= after_lsn`` — the resume path)."""
        pending = [s for s in self.segments() if s.max_lsn > after_lsn]
        return [
            Epoch(tuple(pending[i : i + segments_per_epoch]))
            for i in range(0, len(pending), segments_per_epoch)
        ]
