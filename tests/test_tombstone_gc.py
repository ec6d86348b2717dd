"""Tombstone retention + GC semantics.

Tombstones must survive long enough to discard late re-delivered OLDER
events for deleted keys (resurrection protection), and the TTL horizon
must drop them at compaction once no such event can arrive."""

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from etl_framework_ray.pipelines.cdc import CDCEngine
from etl_framework_ray.sources.changelog import ChangeLog
from etl_framework_ray.sources.generator import CHANGELOG_SCHEMA


def _log(rows):
    return pa.Table.from_pylist(rows, schema=CHANGELOG_SCHEMA)


def _ev(lsn, op, ts, conv, turn, text=None):
    return {
        "lsn": lsn, "op": op, "ts": ts * 1_000_000, "conv_id": conv,
        "turn_idx": turn, "role": None if op == "D" else "user",
        "text": None if op == "D" else text, "tool": None,
    }


def _tombstone_count(eng):
    n = 0
    for f in eng.manifest.data_files():
        t = pq.read_table(f)
        if "_deleted" in t.column_names:
            n += pc.sum(t.column("_deleted")).as_py() or 0
    return n


@pytest.mark.usefixtures("ray_session")
def test_tombstone_blocks_late_resurrection(tmp_path):
    clog = ChangeLog(str(tmp_path / "log"))
    # epoch 1: insert at ts=10, delete at ts=20
    clog.write_segments(
        _log([_ev(1, "I", 10, "c1", 0, "alive"), _ev(2, "D", 20, "c1", 0)]), 10
    )
    # epoch 2: a LATE event with OLDER ts (15) re-targets the deleted key
    clog.write_segments(_log([_ev(3, "U", 15, "c1", 0, "zombie")]), 10)

    eng = CDCEngine(str(tmp_path / "tbl"), num_partitions=2)
    eng.replay(clog, segments_per_epoch=1)
    assert eng.snapshot_arrow().num_rows == 0  # the zombie was discarded
    assert _tombstone_count(eng) == 1  # tombstone retained (no TTL)


@pytest.mark.usefixtures("ray_session")
def test_tombstone_gc_at_compaction(tmp_path):
    clog = ChangeLog(str(tmp_path / "log"))
    clog.write_segments(
        _log([_ev(1, "I", 10, "c1", 0, "alive"), _ev(2, "D", 20, "c1", 0)]), 10
    )
    # several later epochs push the watermark far past the TTL
    for i in range(3, 9):
        clog.write_segments(_log([_ev(i * 100, "I", i * 10, "c2", i, f"t{i}")]), 10)

    eng = CDCEngine(
        str(tmp_path / "tbl"), num_partitions=1, compact_every=2, tombstone_ttl_lsn=50
    )
    eng.replay(clog, segments_per_epoch=1)
    assert _tombstone_count(eng) == 0  # GC'd at a compaction beyond the horizon
    live = {(r["conv_id"], r["turn_idx"]) for r in eng.snapshot_arrow().to_pylist()}
    assert ("c1", 0) not in live and len(live) == 6
