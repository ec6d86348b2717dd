"""Kill/resume + exactly-once tests (FIXTURES.md F6).

A replay killed after epoch k's commit — and again mid-epoch k+1 before
commit (staged files on disk, no manifest entry) — must produce a final
state identical to an uninterrupted run.
"""

import glob
import os

import pytest

from etl_framework_ray.pipelines.cdc import CDCEngine
from etl_framework_ray.sources.changelog import ChangeLog
from etl_framework_ray.sources.generator import GenConfig, generate_changelog, oracle_replay

CFG = GenConfig(num_events=4000, num_conversations=120, seed=77)


def _setup(tmp_path):
    log = generate_changelog(CFG)
    clog = ChangeLog(str(tmp_path / "log"))
    clog.write_segments(log, segment_rows=500)
    return log, clog


@pytest.mark.usefixtures("ray_session")
def test_resume_after_commit_equals_uninterrupted(tmp_path):
    log, clog = _setup(tmp_path)

    # uninterrupted reference run
    ref = CDCEngine(str(tmp_path / "ref"), num_partitions=4)
    ref.replay(clog, segments_per_epoch=2)

    # interrupted run: apply 2 epochs, "crash", fresh engine resumes
    eng = CDCEngine(str(tmp_path / "tbl"), num_partitions=4)
    for epoch in clog.epochs(2)[:2]:
        eng.apply_epoch(epoch)
    watermark = eng.manifest.applied_lsn
    del eng

    eng2 = CDCEngine(str(tmp_path / "tbl"), num_partitions=4)
    assert eng2.manifest.applied_lsn == watermark  # durable checkpoint
    stats = eng2.replay(clog, segments_per_epoch=2)
    assert stats.epochs_applied == len(clog.epochs(2)) - 2

    assert eng2.snapshot_arrow().equals(ref.snapshot_arrow())


@pytest.mark.usefixtures("ray_session")
def test_crash_mid_epoch_leaves_state_invisible(tmp_path):
    log, clog = _setup(tmp_path)
    epochs = clog.epochs(2)

    eng = CDCEngine(str(tmp_path / "tbl"), num_partitions=4)
    eng.apply_epoch(epochs[0])
    state_after_e0 = eng.snapshot_arrow()

    # simulate a crash mid-epoch-1: stage files exactly like the applier
    # would, but never commit the manifest
    fake_dir = os.path.join(eng.table_dir, "data", "part=00002", f"epoch={epochs[1].epoch_id:012d}")
    os.makedirs(fake_dir, exist_ok=True)
    with open(os.path.join(fake_dir, "part-00002-garbage.parquet"), "wb") as f:
        f.write(b"not a parquet file")

    # snapshot still reads ONLY manifest-listed files → unchanged
    eng2 = CDCEngine(str(tmp_path / "tbl"), num_partitions=4)
    assert eng2.snapshot_arrow().equals(state_after_e0)

    # resume applies epoch 1+ normally; the garbage file is replaced or
    # ignored (deterministic staged name differs) and vacuumed
    eng2.replay(clog, segments_per_epoch=2)
    oracle = oracle_replay(log)
    got = eng2.snapshot_arrow().to_pylist()
    assert len(got) == len(oracle)
    assert all(oracle[(r["conv_id"], r["turn_idx"])]["text"] == r["text"] for r in got)
    leftovers = glob.glob(os.path.join(eng2.table_dir, "data", "**", "*garbage*"), recursive=True)
    assert leftovers == []  # vacuum removed the orphan


@pytest.mark.usefixtures("ray_session")
def test_reapply_committed_epoch_is_noop(tmp_path):
    log, clog = _setup(tmp_path)
    eng = CDCEngine(str(tmp_path / "tbl"), num_partitions=4)
    eng.replay(clog, segments_per_epoch=2)
    v = eng.manifest.version
    before = eng.snapshot_arrow()
    for epoch in clog.epochs(2):
        assert eng.apply_epoch(epoch) is None  # duplicate delivery of a committed epoch
    assert eng.manifest.version == v
    assert eng.snapshot_arrow().equals(before)
