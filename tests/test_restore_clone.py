"""Table lifecycle: RESTORE (rollback to version) and CLONE (deep/shallow).

Delta-style semantics: restore is a NEW versioned commit whose state
equals the time-travel snapshot of the target version; a clone is an
independent table whose writes never touch the source (copy-on-write).
"""

import os

import pytest

from etl_framework_ray.pipelines.cdc import CDCEngine
from etl_framework_ray.sources.changelog import ChangeLog
from etl_framework_ray.sources.generator import GenConfig, generate_changelog, oracle_replay


def _setup(tmp_path, n=4000, seed=51):
    log = generate_changelog(GenConfig(num_events=n, seed=seed))
    clog = ChangeLog(str(tmp_path / "changelog"))
    clog.write_segments(log, segment_rows=n // 8)
    eng = CDCEngine(str(tmp_path / "lake" / "transcripts"), num_partitions=4)
    eng.replay(clog, segments_per_epoch=2)  # 4 epochs → versions 2..5
    return log, clog, eng


@pytest.mark.usefixtures("ray_session")
def test_restore_rolls_back_then_replay_rebuilds(tmp_path):
    log, clog, eng = _setup(tmp_path)
    final = eng.snapshot_arrow()
    mid_version = 3  # after the 2nd of 4 epochs
    mid = eng.snapshot_arrow(version=mid_version)
    assert not mid.equals(final)

    info = eng.restore(mid_version)
    assert info["restored_version"] == mid_version
    assert eng.manifest.version > mid_version  # a NEW commit, not a rewind
    assert eng.snapshot_arrow().equals(mid)
    assert eng.manifest.history[-1]["op"] == "restore"

    # a fresh engine sees the restored state through the manifest alone
    eng2 = CDCEngine(eng.table_dir, num_partitions=4)
    assert eng2.snapshot_arrow().equals(mid)

    # replaying the same changelog re-applies the undone epochs:
    # the timeline rebuilds to the oracle state
    stats = eng2.replay(clog, segments_per_epoch=2)
    assert stats.epochs_applied == 2
    oracle = oracle_replay(log)
    rows = eng2.snapshot_arrow().to_pylist()
    assert len(rows) == len(oracle)
    for r in rows:
        assert r["text"] == oracle[(r["conv_id"], r["turn_idx"])]["text"]


@pytest.mark.usefixtures("ray_session")
def test_restore_guards(tmp_path):
    log = generate_changelog(GenConfig(num_events=4000, seed=53))
    clog = ChangeLog(str(tmp_path / "changelog"))
    clog.write_segments(log, segment_rows=500)
    # compact_every=1: every epoch folds the stack, retiring prior files
    eng = CDCEngine(
        str(tmp_path / "lake" / "transcripts"), num_partitions=4, compact_every=1
    )
    # vacuum=False keeps the folded files on disk (replay's default
    # end-of-run vacuum would end time travel — and restore — right away)
    eng.replay(clog, segments_per_epoch=2, vacuum=False)
    with pytest.raises(ValueError, match="not an earlier version"):
        eng.restore(eng.manifest.version)
    assert eng.restore(2)["restored_version"] == 2  # files still on disk
    eng.restore(eng.manifest.version - 1)  # restore of a restore works too
    # vacuum reclaims superseded files → restore past it fails loud
    eng.vacuum()
    with pytest.raises(ValueError, match="vacuumed"):
        eng.restore(3)


@pytest.mark.usefixtures("ray_session")
def test_deep_clone_is_independent(tmp_path):
    log, clog, eng = _setup(tmp_path)
    dst = str(tmp_path / "lake" / "branch")
    info = eng.clone(dst)
    assert info["files_copied"] > 0

    clone = CDCEngine(dst, num_partitions=4, create_if_missing=False)
    assert clone.snapshot_arrow().equals(eng.snapshot_arrow())
    # every clone file lives under the clone's own directory
    for f in clone.manifest.data_files():
        assert os.path.abspath(f).startswith(os.path.abspath(dst)), f
    assert clone.fsck()["ok"]

    # mutate the SOURCE: extend the log and replay — the clone is frozen
    more = generate_changelog(
        GenConfig(num_events=1000, seed=52, lsn_start=4001)
    )
    clog.write_segments(more, segment_rows=500)
    before = clone.snapshot_arrow()
    eng.replay(clog, segments_per_epoch=2)
    assert clone.snapshot_arrow().equals(before)
    assert not eng.snapshot_arrow().equals(before)

    # the clone is a full CDC table: replaying the same changelog into it
    # catches it up to the source (writes land under the clone's dir)
    clone.replay(clog, segments_per_epoch=2)
    assert clone.snapshot_arrow().equals(eng.snapshot_arrow())
    assert clone.fsck()["ok"]
    # source files untouched by the clone's writes
    assert eng.fsck()["ok"]


@pytest.mark.usefixtures("ray_session")
def test_clone_at_version_matches_time_travel(tmp_path):
    _, _, eng = _setup(tmp_path)
    dst = str(tmp_path / "lake" / "pinned")
    eng.clone(dst, version=3)
    clone = CDCEngine(dst, create_if_missing=False)
    assert clone.snapshot_arrow().equals(eng.snapshot_arrow(version=3))


@pytest.mark.usefixtures("ray_session")
def test_shallow_clone_zero_copy_and_documented_hazard(tmp_path):
    _, _, eng = _setup(tmp_path)
    dst = str(tmp_path / "lake" / "shallow")
    info = eng.clone(dst, shallow=True)
    assert info["files_copied"] == 0
    clone = CDCEngine(dst, create_if_missing=False)
    assert clone.snapshot_arrow().equals(eng.snapshot_arrow())
    # the documented hazard: source compact+vacuum retires files the
    # shallow clone still references — its fsck pinpoints the breakage
    eng.compact()
    eng.vacuum()
    audit = clone.fsck()
    assert not audit["ok"]
    assert any("missing" in i for i in audit["issues"])


@pytest.mark.usefixtures("ray_session")
def test_clone_refuses_existing_table(tmp_path):
    _, _, eng = _setup(tmp_path)
    with pytest.raises(ValueError, match="already holds a table"):
        eng.clone(eng.table_dir)


@pytest.mark.usefixtures("ray_session")
def test_clone_inherits_cas_backend(tmp_path):
    """A CAS-backed table clones onto the SAME commit primitives: the
    clone's manifest lives in the shared backend (no POSIX _manifest
    dir), is readable through it, and the clone replays independently."""
    from etl_framework_ray.state.backend import MemoryCommitBackend
    from etl_framework_ray.state.manifest import ManifestStore

    log = generate_changelog(GenConfig(num_events=3000, num_conversations=50, seed=4))
    clog = ChangeLog(str(tmp_path / "log"))
    clog.write_segments(log, segment_rows=1000)
    be = MemoryCommitBackend()
    eng = CDCEngine(str(tmp_path / "src"), num_partitions=4, commit_backend=be)
    eng.replay(clog, segments_per_epoch=2)

    info = eng.clone(str(tmp_path / "dst"))
    assert info["src_version"] == eng.manifest.version
    assert not os.path.exists(os.path.join(str(tmp_path / "dst"), "_manifest"))
    dst = CDCEngine(str(tmp_path / "dst"), num_partitions=4, commit_backend=be)
    assert dst.snapshot_arrow().equals(eng.snapshot_arrow())
    # and the clone's manifest really is in the shared CAS store
    assert ManifestStore(str(tmp_path / "dst"), backend=be).current_version() is not None
