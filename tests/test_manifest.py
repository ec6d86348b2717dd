"""Manifest store: atomic commit protocol, version conflicts, vacuum. No Ray."""

import os

import pyarrow as pa
import pytest

from etl_framework_ray.state.manifest import Manifest, ManifestStore, PartitionState
from etl_framework_ray.state.schema import schema_to_b64


def _man(version=1, **kw):
    return Manifest(
        table="t",
        version=version,
        num_partitions=4,
        schema_b64=schema_to_b64(pa.schema([pa.field("a", pa.int32())])),
        **kw,
    )


def test_roundtrip(tmp_path):
    store = ManifestStore(str(tmp_path))
    assert store.load() is None
    m = _man()
    m.partitions[3] = PartitionState(files=["/x/f.parquet"], applied_lsn=7, rows=10)
    store.commit(m)
    got = store.load()
    assert got.version == 1
    assert got.partitions[3].files == ["/x/f.parquet"]
    assert got.schema.names == ["a"]


def test_version_conflict_rejected(tmp_path):
    store = ManifestStore(str(tmp_path))
    store.commit(_man(1))
    with pytest.raises(RuntimeError, match="conflict"):
        store.commit(_man(1))  # replay of same version
    with pytest.raises(RuntimeError, match="conflict"):
        store.commit(_man(3))  # skipping a version
    store.commit(_man(2))
    assert store.load().version == 2


def test_uncommitted_files_invisible_and_vacuumed(tmp_path):
    store = ManifestStore(str(tmp_path))
    data = tmp_path / "data" / "part=00001"
    data.mkdir(parents=True)
    live = data / "live.parquet"
    orphan = data / "orphan.parquet"
    live.write_bytes(b"x")
    orphan.write_bytes(b"y")
    m = _man(1)
    m.partitions[1] = PartitionState(files=[str(live)], applied_lsn=1, rows=1)
    store.commit(m)
    assert store.load().data_files() == [str(live)]  # orphan never visible
    removed = store.vacuum(m)
    assert removed == 1
    assert live.exists() and not orphan.exists()


def test_history_and_watermark_roundtrip(tmp_path):
    store = ManifestStore(str(tmp_path))
    m = _man(1, applied_lsn=500)
    m.history.append({"epoch_id": 500, "events": 10})
    store.commit(m)
    got = store.load()
    assert got.applied_lsn == 500
    assert got.history == [{"epoch_id": 500, "events": 10}]
    assert os.path.exists(tmp_path / "_manifest" / "CURRENT")


# ---------------------------------------------------------------------------
# Optimistic concurrency: the version file is the commit point
# ---------------------------------------------------------------------------


def test_commit_is_atomic_winner_take_all(tmp_path):
    """Two committers racing past the version precheck must serialize: the
    version-file link is fail-if-exists, so exactly one wins."""
    import json

    from etl_framework_ray.state.manifest import CommitConflict

    store = ManifestStore(str(tmp_path))
    store.commit(_man(1))
    # simulate a racer that won v2 AFTER our precheck: drop its version
    # file directly (complete JSON — exactly what a real winner leaves)
    vpath = os.path.join(str(tmp_path), "_manifest", "v00000002.json")
    with open(vpath, "w") as f:
        json.dump(_man(2).to_json(), f)
    # our commit of v2 must lose — never clobber the winner's file
    with pytest.raises(CommitConflict):
        store.commit(_man(2, properties={"mine": True}))
    assert store.load().properties == {}  # the racer's v2 survived intact


def test_crash_window_recovery_rolls_current_forward(tmp_path):
    """A committer crashing between version-file link and CURRENT write
    leaves a durable commit; the next reader finishes the pointer swap."""
    import json

    store = ManifestStore(str(tmp_path))
    store.commit(_man(1))
    vpath = os.path.join(str(tmp_path), "_manifest", "v00000002.json")
    with open(vpath, "w") as f:
        json.dump(_man(2).to_json(), f)
    cur = os.path.join(str(tmp_path), "_manifest", "CURRENT")
    with open(cur) as f:
        assert f.read().strip() == "1"  # pointer is stale
    assert store.current_version() == 2  # read recovers
    with open(cur) as f:
        assert f.read().strip() == "2"  # and persists the roll-forward
    store.commit(_man(3))  # next commit builds on the recovered version
    assert store.load().version == 3


def test_first_commit_crash_window(tmp_path):
    """v1 exists but CURRENT was never written (crash on the very first
    commit): recovery must still find it."""
    import json

    store = ManifestStore(str(tmp_path))
    os.makedirs(os.path.join(str(tmp_path), "_manifest"))
    with open(os.path.join(str(tmp_path), "_manifest", "v00000001.json"), "w") as f:
        json.dump(_man(1).to_json(), f)
    assert store.current_version() == 1
    assert store.load().version == 1


def test_vacuum_grace_spares_fresh_unreferenced_files(tmp_path):
    """grace_s > 0 keeps young orphans (a concurrent writer's in-flight
    staging) and removes old ones."""
    store = ManifestStore(str(tmp_path))
    data = tmp_path / "data" / "part=00001"
    data.mkdir(parents=True)
    fresh = data / "staging.parquet"
    old = data / "crashed.parquet"
    fresh.write_bytes(b"x")
    old.write_bytes(b"y")
    os.utime(old, (0, 0))  # epoch-old mtime
    m = _man(1)
    store.commit(m)
    removed = store.vacuum(m, grace_s=3600)
    assert removed == 1
    assert fresh.exists() and not old.exists()
