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
