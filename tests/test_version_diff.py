"""Version diff — row-level changes between two committed versions
(CDCEngine.diff): I/U/D per key from a per-partition LWW compare of the
two manifests' merge-on-read stacks, no retained deltas needed.
"""

import pytest

from etl_framework_ray.pipelines.cdc import CDCEngine
from etl_framework_ray.sources.changelog import ChangeLog
from etl_framework_ray.sources.generator import GenConfig, generate_changelog


def _setup(tmp_path, n=4000, seed=61, **eng_kw):
    log = generate_changelog(GenConfig(num_events=n, seed=seed, delete_frac=0.1))
    clog = ChangeLog(str(tmp_path / "changelog"))
    clog.write_segments(log, segment_rows=n // 8)
    eng = CDCEngine(str(tmp_path / "lake" / "transcripts"), num_partitions=4, **eng_kw)
    eng.replay(clog, segments_per_epoch=2, vacuum=False)  # versions 2..5
    return log, clog, eng


def _expected_diff(eng, v0, v1=None):
    """Brute-force oracle from the two time-travel snapshots."""
    old = {
        (r["conv_id"], r["turn_idx"]): r
        for r in eng.snapshot_arrow(version=v0).to_pylist()
    }
    new = {
        (r["conv_id"], r["turn_idx"]): r
        for r in eng.snapshot_arrow(version=v1).to_pylist()
    }
    exp = {}
    for k, r in new.items():
        if k not in old:
            exp[k] = ("I", r)
        elif old[k] != r:
            exp[k] = ("U", r)
    for k in old:
        if k not in new:
            exp[k] = ("D", None)
    return exp


@pytest.mark.usefixtures("ray_session")
def test_diff_matches_snapshot_compare(tmp_path):
    _, _, eng = _setup(tmp_path)
    got = eng.diff(3).take_all()
    exp = _expected_diff(eng, 3)
    assert {"I", "U", "D"} <= {r["diff_op"] for r in got}, "fixture must hit all ops"
    assert len(got) == len(exp)
    for r in got:
        k = (r["conv_id"], r["turn_idx"])
        op, row = exp[k]
        assert r["diff_op"] == op, k
        if op == "D":
            assert r["text"] is None and r["ts"] is None
        else:
            for c in ("role", "text", "tool", "ts"):
                assert r[c] == row[c], (k, c)


@pytest.mark.usefixtures("ray_session")
def test_diff_explicit_to_version_and_identity(tmp_path):
    _, _, eng = _setup(tmp_path, seed=62)
    got = eng.diff(2, to_version=4).take_all()
    exp = _expected_diff(eng, 2, 4)
    assert len(got) == len(exp) and len(exp) > 0
    for r in got:
        assert exp[(r["conv_id"], r["turn_idx"])][0] == r["diff_op"]
    # identity diff: no changes
    assert eng.diff(4, to_version=4).take_all() == []


@pytest.mark.usefixtures("ray_session")
def test_diff_streamed_chunks_equal_whole_partition(tmp_path):
    """The streaming two-stream walker with a tiny chunk size (keys
    forced to straddle chunk boundaries on both sides) yields exactly
    the same diff as the default chunking — no key is compared twice or
    dropped at a pivot."""
    import pyarrow as pa

    from etl_framework_ray.pipelines.cdc import (
        LSN_COL,
        DELETED_COL,
        _diff_partition_chunks,
    )

    _, _, eng = _setup(tmp_path, seed=64)
    man0 = eng.store.load(3)
    man1 = eng.manifest
    lake = man1.schema
    public = [f.name for f in lake if f.name not in (LSN_COL, DELETED_COL)]
    out_schema = pa.schema(
        [pa.field("diff_op", pa.string())] + [lake.field(n) for n in public]
    )
    key_cols = eng.key_cols
    rows_small, rows_big = [], []
    for pid in sorted(set(man0.partitions) | set(man1.partitions)):
        f0 = man0.partitions[pid].files if pid in man0.partitions else []
        f1 = man1.partitions[pid].files if pid in man1.partitions else []
        for chunk_rows, acc in ((64, rows_small), (1 << 20, rows_big)):
            for c in _diff_partition_chunks(
                list(f0), list(f1), lake, key_cols, public, out_schema, chunk_rows
            ):
                acc.extend(c.to_pylist())
    key = lambda r: (r["conv_id"], r["turn_idx"])  # noqa: E731
    assert sorted(rows_small, key=key) == sorted(rows_big, key=key)
    assert len(rows_small) > 100


@pytest.mark.usefixtures("ray_session")
def test_diff_guards(tmp_path):
    _, _, eng = _setup(tmp_path, seed=63, compact_every=1)
    with pytest.raises(FileNotFoundError, match="does not exist"):
        eng.diff(99)
    eng.reshard(8)
    with pytest.raises(ValueError, match="reshard"):
        eng.diff(3)
    # vacuum reclaims the folded stacks of old versions → diff fails loud
    eng2 = CDCEngine(eng.table_dir, num_partitions=8)
    eng2.vacuum()
    with pytest.raises(ValueError, match="vacuumed"):
        # version 3's files were folded by compact_every=1 and vacuumed
        CDCEngine(eng.table_dir).diff(3, to_version=eng2.manifest.version - 1)
