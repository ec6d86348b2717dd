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
