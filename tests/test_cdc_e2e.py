"""End-to-end CDC replay vs the dict-replay oracle (FIXTURES.md F3).

The invariant under test is the north rule's: per-turn text equality under
stable turn ordering after full replay, for uniform / skewed / out-of-order
/ duplicate-delivery changelogs.
"""

import pyarrow as pa
import pytest

from etl_framework_ray.pipelines.cdc import CDCEngine
from etl_framework_ray.sources.changelog import ChangeLog
from etl_framework_ray.sources.generator import GenConfig, generate_changelog, oracle_replay


def _replay(tmp_path, cfg: GenConfig, num_partitions=8, segment_rows=800, segments_per_epoch=2):
    log_tbl = generate_changelog(cfg)
    clog = ChangeLog(str(tmp_path / "changelog"))
    clog.write_segments(log_tbl, segment_rows=segment_rows)
    eng = CDCEngine(str(tmp_path / "lake" / "transcripts"), num_partitions=num_partitions)
    stats = eng.replay(clog, segments_per_epoch=segments_per_epoch)
    return log_tbl, eng, stats


def _assert_matches_oracle(log_tbl: pa.Table, eng: CDCEngine):
    oracle = oracle_replay(log_tbl)
    state = eng.snapshot_arrow()
    rows = state.to_pylist()
    # stable turn ordering: sorted by (conv_id, turn_idx)
    keys = [(r["conv_id"], r["turn_idx"]) for r in rows]
    assert keys == sorted(keys)
    assert len(keys) == len(set(keys)), "duplicate primary keys in committed state"
    assert len(rows) == len(oracle)
    for r in rows:
        exp = oracle[(r["conv_id"], r["turn_idx"])]
        assert r["text"] == exp["text"], (r["conv_id"], r["turn_idx"])
        assert r["role"] == exp["role"]
        assert r["tool"] == exp["tool"]
        assert r["ts"] == exp["ts"]


@pytest.mark.usefixtures("ray_session")
def test_uniform_replay_matches_oracle(tmp_path):
    log_tbl, eng, stats = _replay(tmp_path, GenConfig(num_events=6000, seed=42))
    assert stats.epochs_applied > 1
    assert stats.events == 6000
    _assert_matches_oracle(log_tbl, eng)


@pytest.mark.usefixtures("ray_session")
def test_hot_key_skew_replay(tmp_path):
    log_tbl, eng, stats = _replay(
        tmp_path, GenConfig(num_events=6000, seed=43, hot_key_frac=0.3)
    )
    _assert_matches_oracle(log_tbl, eng)


@pytest.mark.usefixtures("ray_session")
def test_out_of_order_replay(tmp_path):
    log_tbl, eng, stats = _replay(
        tmp_path, GenConfig(num_events=6000, seed=44, out_of_order=True)
    )
    _assert_matches_oracle(log_tbl, eng)


@pytest.mark.usefixtures("ray_session")
def test_snapshot_dataset_matches_arrow(tmp_path):
    log_tbl, eng, _ = _replay(tmp_path, GenConfig(num_events=3000, seed=45))
    ds_rows = eng.snapshot().take_all()
    ar_rows = eng.snapshot_arrow().to_pylist()
    key = lambda r: (r["conv_id"], r["turn_idx"])  # noqa: E731
    assert sorted(ds_rows, key=key) == ar_rows


@pytest.mark.usefixtures("ray_session")
def test_metrics_lineage_written(tmp_path):
    from etl_framework_ray.pipelines.metrics import read_metrics

    log_tbl, eng, stats = _replay(tmp_path, GenConfig(num_events=3000, seed=46))
    m = read_metrics(eng.table_dir)
    assert m.num_rows > 0
    assert stats.events == 3000  # raw change events accounted in lineage
    import pyarrow.compute as pc

    # post-combiner events routed to partitions never exceed raw events
    assert 0 < pc.sum(m.column("events_applied")).as_py() <= 3000
    # per-partition watermarks advanced to the last epoch
    assert set(m.column("epoch_id").to_pylist()) == {
        h["epoch_id"] for h in eng.manifest.history
    }


@pytest.mark.usefixtures("ray_session")
def test_snapshot_column_pruning(tmp_path):
    """snapshot(columns=...) must equal the full snapshot projected — same
    rows, caller's column order — while never decoding unrequested payload
    (verified indirectly: the pruned lake schema excludes 'text')."""
    from etl_framework_ray.pipelines.cdc import pruned_lake_schema

    log_tbl, eng, _ = _replay(tmp_path, GenConfig(num_events=3000, seed=47))
    key = lambda r: (r["conv_id"], r["turn_idx"])  # noqa: E731
    full = sorted(eng.snapshot().take_all(), key=key)
    slim = sorted(eng.snapshot(columns=["role", "conv_id", "turn_idx"]).take_all(), key=key)
    assert len(slim) == len(full)
    assert list(slim[0].keys()) == ["role", "conv_id", "turn_idx"]  # caller order
    for f, s in zip(full, slim):
        assert (s["conv_id"], s["turn_idx"], s["role"]) == (
            f["conv_id"], f["turn_idx"], f["role"],
        )
    pruned = pruned_lake_schema(
        eng.manifest.schema, eng.key_cols, ["role", "conv_id", "turn_idx"]
    )
    assert "text" not in pruned.names  # the wide column is never decoded
    with pytest.raises(ValueError, match="unknown or internal"):
        eng.snapshot(columns=["_lsn"])
