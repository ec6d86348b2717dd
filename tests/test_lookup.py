"""Point lookup + partition-pruned snapshot reads."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from etl_framework_ray.functions.hashing import partition_ids
from etl_framework_ray.pipelines.cdc import CDCEngine
from etl_framework_ray.sources.changelog import ChangeLog
from etl_framework_ray.sources.generator import GenConfig, generate_changelog


def _replayed(tmp_path, **gen_kw):
    replay_kw = gen_kw.pop("replay_kw", {})
    cfg = GenConfig(
        num_events=gen_kw.pop("num_events", 4000),
        num_conversations=gen_kw.pop("num_conversations", 50),
        seed=gen_kw.pop("seed", 21),
        delete_frac=gen_kw.pop("delete_frac", 0.1),
        **gen_kw,
    )
    log = generate_changelog(cfg)
    clog = ChangeLog(str(tmp_path / "log"))
    clog.write_segments(log, segment_rows=1000)
    eng = CDCEngine(str(tmp_path / "tbl"), num_partitions=8)
    eng.replay(clog, segments_per_epoch=2, **replay_kw)
    return eng


@pytest.mark.usefixtures("ray_session")
def test_lookup_matches_snapshot_filter(tmp_path):
    eng = _replayed(tmp_path)
    snap = eng.snapshot_arrow()
    convs = sorted(set(snap.column("conv_id").to_pylist()))[:3]
    got = eng.lookup(convs)
    exp = snap.filter(pc.is_in(snap.column("conv_id"), value_set=pa.array(convs)))
    assert got.equals(exp)


@pytest.mark.usefixtures("ray_session")
def test_lookup_missing_and_deleted_keys_empty(tmp_path):
    eng = _replayed(tmp_path)
    assert eng.lookup(["conv-999999"]).num_rows == 0
    assert eng.lookup([]).num_rows == 0
    # a fully deleted conversation (if any) returns nothing live
    snap = eng.snapshot_arrow()
    live = set(snap.column("conv_id").to_pylist())
    all_convs = {f"conv-{i:06d}" for i in range(50)}
    gone = sorted(all_convs - live)
    if gone:
        assert eng.lookup(gone[:1]).num_rows == 0


@pytest.mark.usefixtures("ray_session")
def test_lookup_salted_hot_key_complete(tmp_path):
    eng = _replayed(
        tmp_path,
        num_events=6000,
        num_conversations=40,
        seed=7,
        hot_key_frac=0.5,
        hot_max_turns=3000,
        replay_kw={"auto_mitigate_skew": True},
    )
    assert eng.salt_map  # hot conv fanned out
    snap = eng.snapshot_arrow()
    hot = "conv-000000"
    got = eng.lookup([hot])
    exp = snap.filter(pc.equal(snap.column("conv_id"), hot))
    assert got.equals(exp)
    assert got.num_rows > 100  # the hot conv really is wide


@pytest.mark.usefixtures("ray_session")
def test_snapshot_partition_pruning(tmp_path):
    eng = _replayed(tmp_path)
    full = eng.snapshot_arrow()
    pids = partition_ids(full.column("conv_id"), 8)
    # NOTE: valid only for unsalted tables (no salt fanout in this fixture)
    target = 3
    pruned = eng.snapshot(pids=[target]).take_all()
    got_convs = sorted({r["conv_id"] for r in pruned})
    exp_convs = sorted(
        set(full.filter(pa.array(pids == target)).column("conv_id").to_pylist())
    )
    assert got_convs == exp_convs
    assert len(pruned) == int((pids == target).sum())
    assert eng.snapshot(pids=[]).count() == 0

@pytest.mark.usefixtures("ray_session")
def test_lookup_coerces_string_keys_to_int_pk(tmp_path):
    """CLI callers pass --key values as strings; lookup must coerce them
    to the key column's dtype on integer-keyed tables instead of raising
    ArrowInvalid."""
    import ray.data

    from etl_framework_ray.pipelines.writer import LakeWriter
    from etl_framework_ray.state.schema import ColumnSpec, TableSpec

    spec = TableSpec(
        name="orders",
        columns=(
            ColumnSpec("order_id", pa.int64(), nullable=False),
            ColumnSpec("amount", pa.float64()),
        ),
        primary_key=("order_id",),
    )
    w = LakeWriter(str(tmp_path / "t"), spec, num_partitions=4)
    w.merge(ray.data.from_arrow(
        pa.table({"order_id": pa.array([1, 5, 9], pa.int64()),
                  "amount": pa.array([1.0, 5.0, 9.0])})
    ))
    got = w.engine.lookup(["5", "9"])  # strings, as the CLI delivers them
    assert got.column("order_id").to_pylist() == [5, 9]
    assert got.equals(w.engine.lookup([5, 9]))  # typed keys agree
