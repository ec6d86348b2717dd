"""Both exchange implementations produce identical committed state, and
compaction composes with mid-replay schema evolution."""

import pyarrow as pa
import pytest

from etl_framework_ray.pipelines.cdc import CDCEngine
from etl_framework_ray.sources.changelog import ChangeLog
from etl_framework_ray.sources.generator import GenConfig, generate_changelog, oracle_replay


@pytest.mark.usefixtures("ray_session")
def test_sort_exchange_equals_ray_exchange(tmp_path):
    log = generate_changelog(GenConfig(num_events=4000, num_conversations=80, seed=21))
    clog = ChangeLog(str(tmp_path / "log"))
    clog.write_segments(log, segment_rows=1000)

    a = CDCEngine(str(tmp_path / "a"), num_partitions=4, exchange="ray")
    a.replay(clog, segments_per_epoch=2)
    b = CDCEngine(str(tmp_path / "b"), num_partitions=4, exchange="sort")
    b.replay(clog, segments_per_epoch=2)

    assert a.snapshot_arrow().equals(b.snapshot_arrow())
    oracle = oracle_replay(log)
    assert a.snapshot_arrow().num_rows == len(oracle)


def test_invalid_exchange_rejected(tmp_path):
    with pytest.raises(ValueError, match="exchange"):
        CDCEngine(str(tmp_path / "x"), exchange="bogus")


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("exchange", ["ray", "sort"])
def test_null_key_feed_rejected(tmp_path, exchange):
    import pyarrow.parquet as pq

    from etl_framework_ray.sources.generator import CHANGELOG_SCHEMA

    bad = pa.Table.from_pylist(
        [
            {"lsn": 1, "op": "I", "ts": 0, "conv_id": "c1", "turn_idx": 0, "role": "user",
             "text": "x", "tool": None},
            {"lsn": 2, "op": "I", "ts": 0, "conv_id": None, "turn_idx": 1, "role": "user",
             "text": "y", "tool": None},
        ],
        schema=pa.schema([f.with_nullable(True) for f in CHANGELOG_SCHEMA]),
    )
    clog = ChangeLog(str(tmp_path / "log"))
    path = str(tmp_path / "log" / "segment-000000000001-000000000002.parquet")
    pq.write_table(bad, path)
    eng = CDCEngine(str(tmp_path / "tbl"), num_partitions=2, exchange=exchange)
    with pytest.raises(Exception, match="NULL values in key column"):
        eng.replay(clog)


def test_pkless_spec_cannot_apply(tmp_path):
    from etl_framework_ray.sources.changelog import Epoch, Segment
    from etl_framework_ray.state.schema import ColumnSpec, TableSpec

    spec = TableSpec(name="nopk", columns=(ColumnSpec("a", pa.int64()),))
    eng = CDCEngine(str(tmp_path / "t"), spec=spec, num_partitions=2)
    with pytest.raises(ValueError, match="primary key"):
        eng.apply_epoch(Epoch((Segment("/nonexistent", 1, 10),)))


@pytest.mark.usefixtures("ray_session")
def test_compaction_composes_with_schema_evolution(tmp_path):
    """Old (pre-evolution) delta files must normalize correctly when a
    compaction folds them under the evolved schema."""
    from etl_framework_ray.state.schema import ColumnSpec, TableSpec

    spec_v1 = TableSpec(
        name="transcripts",
        columns=(
            ColumnSpec("conv_id", pa.string(), nullable=False),
            ColumnSpec("turn_idx", pa.int32(), nullable=False),
            ColumnSpec("role", pa.string()),
            ColumnSpec("text", pa.large_string()),
            ColumnSpec("ts", pa.timestamp("us"), nullable=False),
        ),
        primary_key=("conv_id", "turn_idx"),
    )
    log = generate_changelog(GenConfig(num_events=3000, num_conversations=40, seed=31))
    early = log.slice(0, 1500).drop_columns(["tool"])
    late = log.slice(1500)
    clog = ChangeLog(str(tmp_path / "log"))
    clog.write_segments(early, segment_rows=300)  # 5 pre-evolution segments
    clog.write_segments(late, segment_rows=300)  # 5 evolved segments

    # compact_every=2 → multiple compactions, some folding old-schema files
    eng = CDCEngine(str(tmp_path / "tbl"), spec=spec_v1, num_partitions=4, compact_every=2)
    stats = eng.replay(clog, segments_per_epoch=1)
    assert any("add tool" in c for c in stats.schema_changes)

    early_as_fed = log.slice(0, 1500).set_column(
        log.schema.get_field_index("tool"), "tool", pa.nulls(1500, pa.string())
    )
    oracle = oracle_replay(pa.concat_tables([early_as_fed, late]))
    got = eng.snapshot_arrow().to_pylist()
    assert len(got) == len(oracle)
    for r in got:
        exp = oracle[(r["conv_id"], r["turn_idx"])]
        assert r["text"] == exp["text"] and r["tool"] == exp["tool"]


@pytest.mark.usefixtures("ray_session")
def test_auto_sort_switch_past_ref_bound(tmp_path):
    """An epoch whose ref matrix (segments × partitions) exceeds
    auto_sort_refs must route through the 'sort' exchange — counted,
    state identical to the pure-ray engine; pipelined replay respects
    the same bound (no prefetched ray map round sneaks past it)."""
    log = generate_changelog(GenConfig(num_events=4000, num_conversations=80, seed=21))
    clog = ChangeLog(str(tmp_path / "log"))
    clog.write_segments(log, segment_rows=1000)  # 4 segments

    ref = CDCEngine(str(tmp_path / "ref"), num_partitions=4, auto_sort_refs=None)
    ref.replay(clog, segments_per_epoch=2)
    assert ref.auto_sort_switches == 0

    # 2 segments × 4 partitions = 8 refs > bound of 7 → every epoch sorts
    a = CDCEngine(str(tmp_path / "a"), num_partitions=4, auto_sort_refs=7)
    a.replay(clog, segments_per_epoch=2, pipelined=True)
    assert a.auto_sort_switches == 2
    assert a.snapshot_arrow().equals(ref.snapshot_arrow())

    # under the bound: stays on the direct exchange
    b = CDCEngine(str(tmp_path / "b"), num_partitions=4, auto_sort_refs=8)
    b.replay(clog, segments_per_epoch=2)
    assert b.auto_sort_switches == 0
    assert b.snapshot_arrow().equals(ref.snapshot_arrow())


@pytest.mark.usefixtures("ray_session")
def test_sort_exchange_parity_event_transform_and_multisource(tmp_path):
    """The sort exchange (now the auto-selected path past the ref-matrix
    bound) must agree with the direct exchange on the two remaining
    feature planes it lacked parity tests for: the map-side event
    transform (SCD2 history envelope) and the multi-source merged feed."""
    from etl_framework_ray.pipelines.history import HistoryTable
    from etl_framework_ray.sources.multisource import MultiSourceFeed

    log = generate_changelog(
        GenConfig(num_events=5000, num_conversations=100, seed=33, out_of_order=True)
    )
    clog = ChangeLog(str(tmp_path / "log"))
    clog.write_segments(log, segment_rows=1000)

    # event_transform (history envelope) under both exchanges
    ha = HistoryTable(str(tmp_path / "ha"), num_partitions=4, exchange="ray")
    ha.replay(clog, segments_per_epoch=2)
    hb = HistoryTable(str(tmp_path / "hb"), num_partitions=4, exchange="sort")
    hb.replay(clog, segments_per_epoch=2)
    assert ha.read_arrow().equals(hb.read_arrow())

    # multisource merged feed under both exchanges
    n = log.num_rows
    shard_a = ChangeLog(str(tmp_path / "sa"))
    shard_a.write_segments(log.slice(0, n // 2), segment_rows=700)
    shard_b = ChangeLog(str(tmp_path / "sb"))
    shard_b.write_segments(log.slice(n // 2), segment_rows=700)
    outs = []
    for mode in ("ray", "sort"):
        feed = MultiSourceFeed(
            [str(tmp_path / "sa"), str(tmp_path / "sb")],
            str(tmp_path / f"merged_{mode}"),
        )
        eng = CDCEngine(str(tmp_path / f"ms_{mode}"), num_partitions=4, exchange=mode)
        eng.replay(feed, segments_per_epoch=2)
        outs.append(eng.snapshot_arrow())
    assert outs[0].equals(outs[1])
