"""Multi-source CDC: N independent changelog shards merged into one
canonical changelog (sources/multisource.MultiSourceFeed).

The merged replay must equal the (ts, per-source-lsn) LWW oracle over the
union of shards whenever cross-source timestamp ties are absent; ties
within one source must keep source order; the merge must be incremental
(per-poll), crash-idempotent (state file is the commit point, residue is
swept), and fail loud on source reconfiguration."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from etl_framework_ray.pipelines.cdc import CDCEngine
from etl_framework_ray.sources.changelog import ChangeLog
from etl_framework_ray.sources.generator import (
    GenConfig,
    generate_changelog,
    oracle_replay,
)
from etl_framework_ray.sources.multisource import MultiSourceFeed


def _shift_ts(log: pa.Table, us: int) -> pa.Table:
    i = log.schema.get_field_index("ts")
    shifted = pc.add(log.column("ts").cast(pa.int64()), pa.scalar(us, pa.int64()))
    return log.set_column(i, "ts", shifted.cast(pa.timestamp("us"))).cast(log.schema)


def _two_shards(tmp_path, n_a=6_000, n_b=3_000, convs=80):
    """Two shards over the SAME conversation universe with overlapping
    per-source LSN spaces; shard B's timestamps are offset by 500 ms so
    cross-source ties are impossible (the oracle is then unambiguous)."""
    log_a = generate_changelog(
        GenConfig(num_events=n_a, num_conversations=convs, seed=21, out_of_order=True)
    )
    log_b = _shift_ts(
        generate_changelog(
            GenConfig(num_events=n_b, num_conversations=convs, seed=22, out_of_order=True)
        ),
        500_000,
    )
    a = ChangeLog(str(tmp_path / "shard_a"))
    a.write_segments(log_a, segment_rows=max(1, n_a // 6))
    b = ChangeLog(str(tmp_path / "shard_b"))
    b.write_segments(log_b, segment_rows=max(1, n_b // 4))
    return log_a, log_b, a, b


def _union_oracle(log_a, log_b):
    """(ts, lsn) LWW over the union; valid because the fixtures guarantee
    no cross-source timestamp collisions for any key."""
    merged = pa.concat_tables([log_a, log_b])
    return oracle_replay(merged)


def _assert_state_equals(eng, expect):
    got = {(r["conv_id"], r["turn_idx"]): r for r in eng.snapshot_arrow().to_pylist()}
    assert len(got) == len(expect), (len(got), len(expect))
    for k, o in expect.items():
        assert got[k]["text"] == o["text"] and got[k]["role"] == o["role"], (k, got[k], o)


@pytest.mark.usefixtures("ray_session")
def test_merged_replay_equals_union_oracle(tmp_path):
    log_a, log_b, _a, _b = _two_shards(tmp_path)
    feed = MultiSourceFeed(
        [str(tmp_path / "shard_a"), str(tmp_path / "shard_b")],
        str(tmp_path / "merged"),
    )
    stats = feed.merge_new()
    assert stats["rows_merged"] == log_a.num_rows + log_b.num_rows
    assert stats["next_lsn"] == log_a.num_rows + log_b.num_rows + 1  # dense

    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=4)
    eng.replay(feed, segments_per_epoch=3)
    _assert_state_equals(eng, _union_oracle(log_a, log_b))

    # a quiet re-poll merges nothing and replays nothing
    assert feed.merge_new()["segments_merged"] == 0
    assert eng.replay(feed, segments_per_epoch=3).epochs_applied == 0


@pytest.mark.usefixtures("ray_session")
def test_merged_patches_disjoint_time_ranges(tmp_path):
    """Partial row images (op='P') compose with the merge when shards own
    disjoint TIME ranges (shard B entirely after shard A): each key's
    events then arrive in event-time order across epochs, so epoch-wise
    patch resolution equals the global fold. (Interleaved-timeline
    multi-master patches are the documented ambiguity in the module
    docstring — not oracle-testable.)"""
    log_a = generate_changelog(
        GenConfig(num_events=3000, num_conversations=50, seed=31, patch_frac=0.3)
    )
    # B strictly AFTER A in event time (offset > A's full ts range)
    log_b = _shift_ts(
        generate_changelog(
            GenConfig(num_events=1500, num_conversations=50, seed=32, patch_frac=0.3)
        ),
        10_000_000_000,
    )
    a = ChangeLog(str(tmp_path / "shard_a"))
    a.write_segments(log_a, segment_rows=500)
    b = ChangeLog(str(tmp_path / "shard_b"))
    b.write_segments(log_b, segment_rows=500)
    feed = MultiSourceFeed(
        [str(tmp_path / "shard_a"), str(tmp_path / "shard_b")],
        str(tmp_path / "merged"),
    )
    feed.merge_new()
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=4)
    eng.replay(feed, segments_per_epoch=3)
    expect = _union_oracle(log_a, log_b)
    got = {(r["conv_id"], r["turn_idx"]): r for r in eng.snapshot_arrow().to_pylist()}
    assert len(got) == len(expect)
    for k, o in expect.items():
        assert got[k]["text"] == o["text"] and got[k]["tool"] == o["tool"], k


@pytest.mark.usefixtures("ray_session")
def test_incremental_polls_and_tail(tmp_path):
    """Shards grow between polls; tail over the merged feed converges to
    the union oracle; per-source order survives staggered arrival."""
    log_a, log_b, a, b = _two_shards(tmp_path, n_a=4_000, n_b=2_000)
    # rebuild the shard dirs empty, then drip segments in alternation
    import shutil

    shutil.rmtree(tmp_path / "shard_a")
    shutil.rmtree(tmp_path / "shard_b")
    a = ChangeLog(str(tmp_path / "shard_a"))
    b = ChangeLog(str(tmp_path / "shard_b"))
    a_rows = [log_a.slice(i, 1_000) for i in range(0, 4_000, 1_000)]
    b_rows = [log_b.slice(i, 500) for i in range(0, 2_000, 500)]

    feed = MultiSourceFeed(
        [str(tmp_path / "shard_a"), str(tmp_path / "shard_b")],
        str(tmp_path / "merged"),
    )
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=4)
    for i in range(4):
        a.write_segments(a_rows[i], segment_rows=1_000)
        b.write_segments(b_rows[i], segment_rows=500)
        eng.replay(feed, segments_per_epoch=2)  # poll: merge-new + apply
    _assert_state_equals(eng, _union_oracle(log_a, log_b))


@pytest.mark.usefixtures("ray_session")
def test_same_ts_ties_within_source_keep_source_order(tmp_path):
    """Two updates to the same key with the SAME timestamp in ONE shard:
    the higher source LSN must win after merging (global LSNs are
    monotone per source)."""
    base = generate_changelog(GenConfig(num_events=40, num_conversations=4, seed=9))
    ts = pa.scalar(1_800_000_000_000_000, pa.timestamp("us"))
    tie = pa.table(
        {
            "lsn": pa.array([100, 101], pa.int64()),
            "op": pa.array(["U", "U"], pa.string()),
            "ts": pa.array([ts.as_py(), ts.as_py()], pa.timestamp("us")),
            "conv_id": pa.array(["conv-000001", "conv-000001"], pa.string()),
            "turn_idx": pa.array([0, 0], pa.int32()),
            "role": pa.array(["user", "user"], pa.string()),
            "text": pa.array(["loser", "winner"], pa.large_string()),
            "tool": pa.array([None, None], pa.string()),
        }
    )
    a = ChangeLog(str(tmp_path / "shard_a"))
    a.write_segments(base, segment_rows=20)
    a.write_segments(tie, segment_rows=1)  # two 1-row segments, in order
    b = ChangeLog(str(tmp_path / "shard_b"))
    b.write_segments(
        _shift_ts(
            generate_changelog(GenConfig(num_events=30, num_conversations=4, seed=10)),
            500_000,
        ),
        segment_rows=10,
    )
    feed = MultiSourceFeed(
        [str(tmp_path / "shard_a"), str(tmp_path / "shard_b")],
        str(tmp_path / "merged"),
    )
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=2)
    eng.replay(feed, segments_per_epoch=4)
    got = {(r["conv_id"], r["turn_idx"]): r for r in eng.snapshot_arrow().to_pylist()}
    assert got[("conv-000001", 0)]["text"] == "winner"


@pytest.mark.usefixtures("ray_session")
def test_crash_residue_sweep_and_determinism(tmp_path):
    """A crash between output writes and the state commit leaves orphan
    canonical segments; the next poll — possibly under a DIFFERENT plan
    because more source segments arrived — must sweep them and produce a
    consistent log."""
    log_a, log_b, a, b = _two_shards(tmp_path, n_a=2_000, n_b=1_000)
    feed = MultiSourceFeed(
        [str(tmp_path / "shard_a"), str(tmp_path / "shard_b")],
        str(tmp_path / "merged"),
    )
    # simulate the crash: run a merge, then delete the state file and ONE
    # output segment — the remaining outputs are residue of an uncommitted
    # attempt under what is now a stale plan
    feed.merge_new()
    outs = sorted(
        f for f in os.listdir(tmp_path / "merged") if f.startswith("segment-")
    )
    os.remove(tmp_path / "merged" / "_sources.json")
    os.remove(tmp_path / "merged" / outs[0])

    # more data arrives before the re-poll (the plan changes)
    extra = _shift_ts(
        generate_changelog(
            GenConfig(num_events=500, num_conversations=80, seed=33, lsn_start=1_001)
        ),
        500_000,
    )
    b.write_segments(extra, segment_rows=500)

    feed2 = MultiSourceFeed(
        [str(tmp_path / "shard_a"), str(tmp_path / "shard_b")],
        str(tmp_path / "merged"),
    )
    stats = feed2.merge_new()
    assert stats["rows_merged"] == log_a.num_rows + log_b.num_rows + 500
    # the canonical log is exactly the committed outputs — no residue, and
    # replay matches the oracle over all three inputs
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=4)
    eng.replay(feed2, segments_per_epoch=4)
    _assert_state_equals(eng, oracle_replay(pa.concat_tables([log_a, log_b, extra])))


@pytest.mark.usefixtures("ray_session")
def test_lineage_columns_and_guards(tmp_path):
    log_a, log_b, _a, _b = _two_shards(tmp_path, n_a=1_000, n_b=500)
    feed = MultiSourceFeed(
        [str(tmp_path / "shard_a"), str(tmp_path / "shard_b")],
        str(tmp_path / "merged_lin"),
        keep_lineage=True,
    )
    eng = CDCEngine(str(tmp_path / "lake_lin"), num_partitions=2)
    eng.replay(feed, segments_per_epoch=4)
    snap = eng.snapshot_arrow()
    assert {"src_id", "src_lsn"} <= set(snap.column_names)
    ids = set(pc.unique(snap.column("src_id")).to_pylist())
    assert ids == {0, 1}  # winners from both shards are recorded

    # reconfiguration guards: different source list / lineage flag refused
    with pytest.raises(RuntimeError, match="sources"):
        MultiSourceFeed([str(tmp_path / "shard_a")], str(tmp_path / "merged_lin"))._load_state()
    with pytest.raises(RuntimeError, match="keep_lineage"):
        MultiSourceFeed(
            [str(tmp_path / "shard_a"), str(tmp_path / "shard_b")],
            str(tmp_path / "merged_lin"),
        )._load_state()
    with pytest.raises(ValueError, match="duplicate"):
        MultiSourceFeed(
            [str(tmp_path / "shard_a"), str(tmp_path / "shard_a")],
            str(tmp_path / "merged_dup"),
        )
