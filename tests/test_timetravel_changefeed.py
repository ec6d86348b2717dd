"""Time-travel reads + downstream changefeed (manifest-versioning bonuses)."""

import pyarrow as pa
import pytest

from etl_framework_ray.pipelines.cdc import CDCEngine
from etl_framework_ray.sources.changelog import ChangeLog
from etl_framework_ray.sources.generator import GenConfig, generate_changelog, oracle_replay


def _setup(tmp_path, compact_every=100):
    log = generate_changelog(GenConfig(num_events=4000, num_conversations=60, seed=88))
    clog = ChangeLog(str(tmp_path / "log"))
    clog.write_segments(log, segment_rows=1000)
    eng = CDCEngine(str(tmp_path / "tbl"), num_partitions=4, compact_every=compact_every)
    return log, clog, eng


@pytest.mark.usefixtures("ray_session")
def test_time_travel_reads_old_versions(tmp_path):
    log, clog, eng = _setup(tmp_path)
    epochs = clog.epochs(1)
    snapshots = {}
    for ep in epochs:
        eng.apply_epoch(ep)
        snapshots[eng.manifest.version] = eng.snapshot_arrow()
    # vacuum=False equivalent: no vacuum ran, so every version is readable
    for version, expected in snapshots.items():
        assert eng.snapshot_arrow(version=version).equals(expected)
    # version 1 is the empty just-created table
    assert eng.snapshot_arrow(version=1).num_rows == 0
    with pytest.raises(FileNotFoundError):
        eng.snapshot_arrow(version=99)


@pytest.mark.usefixtures("ray_session")
def test_changefeed_matches_incremental_state(tmp_path):
    log, clog, eng = _setup(tmp_path)  # compaction disabled → full retention
    epochs = clog.epochs(2)
    eng.apply_epoch(epochs[0])
    watermark = eng.manifest.applied_lsn
    state_before = {
        (r["conv_id"], r["turn_idx"]): r["text"] for r in eng.snapshot_arrow().to_pylist()
    }
    for ep in epochs[1:]:
        eng.apply_epoch(ep)

    changes = eng.read_changes(since_lsn=watermark)
    # applying the feed over the old state reproduces the new state
    new_state = dict(state_before)
    for r in changes.to_pylist():
        k = (r["conv_id"], r["turn_idx"])
        if r["_deleted"]:
            new_state.pop(k, None)
        else:
            new_state[k] = r["text"]
    oracle = oracle_replay(log)
    assert len(new_state) == len(oracle)
    assert all(oracle[k]["text"] == v for k, v in new_state.items())
    # feed is net-per-key: no duplicate keys
    keys = [(r["conv_id"], r["turn_idx"]) for r in changes.to_pylist()]
    assert len(keys) == len(set(keys))


@pytest.mark.usefixtures("ray_session")
def test_changefeed_raises_after_compaction(tmp_path):
    log, clog, eng = _setup(tmp_path, compact_every=1)  # compact every epoch
    epochs = clog.epochs(1)
    eng.apply_epoch(epochs[0])
    watermark = eng.manifest.applied_lsn
    for ep in epochs[1:]:
        eng.apply_epoch(ep)
    with pytest.raises(RuntimeError, match="compacted"):
        eng.read_changes(since_lsn=watermark)


@pytest.mark.usefixtures("ray_session")
def test_changefeed_retention_survives_compaction(tmp_path):
    """With changefeed_retention_lsn set, folded deltas stay readable:
    the feed after aggressive compaction must EQUAL the feed of an
    uncompacted twin table, and vacuum must not remove retained files."""
    log = generate_changelog(GenConfig(num_events=4000, num_conversations=60, seed=88))
    clog = ChangeLog(str(tmp_path / "log"))
    clog.write_segments(log, segment_rows=1000)

    compacting = CDCEngine(
        str(tmp_path / "a"), num_partitions=4, compact_every=1,
        changefeed_retention_lsn=10_000,
    )
    plain = CDCEngine(str(tmp_path / "b"), num_partitions=4, compact_every=100)
    epochs = clog.epochs(1)
    compacting.apply_epoch(epochs[0])
    plain.apply_epoch(epochs[0])
    watermark = compacting.manifest.applied_lsn
    for ep in epochs[1:]:
        compacting.apply_epoch(ep)
        plain.apply_epoch(ep)
    compacting.vacuum()  # must keep retained deltas on disk

    a = compacting.read_changes(since_lsn=watermark)
    b = plain.read_changes(since_lsn=watermark)
    key = lambda t: sorted(
        (r["conv_id"], r["turn_idx"], r["_lsn"], r["_deleted"]) for r in t.to_pylist()
    )
    assert key(a) == key(b)
    assert a.num_rows > 0


@pytest.mark.usefixtures("ray_session")
def test_changefeed_retention_expiry(tmp_path):
    """Past the retention horizon the feed raises; within it, it serves."""
    log = generate_changelog(GenConfig(num_events=4000, num_conversations=60, seed=88))
    clog = ChangeLog(str(tmp_path / "log"))
    clog.write_segments(log, segment_rows=500)  # 8 epochs of 500 LSNs

    eng = CDCEngine(
        str(tmp_path / "tbl"), num_partitions=4, compact_every=1,
        changefeed_retention_lsn=1_200,  # ~2.4 epochs
    )
    for ep in clog.epochs(1):
        eng.apply_epoch(ep)
    floor = eng.manifest.properties.get("changefeed_floor", 0)
    assert floor > 0  # old deltas were pruned
    with pytest.raises(RuntimeError, match="retention floor"):
        eng.read_changes(since_lsn=floor - 400)
    recent = eng.read_changes(since_lsn=floor)  # at the floor: served
    assert recent.num_rows > 0


@pytest.mark.usefixtures("ray_session")
def test_retention_toggle_does_not_hide_pre_retention_folds(tmp_path):
    """Enabling retention on an EXISTING table must not silently skip base
    files whose deltas were folded (and vacuumed) before retention was
    active — consumers behind that point still get the loud error."""
    log = generate_changelog(GenConfig(num_events=4000, num_conversations=60, seed=88))
    clog = ChangeLog(str(tmp_path / "log"))
    clog.write_segments(log, segment_rows=500)
    epochs = clog.epochs(1)

    plain = CDCEngine(str(tmp_path / "tbl"), num_partitions=4, compact_every=1)
    for ep in epochs[:4]:  # pre-retention: folds never retained
        plain.apply_epoch(ep)
    pre_watermark = plain.manifest.applied_lsn

    ret = CDCEngine(
        str(tmp_path / "tbl"), num_partitions=4, compact_every=1,
        changefeed_retention_lsn=50_000,
    )
    for ep in epochs[4:]:
        ret.apply_epoch(ep)
    # a consumer behind the retention activation point: loud error, not a
    # silently incomplete feed
    with pytest.raises(RuntimeError, match="compacted"):
        ret.read_changes(since_lsn=pre_watermark - 500)
    # a consumer at/after the activation watermark is fully served
    feed = ret.read_changes(since_lsn=pre_watermark)
    assert feed.num_rows > 0


@pytest.mark.usefixtures("ray_session")
def test_retention_off_window_invalidates_coverage(tmp_path):
    """Retention on → OFF (folds happen unretained) → on again: consumers
    inside the off-window must get the loud error, not a silent gap."""
    log = generate_changelog(GenConfig(num_events=4000, num_conversations=60, seed=88))
    clog = ChangeLog(str(tmp_path / "log"))
    clog.write_segments(log, segment_rows=500)
    epochs = clog.epochs(1)

    on1 = CDCEngine(str(tmp_path / "tbl"), num_partitions=4, compact_every=1,
                    changefeed_retention_lsn=50_000)
    for ep in epochs[:3]:
        on1.apply_epoch(ep)
    early_watermark = on1.manifest.applied_lsn

    off = CDCEngine(str(tmp_path / "tbl"), num_partitions=4, compact_every=1,
                    changefeed_retention_lsn=None)  # EXPLICIT disable
    for ep in epochs[3:6]:  # folds WITHOUT retention
        off.apply_epoch(ep)
    off_watermark = off.manifest.applied_lsn

    on2 = CDCEngine(str(tmp_path / "tbl"), num_partitions=4, compact_every=1,
                    changefeed_retention_lsn=50_000)
    for ep in epochs[6:]:
        on2.apply_epoch(ep)
    # the off-window broke coverage: consumers from before/inside it error
    for since in (early_watermark, off_watermark - 500):
        with pytest.raises(RuntimeError, match="compacted"):
            on2.read_changes(since_lsn=since)
    # consumers from the re-activation watermark onward are served
    assert on2.read_changes(since_lsn=off_watermark).num_rows > 0


@pytest.mark.usefixtures("ray_session")
def test_expired_retained_deltas_are_vacuumed(tmp_path):
    """Once retention expires an entry, the floor advances AND vacuum may
    physically remove the file (it is no longer manifest-live)."""
    import glob as _glob
    import os as _os

    log = generate_changelog(GenConfig(num_events=4000, num_conversations=60, seed=88))
    clog = ChangeLog(str(tmp_path / "log"))
    clog.write_segments(log, segment_rows=500)
    eng = CDCEngine(
        str(tmp_path / "tbl"), num_partitions=4, compact_every=1,
        changefeed_retention_lsn=1_200,
    )
    for ep in clog.epochs(1):
        eng.apply_epoch(ep)
    retained = {e["path"] for e in eng.manifest.properties.get("retained_deltas", [])}
    assert retained  # some still within retention
    removed = eng.vacuum()
    assert removed > 0
    # retained-within-horizon files survived the vacuum
    assert all(_os.path.exists(p) for p in retained)
    # and the feed still serves from the floor
    floor = eng.manifest.properties["changefeed_floor"]
    assert eng.read_changes(since_lsn=floor).num_rows > 0


@pytest.mark.usefixtures("ray_session")
def test_changefeed_dataset_matches_arrow(tmp_path):
    """The streaming Dataset form (one merge task per partition) carries
    the same content as the driver Arrow wrapper — across compaction with
    retention on, tombstones included."""
    log = generate_changelog(
        GenConfig(num_events=4000, num_conversations=60, seed=88, out_of_order=True)
    )
    clog = ChangeLog(str(tmp_path / "log"))
    clog.write_segments(log, segment_rows=1000)
    eng = CDCEngine(
        str(tmp_path / "tbl"), num_partitions=4, compact_every=1,
        changefeed_retention_lsn=10_000,
    )
    epochs = clog.epochs(1)
    eng.apply_epoch(epochs[0])
    watermark = eng.manifest.applied_lsn
    for ep in epochs[1:]:
        eng.apply_epoch(ep)

    arrow = eng.read_changes(since_lsn=watermark)
    ds = pa.Table.from_pandas(
        eng.changefeed(since_lsn=watermark).to_pandas(), preserve_index=False
    )
    key = lambda t: sorted(
        (r["conv_id"], r["turn_idx"], r["_lsn"], r["_deleted"], r["text"])
        for r in t.to_pylist()
    )
    assert key(arrow) == key(ds)
    assert arrow.num_rows > 0
    # keys unique in the Dataset form too (no migration inside the window)
    ks = [(r["conv_id"], r["turn_idx"]) for r in ds.to_pylist()]
    assert len(ks) == len(set(ks))
    # empty window → empty Dataset with the lake schema
    empty = eng.changefeed(since_lsn=eng.manifest.applied_lsn)
    assert empty.count() == 0


@pytest.mark.usefixtures("ray_session")
def test_retention_prunes_on_retirement_not_creation(tmp_path):
    """A delta created at epoch E but folded at later epoch F stays
    readable for the retention window past F (the docstring's promise),
    not past E."""
    log = generate_changelog(GenConfig(num_events=4000, num_conversations=60, seed=88))
    clog = ChangeLog(str(tmp_path / "log"))
    clog.write_segments(log, segment_rows=500)  # 8 epochs of 500 LSNs
    # compact only at the END: early deltas age ~7 epochs before retiring
    eng = CDCEngine(
        str(tmp_path / "tbl"), num_partitions=4, compact_every=100,
        changefeed_retention_lsn=1_000,  # ≪ the deltas' age at retirement
    )
    for ep in clog.epochs(1):
        eng.apply_epoch(ep)
    eng.compact()  # retires ALL deltas at the final watermark
    entries = eng.manifest.properties.get("retained_deltas", [])
    assert entries, "retirement must retain despite creation-age > window"
    w = eng.manifest.applied_lsn
    assert all(int(e["retired_lsn"]) == w for e in entries)
    # creation-epoch pruning would have dropped the oldest entries here
    assert min(int(e["epoch_id"]) for e in entries) <= w - 3 * 500


@pytest.mark.usefixtures("ray_session")
def test_retention_off_drops_retained_registry(tmp_path):
    """Toggling retention OFF must not leak retained files forever: the
    next commit drops the registry (raising the floor) and vacuum
    reclaims the files."""
    import os

    log = generate_changelog(GenConfig(num_events=4000, num_conversations=60, seed=88))
    clog = ChangeLog(str(tmp_path / "log"))
    clog.write_segments(log, segment_rows=500)
    epochs = ChangeLog(str(tmp_path / "log")).epochs(1)

    eng = CDCEngine(
        str(tmp_path / "tbl"), num_partitions=4, compact_every=1,
        changefeed_retention_lsn=50_000,
    )
    for ep in epochs[:4]:
        eng.apply_epoch(ep)
    retained = [e["path"] for e in eng.manifest.properties.get("retained_deltas", [])]
    assert retained and all(os.path.exists(p) for p in retained)

    # reopen with retention EXPLICITLY off; the next commit clears the
    # registry (omitting the arg inherits the persisted horizon instead)
    eng2 = CDCEngine(str(tmp_path / "tbl"), num_partitions=4, compact_every=1,
                     changefeed_retention_lsn=None)
    eng2.apply_epoch(epochs[4])
    assert not eng2.manifest.properties.get("retained_deltas")
    assert int(eng2.manifest.properties.get("changefeed_floor", 0)) > 0
    removed = eng2.vacuum()
    assert removed >= len(retained)
    assert not any(os.path.exists(p) for p in retained)

@pytest.mark.usefixtures("ray_session")
def test_maintenance_engine_inherits_retention(tmp_path):
    """A retention-less engine (the CLI replay/compact/vacuum shape) on a
    retention-enabled table must INHERIT the persisted horizon — its folds
    retain deltas and never destroy the registry or advance the floor."""
    import os

    log = generate_changelog(GenConfig(num_events=4000, num_conversations=60, seed=88))
    clog = ChangeLog(str(tmp_path / "log"))
    clog.write_segments(log, segment_rows=500)
    epochs = clog.epochs(1)

    ingest = CDCEngine(
        str(tmp_path / "tbl"), num_partitions=4, compact_every=1,
        changefeed_retention_lsn=50_000,
    )
    for ep in epochs[:4]:
        ingest.apply_epoch(ep)
    watermark = ingest.manifest.applied_lsn
    retained = [e["path"] for e in ingest.manifest.properties.get("retained_deltas", [])]
    assert retained

    # the maintenance shape: no retention arg, folds more epochs + vacuums
    maint = CDCEngine(str(tmp_path / "tbl"), num_partitions=4, compact_every=1)
    assert maint.changefeed_retention_lsn == 50_000
    for ep in epochs[4:6]:
        maint.apply_epoch(ep)
    maint.vacuum()
    still = [e["path"] for e in maint.manifest.properties.get("retained_deltas", [])]
    assert set(retained) <= set(still)
    assert all(os.path.exists(p) for p in retained)
    # a consumer lagging from before the maintenance window is still served
    assert maint.read_changes(since_lsn=watermark).num_rows > 0

def test_inherit_sentinel_compares_by_equality(tmp_path):
    """Config plumbed through JSON hands the constructor an equal but
    NON-INTERNED '__inherit__' string; it must behave exactly like the
    module constant (inherit, never int('__inherit__'))."""
    eng = CDCEngine(str(tmp_path / "tbl"), num_partitions=2,
                    changefeed_retention_lsn=7_000)
    clone = "__inherit".__add__("__")  # equal, different object
    from etl_framework_ray.pipelines.cdc import INHERIT
    assert clone == INHERIT and clone is not INHERIT
    eng2 = CDCEngine(str(tmp_path / "tbl"), num_partitions=2,
                     changefeed_retention_lsn=clone)
    assert eng2.changefeed_retention_lsn == 7_000
    assert eng2.manifest.version == eng.manifest.version  # no config commit


@pytest.mark.usefixtures("ray_session")
def test_time_travel_by_timestamp(tmp_path):
    """as_of_ts resolves the newest version committed at or before the
    given wall-clock time; pre-table timestamps error; version/as_of_ts
    are mutually exclusive."""
    import time

    log, clog, eng = _setup(tmp_path)
    t_before_any = time.time() - 3600.0
    commits = []  # (committed_at, version, snapshot)
    for ep in clog.epochs(1):
        eng.apply_epoch(ep)
        commits.append((eng.manifest.committed_at, eng.manifest.version, eng.snapshot_arrow()))
    assert all(c[0] is not None for c in commits)
    # exactly at a commit time → that version; just before → the previous
    for i, (ts, version, snap) in enumerate(commits):
        assert eng.store.version_at(ts) == version
        assert eng.snapshot_arrow(as_of_ts=ts).equals(snap)
    assert eng.store.version_at(time.time() + 60) == eng.manifest.version
    mid = (commits[0][0] + commits[1][0]) / 2.0
    if commits[1][0] > commits[0][0]:  # distinct clock ticks
        assert eng.store.version_at(mid) == commits[0][1]
    with pytest.raises(ValueError, match="committed at or before"):
        eng.snapshot_arrow(as_of_ts=t_before_any)
    with pytest.raises(ValueError, match="not both"):
        eng.snapshot_arrow(version=2, as_of_ts=commits[0][0])


@pytest.mark.usefixtures("ray_session")
def test_changefeed_since_ts(tmp_path):
    """changefeed_since_ts(ts) streams exactly the changes committed
    after the version in effect at ts; a pre-table ts yields the full
    feed."""
    log, clog, eng = _setup(tmp_path)
    epochs = clog.epochs(1)
    eng.apply_epoch(epochs[0])
    mid_ts = eng.manifest.committed_at
    mid_lsn = eng.manifest.applied_lsn
    for ep in epochs[1:]:
        eng.apply_epoch(ep)

    via_ts = eng.changefeed_since_ts(mid_ts).to_pandas()
    via_lsn = eng.changefeed(since_lsn=mid_lsn).to_pandas()
    key = ["conv_id", "turn_idx", "_lsn"]
    pd_sorted = lambda df: df.sort_values(key).reset_index(drop=True)  # noqa: E731
    import pandas as pd

    pd.testing.assert_frame_equal(pd_sorted(via_ts), pd_sorted(via_lsn))

    full = eng.changefeed_since_ts(0.0).to_pandas()
    assert len(full) >= len(via_ts)
    assert full["_lsn"].min() >= 1


@pytest.mark.usefixtures("ray_session")
def test_streaming_snapshot_time_travel_matches_arrow(tmp_path):
    """snapshot(version=/as_of_ts=) — the STREAMING reader's time travel
    (the only path that exists at scale) — must equal the driver-side
    snapshot_arrow at every retained version, project the RESOLVED
    version's schema across a schema evolution, and compose with column
    pruning and predicates."""
    import pyarrow.parquet as pq

    from etl_framework_ray.sources.generator import CHANGELOG_SCHEMA

    log, clog, eng = _setup(tmp_path)
    epochs = clog.epochs(1)
    commits = []  # (version, committed_at)
    for ep in epochs:
        eng.apply_epoch(ep)
        commits.append((eng.manifest.version, eng.manifest.committed_at))

    for version, _ts in commits:
        got = (
            eng.snapshot(version=version)
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        exp = eng.snapshot_arrow(version=version).to_pandas().reset_index(drop=True)
        assert got.equals(exp), version

    # as_of_ts resolves to the same version the wall-clock saw
    v_mid, ts_mid = commits[len(commits) // 2]
    got = eng.snapshot(as_of_ts=ts_mid).to_pandas()
    assert len(got) == eng.snapshot_arrow(version=v_mid).num_rows
    with pytest.raises(ValueError, match="not both"):
        eng.snapshot(version=2, as_of_ts=ts_mid)

    # column pruning + PK predicate still push down on an old version
    some_conv = eng.snapshot_arrow(version=v_mid).column("conv_id")[0].as_py()
    stats: dict = {}
    pruned = eng.snapshot(
        version=v_mid,
        columns=["conv_id", "text"],
        predicate=[("conv_id", "==", some_conv)],
        prune_stats=stats,
    ).to_pandas()
    assert list(pruned.columns) == ["conv_id", "text"]
    assert len(pruned) and set(pruned["conv_id"]) == {some_conv}
    assert stats["partitions_read"] <= stats["partitions_total"]

    # schema evolution: a version taken BEFORE a new column exists must
    # project the OLD schema from the streaming reader
    pre_evo_version = eng.manifest.version
    seg = pa.Table.from_pylist(
        [
            {
                "lsn": 1_000_000, "op": "I", "ts": 0, "conv_id": "zz", "turn_idx": 0,
                "role": "user", "text": "new era", "tool": None, "channel": "api",
            }
        ],
        schema=pa.schema(
            [*[f.with_nullable(True) for f in CHANGELOG_SCHEMA],
             pa.field("channel", pa.string())]
        ),
    )
    pq.write_table(seg, str(tmp_path / "log" / "segment-000001000000-000001000000.parquet"))
    eng.replay(clog)
    assert "channel" in eng.snapshot().schema().names  # evolved head
    old = eng.snapshot(version=pre_evo_version)
    assert "channel" not in old.schema().names
    assert old.count() == eng.snapshot_arrow(version=pre_evo_version).num_rows
