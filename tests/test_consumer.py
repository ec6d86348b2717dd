"""Exactly-once windowed changefeed delivery (pipelines/consumer.py)."""

import os

import pyarrow.compute as pc
import pytest

from etl_framework_ray.pipelines.cdc import CDCEngine
from etl_framework_ray.pipelines.consumer import ChangefeedConsumer
from etl_framework_ray.sources.changelog import ChangeLog
from etl_framework_ray.sources.generator import GenConfig, generate_changelog


def _setup(tmp_path):
    log = generate_changelog(GenConfig(num_events=4000, num_conversations=60, seed=88))
    clog = ChangeLog(str(tmp_path / "log"))
    clog.write_segments(log, segment_rows=1000)
    # compaction disabled → deltas stay readable for the whole test
    eng = CDCEngine(str(tmp_path / "tbl"), num_partitions=4, compact_every=100)
    return clog, eng


def _lww_net(t, key_cols=("conv_id", "turn_idx")):
    """Reduce a window to one row per key (consumer-side LWW contract)."""
    from etl_framework_ray.stages.lww import lww_reduce

    return lww_reduce(t, key_cols, ("ts", "_lsn"))


@pytest.mark.usefixtures("ray_session")
def test_windows_cover_the_feed_exactly_once(tmp_path):
    clog, eng = _setup(tmp_path)
    epochs = clog.epochs(1)
    sink = str(tmp_path / "sink")
    con = ChangefeedConsumer(eng, sink)

    eng.apply_epoch(epochs[0])
    eng.apply_epoch(epochs[1])
    r1 = con.poll()
    assert r1["rows"] > 0 and r1["watermark_lsn"] == eng.manifest.applied_lsn
    for ep in epochs[2:]:
        eng.apply_epoch(ep)
    r2 = con.poll()
    assert r2["window"] != r1["window"]

    # window 2 carries exactly the net changes since window 1's watermark
    w1 = _lww_net(con.read_window(r1["window"]))
    got2 = _lww_net(con.read_window(r2["window"]))
    exp2 = eng.read_changes(since_lsn=r1["watermark_lsn"])
    assert got2.num_rows == exp2.num_rows
    # no-op poll
    r3 = con.poll()
    assert r3["window"] is None and r3["rows"] == 0

    # applying window 2 over window 1's state reproduces the final state
    state = {}
    for t in (w1, got2):
        for r in t.sort_by([("ts", "ascending"), ("_lsn", "ascending")]).to_pylist():
            k = (r["conv_id"], r["turn_idx"])
            if r["_deleted"]:
                state.pop(k, None)
            else:
                state[k] = r["text"]
    snap = eng.snapshot_arrow()
    assert len(state) == snap.num_rows
    texts = {
        (r["conv_id"], r["turn_idx"]): r["text"] for r in snap.to_pylist()
    }
    assert state == texts


@pytest.mark.usefixtures("ray_session")
def test_crash_before_commit_is_idempotent(tmp_path):
    clog, eng = _setup(tmp_path)
    eng.replay(clog, segments_per_epoch=2)
    sink = str(tmp_path / "sink")
    con = ChangefeedConsumer(eng, sink)
    r1 = con.poll()
    # simulate a crash AFTER the window wrote but BEFORE the state commit:
    # roll the state file back and re-poll
    os.remove(os.path.join(sink, ChangefeedConsumer._STATE))
    con2 = ChangefeedConsumer(eng, sink)
    assert con2.watermark == 0
    r2 = con2.poll()
    assert r2["window"] == r1["window"] and r2["rows"] == r1["rows"]
    # exactly one window directory exists (the rerun replaced, not duplicated)
    wins = [d for d in os.listdir(sink) if d.startswith("window-")]
    assert wins == [r1["window"]]


@pytest.mark.usefixtures("ray_session")
def test_seed_from_snapshot_bootstraps_past_lost_horizon(tmp_path):
    log = generate_changelog(GenConfig(num_events=3000, num_conversations=30, seed=4))
    clog = ChangeLog(str(tmp_path / "log"))
    clog.write_segments(log, segment_rows=300)
    eng = CDCEngine(str(tmp_path / "tbl"), num_partitions=4, compact_every=2)
    eng.replay(clog, segments_per_epoch=1)  # compactions fold the early deltas
    con = ChangefeedConsumer(eng, str(tmp_path / "sink"))
    with pytest.raises(RuntimeError):
        con.poll()  # watermark 0 is past the compaction horizon
    r = con.seed_from_snapshot()
    assert r["rows"] == eng.snapshot_arrow().num_rows
    assert con.watermark == eng.manifest.applied_lsn
    seed = con.read_window(r["window"])
    assert seed.num_rows == r["rows"]
    assert con.poll()["window"] is None  # caught up

@pytest.mark.usefixtures("ray_session")
def test_crash_before_commit_with_table_advance_leaves_no_overlap(tmp_path):
    """Crash between the window rename and the watermark commit, THEN the
    table advances before the re-poll: the regenerated window has a new
    name, so the stale one must be swept — otherwise downstream applies
    the old range twice."""
    clog, eng = _setup(tmp_path)
    epochs = clog.epochs(1)
    sink = str(tmp_path / "sink")
    con = ChangefeedConsumer(eng, sink)

    eng.apply_epoch(epochs[0])
    r1 = con.poll()
    # crash after rename, before commit
    os.remove(os.path.join(sink, ChangefeedConsumer._STATE))
    # the table advances before the consumer restarts
    eng.apply_epoch(epochs[1])
    con2 = ChangefeedConsumer(eng, sink)
    r2 = con2.poll()
    assert r2["window"] != r1["window"] and r2["watermark_lsn"] == eng.manifest.applied_lsn
    wins = sorted(d for d in os.listdir(sink) if d.startswith("window-"))
    assert wins == [r2["window"]]  # the stale pre-crash window is gone
    # the single surviving window covers the whole range from LSN 0
    net = _lww_net(con2.read_window(r2["window"]))
    assert net.num_rows == eng.read_changes(since_lsn=0).num_rows

@pytest.mark.usefixtures("ray_session")
def test_seed_from_snapshot_is_idempotent_without_advance(tmp_path):
    """Re-running the bootstrap seed with no table advance must replace
    the committed seed window (recovery is retry-safe), not crash on a
    non-empty target directory."""
    clog, eng = _setup(tmp_path)
    eng.replay(clog, segments_per_epoch=2)
    sink = str(tmp_path / "sink")
    con = ChangefeedConsumer(eng, sink)
    r1 = con.seed_from_snapshot()
    r2 = con.seed_from_snapshot()  # same watermark, same name
    assert r2["window"] == r1["window"] and r2["rows"] == r1["rows"]
    wins = [d for d in os.listdir(sink) if d.startswith("window-")]
    assert wins == [r1["window"]]


@pytest.mark.usefixtures("ray_session")
def test_view_delta_consumer_exactly_once(tmp_path):
    """ViewDeltaConsumer: version-range windows cover the view changefeed
    exactly once; a replica applying the windows in order equals read();
    crash residue never double-delivers; a rebuild forces seed recovery."""
    import pandas as pd

    from etl_framework_ray.pipelines.consumer import ViewDeltaConsumer
    from etl_framework_ray.pipelines.incremental import IncrementalRollup

    log = generate_changelog(GenConfig(num_events=4000, num_conversations=60, seed=89))
    clog = ChangeLog(str(tmp_path / "log"))
    clog.write_segments(log, segment_rows=1000)
    eng = CDCEngine(str(tmp_path / "tbl"), num_partitions=4, compact_every=1_000_000)
    view = IncrementalRollup(eng, str(tmp_path / "view"), emit_changes=True)
    con = ViewDeltaConsumer(view, str(tmp_path / "sink"))

    epochs = clog.epochs(1)
    eng.apply_epoch(epochs[0])
    view.advance()
    seed = con.seed_from_view()  # bootstrap advance emits no deltas
    assert seed["rows"] > 0 and con.cursor == view.version

    replica = con.read_window(seed["window"]).to_pandas()

    def apply_window(replica, t):
        d = t.to_pandas()
        if not len(d):
            return replica
        replica = replica[~replica["conv_id"].isin(set(d["conv_id"]))]
        ins = d[d["op"] == "U"].drop(columns=["op", "version"])
        return pd.concat([replica, ins.astype(replica.dtypes)], ignore_index=True)

    for ep in epochs[1:3]:
        eng.apply_epoch(ep)
        view.advance()
        r = con.poll()
        assert r["rows"] > 0 and r["version"] == view.version
        replica = apply_window(replica, con.read_window(r["window"]))
    assert con.poll()["window"] is None  # no-op
    got = replica.sort_values("conv_id").reset_index(drop=True)
    want = view.read_arrow().to_pandas()
    pd.testing.assert_frame_equal(got, want.reindex(columns=got.columns))

    # crash residue: final-named window past the cursor is swept, and the
    # re-poll regenerates the range exactly once
    eng.apply_epoch(epochs[3])
    view.advance()
    cur = con.cursor
    ghost = os.path.join(str(tmp_path / "sink"), f"window-{cur + 1:012d}-{view.version:012d}")
    os.makedirs(ghost)  # simulated rename-before-commit crash
    r = con.poll()
    assert r["rows"] > 0
    names = [d for d in os.listdir(str(tmp_path / "sink")) if d.startswith("window-")]
    assert len([n for n in names if n.endswith(f"{view.version:012d}")]) == 1
    replica = apply_window(replica, con.read_window(r["window"]))
    pd.testing.assert_frame_equal(
        replica.sort_values("conv_id").reset_index(drop=True),
        view.read_arrow().to_pandas().reindex(columns=replica.columns),
    )

    # a rebuild breaks continuity (and must NOT recycle version numbers —
    # the consumer's cursor would alias an unrelated new version):
    v_before = view.version
    view.rebuild()
    assert view.version == v_before + 1
    with pytest.raises(RuntimeError, match="continuous since"):
        con.poll()
    seed2 = con.seed_from_view()
    pd.testing.assert_frame_equal(
        con.read_window(seed2["window"]).to_pandas().sort_values("conv_id").reset_index(drop=True),
        view.read_arrow().to_pandas(),
    )

    # an advance that bumps the version WITHOUT emitting rows (e.g. a
    # touched-nothing window) still advances the cursor, writing no dir
    IncrementalRollup(eng, str(tmp_path / "view"), emit_changes=False).advance()
    # (no new lake data: version unchanged -> plain no-op is also fine)
    r = con.poll()
    assert r["rows"] == 0

    # a sink directory refuses the OTHER consumer kind instead of
    # mis-sweeping its committed windows
    from etl_framework_ray.pipelines.consumer import ChangefeedConsumer

    with pytest.raises(RuntimeError, match="belongs to a"):
        ChangefeedConsumer(eng, str(tmp_path / "sink")).poll()


@pytest.mark.usefixtures("ray_session")
def test_empty_window_commits_cursor_without_directory(tmp_path):
    """A head advance whose feed nets to ZERO rows must advance the
    cursor without writing (or crashing on) a window directory — Ray's
    write_parquet of an empty dataset creates no files."""
    import pyarrow as pa
    import ray as _ray

    from etl_framework_ray.pipelines.consumer import ViewDeltaConsumer

    class _StubView:
        version = 5

        def changes(self, cur, net=True, up_to=None):
            return _ray.data.from_arrow(
                pa.schema([("op", pa.string()), ("version", pa.int64())]).empty_table()
            )

    con = ViewDeltaConsumer(_StubView(), str(tmp_path / "sink"))
    r = con.poll()
    assert r["window"] is None and r["rows"] == 0 and con.cursor == 5
    assert not [d for d in os.listdir(str(tmp_path / "sink")) if d.startswith("window-")]
    assert con.poll()["window"] is None  # now a plain no-op at the head


@pytest.mark.usefixtures("ray_session")
def test_replica_follows_view_through_windows(tmp_path):
    """End-to-end replication: view emits deltas, ViewDeltaConsumer
    transports exactly-once windows, ReplicaTable applies them — the
    replica equals the view after every drain, deletes included, and
    re-draining (duplicate delivery) is a no-op."""
    import pandas as pd

    from etl_framework_ray.pipelines.consumer import ViewDeltaConsumer
    from etl_framework_ray.pipelines.incremental import IncrementalRollup
    from etl_framework_ray.pipelines.replica import ReplicaTable

    log = generate_changelog(
        GenConfig(num_events=5000, num_conversations=50, seed=91, delete_frac=0.1)
    )
    clog = ChangeLog(str(tmp_path / "log"))
    clog.write_segments(log, segment_rows=1000)
    eng = CDCEngine(str(tmp_path / "tbl"), num_partitions=4, compact_every=1_000_000)
    view = IncrementalRollup(eng, str(tmp_path / "view"), emit_changes=True)
    con = ViewDeltaConsumer(view, str(tmp_path / "sink"))
    rep = ReplicaTable(str(tmp_path / "replica"), num_partitions=4)

    epochs = clog.epochs(1)
    eng.apply_epoch(epochs[0])
    view.advance()
    con.seed_from_view()
    rep.follow(con)
    pd.testing.assert_frame_equal(
        rep.read_arrow().to_pandas(), view.read_arrow().to_pandas()
    )

    # applying a delta before any seed fails loud on a FRESH replica
    import pyarrow as pa

    with pytest.raises(RuntimeError, match="no seed"):
        ReplicaTable(str(tmp_path / "rep2")).apply(pa.table({}), 99)

    # drain ALL remaining epochs first (later segments carry later event
    # times — a delete stamped before they apply would lose LWW to them),
    # then a window containing a full-conversation delete
    for ep in epochs[1:]:
        eng.apply_epoch(ep)
        view.advance()
        con.poll()
    victim = view.read_arrow().to_pandas()["conv_id"].iloc[0]
    snap = eng.snapshot_arrow().to_pandas()
    turns = snap.loc[snap["conv_id"] == victim, "turn_idx"].tolist()
    import datetime

    from etl_framework_ray.sources.generator import CHANGELOG_SCHEMA

    _lsn0 = eng.manifest.applied_lsn + 1
    _ts = snap["ts"].max() + datetime.timedelta(seconds=5)
    rows = pa.Table.from_pylist(
        [
            {"lsn": int(_lsn0 + i), "ts": _ts, "op": "D", "conv_id": victim,
             "turn_idx": int(t), "role": None, "text": None, "tool": None}
            for i, t in enumerate(turns)
        ],
        schema=CHANGELOG_SCHEMA,
    )
    clog.write_segments(rows, segment_rows=len(turns))
    eng.replay(clog, segments_per_epoch=1)
    view.advance()
    con.poll()

    r = rep.follow(con)
    assert r["windows_applied"] >= 1 and rep.version == view.version
    got = rep.read_arrow().to_pandas()
    want = view.read_arrow().to_pandas()
    pd.testing.assert_frame_equal(got, want)
    assert victim not in set(got["conv_id"])

    # duplicate drain: nothing re-applies, state unchanged
    assert rep.follow(con)["windows_applied"] == 0
    pd.testing.assert_frame_equal(rep.read_arrow().to_pandas(), want)


@pytest.mark.usefixtures("ray_session")
def test_replica_guards_and_empty_states(tmp_path):
    """Re-creating a replica with a different partition count fails loud
    (mis-routing guard); an empty seed resyncs to an empty replica that
    keeps its schema; deleting every conversation leaves a readable
    empty replica."""
    import pandas as pd
    import pyarrow as pa

    from etl_framework_ray.pipelines.incremental import VIEW_SCHEMA
    from etl_framework_ray.pipelines.replica import ReplicaTable

    rep = ReplicaTable(str(tmp_path / "rep"), num_partitions=4)
    seed_rows = pa.table(
        {
            "conv_id": pa.array(["a", "b"], pa.string()),
            "n_turns": pa.array([1, 2], pa.int64()),
        }
    )
    rep.seed(seed_rows, 1)
    with pytest.raises(RuntimeError, match="partitions"):
        ReplicaTable(str(tmp_path / "rep"), num_partitions=8)
    assert ReplicaTable(str(tmp_path / "rep"), num_partitions=4).version == 1

    # a delta deleting every conversation leaves a schema-preserving empty
    delta = pa.table(
        {
            "op": pa.array(["D", "D"], pa.string()),
            "version": pa.array([2, 2], pa.int64()),
            "conv_id": pa.array(["a", "b"], pa.string()),
            "n_turns": pa.array([None, None], pa.int64()),
        }
    )
    rep.apply(delta, 2)
    t = rep.read_arrow()
    assert t.num_rows == 0 and t.schema.names == ["conv_id", "n_turns"]
    assert rep.read().count() == 0

    # an EMPTY seed window is valid (never-advanced view): schema from arg
    rep2 = ReplicaTable(str(tmp_path / "rep2"), num_partitions=4)
    rep2.seed(pa.table({}), 1, schema=VIEW_SCHEMA)
    assert rep2.read_arrow().schema.names == VIEW_SCHEMA.names
    assert rep2.version == 1


@pytest.mark.usefixtures("ray_session")
def test_anchored_changefeed_still_fails_loud_on_compaction(tmp_path):
    """The up_to anchor bounds DELTA files only: a base file that folded
    changes inside the anchored window must still raise the compaction
    horizon error, never silently shrink the window."""
    log = generate_changelog(GenConfig(num_events=4000, num_conversations=60, seed=88))
    clog = ChangeLog(str(tmp_path / "log"))
    clog.write_segments(log, segment_rows=1000)
    # compact_every=2 live files -> the 4-epoch replay folds a base
    eng = CDCEngine(str(tmp_path / "tbl"), num_partitions=4, compact_every=2)
    eng.replay(clog, segments_per_epoch=1)
    with pytest.raises(RuntimeError, match="compacted"):
        eng._changefeed_files(0, up_to_lsn=50)  # bound far below the base
