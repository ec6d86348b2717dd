"""Maintenance ops: forced compaction (OPTIMIZE) + vacuum + CLI surface."""

import glob
import os

import pytest

from etl_framework_ray.pipelines.cdc import CDCEngine
from etl_framework_ray.sources.changelog import ChangeLog
from etl_framework_ray.sources.generator import GenConfig, generate_changelog, oracle_replay


@pytest.mark.usefixtures("ray_session")
def test_compact_and_vacuum(tmp_path):
    log = generate_changelog(GenConfig(num_events=4000, num_conversations=60, seed=91))
    clog = ChangeLog(str(tmp_path / "log"))
    clog.write_segments(log, segment_rows=500)
    # compaction threshold high → replay leaves deep delta stacks
    eng = CDCEngine(str(tmp_path / "tbl"), num_partitions=4, compact_every=100)
    eng.replay(clog, segments_per_epoch=1, vacuum=False)
    depths = [len(ps.files) for ps in eng.manifest.partitions.values()]
    assert max(depths) > 1
    before = eng.snapshot_arrow()

    n = eng.compact()
    assert n == sum(1 for d in depths if d > 1)
    assert all(len(ps.files) == 1 for ps in eng.manifest.partitions.values())
    assert eng.snapshot_arrow().equals(before)  # state unchanged
    assert eng.compact() == 0  # idempotent

    # superseded files still on disk (time travel) until vacuum
    all_files = glob.glob(os.path.join(eng.table_dir, "data", "**", "*.parquet"), recursive=True)
    live = set(eng.manifest.data_files())
    assert len(all_files) > len(live)
    removed = eng.vacuum()
    assert removed == len(all_files) - len(live)
    assert eng.snapshot_arrow().num_rows == len(oracle_replay(log))


@pytest.mark.usefixtures("ray_session")
def test_cli_snapshot_and_metrics(tmp_path, capsys):
    from etl_framework_ray.__main__ import main

    log = generate_changelog(GenConfig(num_events=1000, num_conversations=20, seed=92))
    clog = ChangeLog(str(tmp_path / "log"))
    clog.write_segments(log, segment_rows=500)
    eng = CDCEngine(str(tmp_path / "tbl"), num_partitions=2)
    eng.replay(clog)

    import json

    main(["snapshot", "--table", str(tmp_path / "tbl")])
    out = json.loads(capsys.readouterr().out.strip())
    assert out["rows"] == len(oracle_replay(log))
    main(["metrics", "--table", str(tmp_path / "tbl")])
    out = json.loads(capsys.readouterr().out.strip())
    assert out["lineage_rows"] > 0


@pytest.mark.usefixtures("ray_session")
def test_changelog_prune_and_cli(tmp_path, capsys):
    """Log truncation: prune removes only fully-applied segments (a
    straddler survives whole), replay of the remainder still lands the
    exact oracle state, and the CLI derives the horizon as the MIN
    watermark across ALL consumer tables."""
    import json

    from etl_framework_ray.__main__ import main

    log = generate_changelog(GenConfig(num_events=3000, num_conversations=40, seed=93))
    clog = ChangeLog(str(tmp_path / "log"))
    clog.write_segments(log, segment_rows=400)  # 8 segments
    n_segs = len(clog.segments())

    # consumer A applies everything; consumer B lags at ~half the log
    a = CDCEngine(str(tmp_path / "a"), num_partitions=2)
    a.replay(clog, segments_per_epoch=2)
    b = CDCEngine(str(tmp_path / "b"), num_partitions=2)
    first_epoch = clog.epochs(segments_per_epoch=4)[0]
    b.apply_epoch(first_epoch)

    # CLI: horizon = min(watermarks) = B's — only B-applied segments go
    main(["prune-log", "--log", str(tmp_path / "log"),
          "--table", str(tmp_path / "a"), "--table", str(tmp_path / "b")])
    out = json.loads(capsys.readouterr().out.strip())
    assert out["upto_lsn"] == b.manifest.applied_lsn == first_epoch.epoch_id
    assert out["segments_removed"] == 4
    assert len(clog.segments()) == n_segs - 4
    assert all(s.max_lsn > out["upto_lsn"] for s in clog.segments())

    # B catches up from the truncated log and matches the oracle exactly
    b.replay(clog, segments_per_epoch=2)
    oracle = oracle_replay(log)
    got = {(r["conv_id"], r["turn_idx"]): r for r in b.snapshot_arrow().to_pylist()}
    assert len(got) == len(oracle)
    assert all(got[k]["text"] == o["text"] for k, o in oracle.items())

    # straddler safety: a horizon inside a segment's range keeps it
    seg = clog.segments()[0]
    assert clog.prune(seg.min_lsn) == 0  # mid-range, not fully applied
    assert clog.prune(seg.max_lsn) == 1

    # guards: missing dir; both/neither horizon source
    with pytest.raises(SystemExit):
        main(["prune-log", "--log", str(tmp_path / "nope")])
    capsys.readouterr()
    with pytest.raises(SystemExit):
        main(["prune-log", "--log", str(tmp_path / "log")])
    assert "upto-lsn" in capsys.readouterr().err


@pytest.mark.usefixtures("ray_session")
def test_cli_readonly_rejects_missing_table(tmp_path, capsys):
    """A mistyped --table path must error, not create an empty table."""
    from etl_framework_ray.__main__ import main

    bogus = str(tmp_path / "no_such_table")
    with pytest.raises(SystemExit) as ei:
        main(["snapshot", "--table", bogus])
    assert ei.value.code == 2
    assert "no table manifest" in capsys.readouterr().err
    assert not os.path.exists(os.path.join(bogus, "_manifest"))
    assert not os.path.exists(bogus) or not os.listdir(bogus)


@pytest.mark.usefixtures("ray_session")
def test_reshard_up_and_down_preserves_state(tmp_path):
    """Changing the partition count (8→16, then 16→3) is invisible to
    readers: snapshot equals the oracle byte-for-byte, PKs stay unique,
    lookup still routes, and SUBSEQUENT epochs apply at the new modulus."""
    import pandas as pd
    import pyarrow as pa  # noqa: F401

    log = generate_changelog(
        GenConfig(num_events=5000, num_conversations=60, seed=23, out_of_order=True)
    )
    half = log.num_rows // 2
    clog = ChangeLog(str(tmp_path / "log"))
    clog.write_segments(log.slice(0, half), segment_rows=1000)
    eng = CDCEngine(str(tmp_path / "tbl"), num_partitions=8)
    eng.replay(clog)

    def check(eng):
        snap = eng.snapshot_arrow().to_pandas()
        state = oracle_replay(
            pa.concat_tables([log]).filter(
                pa.compute.less_equal(log.column("lsn"), eng.manifest.applied_lsn)
            )
        )
        assert len(snap) == len(state)
        for r in snap.itertuples():
            o = state[(r.conv_id, r.turn_idx)]
            assert o["text"] == r.text and o["role"] == r.role
        assert not snap.duplicated(["conv_id", "turn_idx"]).any()

    s = eng.reshard(16)
    assert eng.manifest.num_partitions == 16 and s["partitions_migrated"] > 0
    check(eng)
    got = eng.lookup(["conv-000003"])
    assert got.num_rows > 0 and set(got.column("conv_id").to_pylist()) == {"conv-000003"}

    # replay the second half AT THE NEW MODULUS, then shrink
    clog.write_segments(log.slice(half), segment_rows=1000)
    eng.replay(clog)
    check(eng)
    eng.reshard(3)
    assert eng.manifest.num_partitions == 3
    assert set(eng.manifest.partitions) <= {0, 1, 2}
    check(eng)

    # no-op and validation paths
    assert eng.reshard(3)["partitions_migrated"] == 0
    with pytest.raises(ValueError):
        eng.reshard(0)

    # a fresh engine on the same dir picks up the new modulus from the
    # manifest (ctor num_partitions only applies to CREATION)
    eng2 = CDCEngine(str(tmp_path / "tbl"), create_if_missing=False)
    assert eng2.manifest.num_partitions == 3
    check(eng2)


@pytest.mark.usefixtures("ray_session")
def test_reshard_invalidates_changefeed_and_ivm(tmp_path):
    """Consumers behind a reshard hit the compaction-horizon error (the
    migration writes base files), and an IVM view demands rebuild()."""
    from etl_framework_ray.pipelines.incremental import IncrementalRollup

    log = generate_changelog(GenConfig(num_events=3000, num_conversations=30, seed=31))
    clog = ChangeLog(str(tmp_path / "log"))
    clog.write_segments(log, segment_rows=750)
    eng = CDCEngine(str(tmp_path / "tbl"), num_partitions=4)
    epochs = clog.epochs(1)
    for ep in epochs[:2]:
        eng.apply_epoch(ep)
    view = IncrementalRollup(eng, str(tmp_path / "view"))
    view.advance()
    watermark = eng.manifest.applied_lsn

    eng.reshard(9)
    for ep in epochs[2:]:
        eng.apply_epoch(ep)

    with pytest.raises(RuntimeError, match="compacted|retention"):
        eng.read_changes(since_lsn=watermark)
    with pytest.raises(RuntimeError, match="reshard"):
        view.advance()
    view.rebuild()
    import pandas as pd

    got = view.read_arrow().to_pandas()
    snap = eng.snapshot_arrow().to_pandas()
    exp = (
        snap.assign(chars=snap["text"].fillna("").str.len())
        .groupby("conv_id", sort=True)
        .agg(n_turns=("conv_id", "size"), total_chars=("chars", "sum"))
    )
    assert len(got) == len(exp)
    m = got.set_index("conv_id")
    assert (m["n_turns"] == exp["n_turns"]).all()
    assert (m["total_chars"] == exp["total_chars"]).all()


@pytest.mark.usefixtures("ray_session")
def test_reshard_salted_table(tmp_path):
    """A salted hot key survives a reshard: fanout re-homes under the new
    modulus, state stays oracle-equal, and fanout > new_P is rejected."""
    log = generate_changelog(
        GenConfig(num_events=4000, num_conversations=30, seed=37, hot_key_frac=0.5, hot_max_turns=3000)
    )
    clog = ChangeLog(str(tmp_path / "log"))
    clog.write_segments(log, segment_rows=800)
    eng = CDCEngine(str(tmp_path / "tbl"), num_partitions=8)
    eng.replay(clog, auto_mitigate_skew=True)
    assert eng.salt_map
    before = eng.snapshot_arrow()

    fanout = max(int(v) for v in eng.salt_map.values())
    with pytest.raises(ValueError, match="fanout"):
        eng.reshard(fanout - 1)

    eng.reshard(16)
    after = eng.snapshot_arrow()
    assert before.equals(after)
    got = eng.lookup(["conv-000000"])  # the hot, salted conversation
    assert got.num_rows > 0


@pytest.mark.usefixtures("ray_session")
def test_fsck_clean_table_and_detected_corruptions(tmp_path):
    """fsck passes on a healthy replayed table (salted hot keys included)
    and pinpoints a deleted file, a corrupted footer, and a mis-routed
    row."""
    import os

    import pyarrow.parquet as pq

    from etl_framework_ray.sources.generator import GenConfig, generate_changelog

    log = generate_changelog(
        GenConfig(num_events=4000, num_conversations=40, seed=31,
                  hot_key_frac=0.4, hot_max_turns=2000)
    )
    clog = ChangeLog(str(tmp_path / "log"))
    clog.write_segments(log, segment_rows=1000)
    eng = CDCEngine(str(tmp_path / "tbl"), num_partitions=8, compact_every=100)
    eng.replay(clog, segments_per_epoch=1, auto_mitigate_skew=True)
    assert eng.salt_map  # fanout pids must not read as mis-routed
    r = eng.fsck()
    assert r["ok"], r["issues"]
    assert r["files_checked"] > 0 and r["partitions_checked"] == 8

    # corruption 1: silently delete a listed file
    some_pid = next(p for p in eng.manifest.partitions if eng.manifest.partitions[p].files)
    victim = eng.manifest.partitions[some_pid].files[0]
    os.remove(victim)
    r = eng.fsck()
    assert not r["ok"] and any("missing file" in i for i in r["issues"])

    # corruption 2: truncate another listed file's footer
    other_pid = next(
        p for p in eng.manifest.partitions
        if p != some_pid and eng.manifest.partitions[p].files
    )
    victim2 = eng.manifest.partitions[other_pid].files[0]
    data = open(victim2, "rb").read()
    open(victim2, "wb").write(data[: len(data) // 2])
    r = eng.fsck()
    assert any("unreadable" in i for i in r["issues"])

    # corruption 3: a row that hashes to the wrong partition
    third_pid = next(
        p for p in eng.manifest.partitions
        if p not in (some_pid, other_pid) and eng.manifest.partitions[p].files
    )
    f3 = eng.manifest.partitions[third_pid].files[0]
    t = pq.read_table(f3)
    import pyarrow as pa

    wrong = t.set_column(
        t.schema.get_field_index("conv_id"),
        "conv_id",
        pa.array(["conv-misrouted-xyz"] * t.num_rows, t.schema.field("conv_id").type),
    )
    pq.write_table(wrong, f3)
    r = eng.fsck()
    assert any("wrong partition" in i for i in r["issues"])


@pytest.mark.usefixtures("ray_session")
def test_view_fsck(tmp_path):
    """View fsck: clean after advances (deltas included), and pinpoints a
    deleted view file, a missing delta, and a kernel mismatch."""
    import os

    from etl_framework_ray.pipelines.incremental import (
        IncrementalCorpus,
        IncrementalRollup,
    )
    from etl_framework_ray.sources.generator import GenConfig, generate_changelog

    log = generate_changelog(GenConfig(num_events=2000, num_conversations=20, seed=41))
    clog = ChangeLog(str(tmp_path / "log"))
    clog.write_segments(log, segment_rows=1000)
    eng = CDCEngine(str(tmp_path / "tbl"), num_partitions=4, compact_every=1_000_000)
    view = IncrementalRollup(eng, str(tmp_path / "view"), emit_changes=True)
    eng.apply_epoch(clog.epochs(1)[0])
    view.advance()
    eng.apply_epoch(clog.epochs(1)[1])
    view.advance()
    r = view.fsck()
    assert r["ok"] and r["files_checked"] > 0, r

    # kernel mismatch is an audit finding (not a crash)
    r = IncrementalCorpus(eng, str(tmp_path / "view")).fsck()
    assert not r["ok"] and any("kernel mismatch" in i for i in r["issues"])

    # deleted view file and deleted delta file are pinpointed
    state = view._load_state()
    os.remove(next(iter(state["files"].values())))
    os.remove(next(iter((state["deltas"] or {"": [""]}).values()))[0])
    r = view.fsck()
    assert any("missing view file" in i for i in r["issues"])
    assert any("missing" in i and "delta" in i for i in r["issues"])


@pytest.mark.usefixtures("ray_session")
def test_replica_fsck(tmp_path):
    import os

    import pyarrow as pa

    from etl_framework_ray.pipelines.replica import ReplicaTable

    rep = ReplicaTable(str(tmp_path / "rep"), num_partitions=4)
    rep.seed(
        pa.table({"conv_id": pa.array([f"c{i}" for i in range(20)], pa.string()),
                  "n": pa.array(range(20), pa.int64())}),
        1,
    )
    assert rep.fsck()["ok"]
    os.remove(next(iter(rep._load_state()["files"].values())))
    r = rep.fsck()
    assert not r["ok"] and any("missing file" in i for i in r["issues"])


@pytest.mark.usefixtures("ray_session")
def test_fsck_non_conv_table_and_reshard_and_orphans(tmp_path):
    """fsck works on tables keyed by something other than conv_id; a
    resharded engine turns the view audit red; a missing manifest with
    data files present is a finding, not a silent all-clear."""
    import os

    import pyarrow as pa
    import ray as _ray

    from etl_framework_ray.pipelines.incremental import IncrementalRollup
    from etl_framework_ray.pipelines.writer import LakeWriter
    from etl_framework_ray.sources.generator import GenConfig, generate_changelog
    from etl_framework_ray.state.schema import ColumnSpec, TableSpec

    spec = TableSpec(
        name="notes",
        columns=(
            ColumnSpec("note_id", pa.int64(), nullable=False),
            ColumnSpec("body", pa.string()),
        ),
        primary_key=("note_id",),
    )
    w = LakeWriter(str(tmp_path / "notes"), spec, num_partitions=4)
    w.overwrite(
        _ray.data.from_arrow(
            pa.table({"note_id": pa.array(range(40), pa.int64()),
                      "body": pa.array([f"n{i}" for i in range(40)])})
        )
    )
    r = w.engine.fsck()
    assert r["ok"], r["issues"]  # keyed by note_id, not conv_id

    # view audit goes red after a reshard (same condition advance guards)
    log = generate_changelog(GenConfig(num_events=1000, num_conversations=10, seed=3))
    clog = ChangeLog(str(tmp_path / "log"))
    clog.write_segments(log, segment_rows=1000)
    eng = CDCEngine(str(tmp_path / "tbl"), num_partitions=4, compact_every=1_000_000)
    eng.replay(clog)
    view = IncrementalRollup(eng, str(tmp_path / "view"))
    view.advance()
    eng.reshard(new_num_partitions=2)
    r = view.fsck()
    assert not r["ok"] and any("reshard" in i for i in r["issues"])

    # a deleted view manifest with data files on disk is a finding
    os.remove(os.path.join(str(tmp_path / "view"), "_view_manifest.json"))
    r = view.fsck()
    assert not r["ok"] and any("no view manifest" in i for i in r["issues"])


@pytest.mark.usefixtures("ray_session")
def test_describe_reports_manifest_truth(tmp_path):
    """describe() is manifest-only reporting: totals agree with the
    committed state, merge depth reflects the delta stack, and a deleted
    file surfaces as files_missing (the run-fsck signal)."""
    import os

    from etl_framework_ray.sources.generator import GenConfig, generate_changelog

    log = generate_changelog(GenConfig(num_events=2000, seed=91))
    clog = ChangeLog(str(tmp_path / "log"))
    clog.write_segments(log, segment_rows=500)
    eng = CDCEngine(str(tmp_path / "tbl"), num_partitions=4)
    eng.replay(clog, segments_per_epoch=1)

    d = eng.describe()
    assert d["applied_lsn"] == 2000 and d["num_partitions"] == 4
    # physical rows (footer metadata: superseded versions + tombstones
    # included) bound the live rows from above
    assert d["rows_physical"] >= eng.snapshot_arrow().num_rows
    assert d["data_files"] == len(eng.manifest.data_files())
    assert d["data_bytes"] > 0 and d["files_missing"] == 0
    assert d["max_files_per_partition"] >= 1
    assert d["primary_key"] == ["conv_id", "turn_idx"]
    assert d["last_commit"]["epoch_id"] == 2000

    os.remove(eng.manifest.data_files()[0])
    assert eng.describe()["files_missing"] == 1
