"""Zone-map data skipping end-to-end: stats capture on every lake write
path, predicate-pushdown snapshots, and the skip counters that prove
files/partitions were never opened."""

import datetime as dt

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest
import ray

from etl_framework_ray.pipelines.cdc import CDCEngine
from etl_framework_ray.pipelines.writer import LakeWriter
from etl_framework_ray.sources.changelog import ChangeLog
from etl_framework_ray.sources.generator import GenConfig, generate_changelog
from etl_framework_ray.state import zonemap as zm
from etl_framework_ray.state.schema import ColumnSpec, TableSpec

EVENTS_SPEC = TableSpec(  # PK-less append-only log table
    name="evlog",
    columns=(
        ColumnSpec("event_id", pa.int64(), nullable=False),
        ColumnSpec("kind", pa.string()),
        ColumnSpec("ts", pa.timestamp("us")),
    ),
)


def _replayed(tmp_path, compact_every=4, **gen_kw):
    cfg = GenConfig(
        num_events=gen_kw.pop("num_events", 4000),
        num_conversations=gen_kw.pop("num_conversations", 40),
        seed=gen_kw.pop("seed", 77),
        delete_frac=gen_kw.pop("delete_frac", 0.05),
        **gen_kw,
    )
    log = generate_changelog(cfg)
    clog = ChangeLog(str(tmp_path / "log"))
    clog.write_segments(log, segment_rows=1000)
    eng = CDCEngine(str(tmp_path / "tbl"), num_partitions=8, compact_every=compact_every)
    eng.replay(clog, segments_per_epoch=2)
    return eng


@pytest.mark.usefixtures("ray_session")
def test_replay_records_stats_for_every_live_file(tmp_path):
    eng = _replayed(tmp_path)
    man = eng.manifest
    checked = 0
    for pid, ps in man.partitions.items():
        for f in ps.files:
            st = ps.file_stats.get(f)
            assert st, f"no zone stats for {f}"
            # spot-check the bounds against the actual file
            t = pq.read_table(f, columns=["conv_id", "turn_idx", "ts"])
            mm = pc.min_max(t.column("turn_idx"))
            assert st["turn_idx"]["min"] == float(mm["min"].as_py())
            assert st["turn_idx"]["max"] == float(mm["max"].as_py())
            assert st["conv_id"]["min"] == pc.min(t.column("conv_id")).as_py()
            assert st["turn_idx"]["rows"] == t.num_rows
            checked += 1
    assert checked > 0


@pytest.mark.usefixtures("ray_session")
def test_compaction_and_maintenance_compact_keep_stats(tmp_path):
    eng = _replayed(tmp_path, compact_every=2)  # force mid-replay compactions
    for ps in eng.manifest.partitions.values():
        for f in ps.files:
            assert f in ps.file_stats
    eng.compact()  # maintenance fold: one base file per partition
    for ps in eng.manifest.partitions.values():
        assert len(ps.files) == 1
        assert ps.files[0] in ps.file_stats
        # stats carry no retired-file residue
        assert set(ps.file_stats) == set(ps.files)


@pytest.mark.usefixtures("ray_session")
def test_snapshot_predicate_matches_post_filter(tmp_path):
    eng = _replayed(tmp_path)
    full = eng.snapshot_arrow()
    mid_ts = sorted(full.column("ts").to_pylist())[len(full) // 2]
    for predicate in (
        [("ts", ">=", mid_ts)],
        [("role", "==", "user")],
        [("role", "==", "user"), ("ts", "<", mid_ts)],
        [("turn_idx", "in", [0, 1, 2])],
    ):
        got = pa.concat_tables(
            [ray.get(r) for r in eng.snapshot(predicate=predicate).to_arrow_refs()]
        ).sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
        exp = zm.filter_table(full, predicate)
        assert got.equals(exp), predicate
        # snapshot_arrow takes the same predicate
        assert eng.snapshot_arrow(predicate=predicate).equals(exp)


@pytest.mark.usefixtures("ray_session")
def test_predicate_with_column_projection(tmp_path):
    eng = _replayed(tmp_path)
    full = eng.snapshot_arrow()
    mid_ts = sorted(full.column("ts").to_pylist())[len(full) // 2]
    # predicate on ts while projecting text only: ts need not be projected
    got = pa.concat_tables(
        [
            ray.get(r)
            for r in eng.snapshot(
                columns=["conv_id", "turn_idx", "text"], predicate=[("ts", ">=", mid_ts)]
            ).to_arrow_refs()
        ]
    ).sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    exp = zm.filter_table(full, [("ts", ">=", mid_ts)]).select(
        ["conv_id", "turn_idx", "text"]
    )
    assert got.equals(exp)


@pytest.mark.usefixtures("ray_session")
def test_pk_conjuncts_prune_partitions_and_files(tmp_path):
    # few conversations over many partitions: conv_id bounds per partition
    # are tight enough that a single-key predicate skips most of the table
    eng = _replayed(tmp_path, num_conversations=6, num_events=3000, compact_every=100)
    full = eng.snapshot_arrow()
    conv = full.column("conv_id")[0].as_py()
    counters: dict = {}
    got = pa.concat_tables(
        [
            ray.get(r)
            for r in eng.snapshot(
                predicate=[("conv_id", "==", conv)], prune_stats=counters
            ).to_arrow_refs()
        ]
    ).sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    exp = full.filter(pc.equal(full.column("conv_id"), conv))
    assert got.equals(exp)
    assert counters["partitions_read"] < counters["partitions_total"]
    assert counters["files_read"] < counters["files_total"]


@pytest.mark.usefixtures("ray_session")
def test_append_table_file_skipping_by_time_range(tmp_path):
    w = LakeWriter(str(tmp_path / "evlog"), EVENTS_SPEC, num_partitions=4)
    day1 = dt.datetime(2026, 1, 1)
    day2 = dt.datetime(2026, 2, 1)

    def batch(day, lo):
        return ray.data.from_arrow(
            pa.table(
                {
                    "event_id": pa.array(range(lo, lo + 50), pa.int64()),
                    "kind": ["a" if i % 2 else "b" for i in range(50)],
                    "ts": pa.array(
                        [day + dt.timedelta(minutes=i) for i in range(50)],
                        pa.timestamp("us"),
                    ),
                }
            )
        )

    w.append(batch(day1, 0))
    w.append(batch(day2, 50))
    counters: dict = {}
    got = pa.concat_tables(
        [
            ray.get(r)
            for r in w.read(
                predicate=[("ts", ">=", day2)], prune_stats=counters
            ).to_arrow_refs()
        ]
    )
    assert sorted(got.column("event_id").to_pylist()) == list(range(50, 100))
    # PK-less table: every conjunct prunes FILES — the day-1 files were
    # never opened even where both days share a partition
    assert counters["files_read"] < counters["files_total"]
    assert counters["files_read"] > 0


@pytest.mark.usefixtures("ray_session")
def test_overwrite_records_footer_stats(tmp_path):
    w = LakeWriter(str(tmp_path / "evlog"), EVENTS_SPEC, num_partitions=4)
    t = pa.table(
        {
            "event_id": pa.array(range(100), pa.int64()),
            "kind": ["x"] * 100,
            "ts": pa.array(
                [dt.datetime(2026, 3, 1) + dt.timedelta(hours=i) for i in range(100)],
                pa.timestamp("us"),
            ),
        }
    )
    w.overwrite(ray.data.from_arrow(t))
    man = w.engine.manifest
    seen = 0
    for ps in man.partitions.values():
        for f in ps.files:
            st = ps.file_stats.get(f)
            assert st and "event_id" in st and "ts" in st
            seen += 1
    assert seen > 0
    # and those stats drive pruning on read
    counters: dict = {}
    out = pa.concat_tables(
        [
            ray.get(r)
            for r in w.read(
                predicate=[("event_id", ">", 1000)], prune_stats=counters
            ).to_arrow_refs()
        ]
    )
    assert out.num_rows == 0
    assert counters["partitions_read"] == 0


@pytest.mark.usefixtures("ray_session")
def test_predicate_validation_errors(tmp_path):
    eng = _replayed(tmp_path, num_events=500, num_conversations=5)
    with pytest.raises(ValueError, match="unsupported predicate op"):
        eng.snapshot(predicate=[("ts", "like", "x")])
    with pytest.raises(ValueError, match="unknown or internal"):
        eng.snapshot(predicate=[("_lsn", ">", 0)])
    with pytest.raises(ValueError, match="unknown or internal"):
        eng.snapshot(predicate=[("nope", ">", 0)])


@pytest.mark.usefixtures("ray_session")
def test_fsck_audits_zone_stats(tmp_path):
    """fsck passes on honest stats; flags too-tight bounds (the failure
    mode that silently drops rows from pushdown reads), count drift, and
    stats for retired files."""
    eng = _replayed(tmp_path, num_events=1500, num_conversations=15)
    r = eng.fsck()
    assert r["ok"], r["issues"]

    man = eng.manifest
    pid = next(p for p in sorted(man.partitions) if man.partitions[p].file_stats)
    ps = man.partitions[pid]
    f = next(f for f in ps.files if f in ps.file_stats and "turn_idx" in ps.file_stats[f])

    # too-tight min: recorded min above the file's actual minimum
    good = dict(ps.file_stats[f]["turn_idx"])
    ps.file_stats[f]["turn_idx"] = {**good, "min": good["max"] + 1, "max": good["max"] + 2}
    r = eng.fsck()
    assert not r["ok"] and any("min too tight" in i for i in r["issues"]), r["issues"]

    # count drift
    ps.file_stats[f]["turn_idx"] = {**good, "rows": good["rows"] + 5}
    r = eng.fsck()
    assert any("counts" in i for i in r["issues"]), r["issues"]

    # stats naming a column the file does not have
    ps.file_stats[f]["turn_idx"] = good  # restore
    ps.file_stats[f]["no_such_col"] = dict(good)
    r = eng.fsck()
    assert any("absent column" in i for i in r["issues"]), r["issues"]

    # stats for a file not in the live list are flagged driver-side
    del ps.file_stats[f]["no_such_col"]
    ps.file_stats[f + ".retired"] = {"turn_idx": good}
    r = eng.fsck()
    assert any("retired" in i for i in r["issues"]), r["issues"]


@pytest.mark.usefixtures("ray_session")
def test_optimize_sort_by_clusters_and_skips(tmp_path):
    """OPTIMIZE with clustering: interleaved appends leave every file
    spanning the whole ts range (no skipping possible); optimize(sort_by=
    ["ts"], target_file_rows=...) rewrites each partition time-sorted into
    bounded files whose tight ranges let a time predicate skip files."""
    w = LakeWriter(str(tmp_path / "evlog"), EVENTS_SPEC, num_partitions=2)
    base = dt.datetime(2026, 1, 1)

    def batch(offsets, lo):
        return ray.data.from_arrow(
            pa.table(
                {
                    "event_id": pa.array(range(lo, lo + len(offsets)), pa.int64()),
                    "kind": ["k"] * len(offsets),
                    "ts": pa.array(
                        [base + dt.timedelta(hours=h) for h in offsets],
                        pa.timestamp("us"),
                    ),
                }
            )
        )

    # three appends, each spanning the FULL time range (interleaved hours)
    for j in range(3):
        w.append(batch(range(j, 300, 3), j * 100))
    full = pa.concat_tables([ray.get(r) for r in w.read().to_arrow_refs()])
    cutoff = base + dt.timedelta(hours=250)
    pred = [("ts", ">=", cutoff)]
    before: dict = {}
    pa.concat_tables([ray.get(r) for r in w.read(predicate=pred, prune_stats=before).to_arrow_refs()])
    assert before["files_read"] == before["files_total"]  # interleaved: no skips

    n = w.optimize(sort_by=["ts"], target_file_rows=40)
    assert n == 2
    after: dict = {}
    got = pa.concat_tables(
        [ray.get(r) for r in w.read(predicate=pred, prune_stats=after).to_arrow_refs()]
    )
    exp = full.filter(pc.greater_equal(full.column("ts"), pa.scalar(cutoff, pa.timestamp("us"))))
    assert sorted(got.column("event_id").to_pylist()) == sorted(exp.column("event_id").to_pylist())
    # clustered layout: most files skip; every partition now has multiple
    # bounded files with recorded stats
    assert after["files_total"] > 2
    assert after["files_read"] < after["files_total"] // 2
    man = w.engine.manifest
    for ps in man.partitions.values():
        assert len(ps.files) >= 2
        assert set(ps.files) == set(ps.file_stats)
    # full read is unchanged by the rewrite
    again = pa.concat_tables([ray.get(r) for r in w.read().to_arrow_refs()])
    assert sorted(again.column("event_id").to_pylist()) == sorted(
        full.column("event_id").to_pylist()
    )
    # audit passes on the clustered layout
    r = w.engine.fsck()
    assert r["ok"], r["issues"]

    # keyed tables refuse clustering (base files must stay PK-sorted)
    eng = _replayed(tmp_path, num_events=400, num_conversations=4)
    with pytest.raises(ValueError, match="PK-less"):
        eng.compact(sort_by=["ts"])


@pytest.mark.usefixtures("ray_session")
def test_column_bounds_from_manifest(tmp_path):
    """column_bounds answers min/max from zone maps alone and goes
    conservative (None) when any live file lacks stats."""
    eng = _replayed(tmp_path, num_events=1200, num_conversations=12)
    full = eng.snapshot_arrow()
    b = eng.column_bounds("turn_idx")
    assert b is not None
    lo, hi = b
    got = pc.min_max(full.column("turn_idx"))
    # bounds may be wider (tombstoned rows count) but must CONTAIN the data
    assert lo <= got["min"].as_py() and hi >= got["max"].as_py()
    tsb = eng.column_bounds("ts")
    assert tsb is not None and tsb[0] <= tsb[1]
    # a file without stats makes the answer conservative
    pid = next(p for p in sorted(eng.manifest.partitions) if eng.manifest.partitions[p].files)
    ps = eng.manifest.partitions[pid]
    ps.file_stats.pop(ps.files[0], None)
    assert eng.column_bounds("turn_idx") is None


@pytest.mark.usefixtures("ray_session")
def test_double_optimize_never_overwrites_live_files(tmp_path):
    """Two optimize passes at the same applied watermark must not reuse
    output paths: the second pass targeting the FIRST pass's live
    committed files would corrupt time travel (and the table itself on
    a crash mid-fold)."""
    w = LakeWriter(str(tmp_path / "evlog"), EVENTS_SPEC, num_partitions=2)
    base = dt.datetime(2026, 4, 1)

    def batch(lo):
        return ray.data.from_arrow(
            pa.table(
                {
                    "event_id": pa.array(range(lo, lo + 50), pa.int64()),
                    "kind": ["k"] * 50,
                    "ts": pa.array(
                        [base + dt.timedelta(minutes=lo + i) for i in range(50)],
                        pa.timestamp("us"),
                    ),
                }
            )
        )

    w.append(batch(0))
    w.append(batch(50))
    w.optimize(sort_by=["ts"], target_file_rows=30)
    v1 = w.engine.manifest.version
    v1_files = {
        f for ps in w.engine.manifest.partitions.values() for f in ps.files
    }
    w.append(batch(100))
    w.optimize(sort_by=["ts"], target_file_rows=30)
    v2_files = {
        f for ps in w.engine.manifest.partitions.values() for f in ps.files
    }
    assert not (v1_files & v2_files)  # fresh paths, no in-place overwrite
    # time travel to the pre-second-optimize version still reads 100 rows
    old = w.engine.snapshot_arrow(version=v1)
    assert old.num_rows == 100
    new = pa.concat_tables([ray.get(r) for r in w.read().to_arrow_refs()])
    assert new.num_rows == 150
    assert w.engine.fsck()["ok"]


@pytest.mark.usefixtures("ray_session")
def test_snapshot_arrow_validates_predicate_columns(tmp_path):
    eng = _replayed(tmp_path, num_events=300, num_conversations=3)
    with pytest.raises(ValueError, match="unknown or internal"):
        eng.snapshot_arrow(predicate=[("convid", "==", "x")])
    with pytest.raises(ValueError, match="unknown or internal"):
        eng.snapshot_arrow(predicate=[("_lsn", ">", 0)])


@pytest.mark.usefixtures("ray_session")
def test_optimize_zorder_skips_on_every_clustered_column(tmp_path):
    """Z-order clustering: after optimize(cluster="zorder") on (ts, val),
    a selective predicate on EITHER column skips files — the case
    lexicographic sort can't serve (its second column spans every file)."""
    spec = TableSpec(
        name="evlog2",
        columns=(
            ColumnSpec("event_id", pa.int64(), nullable=False),
            ColumnSpec("val", pa.int64()),
            ColumnSpec("ts", pa.timestamp("us")),
        ),
    )
    w = LakeWriter(str(tmp_path / "evlog2"), spec, num_partitions=2)
    base = dt.datetime(2026, 1, 1)
    n = 4096

    def batch(lo, step):
        ids = list(range(lo, lo + n))
        # val is INDEPENDENT of ts (a de-correlating multiplier mod n), so
        # a lexicographic ts sort leaves val spanning every file
        return ray.data.from_arrow(
            pa.table(
                {
                    "event_id": pa.array(ids, pa.int64()),
                    "val": pa.array([(i * 2654435761) % n for i in ids], pa.int64()),
                    "ts": pa.array(
                        [base + dt.timedelta(minutes=(i * step) % n) for i in ids],
                        pa.timestamp("us"),
                    ),
                }
            )
        )

    for j in range(3):
        w.append(batch(j * n, 3 + j))
    full = pa.concat_tables([ray.get(r) for r in w.read().to_arrow_refs()])

    # lexicographic baseline: ts predicates skip, val predicates cannot
    w.optimize(sort_by=["ts", "val"], target_file_rows=512)
    val_pred = [("val", "<", 256)]  # ~6% of the val range
    lex: dict = {}
    pa.concat_tables(
        [ray.get(r) for r in w.read(predicate=val_pred, prune_stats=lex).to_arrow_refs()]
    )
    assert lex["files_read"] == lex["files_total"]  # second column: no skips

    w.optimize(sort_by=["ts", "val"], target_file_rows=512, cluster="zorder")
    zval: dict = {}
    got_val = pa.concat_tables(
        [ray.get(r) for r in w.read(predicate=val_pred, prune_stats=zval).to_arrow_refs()]
    )
    exp_val = full.filter(pc.less(full.column("val"), 256))
    assert sorted(got_val.column("event_id").to_pylist()) == sorted(
        exp_val.column("event_id").to_pylist()
    )
    assert zval["files_read"] < zval["files_total"] // 2  # val NOW skips

    ts_pred = [("ts", ">=", base + dt.timedelta(minutes=int(n * 0.9)))]
    zts: dict = {}
    got_ts = pa.concat_tables(
        [ray.get(r) for r in w.read(predicate=ts_pred, prune_stats=zts).to_arrow_refs()]
    )
    exp_ts = full.filter(
        pc.greater_equal(
            full.column("ts"),
            pa.scalar(base + dt.timedelta(minutes=int(n * 0.9)), pa.timestamp("us")),
        )
    )
    assert sorted(got_ts.column("event_id").to_pylist()) == sorted(
        exp_ts.column("event_id").to_pylist()
    )
    # ts still skips — less sharply than a dedicated ts sort would (the
    # z-curve splits its prefix bits across BOTH dimensions, so each one
    # prunes to ~a quadrant boundary, not a razor slice; that is the trade)
    assert zts["files_read"] <= zts["files_total"] * 0.6

    # full content unchanged; audit green; history records the layout
    again = pa.concat_tables([ray.get(r) for r in w.read().to_arrow_refs()])
    assert sorted(again.column("event_id").to_pylist()) == sorted(
        full.column("event_id").to_pylist()
    )
    assert w.engine.fsck()["ok"]
    assert w.engine.manifest.history[-1]["cluster"] == "zorder"

    # guards: zorder needs >= 2 columns; bad cluster name refused
    with pytest.raises(ValueError, match="at least 2"):
        w.optimize(sort_by=["ts"], cluster="zorder")
    with pytest.raises(ValueError, match="cluster"):
        w.engine.compact(sort_by=["ts", "val"], cluster="hilbert")


def test_zorder_permutation_unit():
    """The Morton permutation: valid permutation, deterministic, groups
    quadrants of a 2-D grid together, and rejects bad column counts."""
    import numpy as np

    n = 16
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    t = pa.table(
        {"x": pa.array(xs.ravel(), pa.int64()), "y": pa.array(ys.ravel(), pa.int64())}
    )
    perm = zm.zorder_permutation(t, ["x", "y"])
    assert sorted(perm.tolist()) == list(range(n * n))
    assert (perm == zm.zorder_permutation(t, ["x", "y"])).all()
    ordered = t.take(perm)
    # the first quarter of the curve is exactly one quadrant of the grid
    q = ordered.slice(0, n * n // 4)
    assert pc.max(q.column("x")).as_py() < n // 2
    assert pc.max(q.column("y")).as_py() < n // 2
    with pytest.raises(ValueError, match="at least 2"):
        zm.zorder_permutation(t, ["x"])
    with pytest.raises(ValueError, match="at most 8"):
        zm.zorder_permutation(t, ["x"] * 9)
    assert zm.zorder_permutation(t.slice(0, 0), ["x", "y"]).size == 0
