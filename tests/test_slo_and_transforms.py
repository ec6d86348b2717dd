"""SLO metrics pipelines (§3.3 port), struct explode (M7), skew detection."""

import duckdb
import pyarrow as pa
import pytest

from etl_framework_ray.functions.transforms import explode_struct_list
from etl_framework_ray.pipelines.metrics import detect_skew

SF = "/root/testdata/sf0.001"


def test_explode_struct_list_matches_reference_semantics():
    failures = pa.array(
        [
            [{"name": "r1", "column": "a"}, {"name": "r2", "column": "b"}],
            [],
            None,
            [{"name": "r3", "column": "c"}],
        ],
        pa.list_(pa.struct([("name", pa.string()), ("column", pa.string())])),
    )
    t = pa.table({"row_id": pa.array([10, 11, 12, 13]), "_errors": failures})
    out = explode_struct_list(t, "_errors", keep=["row_id"])
    assert out.to_pylist() == [
        {"row_id": 10, "name": "r1", "column": "a"},
        {"row_id": 10, "name": "r2", "column": "b"},
        {"row_id": 13, "name": "r3", "column": "c"},
    ]


@pytest.mark.usefixtures("ray_session")
def test_track_timeliness_merges_and_matches_sql(tmp_path):
    from etl_framework_ray.pipelines.slo import track_timeliness

    lake = str(tmp_path / "lake")
    out = track_timeliness(f"{SF}/events.parquet", lake)
    got = {(r["date"], r["job_name"]): r["ready_by_09"] for r in out.take_all()}
    con = duckdb.connect()
    exp_rows = con.sql(
        f"""SELECT strftime(ts, '%Y-%m-%d') AS date, event_type AS job_name,
               MIN(CASE WHEN EXTRACT(hour FROM ts) < 9 THEN 1 ELSE 0 END) = 1 AS ready_by_09
            FROM read_parquet('{SF}/events.parquet') GROUP BY 1, 2"""
    ).fetchall()
    assert got == {(d, j): r for d, j, r in exp_rows}
    # re-running MERGEs idempotently (same keys, same values)
    out2 = track_timeliness(f"{SF}/events.parquet", lake)
    assert {(r["date"], r["job_name"]): r["ready_by_09"] for r in out2.take_all()} == got


@pytest.mark.usefixtures("ray_session")
def test_track_quality_counts_audit(tmp_path):
    import ray.data

    from etl_framework_ray.functions.quality import DQError, DQGate
    from etl_framework_ray.pipelines.slo import track_quality
    from etl_framework_ray.state.schema import ColumnSpec, QualityRule, TableSpec

    spec = TableSpec(
        name="t",
        columns=(
            ColumnSpec("k", pa.int64(), nullable=False),
            ColumnSpec("v", pa.float64(), quality=QualityRule(criticality="warn", min_value=0)),
        ),
        primary_key=("k",),
    )
    audit = str(tmp_path / "audit")
    gate = DQGate(spec, audit)
    gate.check(ray.data.from_arrow(pa.table({"k": [1, 2], "v": [1.0, -5.0]})))  # 1 warn
    rows = track_quality(audit, str(tmp_path / "lake")).take_all()
    assert len(rows) == 1
    assert rows[0]["warning_count"] == 1 and rows[0]["error_count"] == 0


@pytest.mark.usefixtures("ray_session")
def test_detect_skew_flags_hot_partition(tmp_path):
    from etl_framework_ray.pipelines.cdc import CDCEngine
    from etl_framework_ray.sources.changelog import ChangeLog
    from etl_framework_ray.sources.generator import GenConfig, generate_changelog

    log = generate_changelog(
        GenConfig(
            num_events=8000,
            num_conversations=64,
            seed=1,
            hot_key_frac=0.5,
            hot_max_turns=4096,  # hot conversation with MANY turns → real residual skew
            delete_frac=0.0,
        )
    )
    clog = ChangeLog(str(tmp_path / "log"))
    clog.write_segments(log, segment_rows=8000)
    eng = CDCEngine(str(tmp_path / "tbl"), num_partitions=8)
    eng.replay(clog)
    hot = detect_skew(eng.table_dir, factor=3.0)
    assert len(hot) >= 1  # conv-000000 owns ~50% of events → its partition flags
    assert all(h["ratio"] >= 3.0 for h in hot)
