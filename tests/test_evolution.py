"""Schema evolution on the data path, mid-replay (FIXTURES.md F4).

F4a: early changelog segments lack ``tool`` → later segments add it; old
rows read as null tool. F4b: ``turn_idx`` arrives int16 and ``text`` as
string → registry keeps/widens to the declared int32/large_string. F4c is
covered in test_quality.py (new role value under a WARN rule).
"""

import pyarrow as pa
import pytest

from etl_framework_ray.pipelines.cdc import CDCEngine
from etl_framework_ray.sources.changelog import ChangeLog
from etl_framework_ray.sources.generator import GenConfig, generate_changelog, oracle_replay
from etl_framework_ray.state.schema import ColumnSpec, TableSpec

#: desired model WITHOUT the tool column — the table as first declared
SPEC_V1 = TableSpec(
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


def _split_log(tmp_path):
    log = generate_changelog(GenConfig(num_events=3000, num_conversations=80, seed=99))
    half = 1500
    early = log.slice(0, half).drop_columns(["tool"])
    # F4b: early feed uses narrower physical types
    early = early.set_column(
        early.schema.get_field_index("turn_idx"), "turn_idx", early.column("turn_idx").cast(pa.int16())
    )
    early = early.set_column(
        early.schema.get_field_index("text"), "text", early.column("text").cast(pa.string())
    )
    late = log.slice(half)
    clog = ChangeLog(str(tmp_path / "log"))
    clog.write_segments(early, segment_rows=750)
    clog.write_segments(late, segment_rows=750)
    return log, clog


@pytest.mark.usefixtures("ray_session")
def test_added_column_and_widening_mid_replay(tmp_path):
    log, clog = _split_log(tmp_path)
    eng = CDCEngine(str(tmp_path / "tbl"), spec=SPEC_V1, num_partitions=4)
    assert "tool" not in eng.manifest.schema.names

    stats = eng.replay(clog, segments_per_epoch=1)
    # evolution recorded: tool added once, schema version bumped
    assert any("add tool" in c for c in stats.schema_changes)
    assert eng.manifest.schema_version == 2
    assert eng.manifest.schema.field("tool").nullable
    assert eng.manifest.schema.field("turn_idx").type == pa.int32()
    assert eng.manifest.schema.field("text").type == pa.large_string()

    # final state matches the full-schema oracle; rows only touched by the
    # early (tool-less) feed surface tool=None
    got = eng.snapshot_arrow().to_pylist()
    # oracle over the log AS FED (early events carried no tool column)
    early_as_fed = log.slice(0, 1500).set_column(
        log.schema.get_field_index("tool"), "tool", pa.nulls(1500, pa.string())
    )
    fed_oracle = oracle_replay(pa.concat_tables([early_as_fed, log.slice(1500)]))
    assert len(got) == len(fed_oracle)
    for r in got:
        exp = fed_oracle[(r["conv_id"], r["turn_idx"])]
        assert r["text"] == exp["text"]
        assert r["tool"] == exp["tool"]
        assert r["role"] == exp["role"]


@pytest.mark.usefixtures("ray_session")
def test_pre_evolution_files_read_under_new_schema(tmp_path):
    """Old committed files (no tool column) must read as null-tool under the
    evolved schema without rewriting untouched partitions."""
    log, clog = _split_log(tmp_path)
    eng = CDCEngine(str(tmp_path / "tbl"), spec=SPEC_V1, num_partitions=4)
    epochs = clog.epochs(1)
    eng.apply_epoch(epochs[0])  # commits files WITHOUT tool column
    eng.apply_epoch(epochs[1])  # still pre-evolution
    old_files = set(eng.manifest.data_files())
    eng.apply_epoch(epochs[2])  # first tool-bearing segment → evolution
    snap = eng.snapshot()  # Dataset path exercises normalize-on-read
    rows = snap.take_all()
    assert "tool" in rows[0]
    assert len(old_files) > 0


@pytest.mark.usefixtures("ray_session")
def test_ivm_views_advance_across_schema_evolution(tmp_path):
    """Maintained views survive a mid-stream schema evolution: bootstrap
    before the `tool` column exists, advance across the epoch that adds
    it — kernels reading the evolved column (tool usage) see nulls for
    pre-evolution rows, and every view equals a from-scratch rebuild."""
    import pandas as pd

    from etl_framework_ray.pipelines.incremental import (
        IncrementalRollup,
        IncrementalToolUsage,
    )

    log, clog = _split_log(tmp_path)
    eng = CDCEngine(
        str(tmp_path / "tbl"), spec=SPEC_V1, num_partitions=4, compact_every=1_000_000
    )
    epochs = clog.epochs(1)
    for ep in epochs[:2]:  # pre-evolution window (no tool column yet)
        eng.apply_epoch(ep)
    roll = IncrementalRollup(eng, str(tmp_path / "roll"), emit_changes=True)
    tools = IncrementalToolUsage(eng, str(tmp_path / "tools"))
    roll.advance()
    tools.advance()
    assert tools.read_arrow().num_rows == 0  # column absent -> no usage rows
    v1 = roll.version

    for ep in epochs[2:]:  # crosses the add-tool evolution epoch
        eng.apply_epoch(ep)
    roll.advance()
    tools.advance()
    assert eng.manifest.schema_version == 2

    for view, cls in ((roll, IncrementalRollup), (tools, IncrementalToolUsage)):
        fresh = cls(eng, str(tmp_path / f"fresh_{cls.__name__}"))
        fresh.rebuild()
        pd.testing.assert_frame_equal(
            view.read_arrow().to_pandas(), fresh.read_arrow().to_pandas()
        )
    assert tools.read_arrow().num_rows > 0  # evolved column now feeds the view
    assert roll.changes(v1).count() > 0  # the delta stream crossed the evolution
