"""StatsKernel — user-configurable per-conversation aggregates as an
incrementally-maintained view (pipelines/incremental.IncrementalStats):
no kernel class required, SQL COUNT/SUM/MIN/MAX/AVG parity (all-NULL
groups yield NULL, COUNT(col) counts non-null), exact under chunked
partials, config covered by the kernel fingerprint."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

from etl_framework_ray.pipelines.cdc import CDCEngine
from etl_framework_ray.pipelines.incremental import IncrementalStats, StatsKernel
from etl_framework_ray.sources.changelog import ChangeLog
from etl_framework_ray.sources.generator import GenConfig, generate_changelog

AGGS = (
    ("n_turns", "count", "*"),
    ("n_tool", "count", "tool"),
    ("first_ts", "min", "ts"),
    ("max_turn", "max", "turn_idx"),
    ("total_chars", "sum", "chars"),
    ("avg_chars", "avg", "chars"),
)


def _live_table(with_all_null_conv: bool = False) -> pa.Table:
    rows = [
        dict(conv_id="a", turn_idx=0, role="user", text="hello", tool=None, ts=1),
        dict(conv_id="a", turn_idx=1, role="assistant", text="hi there", tool="search", ts=2),
        dict(conv_id="b", turn_idx=0, role="user", text=None, tool=None, ts=3),
        dict(conv_id="b", turn_idx=1, role="user", text="x", tool="python", ts=4),
    ]
    if with_all_null_conv:
        rows.append(dict(conv_id="z", turn_idx=0, role="user", text=None, tool=None, ts=9))
    t = pa.table(
        {
            "conv_id": pa.array([r["conv_id"] for r in rows]),
            "turn_idx": pa.array([r["turn_idx"] for r in rows], pa.int32()),
            "role": pa.array([r["role"] for r in rows]),
            "text": pa.array([r["text"] for r in rows], pa.large_string()),
            "tool": pa.array([r["tool"] for r in rows]),
            "ts": pa.array([r["ts"] * 1_000_000 for r in rows], pa.timestamp("us")),
        }
    )
    return t


def _sql_expected(t: pa.Table) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("live", t)
    return con.execute(
        """
        SELECT conv_id,
               COUNT(*) AS n_turns,
               COUNT(tool) AS n_tool,
               MIN(ts) AS first_ts,
               CAST(MAX(turn_idx) AS BIGINT) AS max_turn,
               CAST(SUM(length(text)) AS DOUBLE) AS total_chars,
               CAST(AVG(length(text)) AS DOUBLE) AS avg_chars
        FROM live GROUP BY conv_id ORDER BY conv_id
        """
    ).fetchdf()


def _kernel_result(k: StatsKernel, chunks: list[pa.Table]) -> pd.DataFrame:
    out = k.combine([k.partial(c) for c in chunks if c.num_rows]).to_pandas()
    return out.sort_values("conv_id", ignore_index=True)


def test_kernel_matches_sql_and_is_chunk_invariant():
    k = StatsKernel(AGGS)
    t = _live_table(with_all_null_conv=True)
    exp = _sql_expected(t)
    whole = _kernel_result(k, [t])
    # SQL parity incl. the all-NULL-text conversation: SUM/AVG are NULL
    pd.testing.assert_frame_equal(whole, exp, check_dtype=False)
    assert pd.isna(whole.loc[whole["conv_id"] == "z", "total_chars"]).all()
    # associativity: any chunking combines to the same result, including
    # a conversation split across chunks
    for cut in (1, 2, 3):
        parts = [t.slice(0, cut), t.slice(cut)]
        pd.testing.assert_frame_equal(_kernel_result(k, parts), exp, check_dtype=False)


def test_kernel_config_guards():
    with pytest.raises(ValueError, match="unknown aggregate fn"):
        StatsKernel((("x", "median", "chars"),))
    with pytest.raises(ValueError, match="duplicate output column"):
        StatsKernel((("x", "count", "*"), ("x", "sum", "chars")))
    with pytest.raises(ValueError, match="column_types"):
        StatsKernel((("x", "min", "mystery_col"),))
    with pytest.raises(ValueError, match="at least one aggregate"):
        StatsKernel(())
    # custom column via column_types works
    k = StatsKernel((("m", "max", "mystery_col"),), column_types={"mystery_col": pa.int64()})
    assert k.schema.field("m").type == pa.int64()


@pytest.mark.usefixtures("ray_session")
def test_incremental_stats_advance_equals_rebuild(tmp_path):
    log = generate_changelog(GenConfig(num_events=3000, num_conversations=60, seed=81))
    clog = ChangeLog(str(tmp_path / "log"))
    half = log.slice(0, 1500)
    clog.write_segments(half, segment_rows=500)
    # changefeed-backed views need the deltas unfolded (same contract as
    # the other IVM tests: compaction has its own retention story)
    eng = CDCEngine(str(tmp_path / "tbl"), num_partitions=4, compact_every=1_000_000)
    eng.replay(clog, segments_per_epoch=1)
    view = IncrementalStats(eng, str(tmp_path / "view"), aggs=AGGS)
    view.advance()

    clog.write_segments(log.slice(1500), segment_rows=500)
    eng.replay(clog, segments_per_epoch=1)
    info = view.advance()
    assert info["touched_convs"] != 0

    got = view.read_arrow().to_pandas().sort_values("conv_id", ignore_index=True)
    exp = _sql_expected(
        eng.snapshot_arrow().select(
            ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        )
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    # a rebuild from scratch agrees byte-for-byte
    view.rebuild()
    got2 = view.read_arrow().to_pandas().sort_values("conv_id", ignore_index=True)
    pd.testing.assert_frame_equal(got2, got)

    # a different agg spec refuses to advance the same view directory
    other = IncrementalStats(eng, str(tmp_path / "view"), aggs=AGGS[:2])
    with pytest.raises(Exception, match="kernel"):
        other.advance()


def test_variance_family_matches_sql_and_is_chunk_invariant():
    """var/stddev aggregates from the (Σx, Σx², n) partial triple: SQL
    parity (DuckDB), the sample-vs-population gates, and exactness under
    arbitrary chunking — including a conversation split across chunks."""
    k = StatsKernel(
        (
            ("var_chars", "var_samp", "chars"),
            ("std_chars", "stddev_samp", "chars"),
            ("varp_turn", "var_pop", "turn_idx"),
            ("stdp_turn", "stddev_pop", "turn_idx"),
        )
    )
    t = _live_table(with_all_null_conv=True)
    con = duckdb.connect()
    con.register("live", t)
    exp = con.execute(
        """
        SELECT conv_id,
               var_samp(length(text)) AS var_chars,
               stddev_samp(length(text)) AS std_chars,
               var_pop(turn_idx) AS varp_turn,
               stddev_pop(turn_idx) AS stdp_turn
        FROM live GROUP BY conv_id ORDER BY conv_id
        """
    ).fetchdf()
    whole = _kernel_result(k, [t])
    pd.testing.assert_frame_equal(whole, exp, check_dtype=False)
    # gates: conv b has ONE non-null text → var_samp NULL; conv z has a
    # single row → var_pop(turn_idx)=0; all-NULL chars → NULL both ways
    assert pd.isna(whole.loc[whole["conv_id"] == "b", "var_chars"]).all()
    assert (whole.loc[whole["conv_id"] == "z", "varp_turn"] == 0.0).all()
    assert pd.isna(whole.loc[whole["conv_id"] == "z", "var_chars"]).all()
    for cut in (1, 2, 3):
        parts = [t.slice(0, cut), t.slice(cut)]
        pd.testing.assert_frame_equal(_kernel_result(k, parts), exp, check_dtype=False)
