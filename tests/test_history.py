"""SCD Type-2 history table (pipelines/history.py): full version
timeline from the raw changelog — interval derivation, event-time as-of
snapshots, late data, duplicate delivery, incremental apply, and
cross-checks against the LWW engine on the same log."""

import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from etl_framework_ray.pipelines.cdc import CDCEngine
from etl_framework_ray.pipelines.history import HistoryTable, history_spec
from etl_framework_ray.sources.changelog import ChangeLog
from etl_framework_ray.sources.generator import (
    GenConfig,
    generate_changelog,
    oracle_replay,
)


def _pandas_history(log: pa.Table) -> pd.DataFrame:
    """Brute-force SCD2 oracle: per key ordered by (ts, lsn), each event's
    interval closes at the next event (any op)."""
    df = log.to_pandas().sort_values(["conv_id", "turn_idx", "ts", "lsn"]).reset_index(drop=True)
    g = df.groupby(["conv_id", "turn_idx"], sort=False)
    df["valid_to_ts"] = g["ts"].shift(-1)
    df["valid_to_lsn"] = g["lsn"].shift(-1)
    df["is_current"] = df["valid_to_ts"].isna() & (df["op"] != "D")
    return df


def _assert_history_equals(h: HistoryTable, log: pa.Table) -> None:
    got = h.read_arrow().to_pandas()
    exp = _pandas_history(log)
    assert len(got) == len(exp)
    assert got["valid_from_lsn"].tolist() == exp["lsn"].tolist()
    assert got["change_op"].tolist() == exp["op"].tolist()
    assert got["text"].tolist() == exp["text"].tolist()
    assert np.allclose(got["valid_to_lsn"].fillna(-1), exp["valid_to_lsn"].fillna(-1))
    assert (got["valid_to_ts"].fillna(pd.Timestamp(0)).values
            == exp["valid_to_ts"].fillna(pd.Timestamp(0)).values).all()
    assert (got["is_current"].values == exp["is_current"].values).all()


@pytest.mark.usefixtures("ray_session")
def test_history_matches_bruteforce_oracle(tmp_path):
    """Out-of-order log with deletes: the interval table equals the
    per-key pandas lead computation event for event."""
    log = generate_changelog(
        GenConfig(num_events=6000, num_conversations=60, seed=17,
                  delete_frac=0.1, out_of_order=True)
    )
    clog = ChangeLog(str(tmp_path / "clog"))
    clog.write_segments(log, segment_rows=700)
    h = HistoryTable(str(tmp_path / "hist"), num_partitions=8)
    stats = h.replay(clog, segments_per_epoch=2)
    assert stats.events == 6000
    _assert_history_equals(h, log)

    # re-replay is exactly-once (manifest watermark)
    again = h.replay(clog, segments_per_epoch=2)
    assert again.epochs_applied == 0
    _assert_history_equals(h, log)


@pytest.mark.usefixtures("ray_session")
def test_history_current_equals_lww_engine(tmp_path):
    """current_only history == the plain LWW engine's live snapshot on
    the same log (two independent code paths, one truth)."""
    log = generate_changelog(
        GenConfig(num_events=4000, num_conversations=40, seed=23, delete_frac=0.12)
    )
    clog = ChangeLog(str(tmp_path / "clog"))
    clog.write_segments(log, segment_rows=500)

    h = HistoryTable(str(tmp_path / "hist"), num_partitions=4)
    h.replay(clog, segments_per_epoch=3)
    cur = h.read_arrow(current_only=True).to_pandas()

    eng = CDCEngine(str(tmp_path / "lww"), num_partitions=4)
    eng.replay(clog, segments_per_epoch=3)
    live = eng.snapshot_arrow().to_pandas()

    assert len(cur) == len(live)
    cur_i = cur.set_index(["conv_id", "turn_idx"]).sort_index()
    live_i = live.set_index(["conv_id", "turn_idx"]).sort_index()
    assert (cur_i["text"].fillna("") == live_i["text"].fillna("")).all()
    assert (cur_i["valid_from_ts"] == live_i["ts"]).all()
    assert cur_i["is_current"].all()
    assert cur_i["valid_to_ts"].isna().all()


@pytest.mark.usefixtures("ray_session")
def test_history_incremental_late_data_and_duplicates(tmp_path):
    """Apply the log in two replays where the SECOND delivers events whose
    ts predates already-applied ones (late data): the late version must
    slot INTO the middle of its key's timeline (its successor's interval
    re-derives around it). Then re-deliver an old segment — duplicate
    events collapse, history unchanged."""
    def env(lsn, ts_s, conv, text, op="c"):
        return {"lsn": lsn, "op": {"c": "I", "u": "U", "d": "D"}[op],
                "ts": pd.Timestamp(ts_s * 10**6, unit="us"),
                "conv_id": conv, "turn_idx": 0,
                "role": None if op == "d" else "user",
                "text": None if op == "d" else text, "tool": None}

    schema = pa.schema([
        pa.field("lsn", pa.int64()), pa.field("op", pa.string()),
        pa.field("ts", pa.timestamp("us")), pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()), pa.field("role", pa.string()),
        pa.field("text", pa.large_string()), pa.field("tool", pa.string()),
    ])
    early = [env(1, 100, "a", "v1"), env(2, 300, "a", "v3", "u"),
             env(3, 100, "b", "b1"), env(4, 400, "b", None, "d")]
    late = [env(5, 200, "a", "v2-late", "u"),   # lands BETWEEN lsn1 and lsn2
            env(6, 500, "a", "v4", "u")]
    t_early = pa.Table.from_pylist(early, schema=schema)
    t_late = pa.Table.from_pylist(late, schema=schema)

    clog = ChangeLog(str(tmp_path / "clog"))
    clog.write_segments(t_early, segment_rows=10)
    h = HistoryTable(str(tmp_path / "hist"), num_partitions=2)
    h.replay(clog)
    assert h.read_arrow().num_rows == 4

    clog.write_segments(t_late, segment_rows=10)
    h.replay(clog)
    full = pa.concat_tables([t_early, t_late])
    _assert_history_equals(h, full)
    got = h.read_arrow().to_pandas()
    a = got[got.conv_id == "a"].reset_index(drop=True)
    # the late v2 closed at v3's start, and v1 now closes at v2
    assert a.loc[0, "text"] == "v1" and a.loc[0, "valid_to_lsn"] == 5
    assert a.loc[1, "text"] == "v2-late" and a.loc[1, "valid_to_lsn"] == 2
    assert a.loc[2, "text"] == "v3" and a.loc[3, "is_current"]
    # deleted key b: history retained, nothing current
    b = got[got.conv_id == "b"]
    assert len(b) == 2 and not b["is_current"].any()

    # duplicate delivery: a fresh changelog dir re-serving an old segment
    dup = ChangeLog(str(tmp_path / "clog2"))
    dup.write_segments(pa.concat_tables([t_early, t_late]), segment_rows=10)
    h2 = HistoryTable(str(tmp_path / "hist2"), num_partitions=2)
    h2.replay(dup)
    h2.replay(dup)  # watermark no-op
    # same events via a SECOND physical delivery inside one epoch
    shutil.rmtree(str(tmp_path / "hist3"), ignore_errors=True)
    both = ChangeLog(str(tmp_path / "clog3"))
    both.write_segments(pa.concat_tables([t_early, t_late, t_early]), segment_rows=100)
    h3 = HistoryTable(str(tmp_path / "hist3"), num_partitions=2)
    h3.replay(both)
    _assert_history_equals(h3, full)


@pytest.mark.usefixtures("ray_session")
def test_history_asof_snapshot_matches_replay_oracle(tmp_path):
    """snapshot_asof(T) == plain-Python LWW replay of the events with
    ts <= T, for several T including exact event-ts boundaries."""
    log = generate_changelog(
        GenConfig(num_events=3000, num_conversations=30, seed=5,
                  delete_frac=0.1, out_of_order=True)
    )
    clog = ChangeLog(str(tmp_path / "clog"))
    clog.write_segments(log, segment_rows=400)
    h = HistoryTable(str(tmp_path / "hist"), num_partitions=4)
    h.replay(clog, segments_per_epoch=2)

    ts_sorted = sorted(log.column("ts").to_pylist())
    for q in (0.25, 0.5, 0.9, 1.0):
        cut = ts_sorted[min(len(ts_sorted) - 1, int(q * len(ts_sorted)))]
        snap = {
            (r["conv_id"], r["turn_idx"]): r
            for b in h.snapshot_asof(cut).iter_batches(batch_format="pyarrow")
            for r in b.to_pylist()
        }
        sub = log.filter(pc.less_equal(log.column("ts"), pa.scalar(cut, pa.timestamp("us"))))
        oracle = oracle_replay(sub)
        assert len(snap) == len(oracle), q
        for k, o in oracle.items():
            assert snap[k]["text"] == o["text"], (q, k)

    # before the first event: empty, schema intact
    t0 = ts_sorted[0] - pd.Timedelta(seconds=1)
    empty = h.snapshot_asof(t0)
    assert empty.count() == 0
    assert set(empty.schema().names) == {"conv_id", "turn_idx", "role", "text", "tool", "ts"}


@pytest.mark.usefixtures("ray_session")
def test_history_tail_and_compaction(tmp_path):
    """Tail a growing changelog with compaction cycles (compact_every=2):
    the folded partitions still reproduce the exact interval table."""
    log = generate_changelog(
        GenConfig(num_events=4000, num_conversations=25, seed=31, delete_frac=0.05)
    )
    clog = ChangeLog(str(tmp_path / "clog"))
    h = HistoryTable(str(tmp_path / "hist"), num_partitions=4, compact_every=2)
    n = log.num_rows
    for lo in (0, n // 3, 2 * n // 3):
        hi = min(n, lo + n // 3 + (n % 3 > 0))
        clog.write_segments(log.slice(lo, hi - lo), segment_rows=300)
        h.tail(clog, poll_s=0, idle_stop_polls=1, segments_per_epoch=2)
    _assert_history_equals(h, log.slice(0, (2 * n // 3) + (n - 2 * n // 3)))
    assert h.fsck()["ok"]


def test_history_spec_guards():
    from etl_framework_ray.state.schema import ColumnSpec, TableSpec

    with pytest.raises(ValueError, match="reserved"):
        history_spec(TableSpec(
            name="x",
            columns=(ColumnSpec("id", pa.string(), nullable=False),
                     ColumnSpec("change_op", pa.string()),
                     ColumnSpec("ts", pa.timestamp("us"), nullable=False)),
            primary_key=("id",),
        ))
    with pytest.raises(ValueError, match="event-time"):
        history_spec(TableSpec(
            name="y",
            columns=(ColumnSpec("id", pa.string(), nullable=False),),
            primary_key=("id",),
        ))
