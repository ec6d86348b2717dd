"""Debezium-style JSON binlog ingestion: envelope parsing, op mapping,
delete row images from ``before``, LSN assignment, and replay parity
with the engine's own changelog format."""

import json
import os

import pyarrow as pa
import pytest
import ray

from etl_framework_ray.pipelines.cdc import CDCEngine
from etl_framework_ray.sources.binlog_json import convert_json_binlog
from etl_framework_ray.sources.changelog import ChangeLog
from etl_framework_ray.sources.generator import (
    GenConfig,
    generate_changelog,
    oracle_replay,
)

PAYLOAD = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.large_string()),
        pa.field("tool", pa.string()),
    ]
)


def _to_envelopes(log: pa.Table, with_lsn: bool) -> list[str]:
    """Engine changelog rows -> Debezium-ish JSONL lines."""
    lines = []
    for r in log.to_pylist():
        row = {k: r[k] for k in PAYLOAD.names}
        ts_ms = int(r["ts"].timestamp() * 1000)
        if r["op"] == "D":
            env = {"op": "d", "ts_ms": ts_ms, "before": row, "after": None}
        elif r["op"] == "P":
            # Mongo patch-style partial image: after carries ONLY the
            # changed columns (absent = unchanged)
            part = {k: v for k, v in row.items() if v is not None}
            env = {"op": "p", "ts_ms": ts_ms, "before": None, "after": part}
        else:
            env = {
                "op": "c" if r["op"] == "I" else "u",
                "ts_ms": ts_ms,
                "before": None,
                "after": row,
            }
        if with_lsn:
            env["source"] = {"lsn": r["lsn"]}
        lines.append(json.dumps(env))
    return lines


def _write_feed(tmp_path, log: pa.Table, with_lsn: bool, n_files: int = 3) -> str:
    src = tmp_path / "feed"
    src.mkdir()
    lines = _to_envelopes(log, with_lsn)
    per = -(-len(lines) // n_files)
    for i in range(n_files):
        chunk = lines[i * per : (i + 1) * per]
        (src / f"feed-{i:03d}.jsonl").write_text("\n".join(chunk) + "\n")
    return str(src)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("with_lsn", [True, False], ids=["source-lsn", "dense-lsn"])
def test_binlog_replay_matches_oracle(tmp_path, with_lsn):
    """Full path: JSONL envelopes -> segments -> replay -> committed
    state equals the plain-Python oracle replay of the original log."""
    log = generate_changelog(
        GenConfig(num_events=3000, num_conversations=30, seed=11, delete_frac=0.08)
    )
    src = _write_feed(tmp_path, log, with_lsn)
    clog = convert_json_binlog(
        src,
        str(tmp_path / "clog"),
        PAYLOAD,
        lsn_field="lsn" if with_lsn else None,
        segment_rows=500,
    )
    eng = CDCEngine(str(tmp_path / "tbl"), num_partitions=4)
    eng.replay(clog, segments_per_epoch=2)
    got = eng.snapshot_arrow()
    # dense LSNs preserve file/line order == the original lsn order, and
    # the generator's ts tie-break keys match either way
    oracle = oracle_replay(log)
    assert got.num_rows == len(oracle)
    for r in got.to_pylist():
        o = oracle[(r["conv_id"], r["turn_idx"])]
        assert r["text"] == o["text"] and r["role"] == o["role"]


@pytest.mark.usefixtures("ray_session")
def test_binlog_patch_envelopes_replay_matches_oracle(tmp_path):
    """Mongo patch-style partial images (op='p', after = changed columns
    only) flow through the converter as op='P' and resolve via the
    engine's patch fold — final state equals the oracle fold."""
    log = generate_changelog(
        GenConfig(
            num_events=3000, num_conversations=30, seed=13, patch_frac=0.3
        )
    )
    src = _write_feed(tmp_path, log, with_lsn=True)
    clog = convert_json_binlog(
        src, str(tmp_path / "clog"), PAYLOAD, lsn_field="lsn", segment_rows=500
    )
    eng = CDCEngine(str(tmp_path / "tbl"), num_partitions=4)
    eng.replay(clog, segments_per_epoch=2)
    got = eng.snapshot_arrow()
    oracle = oracle_replay(log)
    assert got.num_rows == len(oracle)
    for r in got.to_pylist():
        o = oracle[(r["conv_id"], r["turn_idx"])]
        assert r["text"] == o["text"] and r["role"] == o["role"] and r["tool"] == o["tool"]


@pytest.mark.usefixtures("ray_session")
def test_binlog_segment_shape_and_ops(tmp_path):
    env = [
        {"op": "c", "ts_ms": 1000, "before": None,
         "after": {"conv_id": "a", "turn_idx": 0, "role": "user", "text": "hi", "tool": None},
         "source": {"lsn": 1}},
        {"op": "u", "ts_ms": 2000, "before": None,
         "after": {"conv_id": "a", "turn_idx": 0, "role": "user", "text": "hi2", "tool": None},
         "source": {"lsn": 2}},
        {"op": "d", "ts_ms": 3000,
         "before": {"conv_id": "a", "turn_idx": 0, "role": None, "text": None, "tool": None},
         "after": None, "source": {"lsn": 3}},
        {"op": "r", "ts_ms": 1500, "before": None,
         "after": {"conv_id": "b", "turn_idx": 1, "role": "assistant", "text": "yo", "tool": "t"},
         "source": {"lsn": 4}},
    ]
    src = tmp_path / "feed"
    src.mkdir()
    (src / "f.jsonl").write_text("\n".join(json.dumps(e) for e in env))
    clog = convert_json_binlog(str(src), str(tmp_path / "clog"), PAYLOAD)
    segs = clog.segments()
    assert len(segs) == 1 and segs[0].min_lsn == 1 and segs[0].max_lsn == 4
    import pyarrow.parquet as pq

    t = pq.read_table(segs[0].path)
    by_lsn = {r["lsn"]: r for r in t.to_pylist()}
    assert [by_lsn[i]["op"] for i in (1, 2, 3, 4)] == ["I", "U", "D", "I"]
    assert by_lsn[3]["conv_id"] == "a" and by_lsn[3]["text"] is None  # before image
    assert by_lsn[1]["ts"].timestamp() == 1.0  # ms -> us
    # replay lands the delete: only conv b survives
    eng = CDCEngine(str(tmp_path / "tbl"), num_partitions=2)
    eng.replay(clog, segments_per_epoch=1)
    snap = eng.snapshot_arrow()
    assert snap.column("conv_id").to_pylist() == ["b"]


@pytest.mark.usefixtures("ray_session")
def test_binlog_error_paths(tmp_path):
    src = tmp_path / "feed"
    src.mkdir()
    (src / "bad_op.jsonl").write_text(
        json.dumps({"op": "x", "ts_ms": 1, "before": None,
                    "after": {"conv_id": "a", "turn_idx": 0, "role": None,
                              "text": None, "tool": None},
                    "source": {"lsn": 1}})
    )
    with pytest.raises(Exception, match="unknown op"):
        convert_json_binlog(str(src), str(tmp_path / "c1"), PAYLOAD)
    (src / "bad_op.jsonl").unlink()
    dup = {"op": "c", "ts_ms": 1, "before": None,
           "after": {"conv_id": "a", "turn_idx": 0, "role": None, "text": None,
                     "tool": None},
           "source": {"lsn": 7}}
    (src / "dup.jsonl").write_text(json.dumps(dup) + "\n" + json.dumps(dup))
    with pytest.raises(Exception, match="duplicate source"):
        convert_json_binlog(str(src), str(tmp_path / "c2"), PAYLOAD)
    with pytest.raises(FileNotFoundError):
        convert_json_binlog(str(tmp_path / "nope_dir_missing"), str(tmp_path / "c3"), PAYLOAD)


@pytest.mark.usefixtures("ray_session")
def test_binlog_quarantine_dead_letters_bad_lines(tmp_path):
    """on_error='quarantine': parser-rejected lines and semantically bad
    envelopes (unknown op, missing ts, duplicate lsn) go VERBATIM to
    OUT/_dlq/<feed file>, the good rows convert and replay, counts land
    in the markers, and a rerun skips the already-handled file."""
    from etl_framework_ray.sources.binlog_json import dlq_stats

    def env(lsn, conv, **kw):
        e = {"op": "c", "ts_ms": 1000 + lsn, "before": None,
             "after": {"conv_id": conv, "turn_idx": 0, "role": "user",
                       "text": f"t{lsn}", "tool": None},
             "source": {"lsn": lsn}}
        e.update(kw)
        return json.dumps(e)

    src = tmp_path / "feed"
    src.mkdir()
    bad_syntax = '{"op": "c", this is not json'
    bad_op = env(90, "zz", op="x")
    bad_ts = env(91, "zz", ts_ms=None)
    dup_lsn = env(2, "dup")  # lsn 2 repeats a good line's lsn: first wins
    (src / "mixed.jsonl").write_text(
        "\n".join([env(1, "a"), bad_syntax, env(2, "b"), bad_op, bad_ts, dup_lsn]) + "\n"
    )
    (src / "clean.jsonl").write_text(env(10, "c") + "\n")

    # default mode fails loud and points at the escape hatch
    with pytest.raises(ValueError, match="quarantine"):
        convert_json_binlog(str(src), str(tmp_path / "strict"), PAYLOAD)

    out = tmp_path / "clog"
    clog = convert_json_binlog(str(src), str(out), PAYLOAD, on_error="quarantine")
    eng = CDCEngine(str(tmp_path / "tbl"), num_partitions=2)
    eng.replay(clog, segments_per_epoch=8)
    assert sorted(eng.snapshot_arrow().column("conv_id").to_pylist()) == ["a", "b", "c"]

    # verbatim dead letters, only for the corrupt file
    dlq = (out / "_dlq" / "mixed.jsonl").read_text().splitlines()
    assert dlq == [bad_syntax, bad_op, bad_ts, dup_lsn]
    assert not (out / "_dlq" / "clean.jsonl").exists()
    assert dlq_stats(str(out)) == {"lines": 4, "files": {"mixed.jsonl": 4}}

    # idempotent: the rerun re-converts nothing and keeps the counts
    clog2 = convert_json_binlog(str(src), str(out), PAYLOAD, on_error="quarantine")
    assert len(clog2.segments()) == len(clog.segments())
    assert dlq_stats(str(out))["lines"] == 4

    with pytest.raises(ValueError, match="on_error"):
        convert_json_binlog(str(src), str(tmp_path / "c9"), PAYLOAD, on_error="ignore")


@pytest.mark.usefixtures("ray_session")
def test_binlog_quarantine_all_bad_file_and_dense_lsn(tmp_path):
    """An entirely-corrupt feed file dead-letters whole (zero segments,
    marker still written so the follower never retries it), and dense-LSN
    assignment stays monotone across later clean arrivals."""
    from etl_framework_ray.sources.binlog_json import dlq_stats

    def env(conv, i):
        return json.dumps({"op": "c", "ts_ms": 1000 + i, "before": None,
                           "after": {"conv_id": conv, "turn_idx": i, "role": "u",
                                     "text": "t", "tool": None}})

    src = tmp_path / "feed"
    src.mkdir()
    (src / "a-good.jsonl").write_text("\n".join(env("a", i) for i in range(3)) + "\n")
    (src / "b-rot.jsonl").write_text("not json at all\n\x00\x01 garbage\n")
    out = tmp_path / "clog"
    clog = convert_json_binlog(
        str(src), str(out), PAYLOAD, lsn_field=None, on_error="quarantine"
    )
    assert dlq_stats(str(out)) == {"lines": 2, "files": {"b-rot.jsonl": 2}}
    # a later arrival continues the dense LSN sequence past the hole
    (src / "c-late.jsonl").write_text(env("c", 0) + "\n")
    clog = convert_json_binlog(
        str(src), str(out), PAYLOAD, lsn_field=None, on_error="quarantine"
    )
    import pyarrow.parquet as pq

    lsns = []
    for seg in clog.segments():
        lsns += pq.read_table(seg.path, columns=["lsn"]).column("lsn").to_pylist()
    assert len(lsns) == len(set(lsns)) == 4  # 3 good + 1 late, no overlap
    eng = CDCEngine(str(tmp_path / "tbl"), num_partitions=2)
    eng.replay(clog, segments_per_epoch=8)
    assert eng.snapshot_arrow().num_rows == 4


@pytest.mark.usefixtures("ray_session")
def test_binlog_feed_follow_and_idempotence(tmp_path):
    """JsonBinlogFeed: tail converts newly arrived feed files per poll
    (marker-tracked), re-polls skip converted files, dense LSNs stay
    monotone across arrivals, and the final state equals the oracle."""
    from etl_framework_ray.sources.binlog_json import JsonBinlogFeed

    log = generate_changelog(GenConfig(num_events=2000, num_conversations=20, seed=3))
    lines = _to_envelopes(log, with_lsn=False)
    src = tmp_path / "feed"
    src.mkdir()
    feed = JsonBinlogFeed(str(src), str(tmp_path / "clog"), PAYLOAD, lsn_field=None)
    eng = CDCEngine(str(tmp_path / "tbl"), num_partitions=4)

    # poll 1: empty feed is an idle poll, not an error
    assert feed.segments() == []
    stats = eng.tail(feed, poll_s=0, idle_stop_polls=1, segments_per_epoch=2)
    assert stats.epochs_applied == 0

    # drip the feed in three arrivals; tail drains each
    third = len(lines) // 3
    for i, sl in enumerate([lines[:third], lines[third : 2 * third], lines[2 * third :]]):
        (src / f"arrival-{i:02d}.jsonl").write_text("\n".join(sl))
        eng.tail(feed, poll_s=0, idle_stop_polls=1, segments_per_epoch=2)

    oracle = oracle_replay(log)
    got = eng.snapshot_arrow()
    assert got.num_rows == len(oracle)
    for r in got.to_pylist():
        o = oracle[(r["conv_id"], r["turn_idx"])]
        assert r["text"] == o["text"]

    # idempotence: a fresh feed handle re-lists but never re-converts
    marks = (tmp_path / "clog" / "_ingested")
    mtimes = {p.name: p.stat().st_mtime_ns for p in marks.iterdir()}
    feed2 = JsonBinlogFeed(str(src), str(tmp_path / "clog"), PAYLOAD, lsn_field=None)
    segs = feed2.segments()
    assert {p.name: p.stat().st_mtime_ns for p in marks.iterdir()} == mtimes
    assert len(segs) > 0
    stats = eng.tail(feed2, poll_s=0, idle_stop_polls=1, segments_per_epoch=2)
    assert stats.epochs_applied == 0  # everything already committed


@pytest.mark.usefixtures("ray_session")
def test_binlog_feed_schema_evolution(tmp_path):
    """A new payload column appearing mid-feed: re-point the feed handle
    at the WIDENED schema — earlier arrivals' markers stand, new files
    parse old envelopes with nulls for the missing field, and replay
    evolves the lake schema (plan_evolution) like any other widening."""
    from etl_framework_ray.sources.binlog_json import JsonBinlogFeed

    src = tmp_path / "feed"
    src.mkdir()
    def env(lsn, conv, extra=None):
        after = {"conv_id": conv, "turn_idx": 0, "role": "user",
                 "text": f"t{lsn}", "tool": None}
        if extra is not None:
            after["lang"] = extra
        return json.dumps({"op": "c", "ts_ms": 1000 + lsn, "before": None,
                           "after": after, "source": {"lsn": lsn}})

    (src / "a.jsonl").write_text("\n".join(env(i, f"c{i}") for i in range(1, 6)))
    eng = CDCEngine(str(tmp_path / "tbl"), num_partitions=2)
    feed_v1 = JsonBinlogFeed(str(src), str(tmp_path / "clog"), PAYLOAD)
    eng.tail(feed_v1, poll_s=0, idle_stop_polls=1, segments_per_epoch=1)
    assert "lang" not in eng.snapshot_arrow().schema.names

    wide = pa.schema(list(PAYLOAD) + [pa.field("lang", pa.string())])
    (src / "b.jsonl").write_text(
        "\n".join(env(i, f"c{i}", extra="en") for i in range(6, 9))
        + "\n" + env(9, "c1")  # an old-shape envelope in the new file
    )
    feed_v2 = JsonBinlogFeed(str(src), str(tmp_path / "clog"), wide)
    eng.tail(feed_v2, poll_s=0, idle_stop_polls=1, segments_per_epoch=1)
    snap = eng.snapshot_arrow()
    assert "lang" in snap.schema.names
    by_conv = {r["conv_id"]: r for r in snap.to_pylist()}
    assert by_conv["c6"]["lang"] == "en"
    assert by_conv["c2"]["lang"] is None   # pre-evolution rows read as null
    assert by_conv["c1"]["lang"] is None   # old-shape envelope in new file
    assert by_conv["c1"]["text"] == "t9"   # and it still applied (LWW)
