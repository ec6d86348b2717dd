"""Unit tests for the vectorized LWW reduction (stages/lww.py). No Ray."""

import pyarrow as pa

from etl_framework_ray.stages.lww import lww_reduce


def _tbl(rows):
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                pa.field("conv_id", pa.string()),
                pa.field("turn_idx", pa.int32()),
                pa.field("ts", pa.int64()),
                pa.field("lsn", pa.int64()),
                pa.field("text", pa.string()),
            ]
        ),
    )


def test_keeps_latest_by_ts_then_lsn():
    t = _tbl(
        [
            {"conv_id": "a", "turn_idx": 0, "ts": 100, "lsn": 1, "text": "v1"},
            {"conv_id": "a", "turn_idx": 0, "ts": 200, "lsn": 2, "text": "v2"},
            {"conv_id": "a", "turn_idx": 0, "ts": 200, "lsn": 3, "text": "v3"},  # tie → lsn
            {"conv_id": "b", "turn_idx": 0, "ts": 50, "lsn": 4, "text": "b0"},
        ]
    )
    out = lww_reduce(t).to_pylist()
    assert {(r["conv_id"], r["turn_idx"]): r["text"] for r in out} == {
        ("a", 0): "v3",
        ("b", 0): "b0",
    }


def test_out_of_order_input_converges():
    rows = [
        {"conv_id": "a", "turn_idx": i % 3, "ts": 1000 + j, "lsn": j, "text": f"t{j}"}
        for j, i in enumerate([0, 1, 2, 0, 1, 2, 0, 0, 1])
    ]
    fwd = lww_reduce(_tbl(rows))
    rev = lww_reduce(_tbl(list(reversed(rows))))
    assert fwd.sort_by("turn_idx").to_pylist() == rev.sort_by("turn_idx").to_pylist()


def test_distinct_keys_untouched():
    rows = [
        {"conv_id": f"c{i}", "turn_idx": 0, "ts": 1, "lsn": i, "text": "x"} for i in range(10)
    ]
    assert lww_reduce(_tbl(rows)).num_rows == 10


def test_empty_and_single():
    assert lww_reduce(_tbl([])).num_rows == 0
    assert lww_reduce(_tbl([{"conv_id": "a", "turn_idx": 0, "ts": 1, "lsn": 1, "text": "x"}])).num_rows == 1
