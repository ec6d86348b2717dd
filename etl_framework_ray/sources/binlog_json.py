"""Debezium-style JSON binlog → changelog-segment converter.

Real CDC feeds arrive as JSON-lines envelopes (the shape Debezium and
most connector ecosystems publish — Kleppmann-style change events with
``op``, ``ts_ms``, ``before``/``after`` row images, and a ``source``
block carrying the WAL position):

    {"op": "c", "ts_ms": 1700000000123,
     "before": null, "after": {"conv_id": "c1", "turn_idx": 0, ...},
     "source": {"lsn": 4711}}

This module converts a directory of such JSONL files into the engine's
parquet changelog segments (``sources/changelog.py`` naming, the
engine's ``(lsn, op, ts, *payload)`` envelope) so ``CDCEngine.replay``
/ ``tail`` consume a standard feed unchanged. The reference's analogue
is the raw-file bronze ingest (/root/reference/src/bronze/ingest.py:
28-55); here the conversion itself is distributed — one Ray task per
input file, pyarrow's JSON reader with an EXPLICIT schema (no
per-block inference drift), all column work in Arrow kernels.

Op mapping: ``c``/``r`` (create/snapshot-read) → ``I``, ``u`` → ``U``,
``d`` → ``D``. Deletes take their row image from ``before`` (Debezium
deletes carry no ``after``), which gives the tombstone its key columns.

LSN assignment: ``lsn_field="lsn"`` trusts ``source.lsn`` (uniqueness
is validated per file; cross-file overlap is tolerated — replay's LWW
is idempotent for duplicate (ts,lsn) deliveries — but segment-name
collisions fail loud rather than overwrite). ``lsn_field=None``
assigns dense LSNs by (file order, line order): a parallel
newline-count pass sizes each file, the driver prefix-sums the
offsets, and conversion tasks stamp ``lsn_start + row_index`` — no
cross-task coordination.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from .changelog import ChangeLog

_OPS_IN = ("c", "r", "u", "d")
_OPS_OUT = ("I", "I", "U", "D")


def _envelope_schema(payload: pa.Schema, ts_field: str, lsn_field: str | None) -> pa.Schema:
    row = pa.struct([pa.field(f.name, f.type) for f in payload])
    fields = [
        pa.field("op", pa.string()),
        pa.field(ts_field, pa.int64()),
        pa.field("before", row),
        pa.field("after", row),
    ]
    if lsn_field:
        fields.append(pa.field("source", pa.struct([pa.field(lsn_field, pa.int64())])))
    return pa.schema(fields)


def _count_lines(path: str) -> int:
    """JSONL rows = newline count (+1 for an unterminated last line)."""
    n = 0
    last = b"\n"
    with open(path, "rb") as f:
        while True:
            buf = f.read(1 << 22)
            if not buf:
                break
            n += buf.count(b"\n")
            last = buf[-1:]
    if last != b"\n":
        n += 1
    return n


@ray.remote
def _count_lines_task(path: str) -> int:
    return _count_lines(path)


@ray.remote
def _convert_file_task(
    path: str,
    out_dir: str,
    payload_types_ser: bytes,
    ts_field: str,
    lsn_field: str | None,
    lsn_start: int,
    segment_rows: int,
) -> list:
    """Convert ONE JSONL file into changelog segment(s). Returns the
    written paths. Arrow kernels only — no per-row Python."""
    pa.set_cpu_count(1)  # the task pool owns parallelism, not Arrow
    from pyarrow import json as pj

    payload = pa.ipc.read_schema(pa.BufferReader(payload_types_ser))
    explicit = _envelope_schema(payload, ts_field, lsn_field)
    try:
        t = pj.read_json(
            path,
            parse_options=pj.ParseOptions(explicit_schema=explicit),
            read_options=pj.ReadOptions(block_size=1 << 24),
        )
    except pa.ArrowInvalid as e:
        raise ValueError(f"{path}: not parseable as JSONL change envelopes: {e}") from e
    if t.num_rows == 0:
        return []
    t = t.combine_chunks()

    # op: c/r -> I, u -> U, d -> D; anything else fails loud
    idx = pc.index_in(t.column("op"), pa.array(_OPS_IN))
    if idx.null_count:
        bad = pc.unique(t.column("op").filter(pc.is_null(idx)))
        raise ValueError(f"{path}: unknown op values {bad.to_pylist()}")
    op = pc.take(pa.array(_OPS_OUT), idx)

    ts = pc.multiply(t.column(ts_field), pa.scalar(1000, pa.int64())).cast(
        pa.timestamp("us")
    )
    if ts.null_count:
        raise ValueError(f"{path}: {ts.null_count} rows missing {ts_field}")

    if lsn_field:
        lsn = pc.struct_field(t.column("source"), lsn_field)
        if lsn.null_count:
            raise ValueError(f"{path}: {lsn.null_count} rows missing source.{lsn_field}")
        if len(pc.unique(lsn)) != t.num_rows:
            raise ValueError(f"{path}: duplicate source.{lsn_field} values within file")
        lsn = lsn.cast(pa.int64())
    else:
        import numpy as np

        lsn = pa.array(np.arange(lsn_start, lsn_start + t.num_rows, dtype=np.int64))

    # row image: after, except deletes read before (Debezium deletes have
    # no after); one vectorized if_else per payload column
    is_del = pc.equal(op, "D")
    before, after = t.column("before"), t.column("after")
    cols = {"lsn": lsn, "op": op, "ts": ts}
    for f in payload:
        cols[f.name] = pc.if_else(
            is_del, pc.struct_field(before, f.name), pc.struct_field(after, f.name)
        )
    out = pa.table(cols)

    paths = []
    for start in range(0, out.num_rows, segment_rows):
        chunk = out.slice(start, segment_rows)
        lo = pc.min(chunk.column("lsn")).as_py()
        hi = pc.max(chunk.column("lsn")).as_py()
        seg = os.path.join(out_dir, f"segment-{lo:012d}-{hi:012d}.parquet")
        if os.path.exists(seg):
            raise FileExistsError(
                f"segment LSN range collision at {os.path.basename(seg)} "
                f"(source LSNs overlap across input files?)"
            )
        tmp = f"{seg}.tmp-{os.getpid()}"
        pq.write_table(chunk, tmp)
        os.replace(tmp, seg)
        paths.append(seg)
    return paths


def convert_json_binlog(
    src: str | list[str],
    out_dir: str,
    payload_schema: pa.Schema,
    ts_field: str = "ts_ms",
    lsn_field: str | None = "lsn",
    segment_rows: int = 500_000,
) -> ChangeLog:
    """Convert JSONL change envelopes under ``src`` (a directory or an
    explicit file list) into a :class:`ChangeLog` at ``out_dir``. One
    Ray task per input file; idempotent per segment name (re-running on
    the same input fails loud on collision rather than double-writing).
    Returns the ChangeLog, ready for ``CDCEngine.replay``."""
    if isinstance(src, str):
        files = sorted(
            os.path.join(src, f)
            for f in os.listdir(src)
            if f.endswith((".jsonl", ".json", ".ndjson"))
        )
    else:
        files = list(src)
    if not files:
        raise FileNotFoundError(f"no JSONL files under {src!r}")
    clog = ChangeLog(out_dir)  # creates out_dir

    starts = [0] * len(files)
    if lsn_field is None:
        counts = ray.get([_count_lines_task.remote(f) for f in files])
        acc = 1  # engine LSNs are 1-based
        for i, c in enumerate(counts):
            starts[i] = acc
            acc += c

    ser = payload_schema.serialize().to_pybytes()
    ray.get(
        [
            _convert_file_task.remote(
                f,
                out_dir,
                ser,
                ts_field,
                lsn_field,
                starts[i],
                segment_rows,
            )
            for i, f in enumerate(files)
        ]
    )
    return clog
