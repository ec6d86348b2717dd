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
``d`` → ``D``, ``p`` (partial image — Mongo patch-style updates where
``after`` carries ONLY the changed columns, absent/null = unchanged) →
``P`` (resolved at apply time by the engine's patch fold,
pipelines/cdc._fold_epoch_patches). Deletes take their row image from
``before`` (Debezium deletes carry no ``after``), which gives the
tombstone its key columns.

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

_OPS_IN = ("c", "r", "u", "d", "p")
_OPS_OUT = ("I", "I", "U", "D", "P")


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
    claimed: dict,
    on_error: str = "raise",
) -> dict:
    """Convert ONE JSONL file into changelog segment(s). Returns
    ``{"paths": [...], "quarantined": n}``. Arrow kernels only on the
    happy path — the per-line fallback runs ONLY for a file the batch
    parser rejects. ``claimed`` maps already-written segment basenames
    to their source feed file: a target claimed by ANOTHER source fails
    loud (LSN overlap), while an unclaimed existing target is this
    source's own crash residue and is deterministically overwritten.
    ``on_error="quarantine"``: lines the parser rejects — and rows that
    parse but fail envelope validation (unknown ``op``, missing ts,
    missing/duplicate LSN) — go verbatim to a dead-letter file under
    ``out_dir/_dlq/`` and the rest convert."""
    from ..pipelines.cdc import _single_threaded_arrow

    _single_threaded_arrow()  # the task pool owns parallelism, not Arrow
    import numpy as np
    from pyarrow import json as pj

    payload = pa.ipc.read_schema(pa.BufferReader(payload_types_ser))
    explicit = _envelope_schema(payload, ts_field, lsn_field)

    def parse(source):
        return pj.read_json(
            source,
            parse_options=pj.ParseOptions(explicit_schema=explicit),
            read_options=pj.ReadOptions(block_size=1 << 24),
        )

    # row i of the parsed table is non-empty line i of the file — kept
    # lazily so verbatim DLQ extraction never reads a clean file twice
    lines_src: list[bytes] | None = None
    bad_lines: list[bytes] = []
    try:
        t = parse(path)
    except pa.ArrowInvalid as e:
        if on_error != "quarantine":
            raise ValueError(
                f"{path}: not parseable as JSONL change envelopes: {e} "
                "(on_error='quarantine' dead-letters bad lines instead)"
            ) from e
        # slow path, corrupt files only: per-line parse, bad lines verbatim
        # to the DLQ, good lines re-batched through the same Arrow parser
        good: list[bytes] = []
        with open(path, "rb") as fh:
            for line in fh:
                s = line.strip()
                if not s:
                    continue
                try:
                    parse(pa.BufferReader(s))
                    good.append(s)
                except pa.ArrowInvalid:
                    bad_lines.append(line.rstrip(b"\n"))
        lines_src = good
        t = parse(pa.BufferReader(b"\n".join(good))) if good else explicit.empty_table()

    if on_error == "quarantine" and t.num_rows:
        # envelope validation as a vectorized reject mask — the strict
        # checks below then run on survivors only (and still fail loud
        # on anything this mask missed)
        rej = pc.is_null(pc.index_in(t.column("op"), pa.array(_OPS_IN)))
        rej = pc.or_kleene(rej, pc.is_null(t.column(ts_field)))
        if lsn_field:
            lsn_raw = pc.struct_field(t.column("source"), lsn_field)
            rej = pc.or_kleene(rej, pc.is_null(lsn_raw))
            # duplicate source LSNs within the file: first wins, rest DLQ
            lv = lsn_raw.fill_null(-1).to_numpy(zero_copy_only=False)
            _, first_idx = np.unique(lv, return_index=True)
            dup = np.ones(len(lv), dtype=bool)
            dup[first_idx] = False
            rej = pc.or_kleene(rej, pa.array(dup))
        rej = rej.fill_null(True).to_numpy(zero_copy_only=False)
        bad_idx = np.flatnonzero(rej)
        if len(bad_idx):
            if lines_src is None:
                with open(path, "rb") as fh:
                    lines_src = [ln.rstrip(b"\n") for ln in fh if ln.strip()]
            bad_lines.extend(lines_src[i] for i in bad_idx)
            t = t.filter(pa.array(~rej))
    n_bad = len(bad_lines)
    if n_bad:
        dlq_dir = os.path.join(out_dir, "_dlq")
        os.makedirs(dlq_dir, exist_ok=True)
        dlq = os.path.join(dlq_dir, os.path.basename(path))
        tmp = f"{dlq}.tmp-{os.getpid()}"
        with open(tmp, "wb") as fh:
            fh.write(b"\n".join(bad_lines) + b"\n")
        os.replace(tmp, dlq)

    if t.num_rows == 0:
        return {"paths": [], "quarantined": n_bad}
    t = t.combine_chunks()

    # op: c/r -> I, u -> U, d -> D, p -> P; anything else fails loud
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

    src_base = os.path.basename(path)
    paths = []
    for start in range(0, out.num_rows, segment_rows):
        chunk = out.slice(start, segment_rows)
        lo = pc.min(chunk.column("lsn")).as_py()
        hi = pc.max(chunk.column("lsn")).as_py()
        seg = os.path.join(out_dir, f"segment-{lo:012d}-{hi:012d}.parquet")
        owner = claimed.get(os.path.basename(seg))
        if owner is not None and owner != src_base:
            raise FileExistsError(
                f"segment LSN range collision: {os.path.basename(seg)} already "
                f"written from feed file {owner!r} (source LSNs overlap across "
                "input files?)"
            )
        # an UNCLAIMED existing file is crash residue of THIS source's
        # previous attempt — the conversion is deterministic, so the
        # overwrite is a byte-identical no-op
        tmp = f"{seg}.tmp-{os.getpid()}"
        pq.write_table(chunk, tmp)
        os.replace(tmp, seg)
        paths.append(seg)
    return {"paths": paths, "quarantined": n_bad}


def _load_markers(out_dir: str) -> dict:
    """{feed basename: marker dict} for already-converted feed files."""
    import json

    d = os.path.join(out_dir, "_ingested")
    marks = {}
    if os.path.isdir(d):
        for name in os.listdir(d):
            if name.endswith(".json"):
                with open(os.path.join(d, name)) as f:
                    marks[name[: -len(".json")]] = json.load(f)
    return marks


def convert_json_binlog(
    src: str | list[str],
    out_dir: str,
    payload_schema: pa.Schema,
    ts_field: str = "ts_ms",
    lsn_field: str | None = "lsn",
    segment_rows: int = 500_000,
    allow_empty: bool = False,
    on_error: str = "raise",
) -> ChangeLog:
    """Convert JSONL change envelopes under ``src`` (a directory or an
    explicit file list) into a :class:`ChangeLog` at ``out_dir``. One
    Ray task per input file. INCREMENTAL and crash-idempotent: each
    converted feed file gets a marker under ``out_dir/_ingested/`` (the
    commit point — written AFTER its segments land atomically), already-
    marked files are skipped, and a rerun after a crash deterministically
    rewrites the unmarked file's segments. Dense LSN assignment
    continues from the highest previously assigned LSN, so a growing
    feed keeps a monotone log. ``on_error="quarantine"`` dead-letters
    parser-rejected lines under ``out_dir/_dlq/<feed file>`` instead of
    failing the file (default ``"raise"``). Returns the ChangeLog, ready
    for ``CDCEngine.replay`` / ``tail``."""
    import json

    if on_error not in ("raise", "quarantine"):
        raise ValueError(f"on_error must be 'raise' or 'quarantine', got {on_error!r}")

    if isinstance(src, str):
        files = sorted(
            os.path.join(src, f)
            for f in (os.listdir(src) if os.path.isdir(src) else [])
            if f.endswith((".jsonl", ".json", ".ndjson"))
        )
        if not os.path.isdir(src) and not allow_empty:
            raise FileNotFoundError(f"feed directory {src!r} does not exist")
    else:
        files = list(src)
    clog = ChangeLog(out_dir)  # creates out_dir
    marks = _load_markers(out_dir)
    todo = [f for f in files if os.path.basename(f) not in marks]
    if not files and not allow_empty:
        raise FileNotFoundError(f"no JSONL files under {src!r}")
    if not todo:
        return clog

    starts = [0] * len(todo)
    if lsn_field is None:
        counts = ray.get([_count_lines_task.remote(f) for f in todo])
        acc = 1 + max((int(m.get("lsn_end", 0)) for m in marks.values()), default=0)
        for i, c in enumerate(counts):
            starts[i] = acc
            acc += c

    claimed = {
        os.path.basename(seg): src_base
        for src_base, m in marks.items()
        for seg in m.get("segments", [])
    }
    ser = payload_schema.serialize().to_pybytes()
    task_out = ray.get(
        [
            _convert_file_task.remote(
                f,
                out_dir,
                ser,
                ts_field,
                lsn_field,
                starts[i],
                segment_rows,
                claimed,
                on_error,
            )
            for i, f in enumerate(todo)
        ]
    )
    results = [r["paths"] for r in task_out]
    # cross-file overlap WITHIN this batch (two unmarked files claiming
    # the same range) cannot be caught per-task — detect before marking,
    # so a rerun keeps failing loud instead of silently marking one
    seen: dict[str, str] = dict(claimed)
    for f, paths in zip(todo, results):
        for p in paths:
            b = os.path.basename(p)
            if b in seen and seen[b] != os.path.basename(f):
                raise FileExistsError(
                    f"segment LSN range collision between feed files "
                    f"{seen[b]!r} and {os.path.basename(f)!r} at {b}"
                )
            seen[b] = os.path.basename(f)
    marks_dir = os.path.join(out_dir, "_ingested")
    os.makedirs(marks_dir, exist_ok=True)
    for i, (f, paths) in enumerate(zip(todo, results)):
        lsn_end = 0
        if lsn_field is None and paths:
            lsn_end = max(int(os.path.basename(p).split("-")[2][:12]) for p in paths)
        mark = {
            "segments": paths,
            "lsn_end": lsn_end,
            "quarantined": int(task_out[i]["quarantined"]),
        }
        mp = os.path.join(marks_dir, f"{os.path.basename(f)}.json")
        tmp = f"{mp}.tmp-{os.getpid()}"
        with open(tmp, "w") as fh:
            json.dump(mark, fh)
        os.replace(tmp, mp)
    return clog


def dlq_stats(out_dir: str) -> dict:
    """Never-silent quarantine accounting for a converted changelog dir:
    ``{"lines": total dead-lettered, "files": {feed basename: count}}``,
    read from the per-file ingestion markers. The verbatim rejected
    lines themselves live under ``out_dir/_dlq/<feed basename>`` for
    repair-and-replay."""
    marks = _load_markers(out_dir)
    files = {
        base: int(m.get("quarantined", 0))
        for base, m in marks.items()
        if m.get("quarantined")
    }
    return {"lines": sum(files.values()), "files": files}


class JsonBinlogFeed(ChangeLog):
    """A ChangeLog view over a LIVE directory of JSONL change envelopes:
    every ``segments()`` call first converts any newly arrived feed
    files (incremental, marker-tracked — see :func:`convert_json_binlog`)
    and then lists the parquet segments. Plug it straight into
    ``CDCEngine.tail`` for the continuous "follow a standard CDC feed"
    deployment shape: each poll converts the new feed files, then
    applies them exactly-once like any other epoch batch."""

    def __init__(
        self,
        src_dir: str,
        out_dir: str,
        payload_schema: pa.Schema,
        ts_field: str = "ts_ms",
        lsn_field: str | None = "lsn",
        segment_rows: int = 500_000,
        on_error: str = "raise",
    ):
        super().__init__(out_dir)
        self.src_dir = src_dir
        self.payload_schema = payload_schema
        self.ts_field = ts_field
        self.lsn_field = lsn_field
        self.segment_rows = segment_rows
        self.on_error = on_error

    def segments(self):
        convert_json_binlog(
            self.src_dir,
            self.log_dir,
            self.payload_schema,
            ts_field=self.ts_field,
            lsn_field=self.lsn_field,
            segment_rows=self.segment_rows,
            allow_empty=True,  # a quiet feed is an idle poll, not an error
            on_error=self.on_error,
        )
        return super().segments()
