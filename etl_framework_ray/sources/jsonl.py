"""JSONL (newline-delimited JSON) source/sink — the interchange format of
document/corpus pipelines (one JSON object per line, gzip-friendly,
append-only). Extends the bronze layer beyond the reference's CSV-only
ingest (/root/reference/src/bronze/ingest.py:28-55) with the same
freeze-inferred-schema contract.

- ``read_jsonl``: ``ray.data.read_json`` with column pruning applied
  AFTER the read (Arrow's JSON reader parses whole lines; unlike parquet
  there is no footer to prune against — documented cost).
- ``ingest_jsonl_directory``: glob → one lake table per file stem via the
  gated writer path, schema frozen like the CSV bronze.
- ``write_jsonl``: partitioned newline-JSON export of a Dataset (one
  file per block — resumable layout, never one giant file).
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import ray

from ..context import RunContext
from ..pipelines.writer import LakeWriter
from ..state.schema import TableSpec
from .csv import freeze_schema


def read_jsonl(path: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    """Read newline-delimited JSON file(s). ``columns`` projects after
    parsing (JSON has no column pruning at the byte level)."""
    ds = ray.data.read_json(path)
    if columns:
        ds = ds.select_columns(columns)
    return ds


def ingest_jsonl_directory(
    directory: str,
    lake_root: str,
    run_context: RunContext | None = None,
) -> dict[str, TableSpec]:
    """Ingest every ``*.jsonl`` under ``directory`` into
    ``lake_root/<stem>`` (bronze full-refresh semantics, schema frozen
    from inference — same contract as the CSV bronze)."""
    specs: dict[str, TableSpec] = {}
    for path in sorted(glob.glob(os.path.join(directory, "*.jsonl"))):
        stem = os.path.splitext(os.path.basename(path))[0]
        ds = read_jsonl(path)
        spec = freeze_schema(stem, ds.schema().base_schema)
        writer = LakeWriter(os.path.join(lake_root, stem), spec, run_context=run_context)
        writer.overwrite(ds)
        specs[stem] = spec
    return specs


def write_jsonl(ds: "ray.data.Dataset", out_dir: str) -> int:
    """Export a Dataset as partitioned JSONL (one ``part-*.json`` file
    per block — parallel writers, resumable layout). Returns rows
    written."""
    os.makedirs(out_dir, exist_ok=True)
    ds = ds.materialize()  # count from metadata after the single write pass
    ds.write_json(out_dir)
    return ds.count()
