"""Bronze CSV ingest: glob a directory, one lake table per file stem.

Port of the reference's bronze layer (/root/reference/src/bronze/ingest.py:
28-55): each ``*.csv`` is read with header + schema inference
(``ray.data.read_csv``), the inferred schema is frozen into a declarative
``TableSpec`` with every column nullable and no primary key
(ingest.py:20-25 freezes inferred fields into DeltaColumns), and the table
is overwritten in the lake through the gated writer path.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import ray

from ..context import RunContext
from ..pipelines.writer import LakeWriter
from ..state.schema import ColumnSpec, TableSpec


def freeze_schema(name: str, schema: pa.Schema) -> TableSpec:
    """Inferred Arrow schema → declarative bronze spec (all nullable, no
    PK — bronze keeps source shape; keys/rules are declared downstream)."""
    return TableSpec(
        name=name,
        columns=tuple(ColumnSpec(f.name, f.type, nullable=True) for f in schema),
        comment=f"bronze ingest of {name}.csv (schema inferred, frozen)",
    )


def ingest_directory(
    directory: str,
    lake_root: str,
    run_context: RunContext | None = None,
) -> dict[str, TableSpec]:
    """Ingest every ``*.csv`` under ``directory`` into ``lake_root/<stem>``.

    Returns the frozen spec per table. Re-running re-ingests (overwrite
    semantics — bronze is a full refresh of the raw zone).
    """
    specs: dict[str, TableSpec] = {}
    for path in sorted(glob.glob(os.path.join(directory, "*.csv"))):
        stem = os.path.splitext(os.path.basename(path))[0]
        ds = ray.data.read_csv(path)
        spec = freeze_schema(stem, ds.schema().base_schema)
        writer = LakeWriter(os.path.join(lake_root, stem), spec, run_context=run_context)
        writer.overwrite(ds)
        specs[stem] = spec
    return specs
