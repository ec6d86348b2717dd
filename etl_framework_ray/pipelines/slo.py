"""SLO / metadata metrics pipelines — the §3.3 port.

Mirrors the reference's slo_tracking job
(/root/reference/databricks/jobs/slo_tracking.yml):

- ``track_timeliness``: per (date, job) "data ready by 09:00" boolean —
  global boolean max over ``hour(ts) < 9`` (timeliness.py:81-89) — MERGEd
  into ``metadata/timeliness`` keyed ``(date, job_name)``
  (timeliness.py:92-101; composite-PK metadata precedent).
- ``track_quality``: per-date error/warn counts from the DQ audit log
  (quality.py:43-59) MERGEd into ``metadata/quality`` keyed ``date``.

Both use the engine's own MERGE (LakeWriter.merge → CDC apply), exactly
the dogfooding the reference does with Delta MERGE.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..context import RunContext
from ..functions.quality import read_audit
from ..pipelines.writer import LakeWriter
from ..state.schema import ColumnSpec, TableSpec

TIMELINESS = TableSpec(
    name="timeliness",
    columns=(
        ColumnSpec("date", pa.string(), nullable=False),
        ColumnSpec("job_name", pa.string(), nullable=False),
        ColumnSpec("ready_by_09", pa.bool_()),
    ),
    primary_key=("date", "job_name"),
    comment="per (date, job): all events landed before 09:00?",
)

QUALITY = TableSpec(
    name="quality",
    columns=(
        ColumnSpec("date", pa.string(), nullable=False),
        ColumnSpec("error_count", pa.int64()),
        ColumnSpec("warning_count", pa.int64()),
    ),
    primary_key=("date",),
    comment="per-date DQ failure counts from the audit log",
)


def track_timeliness(
    events_path: str, lake_root: str, run_context: RunContext | None = None
) -> "ray.data.Dataset":
    """events → per (date, event_type) ready_by_09 → MERGE into metadata."""

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "date": pc.strftime(batch.column("ts"), format="%Y-%m-%d").to_pandas(),
                "job_name": batch.column("event_type").to_pandas(),
                # boolean max over hour(ts) < 9 — "all" semantics need min;
                # the reference takes max(hour < 9) per run, we track
                # whether EVERY event of the day landed before 9
                "before_9": pc.less(pc.hour(batch.column("ts")), 9).to_pandas(),
            }
        )
        g = df.groupby(["date", "job_name"], sort=False)["before_9"].min().reset_index()
        return pa.Table.from_pandas(g.rename(columns={"before_9": "ready_by_09"}), preserve_index=False)

    from ray.data.aggregate import Min

    agg = (
        ray.data.read_parquet(events_path, columns=["ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["date", "job_name"])
        .aggregate(Min("ready_by_09", alias_name="ready_by_09"))
    )

    def as_bool(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index("ready_by_09")
        return batch.set_column(i, "ready_by_09", batch.column("ready_by_09").cast(pa.bool_()))

    agg = agg.map_batches(as_bool, batch_format="pyarrow")
    writer = LakeWriter(os.path.join(lake_root, "metadata", "timeliness"), TIMELINESS, run_context=run_context)
    writer.merge(agg)
    return writer.read()


def check_failures(audit_dir: str, date: str, threshold: int = 1) -> int:
    """Post-run alert check — the SQL alert task's semantics
    (/root/reference/src/metadata/data_quality/check_failures.sql:1-8,
    ``assert_true(count <= 1)`` over today's ERROR failures): raises if
    more than ``threshold`` ERROR rules failed on ``date``."""
    audit = read_audit(audit_dir)
    if audit.num_rows == 0:
        return 0
    pdf = audit.to_pandas()
    n = int(
        ((pdf.date == date) & (pdf.criticality == "error") & (pdf.failed_rows > 0)).sum()
    )
    if n > threshold:
        raise AssertionError(
            f"{n} ERROR-level DQ failures on {date} exceeds threshold {threshold}"
        )
    return n


def track_quality(
    audit_dir: str, lake_root: str, run_context: RunContext | None = None
) -> "ray.data.Dataset":
    """DQ audit log → per-date error/warn failure counts → MERGE."""
    audit = read_audit(audit_dir)
    if audit.num_rows == 0:
        df = pd.DataFrame(columns=["date", "error_count", "warning_count"])
    else:
        pdf = audit.to_pandas()
        pdf["is_error"] = (pdf.criticality == "error") & (pdf.failed_rows > 0)
        pdf["is_warning"] = (pdf.criticality == "warn") & (pdf.failed_rows > 0)
        df = (
            pdf.groupby("date")
            .agg(error_count=("is_error", "sum"), warning_count=("is_warning", "sum"))
            .reset_index()
        )
        df["error_count"] = df["error_count"].astype("int64")
        df["warning_count"] = df["warning_count"].astype("int64")
    ds = ray.data.from_pandas(df) if len(df) else ray.data.from_arrow(QUALITY.schema.empty_table())
    writer = LakeWriter(os.path.join(lake_root, "metadata", "quality"), QUALITY, run_context=run_context)
    if len(df):
        writer.merge(ds)
    return writer.read()
