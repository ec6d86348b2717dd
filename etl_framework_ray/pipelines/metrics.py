"""Lineage / metrics audit tables (per-partition, per-epoch).

Generalizes the reference's metadata layer — the DQ audit log append
(/root/reference/src/models/data_quality_evaluator.py:67-86) and the SLO
metrics tables (/root/reference/src/metadata/slo/timeliness.py,
quality.py) — into the CDC engine's per-epoch lineage: one row per touched
partition per committed epoch, written idempotently (deterministic file name
per epoch, atomic replace) BEFORE the manifest commit so a crash never
loses metrics for a committed epoch.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq

METRICS_SCHEMA = pa.schema(
    [
        pa.field("epoch_id", pa.int64()),
        pa.field("partition", pa.int64()),
        pa.field("events_applied", pa.int64()),
        pa.field("rows_live", pa.int64()),
        pa.field("tombstones", pa.int64()),
        pa.field("bytes_written", pa.int64()),
        pa.field("applied_lsn", pa.int64()),
        pa.field("duration_s", pa.float64()),
        pa.field("job_id", pa.string()),
        pa.field("run_id", pa.string()),
        pa.field("date", pa.string()),
    ]
)


def metrics_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "_metrics", "epochs")


def write_epoch_metrics(table_dir: str, epoch_id: int, rows: list[dict]) -> str:
    d = metrics_dir(table_dir)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"epoch-{epoch_id:012d}.parquet")
    tbl = pa.Table.from_pylist(rows, schema=METRICS_SCHEMA)
    tmp = path + f".tmp-{os.getpid()}"
    pq.write_table(tbl, tmp)
    os.replace(tmp, path)
    return path


def detect_skew(table_dir: str, factor: float = 4.0, epoch_id: int | None = None) -> list[dict]:
    """Hot-partition detection from the lineage table (SURVEY.md §7.4):
    partitions whose applied-event count in their latest epoch exceeds
    ``factor`` × the median partition. The per-batch LWW combiner already
    collapses hot keys to ≤1 row per key per segment before the exchange;
    this surfaces residual imbalance (many distinct keys on one entity) —
    ``CDCEngine.mitigate_skew`` consumes it to salt + migrate hot keys.

    ``epoch_id`` inspects exactly that epoch's metrics file (O(1), the
    per-epoch auto-mitigation path); default reads the whole lineage table
    and uses its latest epoch."""
    if epoch_id is not None:
        p = os.path.join(metrics_dir(table_dir), f"epoch-{epoch_id:012d}.parquet")
        t = pq.read_table(p) if os.path.exists(p) else METRICS_SCHEMA.empty_table()
    else:
        t = read_metrics(table_dir)
    if t.num_rows == 0:
        return []
    df = t.to_pandas()
    last = df[df.epoch_id == df.epoch_id.max()]
    med = max(1.0, float(last.events_applied.median()))
    hot = last[last.events_applied > factor * med]
    return [
        {
            "partition": int(r.partition),
            "events_applied": int(r.events_applied),
            "median_events": med,
            "ratio": round(float(r.events_applied) / med, 2),
        }
        for r in hot.itertuples()
    ]


def read_metrics(table_dir: str) -> pa.Table:
    paths = sorted(glob.glob(os.path.join(metrics_dir(table_dir), "epoch-*.parquet")))
    if not paths:
        return METRICS_SCHEMA.empty_table()
    return pa.concat_tables([pq.read_table(p) for p in paths])
