"""Publish / gold layer: committed snapshot + derived rollups + invariants.

Generalizes the reference's gold stage — star-schema joins, projections,
DQ-gated overwrite writes (/root/reference/src/gold/product_dimension.py:62-93,
order_fact.py:75-88) — over the CDC lake table:

- ``publish_snapshot``: DQ-gated, partition-directory Parquet export of the
  committed live rows (resumable output layout: one directory per hash
  partition, written atomically).
- ``conversation_rollup``: per-conversation aggregate via a vectorized
  per-batch partial aggregation followed by a small ``groupby().aggregate``
  over the partials (pre-aggregate pattern — SURVEY.md §4.2 shuffle note).
- ``attach_role_group``: broadcast-join a tiny dimension (``ray.put`` once,
  dict lookup per batch) — the J1 pattern from SURVEY.md §2.4.
- ``pk_violations``: the A4 PK-uniqueness invariant
  (/root/reference/src/models/data_quality_table.py:51-58).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..context import RunContext
from ..functions.quality import DQGate
from ..state.schema import TableSpec

#: tiny role dimension (gold-join example; analogous to the reference's
#: aisle/department dims, /root/reference/src/gold/product_dimension.py:62-74)
ROLE_DIM = {
    "user": "human",
    "assistant": "model",
    "system": "control",
    "tool": "control",
}


def publish_snapshot(
    engine,
    out_dir: str,
    gate_spec: TableSpec | None = None,
    run_context: RunContext | None = None,
) -> int:
    """Write the committed snapshot as partition-directory Parquet.

    Layout ``out_dir/part=<pid>/...`` so a failed export can skip finished
    partitions on rerun. Runs the DQ gate first when ``gate_spec`` carries
    rules — errors abort before any file is written.
    """
    ds = engine.snapshot()
    if gate_spec is not None:
        gate = DQGate(gate_spec, os.path.join(engine.table_dir, "_metrics", "dq"), run_context)
        gate.check(ds)
        ds = engine.snapshot()  # re-plan after the gate consumed the stream
    num_partitions = engine.manifest.num_partitions
    from ..functions.hashing import partition_ids

    def add_pid(batch: pa.Table) -> pa.Table:
        pid = partition_ids(batch.column("conv_id"), num_partitions)
        return batch.append_column("pid", pa.array(pid, pa.int64()))

    ds.map_batches(add_pid, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["pid"]
    )
    return num_partitions


def conversation_rollup(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-conversation stats: turns, assistant turns, chars, last ts.

    Partial-aggregates inside ``map_batches`` (one row per conv per block)
    so the groupby shuffles partials, not turns.
    """

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "conv_id": batch.column("conv_id").to_pandas(),
                "is_assistant": pc.equal(batch.column("role"), "assistant").to_pandas().fillna(False),
                "chars": pc.utf8_length(
                    pc.coalesce(batch.column("text"), pa.scalar("", pa.large_string()))
                ).to_pandas(),
                "ts": batch.column("ts").to_pandas(),
            }
        )
        g = df.groupby("conv_id", sort=False).agg(
            n_turns=("conv_id", "size"),
            n_assistant_turns=("is_assistant", "sum"),
            total_chars=("chars", "sum"),
            last_ts=("ts", "max"),
        )
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    from ray.data.aggregate import Max, Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("conv_id")
        .aggregate(
            Sum("n_turns", alias_name="n_turns"),
            Sum("n_assistant_turns", alias_name="n_assistant_turns"),
            Sum("total_chars", alias_name="total_chars"),
            Max("last_ts", alias_name="last_ts"),
        )
    )


def attach_role_group(ds: "ray.data.Dataset", dim: dict[str, str] | None = None) -> "ray.data.Dataset":
    """Broadcast-join the role dimension: ``ray.put`` the dict once, map it
    per batch with a vectorized pandas lookup — no shuffle."""
    ref = ray.put(dim or ROLE_DIM)

    def join(batch: pa.Table) -> pa.Table:
        lookup = ray.get(ref)
        roles = batch.column("role").to_pandas()
        grp = roles.map(lookup).astype(object).where(roles.notna(), None)
        return batch.append_column("role_group", pa.array(np.asarray(grp, dtype=object), pa.string()))

    return ds.map_batches(join, batch_format="pyarrow")


def pk_violations(ds: "ray.data.Dataset", key_cols: tuple[str, ...]) -> int:
    """Number of duplicated primary-key tuples (must be 0 post-apply)."""
    from ray.data.aggregate import Count

    counts = ds.groupby(list(key_cols)).aggregate(Count(alias_name="n"))
    dup = counts.filter(expr="n > 1")
    return dup.count()
