"""Data-quality rules → Arrow predicates; warn/error write gates.

Port of the reference's DQ semantics
(/root/reference/src/models/data_quality_evaluator.py:81-102 and rule
builders /root/reference/src/models/data_quality_table.py:51-108):

- per-column rules auto-derived from the spec: ``allowed_values`` →
  ``pc.is_in``, ``min/max`` → range predicates, NOT NULL → ``pc.is_null``
  (M10 in SURVEY.md §2.2);
- a dataset-level ``is_unique`` rule over the primary key (A4);
- WARN failures are logged to the audit table and the write proceeds;
- any ERROR failure logs then raises ``DQError``, aborting the write
  BEFORE any data lands (evaluator ordering: warnings first, then errors
  raise — data_quality_evaluator.py:88-102).

Rule builders are extensible through a registry decorator, mirroring
``@DQDeltaTable.register_builder``
(/root/reference/src/models/data_quality_table.py:24-48): caller-supplied
rules win over generated rules with the same (column, name).
"""

from __future__ import annotations

import os
import time
import uuid
from dataclasses import dataclass
from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..context import RunContext
from ..state.schema import QualityRule, TableSpec


class DQError(Exception):
    """Raised when ERROR-criticality rows are present; aborts the write
    (reference ``DQError``, data_quality_evaluator.py:22-25)."""


@dataclass(frozen=True)
class CheckSpec:
    """One executable check: name + criticality + vectorized failure mask."""

    name: str
    column: str
    criticality: str  # warn | error
    #: batch -> boolean array, True where the row FAILS the rule
    fail_mask: Callable[[pa.Table], pa.ChunkedArray | pa.Array]


#: builder registry: spec -> list[CheckSpec]
_BUILDERS: list[Callable[[TableSpec], list[CheckSpec]]] = []


def register_builder(fn: Callable[[TableSpec], list[CheckSpec]]):
    _BUILDERS.append(fn)
    return fn


def _not_null_mask(col: str):
    return lambda t: pc.is_null(t.column(col))


def _allowed_values_mask(col: str, values: tuple):
    vs = pa.array(list(values))
    return lambda t: pc.and_kleene(
        pc.invert(pc.is_in(t.column(col), value_set=vs)), pc.is_valid(t.column(col))
    )


def _range_mask(col: str, lo, hi):
    def mask(t: pa.Table):
        c = t.column(col)
        bad = pa.array([False] * t.num_rows) if t.num_rows else pa.array([], pa.bool_())
        if lo is not None:
            bad = pc.or_kleene(bad, pc.less(c, lo))
        if hi is not None:
            bad = pc.or_kleene(bad, pc.greater(c, hi))
        return pc.and_kleene(bad, pc.is_valid(c))

    return mask


@register_builder
def column_rule_builder(spec: TableSpec) -> list[CheckSpec]:
    """Auto-derive checks from column metadata (data_quality_table.py:61-108)."""
    checks: list[CheckSpec] = []
    for c in spec.columns:
        if not c.nullable:
            checks.append(CheckSpec(f"{c.name}_is_not_null", c.name, "error", _not_null_mask(c.name)))
        r: QualityRule | None = c.quality
        if r is None:
            continue
        if r.allowed_values is not None:
            checks.append(
                CheckSpec(
                    f"{c.name}_is_in_list", c.name, r.criticality, _allowed_values_mask(c.name, r.allowed_values)
                )
            )
        if r.min_value is not None or r.max_value is not None:
            checks.append(
                CheckSpec(
                    f"{c.name}_is_in_range", c.name, r.criticality, _range_mask(c.name, r.min_value, r.max_value)
                )
            )
    return checks


def build_checks(spec: TableSpec, extra: list[CheckSpec] | None = None) -> list[CheckSpec]:
    """All generated checks; ``extra`` (caller-supplied) wins on name clash."""
    out: dict[tuple[str, str], CheckSpec] = {}
    for b in _BUILDERS:
        for c in b(spec):
            out[(c.column, c.name)] = c
    for c in extra or []:
        out[(c.column, c.name)] = c
    return list(out.values())


AUDIT_SCHEMA = pa.schema(
    [
        pa.field("table_name", pa.string()),
        pa.field("rule_name", pa.string()),
        pa.field("column", pa.string()),
        pa.field("criticality", pa.string()),
        pa.field("failed_rows", pa.int64()),
        pa.field("checked_rows", pa.int64()),
        pa.field("job_id", pa.string()),
        pa.field("run_id", pa.string()),
        pa.field("date", pa.string()),
        pa.field("run_time", pa.float64()),
    ]
)


def evaluate_batch(batch: pa.Table, checks: list[CheckSpec]) -> dict[str, int]:
    """Vectorized failure counts per rule for one batch."""
    out = {}
    for chk in checks:
        mask = chk.fail_mask(batch)
        n = pc.sum(mask).as_py() or 0
        if n:
            out[chk.name] = n
    return out


class DQGate:
    """Gate a Dataset before a write: count failures per rule (a cheap
    column-pruned aggregation pass), append the audit rows, then raise
    ``DQError`` if any ERROR rule failed. The data pass only starts after
    the gate passes — same ordering as the reference (gate inside the
    writer, /root/reference/src/models/writer.py:31-40)."""

    def __init__(self, spec: TableSpec, audit_dir: str, run_context: RunContext | None = None):
        self.spec = spec
        self.audit_dir = audit_dir
        self.ctx = run_context or RunContext()

    def check(self, ds, extra: list[CheckSpec] | None = None) -> dict[str, dict]:
        checks = build_checks(self.spec, extra)
        if not checks:
            return {}
        by_name = {c.name: c for c in checks}
        t0 = time.perf_counter()

        def count_failures(batch: pa.Table) -> pa.Table:
            counts = evaluate_batch(batch, checks)
            return pa.Table.from_pylist(
                [
                    {"rule_name": k, "failed_rows": v, "checked_rows": batch.num_rows}
                    for k, v in counts.items()
                ]
                + ([{"rule_name": "_rows", "failed_rows": 0, "checked_rows": batch.num_rows}]),
                schema=pa.schema(
                    [
                        pa.field("rule_name", pa.string()),
                        pa.field("failed_rows", pa.int64()),
                        pa.field("checked_rows", pa.int64()),
                    ]
                ),
            )

        partials = ds.map_batches(count_failures, batch_format="pyarrow").to_pandas()
        run_time = time.perf_counter() - t0
        if partials.empty:  # empty source: nothing to check, nothing to log
            return {}
        total_rows = int(partials[partials.rule_name == "_rows"].checked_rows.sum())
        agg = partials[partials.rule_name != "_rows"].groupby("rule_name").failed_rows.sum()

        results: dict[str, dict] = {}
        audit_rows = []
        rc = self.ctx.as_dict()
        for name, failed in agg.items():
            chk = by_name[name]
            results[name] = {
                "criticality": chk.criticality,
                "failed_rows": int(failed),
                "checked_rows": total_rows,
            }
            audit_rows.append(
                {
                    "table_name": self.spec.name,
                    "rule_name": name,
                    "column": chk.column,
                    "criticality": chk.criticality,
                    "failed_rows": int(failed),
                    "checked_rows": total_rows,
                    "run_time": run_time,
                    **rc,
                }
            )
        # warnings logged first, then errors raise (reference ordering)
        if audit_rows:
            self._append_audit(audit_rows)
        errors = {k: v for k, v in results.items() if v["criticality"] == "error" and v["failed_rows"]}
        if errors:
            raise DQError(f"DQ errors on {self.spec.name}: {errors}")
        return results

    def _append_audit(self, rows: list[dict]) -> None:
        os.makedirs(self.audit_dir, exist_ok=True)
        path = os.path.join(self.audit_dir, f"checks-{self.ctx.run_id}-{uuid.uuid4().hex[:8]}.parquet")
        pq.write_table(pa.Table.from_pylist(rows, schema=AUDIT_SCHEMA), path)


def read_audit(audit_dir: str) -> pa.Table:
    import glob

    paths = sorted(glob.glob(os.path.join(audit_dir, "checks-*.parquet")))
    if not paths:
        return AUDIT_SCHEMA.empty_table()
    return pa.concat_tables([pq.read_table(p) for p in paths])
