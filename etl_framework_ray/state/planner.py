"""Diff planner + safety validator: desired spec vs observed state → actions.

Port of the reference's snapshot → plan → validate → execute sequence
(/root/reference/src/delta_engine/orchestrate/orchestrator.py:51-91):
``Planner.plan`` diffs a desired ``TableSpec`` against the observed manifest
schema into an immutable ``TablePlan``
(/root/reference/src/delta_engine/compile/planner.py:35-68,108-177 — set
difference over column names), and ``validate_plan`` enforces the
safety rules before execution (/root/reference/src/delta_engine/validation/
rules.py): add-NULLABLE-only on existing tables (rules.py:90-106), PK columns
NOT NULL (rules.py:228-261), PK order significant (rules.py:285-305), no
case-insensitive duplicate columns (rules.py:271-282).

``plan_evolution`` is the data-path entry: it evolves the lake schema from
an incoming changelog-batch schema (add nullable columns, widen types) and
rejects unsafe evolution, all before any file is written.
"""

from __future__ import annotations

import pyarrow as pa

from .actions import (
    AlignTable,
    ColumnAdd,
    ColumnDrop,
    ColumnNullabilityChange,
    CreateTable,
    PrimaryKeyAdd,
    PrimaryKeyDrop,
    SetColumnComments,
    TablePlan,
    TypeWiden,
)
from .schema import TableSpec, is_widening, widen


class ValidationError(Exception):
    """A plan or model violates a safety rule; nothing is executed.

    Mirrors the reference's fail-fast validation
    (/root/reference/src/delta_engine/validation/rules.py:28-33)."""


# ---------------------------------------------------------------------------
# Model validation (rules over the desired spec itself)
# ---------------------------------------------------------------------------


def validate_model(spec: TableSpec) -> None:
    names = [c.name for c in spec.columns]
    lowered = [n.lower() for n in names]
    dupes = {n for n in lowered if lowered.count(n) > 1}
    if dupes:
        raise ValidationError(f"{spec.name}: case-insensitive duplicate columns {sorted(dupes)}")
    for k in spec.primary_key:
        if k not in names:
            raise ValidationError(f"{spec.name}: primary key column {k!r} not in model")
        if spec.column(k).nullable:
            raise ValidationError(f"{spec.name}: primary key column {k!r} must be NOT NULL")


# ---------------------------------------------------------------------------
# Planner: desired spec vs observed schema
# ---------------------------------------------------------------------------


def plan_table(
    spec: TableSpec,
    observed_schema: pa.Schema | None,
    observed_pk: tuple[str, ...] = (),
) -> TablePlan:
    """Diff the desired spec against the observed state.

    ``observed_schema is None`` → the table does not exist → CreateTable.
    Otherwise an AlignTable with set-difference adds/drops (planner.py:138-177
    semantics) plus nullability and PK alignment.
    """
    validate_model(spec)
    if observed_schema is None:
        return TablePlan(table=spec.name, create=CreateTable(spec.name, tuple(spec.column_names)))

    desired_names = spec.column_names
    observed_names = list(observed_schema.names)
    missing = [n for n in desired_names if n not in observed_names]
    extra = [n for n in observed_names if n not in desired_names]

    adds = tuple(
        ColumnAdd(c.name, c.dtype, nullable=True, comment=c.comment)
        for c in spec.columns
        if c.name in missing
    )
    drops = tuple(ColumnDrop(n) for n in extra)

    widens: list[TypeWiden] = []
    nullability: list[ColumnNullabilityChange] = []
    comment_changes: list[tuple[str, str]] = []
    for c in spec.columns:
        if c.name in missing:
            continue
        obs = observed_schema.field(c.name)
        if not obs.type.equals(c.dtype):
            widens.append(TypeWiden(c.name, obs.type, widen(obs.type, c.dtype)))
        if obs.nullable != c.nullable:
            nullability.append(ColumnNullabilityChange(c.name, c.nullable))
        obs_comment = (obs.metadata or {}).get(b"comment", b"").decode()
        if c.comment and c.comment != obs_comment:
            comment_changes.append((c.name, c.comment))

    pk_changed = tuple(observed_pk) != tuple(spec.primary_key)
    align = AlignTable(
        table=spec.name,
        pk_drop=PrimaryKeyDrop() if pk_changed and observed_pk else None,
        adds=adds,
        drops=drops,
        widens=tuple(widens),
        nullability=tuple(nullability),
        pk_add=PrimaryKeyAdd(tuple(spec.primary_key)) if pk_changed and spec.primary_key else None,
        column_comments=SetColumnComments(tuple(comment_changes)) if comment_changes else None,
    )
    return TablePlan(table=spec.name, align=None if align.is_noop else align)


# ---------------------------------------------------------------------------
# Plan validation (safety rules)
# ---------------------------------------------------------------------------


def validate_plan(plan: TablePlan, primary_key: tuple[str, ...] = ()) -> None:
    align = plan.align
    if align is None:
        return
    if align.pk_drop is not None and align.pk_add is None:
        # a CDC table without its key cannot apply upserts; key REPLACEMENT
        # (drop+add) is allowed, silent removal is not
        raise ValidationError(
            f"{plan.table}: refusing to remove the primary key constraint without a replacement"
        )
    for add in align.adds:
        if not add.nullable:
            # "add NULLABLE → backfill → SET NOT NULL" rule (rules.py:90-106)
            raise ValidationError(
                f"{plan.table}: cannot add NOT NULL column {add.name!r} to an existing table"
            )
    pk = set(primary_key)
    for drop in align.drops:
        if drop.name in pk:
            raise ValidationError(f"{plan.table}: cannot drop primary key column {drop.name!r}")
    for nc in align.nullability:
        if nc.nullable and nc.name in pk:
            raise ValidationError(
                f"{plan.table}: cannot relax NOT NULL on primary key column {nc.name!r}"
            )
    for w in align.widens:
        if not is_widening(w.src, w.dst):
            raise ValidationError(f"{plan.table}: narrowing {w.name}: {w.src} -> {w.dst}")


# ---------------------------------------------------------------------------
# Data-path evolution (changelog batch schema → lake schema)
# ---------------------------------------------------------------------------


def plan_evolution(
    current: pa.Schema,
    incoming: pa.Schema,
    primary_key: tuple[str, ...] = (),
) -> tuple[pa.Schema, list[str]]:
    """Evolve ``current`` (public lake schema) to absorb ``incoming``
    (changelog payload schema): add new columns nullable, widen types.
    Validates safety: PK columns must be present in the incoming schema with
    widenable types; narrowing raises ``ValidationError``.

    Returns ``(new_schema, human-readable change list)`` — empty list means
    no evolution.
    """
    for k in primary_key:
        if k not in incoming.names:
            raise ValidationError(f"changelog batch is missing primary key column {k!r}")
    changes: list[str] = []
    fields: list[pa.Field] = []
    cur_names = set(current.names)
    for f in current:
        if f.name in incoming.names:
            inc_t = incoming.field(f.name).type
            try:
                merged_t = widen(f.type, inc_t)
            except TypeError as e:
                raise ValidationError(str(e)) from e
            if is_widening(inc_t, f.type) and not inc_t.equals(f.type):
                # incoming is NARROWER than current (e.g. old int16 segments
                # after the table already widened) — keep current, no change
                merged_t = f.type
            if not merged_t.equals(f.type):
                changes.append(f"widen {f.name}: {f.type} -> {merged_t}")
            fields.append(pa.field(f.name, merged_t, nullable=f.nullable, metadata=f.metadata))
        else:
            fields.append(f)  # dropped from the feed → stays, nulls henceforth
    for f in incoming:
        if f.name not in cur_names:
            fields.append(pa.field(f.name, f.type, nullable=True))
            changes.append(f"add {f.name}: {f.type} (nullable)")
    return pa.schema(fields), changes
