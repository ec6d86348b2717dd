"""Planner/validator unit tests — construct-state → plan → assert-actions
style, mirroring the reference's test strategy (SURVEY.md §5;
/root/reference/tests/delta_engine/compile/test_planner.py). No Ray."""

import pyarrow as pa
import pytest

from etl_framework_ray.state.actions import ColumnAdd, ColumnDrop
from etl_framework_ray.state.planner import (
    ValidationError,
    plan_evolution,
    plan_table,
    validate_model,
    validate_plan,
)
from etl_framework_ray.state.schema import ColumnSpec, TableSpec


def _spec(cols, pk=()):
    return TableSpec(name="t", columns=tuple(cols), primary_key=tuple(pk))


def test_create_when_missing():
    spec = _spec([ColumnSpec("a", pa.int32(), nullable=False)], pk=("a",))
    plan = plan_table(spec, observed_schema=None)
    assert plan.create is not None
    assert plan.create.schema_names == ("a",)
    assert plan.align is None


def test_noop_when_aligned():
    spec = _spec([ColumnSpec("a", pa.int32(), nullable=False), ColumnSpec("b", pa.string())], pk=("a",))
    observed = pa.schema([pa.field("a", pa.int32(), nullable=False), pa.field("b", pa.string())])
    plan = plan_table(spec, observed, observed_pk=("a",))
    assert plan.is_noop


def test_add_and_drop_sets():
    spec = _spec([ColumnSpec("a", pa.int32(), nullable=False), ColumnSpec("c", pa.string())], pk=("a",))
    observed = pa.schema([pa.field("a", pa.int32(), nullable=False), pa.field("b", pa.string())])
    plan = plan_table(spec, observed, observed_pk=("a",))
    assert plan.align.adds == (ColumnAdd("c", pa.string(), nullable=True, comment=""),)
    assert plan.align.drops == (ColumnDrop("b"),)


def test_widen_action():
    spec = _spec([ColumnSpec("a", pa.int64(), nullable=False)], pk=("a",))
    observed = pa.schema([pa.field("a", pa.int32(), nullable=False)])
    plan = plan_table(spec, observed, observed_pk=("a",))
    (w,) = plan.align.widens
    assert w.src == pa.int32() and w.dst == pa.int64()
    validate_plan(plan, primary_key=("a",))  # widening PK is safe


def test_validate_rejects_not_null_add():
    from etl_framework_ray.state.actions import AlignTable, TablePlan

    plan = TablePlan(table="t", align=AlignTable(table="t", adds=(ColumnAdd("x", pa.int32(), nullable=False),)))
    with pytest.raises(ValidationError, match="NOT NULL"):
        validate_plan(plan)


def test_validate_rejects_pk_drop():
    from etl_framework_ray.state.actions import AlignTable, TablePlan

    plan = TablePlan(table="t", align=AlignTable(table="t", drops=(ColumnDrop("a"),)))
    with pytest.raises(ValidationError, match="primary key"):
        validate_plan(plan, primary_key=("a",))


def test_model_rejects_nullable_pk_and_dupes():
    with pytest.raises(ValueError):
        _spec([ColumnSpec("a", pa.int32(), nullable=True)], pk=("a",))
    spec = TableSpec.__new__(TableSpec)  # bypass __post_init__ to hit validate_model
    object.__setattr__(spec, "name", "t")
    object.__setattr__(spec, "columns", (ColumnSpec("A", pa.int32()), ColumnSpec("a", pa.int32())))
    object.__setattr__(spec, "primary_key", ())
    with pytest.raises(ValidationError, match="duplicate"):
        validate_model(spec)


# --- data-path evolution ----------------------------------------------------


def test_evolution_adds_nullable_column():
    cur = pa.schema([pa.field("conv_id", pa.string(), False), pa.field("text", pa.large_string())])
    inc = pa.schema([pa.field("conv_id", pa.string()), pa.field("text", pa.string()), pa.field("tool", pa.string())])
    new, changes = plan_evolution(cur, inc, primary_key=("conv_id",))
    assert new.field("tool").nullable
    assert any("add tool" in c for c in changes)
    # narrower incoming text (string vs large_string) does NOT narrow current
    assert new.field("text").type == pa.large_string()


def test_evolution_widens():
    cur = pa.schema([pa.field("k", pa.int32(), False)])
    inc = pa.schema([pa.field("k", pa.int64())])
    new, changes = plan_evolution(cur, inc, primary_key=("k",))
    assert new.field("k").type == pa.int64()
    assert changes == ["widen k: int32 -> int64"]


def test_evolution_rejects_incompatible():
    cur = pa.schema([pa.field("k", pa.int32(), False)])
    inc = pa.schema([pa.field("k", pa.string())])
    with pytest.raises(ValidationError):
        plan_evolution(cur, inc, primary_key=("k",))


def test_evolution_requires_pk_columns():
    cur = pa.schema([pa.field("k", pa.int32(), False), pa.field("v", pa.string())])
    inc = pa.schema([pa.field("v", pa.string())])
    with pytest.raises(ValidationError, match="missing primary key"):
        plan_evolution(cur, inc, primary_key=("k",))
