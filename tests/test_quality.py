"""DQ gate tests: WARN logs + write proceeds; ERROR aborts before write.

Reference semantics under test:
/root/reference/src/models/data_quality_evaluator.py:81-102 (warnings
logged first, errors raise) and FIXTURES.md F4c (new role value under a
WARN-level allowed-values rule does not block).
"""

import pyarrow as pa
import pytest

from etl_framework_ray.functions.quality import (
    CheckSpec,
    DQError,
    DQGate,
    build_checks,
    evaluate_batch,
    read_audit,
)
from etl_framework_ray.state.schema import TRANSCRIPTS, ColumnSpec, QualityRule, TableSpec


def _spec(crit="error"):
    return TableSpec(
        name="t",
        columns=(
            ColumnSpec("k", pa.int32(), nullable=False),
            ColumnSpec("price", pa.float64(), quality=QualityRule(criticality=crit, min_value=0)),
            ColumnSpec(
                "status",
                pa.string(),
                quality=QualityRule(criticality="warn", allowed_values=("a", "b")),
            ),
        ),
        primary_key=("k",),
    )


def _batch(prices, statuses):
    return pa.table(
        {
            "k": pa.array(range(len(prices)), pa.int32()),
            "price": pa.array(prices, pa.float64()),
            "status": pa.array(statuses, pa.string()),
        }
    )


def test_masks_vectorized():
    checks = build_checks(_spec())
    names = {c.name for c in checks}
    assert names == {"k_is_not_null", "price_is_in_range", "status_is_in_list"}
    counts = evaluate_batch(_batch([1.0, -2.0, None], ["a", "z", None]), checks)
    # nulls don't fail range/list rules; -2 fails range; z fails list
    assert counts == {"price_is_in_range": 1, "status_is_in_list": 1}


def test_caller_rules_win_on_name_clash():
    override = CheckSpec("price_is_in_range", "price", "warn", lambda t: pa.array([False] * t.num_rows))
    checks = build_checks(_spec("error"), extra=[override])
    chk = next(c for c in checks if c.name == "price_is_in_range")
    assert chk.criticality == "warn"


@pytest.mark.usefixtures("ray_session")
def test_warn_logs_and_passes(tmp_path):
    import ray.data

    ds = ray.data.from_arrow(_batch([1.0, 2.0], ["a", "zzz"]))
    gate = DQGate(_spec(), str(tmp_path / "audit"))
    results = gate.check(ds)  # no exception: only the warn rule fails
    assert results["status_is_in_list"]["failed_rows"] == 1
    audit = read_audit(str(tmp_path / "audit"))
    assert audit.num_rows == 1
    assert audit.column("criticality").to_pylist() == ["warn"]


@pytest.mark.usefixtures("ray_session")
def test_error_aborts_and_still_logs(tmp_path):
    import ray.data

    ds = ray.data.from_arrow(_batch([-5.0, 2.0], ["a", "zzz"]))
    gate = DQGate(_spec(), str(tmp_path / "audit"))
    with pytest.raises(DQError, match="price_is_in_range"):
        gate.check(ds)
    # reference ordering: failures (warn AND error) appended before raise
    audit = read_audit(str(tmp_path / "audit"))
    assert set(audit.column("rule_name").to_pylist()) == {"price_is_in_range", "status_is_in_list"}


@pytest.mark.usefixtures("ray_session")
def test_f4c_new_role_value_warns_not_blocks(tmp_path):
    """F4c: a new role value fails TRANSCRIPTS' WARN-level allowed-values
    rule → logged, not blocked."""
    import ray.data

    batch = pa.table(
        {
            "conv_id": pa.array(["c1"], pa.string()),
            "turn_idx": pa.array([0], pa.int32()),
            "role": pa.array(["critic"], pa.string()),  # not in allowed set
            "text": pa.array(["hi"], pa.large_string()),
            "tool": pa.array([None], pa.string()),
            "ts": pa.array([0], pa.timestamp("us")),
        }
    )
    gate = DQGate(TRANSCRIPTS, str(tmp_path / "audit"))
    results = gate.check(ray.data.from_arrow(batch))
    assert results["role_is_in_list"]["failed_rows"] == 1  # warned, no raise
