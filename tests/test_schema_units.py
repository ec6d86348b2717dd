"""Unit tests for the widening lattice, schema helpers, and stable hashing.
No Ray."""

import numpy as np
import pyarrow as pa
import pytest

from etl_framework_ray.functions.hashing import partition_ids, stable_hash_array
from etl_framework_ray.state.schema import (
    is_widening,
    merge_schemas,
    normalize_table,
    schema_from_b64,
    schema_to_b64,
    widen,
)


def test_widening_lattice():
    assert is_widening(pa.int16(), pa.int32())
    assert is_widening(pa.int32(), pa.int64())
    assert not is_widening(pa.int64(), pa.int32())
    assert is_widening(pa.float32(), pa.float64())
    # int→float only when lossless: float32 mantissa=24 bits, float64=53
    assert is_widening(pa.int16(), pa.float32())
    assert not is_widening(pa.int32(), pa.float32())
    assert is_widening(pa.int32(), pa.float64())
    assert not is_widening(pa.int64(), pa.float64())  # would corrupt large ints
    with pytest.raises(TypeError):
        widen(pa.int64(), pa.float64())
    assert is_widening(pa.string(), pa.large_string())
    assert not is_widening(pa.large_string(), pa.string())
    assert widen(pa.int16(), pa.int64()) == pa.int64()
    assert widen(pa.int64(), pa.int16()) == pa.int64()  # symmetric
    with pytest.raises(TypeError):
        widen(pa.string(), pa.int32())


def test_merge_schemas_appends_and_widens():
    a = pa.schema([pa.field("x", pa.int32()), pa.field("y", pa.string())])
    b = pa.schema([pa.field("x", pa.int64()), pa.field("z", pa.bool_())])
    merged, changes = merge_schemas(a, b)
    assert merged.names == ["x", "y", "z"]
    assert merged.field("x").type == pa.int64()
    assert merged.field("z").nullable
    assert len(changes) == 2


def test_normalize_table_roundtrip():
    target = pa.schema(
        [pa.field("a", pa.int64()), pa.field("b", pa.large_string()), pa.field("c", pa.float64())]
    )
    t = pa.table({"b": pa.array(["x", None], pa.string()), "a": pa.array([1, 2], pa.int32())})
    out = normalize_table(t, target)
    assert out.schema.equals(target)
    assert out.column("c").null_count == 2  # missing column → nulls
    assert out.column("a").type == pa.int64()


def test_schema_b64_roundtrip():
    s = pa.schema([pa.field("k", pa.int32(), nullable=False, metadata={b"comment": b"hi"})])
    assert schema_from_b64(schema_to_b64(s)).equals(s, check_metadata=True)


def test_stable_hash_deterministic_and_spread():
    vals = np.array([f"conv-{i:06d}" for i in range(1000)], dtype=object)
    h1 = stable_hash_array(vals)
    h2 = stable_hash_array(vals)
    assert (h1 == h2).all()  # deterministic (fixed siphash key)
    pid = partition_ids(pa.array(list(vals)), 16)
    counts = np.bincount(pid, minlength=16)
    assert counts.min() > 0 and counts.max() < 3 * counts.mean()  # reasonable spread
    # salt shifts assignments
    salted = partition_ids(pa.array(list(vals)), 16, salt=np.ones(1000, dtype=np.int64))
    assert (pid != salted).any()
