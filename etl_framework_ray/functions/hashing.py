"""Stable, vectorized hashing helpers.

Partition routing must be deterministic across processes and Ray workers
(``PYTHONHASHSEED`` makes builtin ``hash`` unusable). We use pandas'
SipHash-based ``hash_array`` (fixed default key → stable across
processes/machines) applied to numpy arrays — vectorized, no per-row Python.

Identifier-hash precedent in the reference: BLAKE2b-truncated constraint
names (/root/reference/src/delta_engine/constraints/naming.py:32-61).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def stable_hash_array(arr: pa.Array | pa.ChunkedArray | np.ndarray) -> np.ndarray:
    """uint64 SipHash per element; deterministic across processes."""
    if isinstance(arr, (pa.Array, pa.ChunkedArray)):
        np_arr = arr.to_pandas().to_numpy()
    else:
        np_arr = arr
    if np_arr.dtype == object or np_arr.dtype.kind in ("U", "S"):
        return pd.util.hash_array(np_arr.astype(object), categorize=False)
    return pd.util.hash_array(np_arr, categorize=False)


def partition_ids(
    key: pa.Array | pa.ChunkedArray, num_partitions: int, salt: np.ndarray | None = None
) -> np.ndarray:
    """Map a key column to int64 partition ids in [0, num_partitions).

    ``salt`` (optional int array, same length) is added before the modulo so
    hot keys can be fanned out across sub-partitions (skew handling,
    SURVEY.md §7.4).
    """
    h = stable_hash_array(key)
    if salt is not None:
        h = h + salt.astype(np.uint64)
    return (h % np.uint64(num_partitions)).astype(np.int64)
