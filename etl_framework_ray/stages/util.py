"""Stage-deployment helpers shared across operator modules."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


def in_sorted(values: np.ndarray, sorted_arr: np.ndarray) -> np.ndarray:
    """Vectorized membership test against a SORTED array (the broadcast
    id-set pattern: ``ray.put`` one sorted int64 array once, probe with
    two ops per batch instead of Python-set lookups)."""
    if not len(sorted_arr):
        return np.zeros(len(values), dtype=bool)
    pos = np.clip(np.searchsorted(sorted_arr, values), 0, len(sorted_arr) - 1)
    return sorted_arr[pos] == values


@ray.remote(num_cpus=0)
class CounterActor:
    """Zero-CPU accumulator for per-batch metrics emitted by streaming
    tasks (DQ failure counts, curation funnel rows). NOT transactional:
    a task retried by Ray after partial completion re-adds its batches —
    acceptable for monitoring/audit counters, never for correctness
    decisions beyond the same single run."""

    def __init__(self):
        self.counts: dict = {}

    def add(self, counts: dict) -> None:
        for k, v in counts.items():
            self.counts[k] = self.counts.get(k, 0) + v

    def get(self) -> dict:
        return dict(self.counts)


def cached_stage(cls, *args, **kwargs):
    """Wrap a callable-class stage as a plain ``map_batches`` function with
    lazy once-per-worker construction.

    Decision rule (measured on this engine): an autoscaling actor pool
    costs ~2 s of spin-up per pipeline; use it only when the per-instance
    state is genuinely expensive (model weights, media codec contexts —
    e.g. ``multimodal.ImageDecoder``). Stages whose state is rebuilt in
    microseconds (hash params, stopword tables, compiled regexes) run as
    stateless TASKS with this wrapper — same once-per-worker init, no
    pool startup, and the streaming executor schedules them like any map.
    """
    inst = None

    def fn(batch: pa.Table) -> pa.Table:
        nonlocal inst
        if inst is None:
            inst = cls(*args, **kwargs)
        return inst(batch)

    return fn
