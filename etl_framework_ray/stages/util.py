"""Stage-deployment helpers shared across operator modules."""

from __future__ import annotations

import pyarrow as pa


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
