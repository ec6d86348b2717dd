"""HyperLogLog distinct-count sketch: accuracy vs exact, merge invariance."""

import numpy as np
import pyarrow as pa
import pytest

from etl_framework_ray.stages.sketches import hll_distinct


@pytest.mark.usefixtures("ray_session")
def test_hll_accuracy_large_and_small():
    import ray.data

    rng = np.random.default_rng(4)
    # large range: 100k distinct ids with duplicates
    vals = rng.integers(0, 100_000, 400_000)
    exact = len(np.unique(vals))
    ds = ray.data.from_arrow(pa.table({"k": pa.array(vals, pa.int64())})).repartition(8)
    est = hll_distinct(ds, "k", p=12)
    assert abs(est - exact) / exact < 0.05, (est, exact)
    # small range: linear counting kicks in, near-exact
    small = ray.data.from_arrow(pa.table({"k": pa.array(np.arange(200) % 37, pa.int64())}))
    est_s = hll_distinct(small, "k", p=12)
    assert abs(est_s - 37) / 37 < 0.03, est_s


@pytest.mark.usefixtures("ray_session")
def test_hll_partition_invariant_and_strings():
    import ray.data

    vals = [f"user-{i % 500}" for i in range(5_000)]
    t = pa.table({"u": pa.array(vals, pa.string())})
    a = hll_distinct(ray.data.from_arrow(t), "u", p=12)
    b = hll_distinct(ray.data.from_arrow(t).repartition(16), "u", p=12)
    assert a == b  # register max-merge is partitioning-independent
    assert abs(a - 500) / 500 < 0.05


@pytest.mark.usefixtures("ray_session")
def test_hll_real_events_users():
    import ray.data

    ds = ray.data.read_parquet("/root/testdata/sf0.001/events.parquet", columns=["user_id"])
    exact = ds.unique("user_id")
    est = hll_distinct(ds, "user_id", p=12)
    assert abs(est - len(exact)) / len(exact) < 0.03
