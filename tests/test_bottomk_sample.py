"""Exactly-k md5 bottom-k sampling: deterministic, partition-invariant,
equals the brute-force sort, uniformity sanity."""

import hashlib

import numpy as np
import pandas as pd
import pytest
import ray

from etl_framework_ray.stages.packing import bottom_k_per_group, bottom_k_sample


def _frame(n=5000, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "id": np.arange(n, dtype="int64"),
        "g": rng.choice(["a", "b", "c"], n),
        "x": rng.normal(size=n),
    })


def _key(i, seed):
    return hashlib.md5(f"{i}:{seed}".encode()).hexdigest()


@pytest.mark.usefixtures("ray_session")
def test_exactly_k_and_partition_invariant():
    df = _frame()
    exp_ids = sorted(df["id"], key=lambda i: _key(i, 7))[:100]
    for par in (1, 11):
        got = bottom_k_sample(
            ray.data.from_pandas(df).repartition(par), 100, "id", seed=7
        ).to_pandas()
        assert len(got) == 100
        assert sorted(got["id"]) == sorted(exp_ids)
    # a different seed draws a different sample
    other = bottom_k_sample(ray.data.from_pandas(df), 100, "id", seed=8).to_pandas()
    assert sorted(other["id"]) != sorted(exp_ids)


@pytest.mark.usefixtures("ray_session")
def test_per_group_exactly_k():
    df = _frame(n=900, seed=9)
    got = bottom_k_per_group(
        ray.data.from_pandas(df).repartition(5), 4, "g", "id", seed=11
    ).to_pandas()
    counts = got.groupby("g").size()
    assert (counts == 4).all()
    for g, sub in df.groupby("g"):
        exp = sorted(sub["id"], key=lambda i: _key(i, 11))[:4]
        assert sorted(got[got["g"] == g]["id"]) == sorted(exp)
