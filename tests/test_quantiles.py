"""Exact rank-select quantiles vs numpy ground truth: skewed data, heavy
ties, refinement path, boundary q values."""

import numpy as np
import pyarrow as pa
import pytest

from etl_framework_ray.stages.quantiles import rank_select_quantiles


def _check(v, qs, **kw):
    import ray.data

    ds = ray.data.from_arrow(pa.table({"x": pa.array(v, pa.float64())})).repartition(4)
    out = rank_select_quantiles(ds, "x", qs, **kw).to_pandas()
    sv = np.sort(v)
    for q, got in zip(out.q, out.v):
        assert got == sv[int(np.floor(q * (len(v) - 1)))], q


@pytest.mark.usefixtures("ray_session")
def test_quantiles_lognormal_exact():
    rng = np.random.default_rng(1)
    _check(rng.lognormal(3, 2, 20_000), (0.0, 0.25, 0.5, 0.9, 0.99, 1.0), collect_limit=200)


@pytest.mark.usefixtures("ray_session")
def test_quantiles_heavy_ties_refine():
    """A bucket of 10k identical values exceeds collect_limit and must
    refine down to a point bucket without losing exactness."""
    v = np.repeat([1.0, 2.0, 2.0, 9.0], 5_000)
    _check(v, (0.1, 0.5, 0.6, 0.9), collect_limit=100, max_refine=3)


@pytest.mark.usefixtures("ray_session")
def test_quantiles_empty_and_constant():
    import ray.data

    empty = ray.data.from_arrow(pa.table({"x": pa.array([], pa.float64())}))
    assert rank_select_quantiles(empty, "x").num_rows == 0
    const = ray.data.from_arrow(pa.table({"x": pa.array([7.0] * 100, pa.float64())}))
    out = rank_select_quantiles(const, "x", (0.0, 0.5, 1.0)).to_pandas()
    assert (out.v == 7.0).all()


@pytest.mark.usefixtures("ray_session")
def test_quantiles_exclude_nulls():
    """n counts NON-NULL values (SQL aggregate semantics); all-null is empty."""
    import ray.data

    v = [None, 1.0, None, 2.0, 3.0, None, 4.0, 5.0]
    ds = ray.data.from_arrow(pa.table({"x": pa.array(v, pa.float64())})).repartition(3)
    out = rank_select_quantiles(ds, "x", (0.0, 0.5, 1.0)).to_pandas()
    assert list(out.v) == [1.0, 3.0, 5.0]  # ranks over the 5 non-null values
    allnull = ray.data.from_arrow(pa.table({"x": pa.array([None, None], pa.float64())}))
    assert rank_select_quantiles(allnull, "x").num_rows == 0
