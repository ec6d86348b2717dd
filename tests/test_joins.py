"""As-of join unit tests: backward pick, left-join nulls, key isolation,
partition invariance."""

import numpy as np
import pyarrow as pa
import pytest

from etl_framework_ray.stages.joins import asof_join


def _left():
    return pa.table(
        {
            "eid": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "k": pa.array([10, 10, 10, 20, 30], pa.int64()),
            "t": pa.array([5.0, 15.0, 25.0, 9.0, 1.0], pa.float64()),
        }
    )


def _right():
    return pa.table(
        {
            "k": pa.array([10, 10, 20], pa.int64()),
            "rt": pa.array([10.0, 20.0, 9.0], pa.float64()),
            "v": pa.array(["a", "b", "c"], pa.string()),
        }
    )


@pytest.mark.usefixtures("ray_session")
def test_asof_backward_semantics():
    import ray.data

    out = (
        asof_join(
            ray.data.from_arrow(_left()).repartition(3),
            ray.data.from_arrow(_right()).repartition(2),
            left_by="k",
            right_by="k",
            left_on="t",
            right_on="rt",
            right_cols=["rt", "v"],
            shuffle_buckets=4,
        )
        .to_pandas()
        .set_index("eid")
        .sort_index()
    )
    assert out.loc[1].r_v is None  # t=5 precedes every right row of k=10
    assert out.loc[2].r_v == "a" and out.loc[2].r_rt == 10.0  # latest ≤ 15
    assert out.loc[3].r_v == "b" and out.loc[3].r_rt == 20.0  # latest ≤ 25
    assert out.loc[4].r_v == "c"  # boundary: rt == t matches (≤)
    assert out.loc[5].r_v is None  # key 30 has no right rows at all
    assert len(out) == 5  # LEFT join: every left row exactly once


@pytest.mark.usefixtures("ray_session")
def test_asof_partition_invariant():
    import ray.data

    kw = dict(left_by="k", right_by="k", left_on="t", right_on="rt", right_cols=["v"])
    a = asof_join(
        ray.data.from_arrow(_left()), ray.data.from_arrow(_right()), **kw
    ).to_pandas()
    b = asof_join(
        ray.data.from_arrow(_left()).repartition(5),
        ray.data.from_arrow(_right()).repartition(3),
        shuffle_buckets=2,
        **kw,
    ).to_pandas()
    a = a.sort_values("eid").reset_index(drop=True)
    b = b.sort_values("eid").reset_index(drop=True)
    assert a.equals(b)


@pytest.mark.usefixtures("ray_session")
def test_trailing_window_bounds():
    """Window is (t − span, t]: exclusive lower bound, inclusive upper."""
    import ray.data

    from etl_framework_ray.stages.joins import trailing_window_join

    left = pa.table(
        {
            "eid": pa.array([1, 2, 3], pa.int64()),
            "k": pa.array([1, 1, 2], pa.int64()),
            "t": pa.array([10.0, 20.0, 10.0], pa.float64()),
        }
    )
    right = pa.table(
        {
            "k": pa.array([1, 1, 1], pa.int64()),
            "rt": pa.array([5.0, 10.0, 15.0], pa.float64()),
            "v": pa.array([100.0, 10.0, 1.0], pa.float64()),
        }
    )
    out = (
        trailing_window_join(
            ray.data.from_arrow(left).repartition(2),
            ray.data.from_arrow(right),
            left_by="k",
            right_by="k",
            left_on="t",
            right_on="rt",
            value_col="v",
            span_s=5.0,
        )
        .to_pandas()
        .set_index("eid")
        .sort_index()
    )
    # eid=1 at t=10, window (5,10]: rt=5 EXCLUDED, rt=10 INCLUDED
    assert out.loc[1].n_right == 1 and out.loc[1].sum_value == 10.0
    # eid=2 at t=20, window (15,20]: nothing (rt=15 excluded)
    assert out.loc[2].n_right == 0 and out.loc[2].sum_value == 0.0
    # eid=3: key 2 has no right rows at all
    assert out.loc[3].n_right == 0 and out.loc[3].sum_value == 0.0
