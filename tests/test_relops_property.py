"""Hypothesis properties for the session-3 relational operators:
algebraic identities that must hold for ANY input, not just the seeded
frames the example tests use.

- set ops: multiset identities |A∩B| + |A\\B| = |A| (ALL forms) and
  intersect/except/union consistency with Python Counters.
- grouping sets: every coarse set's aggregates equal re-aggregating the
  finest set; the () row equals the whole-input aggregate.
- global ranks: row_number is a permutation of 1..N; rank/dense_rank are
  the textbook functions of the sorted peer sequence.
"""

from collections import Counter

import numpy as np
import pandas as pd
import pytest
import ray
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_framework_ray.stages.ranking import global_ranks
from etl_framework_ray.stages.rollup import grouping_sets, rollup_sets
from etl_framework_ray.stages.setops import except_all, intersect_all

rows = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c", None]),
        st.one_of(st.none(), st.integers(0, 5)),
    ),
    min_size=0,
    max_size=60,
)


def _df(data):
    return pd.DataFrame(data, columns=["g", "v"]).astype({"v": "float64"})


def _bag(df):
    if not len(df):  # Ray's empty to_pandas drops columns
        return Counter()
    return Counter(
        (g if g is not None and g == g else None, None if v != v else v)
        for g, v in zip(df["g"], df["v"])
    )


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(a=rows, b=rows)
def test_setops_multiset_identities(a, b):
    if not a:
        return  # empty left has no schema — covered by example tests
    da, db = _df(a), _df(b)
    la = ray.data.from_pandas(da).repartition(3)
    if b:
        lb = ray.data.from_pandas(db).repartition(2)
    else:  # schema-preserving empty right side
        lb = ray.data.from_pandas(_df([("zz", 99.0)])).map_batches(
            lambda t: t.slice(0, 0), batch_format="pyarrow"
        )
    inter = _bag(intersect_all(la, lb).to_pandas())
    exc = _bag(except_all(la, lb).to_pandas())
    ca, cb = _bag(da), _bag(db)
    assert inter == ca & cb
    assert exc == ca - cb
    # |A∩B| + |A\B| = |A| (multiset partition of the left side)
    assert inter + exc == ca


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(data=rows)
def test_grouping_sets_coarse_equals_reaggregated_fine(data):
    if not data:
        return
    df = _df(data)
    out = grouping_sets(
        ray.data.from_pandas(df).repartition(3),
        rollup_sets(["g"]),
        {"n": ("count", None), "s": ("sum", "v")},
    ).to_pandas()
    fine = out[out["grouping_id"] == 0]
    total = out[out["grouping_id"] == 1]
    assert len(total) == 1
    assert total["n"].iloc[0] == fine["n"].sum() == len(df)
    s_fine = fine["s"].dropna().sum()
    if df["v"].notna().any():
        assert np.isclose(total["s"].iloc[0], s_fine)
        assert np.isclose(s_fine, df["v"].sum())
    else:
        assert pd.isna(total["s"].iloc[0])


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(st.one_of(st.none(), st.integers(0, 8)), min_size=1, max_size=80)
)
def test_global_ranks_are_the_textbook_functions(vals):
    df = pd.DataFrame({
        "v": pd.array([float(v) if v is not None else np.nan for v in vals]),
        "k": np.arange(len(vals), dtype="int64"),
    })
    out = (
        global_ranks(
            ray.data.from_pandas(df).repartition(4), ["v", "k"], peer_cols=1,
            shuffle_buckets=3,
        )
        .to_pandas()
        .sort_values("row_number")
        .reset_index(drop=True)
    )
    n = len(df)
    assert sorted(out["row_number"]) == list(range(1, n + 1))
    # rebuild expected ranks from the sorted peer sequence
    key = out["v"].to_numpy()
    new_peer = np.ones(n, bool)
    if n > 1:
        a, b = key[1:], key[:-1]
        same = (a == b) | (pd.isna(a) & pd.isna(b))
        new_peer[1:] = ~same
    dense = np.cumsum(new_peer)
    starts = np.flatnonzero(new_peer)
    assert (out["dense_rank"].to_numpy() == dense).all()
    assert (out["rank"].to_numpy() == starts[dense - 1] + 1).all()
