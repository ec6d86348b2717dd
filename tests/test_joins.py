"""As-of join unit tests: backward pick, left-join nulls, key isolation,
partition invariance."""

import numpy as np
import pandas as pd
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


from hypothesis import given, settings
from hypothesis import strategies as st


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=12, deadline=None)
@given(
    n_left=st.integers(1, 60),
    n_right=st.integers(0, 60),
    n_keys=st.integers(1, 6),
    seed=st.integers(0, 10_000),
)
def test_asof_matches_pandas_merge_asof(n_left, n_right, n_keys, seed):
    """Property: asof_join ≡ pandas.merge_asof (backward, by-key) on
    random inputs — an independent oracle implementation."""
    import pandas as pd
    import ray.data

    rng = np.random.default_rng(seed)
    left = pa.table(
        {
            "eid": pa.array(range(n_left), pa.int64()),
            "k": pa.array(rng.integers(0, n_keys, n_left), pa.int64()),
            "t": pa.array(np.round(rng.uniform(0, 100, n_left), 3), pa.float64()),
        }
    )
    # unique (k, rt) on the right: ties are pre-reduced by contract
    rk = rng.integers(0, n_keys, n_right)
    rt = np.round(rng.uniform(0, 100, n_right), 3)
    rdf = (
        pd.DataFrame({"k": rk, "rt": rt, "v": np.arange(n_right, dtype=np.int64)})
        .drop_duplicates(["k", "rt"])
        .reset_index(drop=True)
    )
    right = pa.Table.from_pandas(rdf, preserve_index=False)

    got = (
        asof_join(
            ray.data.from_arrow(left).repartition(3),
            ray.data.from_arrow(right),
            left_by="k",
            right_by="k",
            left_on="t",
            right_on="rt",
            right_cols=["rt", "v"],
            shuffle_buckets=4,
        )
        .to_pandas()
        .sort_values("eid")
        .reset_index(drop=True)
    )
    exp = pd.merge_asof(
        left.to_pandas().sort_values("t"),
        rdf.sort_values("rt"),
        left_on="t",
        right_on="rt",
        by="k",
        direction="backward",
        allow_exact_matches=True,
    ).sort_values("eid").reset_index(drop=True)
    assert list(got.eid) == list(exp.eid)
    for c, ec in (("r_rt", "rt"), ("r_v", "v")):
        g = got[c].astype("float64")
        e = exp[ec].astype("float64")
        assert ((g.isna() & e.isna()) | (g == e)).all(), c


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=10, deadline=None)
@given(
    n_left=st.integers(1, 40),
    n_right=st.integers(0, 40),
    span=st.sampled_from([1.0, 7.5, 50.0]),
    seed=st.integers(0, 10_000),
)
def test_trailing_window_matches_bruteforce(n_left, n_right, span, seed):
    """Property: trailing_window_join ≡ the O(L×R) brute force."""
    import ray.data

    from etl_framework_ray.stages.joins import trailing_window_join

    rng = np.random.default_rng(seed)
    lk = rng.integers(0, 4, n_left)
    lt = np.round(rng.uniform(0, 100, n_left), 3)
    rk = rng.integers(0, 4, n_right)
    rt = np.round(rng.uniform(0, 100, n_right), 3)
    rv = np.round(rng.uniform(0, 10, n_right), 3)
    left = pa.table(
        {
            "eid": pa.array(range(n_left), pa.int64()),
            "k": pa.array(lk, pa.int64()),
            "t": pa.array(lt, pa.float64()),
        }
    )
    right = pa.table(
        {"k": pa.array(rk, pa.int64()), "rt": pa.array(rt, pa.float64()), "v": pa.array(rv, pa.float64())}
    )
    got = (
        trailing_window_join(
            ray.data.from_arrow(left).repartition(2),
            ray.data.from_arrow(right).repartition(2),
            left_by="k",
            right_by="k",
            left_on="t",
            right_on="rt",
            value_col="v",
            span_s=span,
            shuffle_buckets=3,
        )
        .to_pandas()
        .set_index("eid")
        .sort_index()
    )
    for i in range(n_left):
        mask = (rk == lk[i]) & (rt > lt[i] - span) & (rt <= lt[i])
        assert got.loc[i].n_right == int(mask.sum()), i
        assert abs(got.loc[i].sum_value - float(rv[mask].sum())) < 1e-9, i


@pytest.mark.usefixtures("ray_session")
def test_group_topk_semantics():
    import ray.data

    from etl_framework_ray.stages.joins import group_topk

    t = pa.table(
        {
            "g": pa.array([1, 1, 1, 1, 2, 2, 3], pa.int64()),
            "id": pa.array([10, 11, 12, 13, 20, 21, 30], pa.int64()),
            "v": pa.array([5.0, 9.0, 9.0, 1.0, 2.0, 2.0, 7.0], pa.float64()),
        }
    )
    out = (
        group_topk(
            ray.data.from_arrow(t).repartition(3), "g", ["v", "id"], k=2,
            descending=[True, False], shuffle_buckets=2,
        )
        .to_pandas()
        .sort_values(["g", "v", "id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    # group 1: the two v=9 rows, tie-broken by id ASC; group 2: both rows;
    # group 3: its single row
    assert list(zip(out.g, out.id)) == [(1, 11), (1, 12), (2, 20), (2, 21), (3, 30)]


@pytest.mark.usefixtures("ray_session")
def test_group_topk_keeps_null_group():
    """SQL's ROW_NUMBER PARTITION BY keeps the NULL partition; so must we
    (and a null in one block must not split an int group across buckets)."""
    import ray.data

    from etl_framework_ray.stages.joins import group_topk

    a = pa.table(
        {
            "g": pa.array([1, 1, None], pa.int64()),
            "id": pa.array([1, 2, 3], pa.int64()),
            "v": pa.array([5.0, 6.0, 9.0], pa.float64()),
        }
    )
    b = pa.table(
        {
            "g": pa.array([1, None], pa.int64()),
            "id": pa.array([4, 5], pa.int64()),
            "v": pa.array([7.0, 1.0], pa.float64()),
        }
    )
    out = (
        group_topk(
            ray.data.from_arrow([a, b]), "g", ["v", "id"], k=2,
            descending=[True, False], shuffle_buckets=2,
        )
        .to_pandas()
    )
    grp1 = out[out.g == 1]
    # group 1 spans both blocks (one of which holds a null): top-2 = ids 4,2
    assert sorted(grp1.id) == [2, 4]
    nulls = out[out.g.isna()]
    assert sorted(nulls.id) == [3, 5]  # the NULL partition survives, top-2


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=10, deadline=None)
@given(
    n=st.integers(1, 80),
    n_groups=st.integers(1, 8),
    k=st.integers(1, 4),
    seed=st.integers(0, 10_000),
)
def test_group_topk_matches_pandas_reference(n, n_groups, k, seed):
    """Property: group_topk ≡ pandas sort+groupby.head on random inputs
    (unique tie-breaker guarantees a single correct answer)."""
    import ray.data

    from etl_framework_ray.stages.joins import group_topk

    rng = np.random.default_rng(seed)
    df = {
        "g": rng.integers(0, n_groups, n),
        "id": np.arange(n, dtype=np.int64),
        "v": np.round(rng.uniform(0, 10, n), 2),
    }
    t = pa.table({c: pa.array(v) for c, v in df.items()})
    got = (
        group_topk(
            ray.data.from_arrow(t).repartition(3), "g", ["v", "id"], k=k,
            descending=[True, False], shuffle_buckets=3,
        )
        .to_pandas()
        .sort_values(["g", "id"])
        .reset_index(drop=True)
    )
    import pandas as pd

    exp = (
        pd.DataFrame(df)
        .sort_values(["v", "id"], ascending=[False, True], kind="mergesort")
        .groupby("g", sort=False)
        .head(k)
        .sort_values(["g", "id"])
        .reset_index(drop=True)
    )
    assert got[["g", "id"]].astype("int64").equals(exp[["g", "id"]].astype("int64"))


@pytest.mark.usefixtures("ray_session")
def test_asof_tie_break_in_kernel():
    """tie_break='max'/'min' resolves duplicate (key, time) right rows
    inside the bucket kernel — no pre-reduce shuffle required."""
    import ray.data

    left = pa.table(
        {
            "eid": pa.array([1], pa.int64()),
            "k": pa.array([10], pa.int64()),
            "t": pa.array([15.0], pa.float64()),
        }
    )
    right = pa.table(
        {
            "k": pa.array([10, 10, 10], pa.int64()),
            "rt": pa.array([10.0, 10.0, 10.0], pa.float64()),
            "v": pa.array([7, 2, 9], pa.int64()),
        }
    )
    for tb, want in (("max", 9), ("min", 2)):
        out = (
            asof_join(
                ray.data.from_arrow(left),
                ray.data.from_arrow(right).repartition(3),
                left_by="k",
                right_by="k",
                left_on="t",
                right_on="rt",
                right_cols=["v"],
                shuffle_buckets=2,
                tie_break=tb,
            )
            .to_pandas()
            .set_index("eid")
        )
        assert out.loc[1].r_v == want, tb

@pytest.mark.usefixtures("ray_session")
def test_reserved_columns_rejected_on_both_sides(tmp_path):
    """_key/_t are exchange-internal names; both sides must reject them
    (the right side used to silently overwrite such a payload column)."""
    import ray.data

    from etl_framework_ray.stages.joins import asof_join

    left = ray.data.from_arrow(
        pa.table({"k": [1], "ts": [1.0], "_t": [9.9]})
    )
    right = ray.data.from_arrow(
        pa.table({"k": [1], "ts": [0.5], "_t": [7.7], "v": [2.0]})
    )
    ok_left = ray.data.from_arrow(pa.table({"k": [1], "ts": [1.0]}))
    with pytest.raises(ValueError, match="_t"):
        asof_join(left, right, left_by="k", left_on="ts", right_by="k", right_on="ts",
                  right_cols=["v"])
    with pytest.raises(ValueError, match="_t"):
        asof_join(ok_left, right, left_by="k", left_on="ts", right_by="k", right_on="ts",
                  right_cols=["_t", "v"])


# ---------------------------------------------------------------------------
# equi_join — the large-large hash join on the same direct exchange
# ---------------------------------------------------------------------------


@pytest.mark.usefixtures("ray_session")
def test_equi_join_inner_matches_pandas():
    import pandas as pd
    import ray.data

    from etl_framework_ray.stages.joins import equi_join

    rng = np.random.default_rng(7)
    ldf = pd.DataFrame(
        {"k": rng.integers(0, 50, 500), "x": rng.normal(size=500)}
    )
    rdf = pd.DataFrame(
        {"rk": rng.integers(0, 60, 80), "seg": [f"s{i % 5}" for i in range(80)]}
    )
    out = (
        equi_join(
            ray.data.from_pandas(ldf).repartition(5),
            ray.data.from_pandas(rdf).repartition(3),
            left_on="k",
            right_on="rk",
            right_cols=["seg"],
            shuffle_buckets=4,
        )
        .to_pandas()
        .sort_values(["k", "x", "r_seg"])
        .reset_index(drop=True)
    )
    want = (
        ldf.merge(rdf, left_on="k", right_on="rk", how="inner")[["k", "x", "seg"]]
        .rename(columns={"seg": "r_seg"})
        .sort_values(["k", "x", "r_seg"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out[["k", "x", "r_seg"]], want)


@pytest.mark.usefixtures("ray_session")
def test_equi_join_left_nulls_and_types():
    """LEFT semantics: unmatched rows carry typed nulls (int64 right
    payload must not widen to float64); NULL keys never match."""
    import ray.data

    from etl_framework_ray.stages.joins import equi_join

    left = pa.table(
        {
            "k": pa.array([1, 2, None, 4], pa.int64()),
            "x": pa.array([10, 20, 30, 40], pa.int64()),
        }
    )
    right = pa.table(
        {
            "k2": pa.array([1, None], pa.int64()),
            "v": pa.array([100, 999], pa.int64()),
        }
    )
    out = equi_join(
        ray.data.from_arrow(left).repartition(2),
        ray.data.from_arrow(right),
        left_on="k",
        right_on="k2",
        right_cols=["v"],
        how="left",
        shuffle_buckets=3,
    )
    t = pa.concat_tables(
        [pa.table(b) for b in out.iter_batches(batch_format="pyarrow")]
    )
    assert t.schema.field("r_v").type == pa.int64()
    df = t.to_pandas().sort_values("x").reset_index(drop=True)
    assert len(df) == 4
    assert df.loc[0, "r_v"] == 100  # k=1 matched
    assert pd.isna(df.loc[1, "r_v"])  # k=2 unmatched
    assert pd.isna(df.loc[2, "r_v"])  # NULL key never matches (not 999)
    assert pd.isna(df.loc[3, "r_v"])  # k=4 unmatched


@pytest.mark.usefixtures("ray_session")
def test_equi_join_empty_right_and_duplicate_keys():
    import ray.data

    from etl_framework_ray.stages.joins import equi_join

    left = ray.data.from_arrow(pa.table({"k": [1, 1], "x": [1.0, 2.0]}))
    empty = ray.data.from_arrow(
        pa.table({"k2": pa.array([], pa.int64()), "v": pa.array([], pa.string())})
    ).filter(lambda r: False)
    assert (
        equi_join(left, empty, left_on="k", right_on="k2", right_cols=["v"]).count()
        == 0
    )
    # duplicate right keys multiply rows (2 left × 2 right = 4)
    dup = ray.data.from_arrow(pa.table({"k2": [1, 1], "v": ["a", "b"]}))
    assert (
        equi_join(left, dup, left_on="k", right_on="k2", right_cols=["v"]).count() == 4
    )


@pytest.mark.usefixtures("ray_session")
def test_asof_nullable_int_key_routing():
    """Regression: an int64 key column flips to float64 hashing only in
    blocks holding a null — one key must not split across buckets when
    another block of the same side (or the other side) is null-free."""
    import ray.data

    left = pa.table(
        {
            "k": pa.array([7, 7, None], pa.int64()),  # block WITH a null
            "t": pa.array([10.0, 20.0, 5.0], pa.float64()),
        }
    )
    right = pa.table(
        {
            "k": pa.array([7], pa.int64()),  # null-free block
            "rt": pa.array([9.0], pa.float64()),
            "v": pa.array(["hit"], pa.string()),
        }
    )
    out = (
        asof_join(
            ray.data.from_arrow(left),
            ray.data.from_arrow(right),
            left_by="k",
            right_by="k",
            left_on="t",
            right_on="rt",
            right_cols=["v"],
            shuffle_buckets=7,
        )
        .to_pandas()
        .sort_values("t")
        .reset_index(drop=True)
    )
    assert list(out["r_v"]) == [None, "hit", "hit"]


@pytest.mark.usefixtures("ray_session")
def test_equi_join_semi_anti():
    """semi keeps matched left rows exactly once (no multiplication from
    duplicate right keys); anti keeps the complement INCLUDING null-key
    rows (SQL NOT EXISTS)."""
    import ray.data

    from etl_framework_ray.stages.joins import equi_join

    left = pa.table(
        {
            "k": pa.array([1, 1, 2, None, 4], pa.int64()),
            "x": pa.array([10, 11, 20, 30, 40], pa.int64()),
        }
    )
    right = pa.table({"k2": pa.array([1, 1, 9, None], pa.int64())})
    lds = ray.data.from_arrow(left).repartition(2)
    rds = ray.data.from_arrow(right)
    semi = (
        equi_join(lds, rds, left_on="k", right_on="k2", right_cols=[], how="semi",
                  shuffle_buckets=3)
        .to_pandas().sort_values("x").reset_index(drop=True)
    )
    assert list(semi["x"]) == [10, 11]  # both k=1 rows, no multiplication
    assert list(semi.columns) == ["k", "x"]
    anti = (
        equi_join(lds, rds, left_on="k", right_on="k2", right_cols=[], how="anti",
                  shuffle_buckets=3)
        .to_pandas().sort_values("x").reset_index(drop=True)
    )
    assert list(anti["x"]) == [20, 30, 40]  # null-key row survives anti
    with pytest.raises(ValueError, match="no right payload"):
        equi_join(lds, rds, left_on="k", right_on="k2", right_cols=["k2"], how="semi")


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=10, deadline=None)
@given(
    n_left=st.integers(0, 60),
    n_right=st.integers(0, 60),
    n_keys=st.integers(1, 8),
    how=st.sampled_from(["inner", "left", "semi", "anti"]),
    seed=st.integers(0, 10_000),
)
def test_equi_join_matches_pandas_property(n_left, n_right, n_keys, how, seed):
    """Property: equi_join ≡ pandas merge / isin on random frames with
    duplicate keys and ~10% null keys, across all four modes."""
    import ray.data

    from etl_framework_ray.stages.joins import equi_join

    rng = np.random.default_rng(seed)

    def keys(n):
        k = rng.integers(0, n_keys, n).astype(float)
        k[rng.random(n) < 0.1] = np.nan
        return k

    ldf = pd.DataFrame({"k": keys(n_left), "x": rng.integers(0, 1000, n_left)})
    rdf = pd.DataFrame({"rk": keys(n_right), "v": rng.normal(size=n_right)})
    lt = pa.table({"k": pa.array(ldf["k"]), "x": pa.array(ldf["x"], pa.int64())})
    rt = pa.table({"rk": pa.array(rdf["rk"]), "v": pa.array(rdf["v"])})
    if n_left == 0:
        return  # empty left has no schema; the API requires one
    lds = ray.data.from_arrow(lt).repartition(3)
    rds = ray.data.from_arrow(rt).repartition(2) if n_right else ray.data.from_arrow(rt)
    got = equi_join(
        lds, rds, left_on="k", right_on="rk",
        right_cols=[] if how in ("semi", "anti") else ["v"],
        how=how, shuffle_buckets=4,
    ).to_pandas()

    l2 = ldf.copy()
    r2 = rdf.dropna(subset=["rk"])
    if how in ("semi", "anti"):
        member = l2["k"].isin(r2["rk"].unique()) & l2["k"].notna()
        want = l2[member if how == "semi" else ~member][["k", "x"]]
        key_cols = ["k", "x"]
    else:
        want = l2.merge(
            r2.rename(columns={"v": "r_v"}), left_on="k", right_on="rk", how=how
        )[["k", "x", "r_v"]]
        if how == "inner":
            want = want[want["k"].notna()]
        key_cols = ["k", "x", "r_v"]
    if len(want) == 0:
        # Ray's to_pandas() on an all-empty dataset returns a columnless
        # frame (the Dataset schema itself is correct) — row count is the
        # only comparable fact
        assert len(got) == 0
        return
    g = got[key_cols].sort_values(key_cols).reset_index(drop=True)
    w = want.sort_values(key_cols).reset_index(drop=True)
    assert len(g) == len(w), (len(g), len(w))
    for c in key_cols:
        a, b = g[c].to_numpy(dtype=float), w[c].to_numpy(dtype=float)
        assert np.allclose(a, b, equal_nan=True), c


# ---------------------------------------------------------------------------
# resolve_buckets — explicit counts are exact; auto counts pin per job
# ---------------------------------------------------------------------------


@pytest.mark.usefixtures("ray_session")
def test_resolve_buckets_explicit_is_exact():
    from etl_framework_ray.stages.joins import resolve_buckets

    assert resolve_buckets(3) == 3
    assert resolve_buckets(1) == 1
    assert resolve_buckets(500) == 500  # no clamp on explicit counts
    with pytest.raises(ValueError):
        resolve_buckets(0)


@pytest.mark.usefixtures("ray_session")
def test_resolve_buckets_auto_pins_across_cluster_resizes(monkeypatch):
    """Auto bucket counts resolve ONCE per job: on an autoscaling cluster
    ray.cluster_resources() moves between a pipeline's stages, and two
    exchanges disagreeing on bucket count would re-route keys
    mid-pipeline. The pinned value must survive a CPU-count change."""
    import ray as _ray

    from etl_framework_ray.stages import joins as joins_mod

    monkeypatch.setattr(joins_mod, "_PINNED_AUTO_BUCKETS", {})
    first = joins_mod.resolve_buckets(None)
    # cluster "scales" 8x mid-pipeline; the pinned count must not move
    real = _ray.cluster_resources

    def inflated():
        res = dict(real())
        res["CPU"] = res.get("CPU", 4) * 8
        return res

    monkeypatch.setattr(_ray, "cluster_resources", inflated)
    assert joins_mod.resolve_buckets(None) == first


# ---------------------------------------------------------------------------
# equi_join how="outer" — FULL OUTER vs DuckDB (null keys, coalesced key)
# ---------------------------------------------------------------------------


@pytest.mark.usefixtures("ray_session")
def test_equi_join_outer_matches_duckdb():
    import duckdb
    import ray.data

    from etl_framework_ray.stages.joins import equi_join

    left = pa.table(
        {
            "k": pa.array([1, 2, 2, None, 5], pa.int64()),
            "x": pa.array(["a", "b", "c", "d", "e"], pa.string()),
        }
    )
    right = pa.table(
        {
            "k": pa.array([2, 3, None], pa.int64()),
            "v": pa.array([20.0, 30.0, 99.0], pa.float64()),
        }
    )
    got = (
        equi_join(
            ray.data.from_arrow(left).repartition(3),
            ray.data.from_arrow(right).repartition(2),
            left_on="k",
            right_on="k",
            right_cols=["v"],
            how="outer",
            shuffle_buckets=4,
        )
        .to_pandas()
        .sort_values(["k", "x", "r_v"], na_position="last")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    exp = con.sql(
        """
        SELECT COALESCE(l.k, r.k) AS k, l.x, r.v AS r_v
        FROM l FULL OUTER JOIN r ON l.k = r.k
        ORDER BY k NULLS LAST, x NULLS LAST, r_v NULLS LAST
        """
    ).df()
    assert len(got) == len(exp) == 7  # 1,2x2 matches, null-l, 5, r-only 3, r null
    for c in ("k", "x", "r_v"):
        a = [x if pd.notna(x) else None for x in got[c]]
        b = [x if pd.notna(x) else None for x in exp[c]]
        assert a == b, c


@pytest.mark.usefixtures("ray_session")
def test_equi_join_outer_empty_sides():
    import ray.data

    from etl_framework_ray.stages.joins import equi_join

    left = pa.table({"k": pa.array([1], pa.int64()), "x": pa.array(["a"], pa.string())})
    right = pa.table({"k": pa.array([7], pa.int64()), "v": pa.array([70.0], pa.float64())})
    empty_r = right.slice(0, 0)
    # empty right: left rows survive with null payload
    out = equi_join(
        ray.data.from_arrow(left), ray.data.from_arrow(empty_r),
        left_on="k", right_on="k", right_cols=["v"], how="outer", shuffle_buckets=2,
    ).to_pandas()
    assert out["k"].tolist() == [1] and pd.isna(out["r_v"]).all()
    # disjoint keys: both rows survive; right-only row carries the key
    out2 = (
        equi_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            left_on="k", right_on="k", right_cols=["v"], how="outer", shuffle_buckets=2,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out2["k"].tolist() == [1, 7]
    assert out2["x"].tolist()[0] == "a" and pd.isna(out2["x"][1])
    assert pd.isna(out2["r_v"][0]) and out2["r_v"][1] == 70.0


@pytest.mark.usefixtures("ray_session")
def test_equi_join_right_matches_duckdb():
    import duckdb
    import ray.data

    from etl_framework_ray.stages.joins import equi_join

    left = pa.table(
        {
            "k": pa.array([1, 2, 2, None, 5], pa.int64()),
            "x": pa.array(["a", "b", "c", "d", "e"], pa.string()),
        }
    )
    right = pa.table(
        {
            "k": pa.array([2, 3, None], pa.int64()),
            "v": pa.array([20.0, 30.0, 99.0], pa.float64()),
        }
    )
    got = (
        equi_join(
            ray.data.from_arrow(left).repartition(3),
            ray.data.from_arrow(right).repartition(2),
            left_on="k",
            right_on="k",
            right_cols=["v"],
            how="right",
            shuffle_buckets=4,
        )
        .to_pandas()
        .sort_values(["k", "x", "r_v"], na_position="last")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    exp = con.sql(
        """
        SELECT COALESCE(l.k, r.k) AS k, l.x, r.v AS r_v
        FROM l RIGHT JOIN r ON l.k = r.k
        ORDER BY k NULLS LAST, x NULLS LAST, r_v NULLS LAST
        """
    ).df()
    # 2 matches (2x b, 2x c), right-only 3, right NULL key -> 4 rows
    assert len(got) == len(exp) == 4
    for c in ("k", "x", "r_v"):
        a = [x if pd.notna(x) else None for x in got[c]]
        b = [x if pd.notna(x) else None for x in exp[c]]
        assert a == b, c

    # empty right -> empty result (unlike outer, left rows drop)
    out = equi_join(
        ray.data.from_arrow(left),
        ray.data.from_arrow(right.slice(0, 0)),
        left_on="k", right_on="k", right_cols=["v"], how="right", shuffle_buckets=2,
    ).to_pandas()
    assert len(out) == 0
