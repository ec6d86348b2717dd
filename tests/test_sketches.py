"""HyperLogLog distinct-count sketch: accuracy vs exact, merge invariance."""

import numpy as np
import pandas as pd
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


@pytest.mark.usefixtures("ray_session")
def test_bloom_no_false_negatives_and_low_fpr():
    import ray.data

    from etl_framework_ray.stages.sketches import bloom_build, bloom_probe

    members = [f"key-{i}" for i in range(5_000)]
    non_members = [f"other-{i}" for i in range(20_000)]
    small = ray.data.from_arrow(pa.table({"k": pa.array(members, pa.string())})).repartition(4)
    bits = bloom_build(small, "k", num_bits=1 << 17, k=4)  # ~26 bits/key

    probe_tbl = pa.table({"k": pa.array(members + non_members, pa.string())})
    kept = bloom_probe(
        ray.data.from_arrow(probe_tbl).repartition(4), "k", bits, num_bits=1 << 17, k=4
    ).to_pandas()
    kept_set = set(kept.k)
    # ZERO false negatives: every member survives
    assert all(m in kept_set for m in members)
    # false-positive rate small
    fpr = (len(kept) - len(members)) / len(non_members)
    assert fpr < 0.01, fpr


@pytest.mark.usefixtures("ray_session")
def test_bloom_semi_join_prefilter_exactness():
    """bloom_probe + exact filter == exact semi-join (the pre-filter
    composes without changing results)."""
    import ray.data

    from etl_framework_ray.stages.sketches import bloom_build, bloom_probe

    rng = np.random.default_rng(6)
    big = pa.table(
        {
            "k": pa.array(rng.integers(0, 10_000, 50_000), pa.int64()),
            "v": pa.array(rng.standard_normal(50_000), pa.float64()),
        }
    )
    small_keys = np.unique(rng.integers(0, 10_000, 300))
    small = ray.data.from_arrow(pa.table({"k": pa.array(small_keys, pa.int64())}))
    bits = bloom_build(small, "k", num_bits=1 << 14, k=4)
    pre = bloom_probe(ray.data.from_arrow(big).repartition(4), "k", bits, num_bits=1 << 14, k=4)

    keyset = set(int(x) for x in small_keys)
    exact = pre.map_batches(
        lambda b: b.filter(
            pa.array(np.isin(b.column("k").to_numpy(zero_copy_only=False), small_keys))
        ),
        batch_format="pyarrow",
    ).to_pandas()
    expected = big.to_pandas()
    expected = expected[expected.k.isin(keyset)]
    assert len(exact) == len(expected)
    assert sorted(exact.k) == sorted(expected.k)


@pytest.mark.usefixtures("ray_session")
def test_sketches_dtype_stable_under_nulls():
    """A null in one batch must not flip the hashed dtype (regression:
    pandas dropna/fillna made int64 keys hash as float64 per batch,
    inflating HLL ~2x and zeroing bloom matches)."""
    import ray.data

    from etl_framework_ray.stages.sketches import bloom_build, bloom_probe

    keys = list(range(500))
    block_a = pa.table({"k": pa.array(keys, pa.int64())})
    block_b = pa.table({"k": pa.array(keys + [None], pa.int64())})  # same keys + a null
    ds = ray.data.from_arrow([block_a, block_b])
    est = hll_distinct(ds, "k", p=12)
    assert abs(est - 500) / 500 < 0.05, est  # NOT ~1000

    bits = bloom_build(ray.data.from_arrow(block_a), "k", num_bits=1 << 15, k=4)
    kept = bloom_probe(
        ray.data.from_arrow(block_b), "k", bits, num_bits=1 << 15, k=4
    ).to_pandas()
    # zero false negatives even though the probe batch holds a null;
    # the null row itself never matches
    assert sorted(kept.k.dropna()) == keys
    assert kept.k.isna().sum() == 0


@pytest.mark.usefixtures("ray_session")
def test_bloom_probe_validates_sizing():
    import ray.data

    from etl_framework_ray.stages.sketches import bloom_build, bloom_probe

    small = ray.data.from_arrow(pa.table({"k": pa.array([1, 2, 3], pa.int64())}))
    bits = bloom_build(small, "k", num_bits=1 << 14)
    with pytest.raises(ValueError, match="num_bits"):
        bloom_probe(small, "k", bits, num_bits=1 << 20)


def test_bloom_semijoin_exact_with_nulls(ray_session):
    """bloom_semijoin == SQL IN semantics: exactly the left rows whose
    non-null key exists on the right (false positives verified away,
    null keys dropped)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from etl_framework_ray.stages.sketches import bloom_semijoin

    rng = np.random.default_rng(3)
    left_keys = rng.integers(0, 5000, size=20_000).tolist()
    left_keys[7] = None
    left = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(left_keys, pa.int64()),
                "payload": pa.array(range(20_000), pa.int64()),
            }
        )
    ).repartition(5)
    right_keys = rng.choice(5000, size=400, replace=False)
    right = ray.data.from_arrow(
        pa.table({"rk": pa.array(right_keys, pa.int64())})
    ).repartition(3)

    # small filter (high FPR) to make the exact verify do real work
    out = bloom_semijoin(left, "k", right, "rk", num_bits=1 << 12, k=2).to_pandas()
    rset = set(int(x) for x in right_keys)
    expected = [
        (k, p) for p, k in zip(range(20_000), left_keys) if k is not None and k in rset
    ]
    assert len(out) == len(expected)
    got = set(zip(out["k"].astype(int), out["payload"].astype(int)))
    assert got == set(expected)


@pytest.mark.usefixtures("ray_session")
def test_hll_distinct_by_accuracy_and_nulls():
    """Grouped HLL: per-group estimates within the sketch's error bound;
    NULL groups form their own group; NULL values are excluded."""
    import ray.data

    from etl_framework_ray.stages.sketches import hll_distinct_by

    rng = np.random.default_rng(3)
    n = 30_000
    groups = rng.choice(["a", "b", "c"], n).astype(object)
    groups[rng.random(n) < 0.05] = None
    # distinct pools of very different sizes per group
    vals = np.where(
        groups == "a", rng.integers(0, 5000, n),
        np.where(groups == "b", rng.integers(0, 500, n), rng.integers(0, 50, n)),
    ).astype(float)
    vals[rng.random(n) < 0.03] = np.nan
    t = pa.table({"g": pa.array(groups, pa.string()), "v": pa.array(vals, pa.float64())})
    out = (
        hll_distinct_by(ray.data.from_arrow(t).repartition(6), "g", "v", p=12)
        .to_pandas()
        .set_index("g")
    )
    import pandas as pd

    df = pd.DataFrame({"g": groups, "v": vals})
    exact = df.dropna(subset=["v"]).groupby("g", dropna=False)["v"].nunique()
    assert len(out) == 4  # a, b, c, and the NULL group
    for gval, true in exact.items():
        key = gval if not pd.isna(gval) else None
        est = out.loc[key, "approx_distinct"] if key is not None else out[out.index.isna()]["approx_distinct"].iloc[0]
        assert abs(est - true) / true < 0.10, (gval, est, true)


@pytest.mark.usefixtures("ray_session")
def test_hll_distinct_by_partition_invariant():
    """Register merge is max — estimates must not depend on block split."""
    import ray.data

    from etl_framework_ray.stages.sketches import hll_distinct_by

    rng = np.random.default_rng(9)
    t = pa.table(
        {
            "g": pa.array(rng.choice(["x", "y"], 5000)),
            "v": pa.array(rng.integers(0, 800, 5000), pa.int64()),
        }
    )
    a = (
        hll_distinct_by(ray.data.from_arrow(t).repartition(2), "g", "v")
        .to_pandas().sort_values("g").reset_index(drop=True)
    )
    b = (
        hll_distinct_by(ray.data.from_arrow(t).repartition(13), "g", "v")
        .to_pandas().sort_values("g").reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)


@pytest.mark.usefixtures("ray_session")
def test_hll_distinct_by_all_null_group_emits_zero():
    """SQL GROUP BY parity: a group ALL of whose values are NULL still
    emits a row, with COUNT(DISTINCT) = 0 (round 4 closed the omission)."""
    import ray.data

    from etl_framework_ray.stages.sketches import hll_distinct_by

    t = pa.table(
        {
            "g": pa.array(["live", "live", "dead", "dead"], pa.string()),
            "v": pa.array([1.0, 2.0, None, None], pa.float64()),
        }
    )
    out = (
        hll_distinct_by(ray.data.from_arrow(t).repartition(2), "g", "v", p=10)
        .to_pandas()
        .set_index("g")["approx_distinct"]
        .to_dict()
    )
    assert set(out) == {"live", "dead"}
    assert out["dead"] == 0.0
    assert abs(out["live"] - 2) / 2 < 0.25


# ---------------------------------------------------------------------------
# top_frequent — Misra–Gries heavy hitters
# ---------------------------------------------------------------------------


@pytest.mark.usefixtures("ray_session")
def test_top_frequent_exact_when_capacity_covers_distincts():
    import ray.data

    from etl_framework_ray.stages.sketches import top_frequent

    rng = np.random.default_rng(7)
    vals = rng.choice(["a", "b", "c", "d", None], size=5000, p=[0.4, 0.3, 0.2, 0.05, 0.05])
    t = pa.table({"v": pa.array(vals.tolist(), pa.string())})
    out = top_frequent(ray.data.from_arrow(t).repartition(6), "v", k=3, capacity=64)
    s = pd.Series([x for x in vals if x is not None]).value_counts()
    assert out.column("max_undercount").to_pylist() == [0, 0, 0]  # never trimmed → exact
    assert out.column("v").to_pylist() == list(s.index[:3])
    assert out.column("est_count").to_pylist() == s.tolist()[:3]


@pytest.mark.usefixtures("ray_session")
def test_top_frequent_mg_guarantee_under_tight_capacity():
    """With capacity far below the distinct count, every value whose true
    count exceeds the reported undercount bound must be present, and each
    estimate must lower-bound the true count within that bound."""
    import ray.data

    from etl_framework_ray.stages.sketches import top_frequent

    rng = np.random.default_rng(11)
    # zipf-ish: few heavy ids over a long uniform tail
    heavy = np.repeat([1, 2, 3], [4000, 2500, 1500])
    tail = rng.integers(100, 3000, size=4000)
    vals = np.concatenate([heavy, tail])
    rng.shuffle(vals)
    t = pa.table({"v": pa.array(vals, pa.int64())})
    out = top_frequent(ray.data.from_arrow(t).repartition(8), "v", k=16, capacity=32)
    d = out.column("max_undercount")[0].as_py()
    true = pd.Series(vals).value_counts()
    got = dict(zip(out.column("v").to_pylist(), out.column("est_count").to_pylist()))
    for hh in (1, 2, 3):
        assert true[hh] > d, "test needs true heavy hitters above the bound"
        assert hh in got, (hh, d)
        assert got[hh] <= true[hh] <= got[hh] + d
    # ordering: estimates descending
    ests = out.column("est_count").to_pylist()
    assert ests == sorted(ests, reverse=True)


@pytest.mark.usefixtures("ray_session")
def test_top_frequent_empty_and_all_null():
    import ray.data

    from etl_framework_ray.stages.sketches import top_frequent

    t = pa.table({"v": pa.array([None, None], pa.string())})
    out = top_frequent(ray.data.from_arrow(t), "v", k=5, capacity=8)
    assert out.num_rows == 0
    assert out.column("v").type == pa.string()
