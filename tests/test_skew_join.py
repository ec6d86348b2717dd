"""Hot-key broadcast hybrid for equi_join: result equality with the
plain exchange under heavy key skew, all join modes, auto detection,
explicit hot lists, broadcast cap, NULL keys stay on the cold path."""

import numpy as np
import pandas as pd
import pytest
import ray

from etl_framework_ray.stages.joins import equi_join


def _sides(seed=41, n_left=8000, hot_frac=0.5):
    rng = np.random.default_rng(seed)
    n_hot = int(n_left * hot_frac)
    keys = np.concatenate([
        np.full(n_hot, 7, np.int64),                 # one scorching key
        rng.integers(100, 400, n_left - n_hot),      # long cold tail
    ])
    left = pd.DataFrame({
        "k": pd.Series(keys).astype("float64"),
        "lv": rng.normal(size=n_left),
    })
    left.loc[rng.random(n_left) < 0.02, "k"] = np.nan  # NULL keys
    right = pd.DataFrame({
        "rk": np.concatenate([[7, 7], np.arange(100, 350, dtype=np.int64)]).astype("float64"),
        "rv": rng.normal(size=252),
    })
    return left, right


def _norm(df):
    cols = sorted(df.columns)
    return df[cols].sort_values(cols, na_position="first").reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
def test_skew_equals_plain(how):
    l, r = _sides()
    rc = [] if how in ("semi", "anti") else ["rv"]
    lds = ray.data.from_pandas(l).repartition(8)
    rds = ray.data.from_pandas(r).repartition(3)
    plain = _norm(equi_join(lds, rds, "k", "rk", rc, how=how).to_pandas())
    stats: dict = {}
    hybrid = _norm(
        equi_join(lds, rds, "k", "rk", rc, how=how, skew="auto",
                  stats_out=stats).to_pandas()
    )
    assert stats["skew_hot_keys"] >= 1  # the scorching key was detected
    assert stats["skew_broadcast_rows"] >= 2
    pd.testing.assert_frame_equal(hybrid, plain)


@pytest.mark.usefixtures("ray_session")
def test_explicit_hot_list_and_left_only_hot_key():
    l, r = _sides(seed=5, n_left=2000)
    lds, rds = ray.data.from_pandas(l), ray.data.from_pandas(r)
    # 999 is hot-listed but absent from the right: LEFT join must keep
    # its rows with NULL payload, map-side
    l2 = pd.concat([l, pd.DataFrame({"k": [999.0] * 50, "lv": 1.0})], ignore_index=True)
    lds2 = ray.data.from_pandas(l2)
    plain = _norm(equi_join(lds2, rds, "k", "rk", ["rv"], how="left").to_pandas())
    hybrid = _norm(
        equi_join(lds2, rds, "k", "rk", ["rv"], how="left",
                  skew=[7.0, 999.0]).to_pandas()
    )
    pd.testing.assert_frame_equal(hybrid, plain)


@pytest.mark.usefixtures("ray_session")
def test_broadcast_cap_fails_loud_and_outer_rejected():
    l, r = _sides(seed=9, n_left=500)
    lds, rds = ray.data.from_pandas(l), ray.data.from_pandas(r)
    with pytest.raises(ValueError, match="max_broadcast_rows"):
        equi_join(lds, rds, "k", "rk", ["rv"], skew=[7.0],
                  max_broadcast_rows=1).to_pandas()
    with pytest.raises(ValueError, match="outer"):
        equi_join(lds, rds, "k", "rk", ["rv"], how="outer", skew="auto")


@pytest.mark.usefixtures("ray_session")
def test_no_hot_keys_falls_back_to_plain():
    rng = np.random.default_rng(3)
    l = pd.DataFrame({"k": rng.permutation(3000).astype("float64"), "lv": 1.0})
    r = pd.DataFrame({"rk": np.arange(1000).astype("float64"), "rv": 2.0})
    stats: dict = {}
    out = equi_join(
        ray.data.from_pandas(l), ray.data.from_pandas(r), "k", "rk", ["rv"],
        skew="auto", stats_out=stats,
    ).to_pandas()
    assert stats["skew_hot_keys"] == 0
    assert len(out) == 1000
