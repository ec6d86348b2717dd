"""global_sort + export_sorted: total order across streamed blocks,
ordered resumable parquet export, crash-resume rewrites only missing
parts."""

import glob
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest
import ray

from etl_framework_ray.stages.ranking import export_sorted, global_sort


def _frame(seed=23, n=4000):
    rng = np.random.default_rng(seed)
    v = pd.Series(rng.integers(0, 50, n).astype("float64"))
    v[rng.random(n) < 0.05] = np.nan
    return pd.DataFrame({"v": v, "k": rng.permutation(n).astype("int64")})


@pytest.mark.usefixtures("ray_session")
def test_global_sort_is_totally_ordered():
    df = _frame()
    out = global_sort(
        ray.data.from_pandas(df).repartition(9), ["v", "k"], descending=[True, False]
    ).to_pandas()
    exp = df.sort_values(["v", "k"], ascending=[False, True],
                         na_position="last").reset_index(drop=True)
    pd.testing.assert_frame_equal(out.reset_index(drop=True), exp)


@pytest.mark.usefixtures("ray_session")
def test_export_sorted_resumable(tmp_path):
    df = _frame(seed=3, n=2500)
    out = str(tmp_path / "exp")
    r = export_sorted(
        ray.data.from_pandas(df).repartition(6), out, ["v", "k"],
        shuffle_buckets=4,
    )
    assert r["rows"] == len(df)
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    parts = sorted(glob.glob(os.path.join(out, "part-*.parquet")))
    got = pd.concat([pq.read_table(p).to_pandas() for p in parts], ignore_index=True)
    exp = df.sort_values(["v", "k"], na_position="last").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)

    # resume: delete one part; rerun rewrites ONLY it (others untouched)
    victim = parts[1]
    keep_mtime = {p: os.path.getmtime(p) for p in parts if p != victim}
    os.remove(victim)
    r2 = export_sorted(
        ray.data.from_pandas(df).repartition(6), out, ["v", "k"],
        shuffle_buckets=4,
    )
    assert os.path.exists(victim)
    for p, m in keep_mtime.items():
        assert os.path.getmtime(p) == m
    got2 = pd.concat(
        [pq.read_table(p).to_pandas() for p in sorted(glob.glob(os.path.join(out, "part-*.parquet")))],
        ignore_index=True,
    )
    pd.testing.assert_frame_equal(got2, exp)
