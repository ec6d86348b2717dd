"""Incrementally-maintained per-(conversation, role) stats: advance ≡
rebuild, trickle edits touch one partition, the derived ROLLUP(role)
report equals a from-scratch recompute (incl. NULL roles)."""

import numpy as np
import pandas as pd
import pytest

from etl_framework_ray.pipelines.cdc import CDCEngine
from etl_framework_ray.pipelines.incremental import IncrementalRoleStats
from etl_framework_ray.sources.changelog import ChangeLog
from etl_framework_ray.sources.generator import GenConfig, generate_changelog

from test_incremental import _manual_rows


def _expected_rollup(eng) -> pd.DataFrame:
    snap = eng.snapshot_arrow().to_pandas()
    snap["chars"] = snap["text"].fillna("").str.len()
    per = (
        snap.groupby("role", sort=False, dropna=False)
        .agg(n_turns=("chars", "size"), total_chars=("chars", "sum"))
        .reset_index()
    )
    per["grouping_id"] = 0
    total = pd.DataFrame(
        {"role": [None], "grouping_id": [1],
         "n_turns": [len(snap)], "total_chars": [snap["chars"].sum()]}
    )
    return pd.concat([per, total], ignore_index=True)


def _norm(df):
    return (
        df.sort_values(["grouping_id", "role"], na_position="first")
        .reset_index(drop=True)
        .astype({"n_turns": "int64", "total_chars": "int64", "grouping_id": "int64"})
        [["role", "grouping_id", "n_turns", "total_chars"]]
    )


def _setup(tmp_path, seed=61):
    log = generate_changelog(
        GenConfig(num_events=5000, num_conversations=60, seed=seed,
                  delete_frac=0.08, out_of_order=True)
    )
    half = log.num_rows // 2
    clog = ChangeLog(str(tmp_path / "log"))
    clog.write_segments(log.slice(0, half), segment_rows=1200)
    eng = CDCEngine(str(tmp_path / "tbl"), num_partitions=8, compact_every=100)
    eng.replay(clog)
    view = IncrementalRoleStats(eng, str(tmp_path / "v"))
    view.advance()
    clog.write_segments(log.slice(half), segment_rows=1200)
    eng.replay(clog)
    return clog, eng, view


@pytest.mark.usefixtures("ray_session")
def test_advance_equals_rebuild_and_rollup_matches(tmp_path):
    clog, eng, view = _setup(tmp_path)
    s = view.advance()
    assert s["touched_convs"] > 0
    got = _norm(view.rollup().to_pandas())
    pd.testing.assert_frame_equal(got, _norm(_expected_rollup(eng)))

    adv = view.read_arrow().to_pandas().sort_values(
        ["conv_id", "role"], na_position="first").reset_index(drop=True)
    view.rebuild()
    reb = view.read_arrow().to_pandas().sort_values(
        ["conv_id", "role"], na_position="first").reset_index(drop=True)
    pd.testing.assert_frame_equal(adv, reb)


@pytest.mark.usefixtures("ray_session")
def test_trickle_edit_touches_one_partition(tmp_path):
    clog, eng, view = _setup(tmp_path, seed=5)
    view.advance()
    _manual_rows(
        eng, clog,
        [{"op": "U", "conv_id": "conv-000003", "turn_idx": 0,
          "role": "tool", "text": "x" * 100}],
    )
    eng.replay(clog, segments_per_epoch=1)
    s = view.advance()
    assert s["touched_convs"] == 1 and s["touched_partitions"] == 1
    got = _norm(view.rollup().to_pandas())
    pd.testing.assert_frame_equal(got, _norm(_expected_rollup(eng)))
