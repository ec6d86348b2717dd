"""Incrementally-maintained full-text (BM25) index over the changefeed:
postings equal a from-scratch tokenization after every advance, search
matches an independent Python BM25 over the assembled corpus, trickle
edits touch one partition and are immediately searchable, deletes leave
the index (including the corpus-stats rows)."""

import math
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from etl_framework_ray.functions.text import TOKEN_PATTERN
from etl_framework_ray.pipelines.cdc import CDCEngine
from etl_framework_ray.pipelines.incremental import IncrementalTextIndex
from etl_framework_ray.sources.changelog import ChangeLog
from etl_framework_ray.sources.generator import GenConfig, generate_changelog

from test_incremental import _manual_rows

QUERIES = {0: ["rev", "7"], 1: ["tool", "12"], 2: ["assistant"]}
K = 8


def _assembled(eng) -> pd.DataFrame:
    """Independent dialogue assembly from committed state (the corpus the
    index is over)."""
    snap = eng.snapshot_arrow().to_pandas()
    snap = snap.sort_values(["conv_id", "turn_idx"], kind="stable")
    line = snap["role"].fillna("") + ": " + snap["text"].fillna("")
    dialogue = line.groupby(snap["conv_id"], sort=True).agg("\n".join)
    return pd.DataFrame({"conv_id": dialogue.index, "dialogue": dialogue.to_numpy()})


def _py_bm25(corpus: pd.DataFrame, queries, k, k1=1.2, b=0.75, round_to=6):
    """Row-at-a-time reference BM25 (string doc ids), snap-then-rank."""
    tok = re.compile(TOKEN_PATTERN)
    docs = {
        r.conv_id: tok.findall((r.dialogue or "").lower()) for r in corpus.itertuples()
    }
    n = len(docs)
    avgdl = sum(len(v) for v in docs.values()) / n
    out = []
    for qid in sorted(queries):
        terms = sorted(set(queries[qid]))
        df = {t: sum(1 for d in docs.values() if t in d) for t in terms}
        idf = {t: math.log1p((n - df[t] + 0.5) / (df[t] + 0.5)) for t in terms}
        scored = []
        for cid, d in docs.items():
            s = 0.0
            for t in terms:
                tf = d.count(t)
                s += idf[t] * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(d) / avgdl))
            snapped = int(round(s * 10**round_to)) / 10**round_to
            if snapped > 0:
                scored.append((qid, cid, snapped))
        scored.sort(key=lambda r: (-r[2], r[1]))
        out.extend(scored[:k])
    return pd.DataFrame(out, columns=["query_id", "conv_id", "score"])


def _sortframe(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df.sort_values(["query_id", "score", "conv_id"], ascending=[True, False, True])
        .reset_index(drop=True)
        .astype({"query_id": "int64", "score": "float64"})
    )


def _setup(tmp_path, seed=23):
    log = generate_changelog(
        GenConfig(
            num_events=6000, num_conversations=80, seed=seed,
            delete_frac=0.08, out_of_order=True,
        )
    )
    half = log.num_rows // 2
    clog = ChangeLog(str(tmp_path / "log"))
    clog.write_segments(log.slice(0, half), segment_rows=1500)
    eng = CDCEngine(str(tmp_path / "tbl"), num_partitions=8, compact_every=100)
    eng.replay(clog)
    view = IncrementalTextIndex(eng, str(tmp_path / "idx"))
    view.advance()  # bootstrap
    clog.write_segments(log.slice(half), segment_rows=1500)
    eng.replay(clog)
    return clog, eng, view


@pytest.mark.usefixtures("ray_session")
def test_postings_and_search_match_reference_after_advance(tmp_path):
    clog, eng, view = _setup(tmp_path)
    s = view.advance()
    assert 0 < s["touched_convs"]

    corpus = _assembled(eng)
    # postings equal a from-scratch tokenization of the assembled corpus
    tok = re.compile(TOKEN_PATTERN)
    exp_rows = []
    for r in corpus.itertuples():
        toks = tok.findall((r.dialogue or "").lower())
        exp_rows.append((r.conv_id, None, 0, len(toks)))  # doc-stats row
        cnt: dict = {}
        for t in toks:
            cnt[t] = cnt.get(t, 0) + 1
        exp_rows.extend((r.conv_id, t, c, len(toks)) for t, c in cnt.items())
    exp = (
        pd.DataFrame(exp_rows, columns=["conv_id", "token", "tf", "dl"])
        .sort_values(["conv_id", "token"], na_position="first", kind="mergesort")
        .reset_index(drop=True)
        .astype({"tf": "int64", "dl": "int64"})
    )
    got = (
        view.read_arrow()
        .to_pandas()
        .sort_values(["conv_id", "token"], na_position="first", kind="mergesort")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)

    # search equals the independent Python BM25 (ranking + snapped scores)
    got_hits = _sortframe(view.search(QUERIES, k=K).to_pandas())
    exp_hits = _sortframe(_py_bm25(corpus, QUERIES, k=K))
    pd.testing.assert_frame_equal(got_hits, exp_hits)

    # advance equals rebuild (view files byte-equal in content terms)
    view.rebuild()
    rebuilt = (
        view.read_arrow()
        .to_pandas()
        .sort_values(["conv_id", "token"], na_position="first", kind="mergesort")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(rebuilt, exp)


@pytest.mark.usefixtures("ray_session")
def test_trickle_edit_is_immediately_searchable(tmp_path):
    clog, eng, view = _setup(tmp_path)
    view.advance()

    # plant a token that exists nowhere else, in ONE conversation
    _manual_rows(
        eng, clog,
        [{"op": "U", "conv_id": "conv-000007", "turn_idx": 0,
          "role": "user", "text": "zzyzx needle appears here"}],
    )
    eng.replay(clog, segments_per_epoch=1)
    s = view.advance()
    assert s["touched_convs"] == 1 and s["touched_partitions"] == 1

    hits = view.search({0: ["zzyzx"]}, k=5).to_pandas()
    assert list(hits["conv_id"]) == ["conv-000007"]
    assert hits["score"].iloc[0] > 0

    # and the full search still matches the reference on the edited corpus
    got = _sortframe(view.search(QUERIES, k=K).to_pandas())
    exp = _sortframe(_py_bm25(_assembled(eng), QUERIES, k=K))
    pd.testing.assert_frame_equal(got, exp)


@pytest.mark.usefixtures("ray_session")
def test_deleted_conversation_leaves_the_index(tmp_path):
    clog, eng, view = _setup(tmp_path)
    view.advance()
    corpus = _assembled(eng)
    victim = corpus["conv_id"].iloc[0]
    turns = eng.snapshot_arrow().to_pandas()
    vic_turns = turns[turns.conv_id == victim]["turn_idx"].tolist()

    _manual_rows(
        eng, clog,
        [{"op": "D", "conv_id": victim, "turn_idx": int(t)} for t in vic_turns],
    )
    eng.replay(clog, segments_per_epoch=1)
    view.advance()

    idx = view.read_arrow().to_pandas()
    assert victim not in set(idx["conv_id"])
    # N (stat rows) shrank with the conversation — corpus stats live in the view
    assert int(idx["token"].isna().sum()) == len(corpus) - 1

    got = _sortframe(view.search(QUERIES, k=K).to_pandas())
    exp = _sortframe(_py_bm25(_assembled(eng), QUERIES, k=K))
    pd.testing.assert_frame_equal(got, exp)


@pytest.mark.usefixtures("ray_session")
def test_empty_view_search_returns_empty(tmp_path, ray_session):
    eng = CDCEngine(str(tmp_path / "tbl"), num_partitions=4)
    view = IncrementalTextIndex(eng, str(tmp_path / "idx"))
    got = view.search({0: ["anything"]}, k=3)
    assert got.count() == 0
    assert set(got.schema().names) == {"query_id", "conv_id", "score"}
