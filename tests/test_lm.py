"""Bigram LM perplexity: matches a pure-Python reference implementation
exactly, separates gibberish from in-domain text, is partition-invariant,
and the composed filter keeps the low-perplexity tail."""

import math
import re

import numpy as np
import pandas as pd
import pytest
import ray

from etl_framework_ray.functions.hashing import stable_hash_array
from etl_framework_ray.functions.text import TOKEN_PATTERN
from etl_framework_ray.stages.lm import (
    _BOS,
    perplexity_filter,
    score_perplexity,
    train_ngram_lm,
)

#: templated sentences over a ~60-word vocabulary: bigrams repeat heavily
#: (like real prose), so in-domain perplexity is low while OOV gibberish
#: pays the full unseen-token penalty
_TEMPLATES = [
    f"the {a} {b} writes one {c} per {d} and commits the {e} atomically"
    for a, b, c, d, e in [
        ("streaming", "engine", "block", "epoch", "manifest"),
        ("bucketed", "writer", "file", "partition", "version"),
        ("incremental", "view", "delta", "advance", "watermark"),
        ("hash", "exchange", "bucket", "task", "result"),
        ("changelog", "tailer", "segment", "poll", "cursor"),
        ("compaction", "job", "chunk", "merge", "snapshot"),
    ]
]


def _corpus(seed=53, n=300, n_gibberish=12):
    rng = np.random.default_rng(seed)
    texts = [
        _TEMPLATES[rng.integers(0, len(_TEMPLATES))] for _ in range(n)
    ]
    for _ in range(n_gibberish):
        texts.append(
            " ".join(
                "".join(chr(ord("a") + c) for c in rng.integers(0, 26, 7))
                for _ in range(10)
            )
        )
    return pd.DataFrame({"doc_id": np.arange(len(texts), dtype="int64"), "text": texts})


def _py_reference(df, add_k=0.1, round_to=4, train_df=None):
    """Row-at-a-time bigram LM over the SAME token hashes (optionally
    trained on a different frame than it scores, the CCNet usage)."""
    tok = re.compile(TOKEN_PATTERN)

    def hashes(s):
        t = tok.findall((s or "").lower())
        return stable_hash_array(np.asarray(t, dtype=object)) if t else np.empty(0, np.uint64)

    def pair(prev, cur):
        x = prev * np.uint64(0x9E3779B97F4A7C15) ^ cur
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        return x

    uni: dict = {}
    bi: dict = {}
    for s in (train_df if train_df is not None else df)["text"]:
        h = hashes(s)
        if not len(h):
            continue
        for x in h:
            uni[x] = uni.get(x, 0) + 1
        prev = np.concatenate(([_BOS], h[:-1]))
        for p in pair(prev, h):
            bi[p] = bi.get(p, 0) + 1
    v = len(uni)
    out = []
    for s in df["text"]:
        h = hashes(s)
        if not len(h):
            out.append(None)
            continue
        canon = np.where([x in uni for x in h], h, _BOS ^ np.uint64(1))
        prev = np.concatenate(([_BOS], canon[:-1]))
        pr = pair(prev, canon)
        lp = []
        for j in range(len(h)):
            bc = bi.get(pr[j], 0)
            pc_ = uni.get(canon[j - 1], 0) if j > 0 else 0
            lp.append(math.log2((bc + 0.1) / (pc_ + 0.1 * (v + 1))))
        out.append(round(2.0 ** (-sum(lp) / len(lp)), round_to))
    return out


@pytest.mark.usefixtures("ray_session")
def test_matches_python_reference_and_separates_gibberish():
    df = _corpus()
    clean = df[df["doc_id"] < 300]  # train on the clean slice (CCNet usage)
    ds_all = ray.data.from_pandas(df).repartition(5)
    model = train_ngram_lm(ray.data.from_pandas(clean).repartition(3), vocab_size=10_000)
    got = (
        score_perplexity(ds_all, model)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = _py_reference(df, train_df=clean)
    assert np.allclose(got["ppl"].to_numpy(np.float64), np.asarray(exp, np.float64),
                       rtol=1e-9)
    normal = got["ppl"][:300].mean()
    gib = got["ppl"][300:].mean()
    assert gib > 5 * normal  # OOV gibberish is unambiguously flagged


@pytest.mark.usefixtures("ray_session")
def test_partition_invariance():
    df = _corpus(seed=7, n=120, n_gibberish=5)
    def run(par):
        ds = ray.data.from_pandas(df).repartition(par)
        m = train_ngram_lm(ds)
        return (
            score_perplexity(ds, m).to_pandas()
            .sort_values("doc_id").reset_index(drop=True)["ppl"]
        )
    pd.testing.assert_series_equal(run(1), run(9))


@pytest.mark.usefixtures("ray_session")
def test_filter_keeps_low_ppl_tail():
    df = _corpus(seed=11, n=200, n_gibberish=20)
    stats: dict = {}
    kept = perplexity_filter(
        ray.data.from_pandas(df).repartition(4), keep_quantile=0.9, stats_out=stats
    ).to_pandas()
    assert stats["max_ppl"] > 0
    # every gibberish doc scores above the cut and is gone
    assert (kept["doc_id"] < 200).all()
    assert len(kept) >= 180 * 0.9
