"""Exact trigram-Jaccard similarity join vs a brute-force string-set
reference: completeness (prefix filter misses nothing), sims, counted
truncation, short/empty inputs, partition invariance."""

import numpy as np
import pandas as pd
import pytest
import ray

from etl_framework_ray.stages.fuzzy import similarity_join

WORDS = ["stream", "window", "merge", "vector", "batch", "arrow", "hash",
         "join", "block", "shard", "table", "index", "epoch", "delta"]


def _corpus(seed=31, n_base=120, n_dups=40):
    rng = np.random.default_rng(seed)
    texts = [
        " ".join(rng.choice(WORDS, rng.integers(8, 20)))
        for _ in range(n_base)
    ]
    for i in range(n_dups):  # mutated near-copies of random bases
        src = list(texts[rng.integers(0, n_base)])
        for _ in range(rng.integers(1, 4)):
            pos = rng.integers(0, len(src))
            src[pos] = chr(ord("a") + rng.integers(0, 26))
        texts.append("".join(src))
    return pd.DataFrame({"doc_id": np.arange(len(texts), dtype="int64"),
                         "text": texts})


def _tri(s: str) -> set:
    s = s.lower()
    return {s[i:i + 3] for i in range(len(s) - 2)}


def _brute(df: pd.DataFrame, th: float) -> pd.DataFrame:
    sets = {r.doc_id: _tri(r.text) for r in df.itertuples() if len(r.text) >= 3}
    rows = []
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            sim = inter / (len(sets[a]) + len(sets[b]) - inter)
            if sim >= th:
                rows.append((a, b, int(round(sim * 1e6)) / 1e6))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "sim"])


def _norm(df):
    return (
        df.sort_values(["id_a", "id_b"]).reset_index(drop=True)
        .astype({"id_a": "int64", "id_b": "int64", "sim": "float64"})
    )


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("th", [0.5, 0.8])
def test_matches_bruteforce(th):
    df = _corpus()
    ds = ray.data.from_pandas(df).repartition(6)
    got = _norm(similarity_join(ds, th).to_pandas())
    exp = _norm(_brute(df, th))
    assert len(exp) > 5  # the planted dups actually produce pairs
    pd.testing.assert_frame_equal(got, exp)


@pytest.mark.usefixtures("ray_session")
def test_partition_invariance():
    df = _corpus(seed=7, n_base=60, n_dups=25)
    a = _norm(similarity_join(ray.data.from_pandas(df).repartition(1), 0.7).to_pandas())
    b = _norm(similarity_join(ray.data.from_pandas(df).repartition(11), 0.7,
                              shuffle_buckets=5).to_pandas())
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.usefixtures("ray_session")
def test_truncation_is_counted_never_silent():
    # one shared hot token everywhere: tiny cap must truncate AND report
    df = pd.DataFrame({
        "doc_id": np.arange(30, dtype="int64"),
        "text": ["zzz common prefix " + f"{i:03d}" for i in range(30)],
    })
    stats: dict = {}
    out = similarity_join(
        ray.data.from_pandas(df), 0.3, max_bucket_pairs=3, stats_out=stats,
        tier="prefix",  # this test exercises the capped prefix path
    ).to_pandas()
    assert stats["truncated_tokens"] > 0 and stats["truncated_pairs"] > 0
    assert stats["candidate_pairs"] >= len(out)


@pytest.mark.usefixtures("ray_session")
def test_short_and_empty_texts_never_pair():
    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype="int64"),
        "text": ["ab", "", "identical words here", "identical words here"],
    })
    got = similarity_join(ray.data.from_pandas(df), 0.9).to_pandas()
    assert got[["id_a", "id_b"]].values.tolist() == [[2, 3]]
    assert got["sim"].iloc[0] == 1.0


@pytest.mark.usefixtures("ray_session")
def test_validation():
    ds = ray.data.from_pandas(_corpus(n_base=5, n_dups=0))
    with pytest.raises(ValueError, match="threshold"):
        similarity_join(ds, 0.0)
    with pytest.raises(ValueError, match="ngram"):
        similarity_join(ds, 0.5, ngram=0)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("th", [0.5, 0.8])
def test_dense_tier_equals_prefix_tier_and_bruteforce(th):
    """The dense tier is EXACT: forced dense == forced prefix == brute
    force on the same corpus, bit-for-bit after normalization."""
    df = _corpus(seed=13, n_base=80, n_dups=30)
    ds = ray.data.from_pandas(df).repartition(5)
    stats: dict = {}
    dense = _norm(similarity_join(ds, th, tier="dense", stats_out=stats).to_pandas())
    assert stats["tier"] == "dense"
    prefix = _norm(similarity_join(ds, th, tier="prefix").to_pandas())
    exp = _norm(_brute(df, th))
    pd.testing.assert_frame_equal(dense, exp)
    pd.testing.assert_frame_equal(prefix, exp)


@pytest.mark.usefixtures("ray_session")
def test_auto_routes_dense_on_dense_corpus_and_reports():
    """A mutually-similar tiny-vocab corpus must auto-route to the dense
    tier (counter-reported) and still return the exact answer."""
    rng = np.random.default_rng(3)
    # every doc shares a long common core -> median pairwise sim is high
    core = "the quick brown fox jumps over the lazy dog again and again"
    texts = [core + " " + "".join(rng.choice(list("abc"), 6)) for _ in range(120)]
    df = pd.DataFrame({"doc_id": np.arange(120, dtype="int64"), "text": texts})
    stats: dict = {}
    got = _norm(similarity_join(
        ray.data.from_pandas(df).repartition(4), 0.8, stats_out=stats
    ).to_pandas())
    assert stats["tier"] == "dense"
    assert stats["candidate_bound"] > 0.25 * (120 * 119 / 2)
    pd.testing.assert_frame_equal(got, _norm(_brute(df, 0.8)))


@pytest.mark.usefixtures("ray_session")
def test_auto_stays_prefix_on_sparse_corpus():
    """A diverse corpus (wide vocab, low pairwise overlap — the realistic
    regime) keeps the prefix tier: pruning works there."""
    rng = np.random.default_rng(21)
    alpha = list("abcdefghijklmnopqrstuvwxyz0123456789 ")
    texts = ["".join(rng.choice(alpha, 60)) for _ in range(90)]
    for i in range(10):  # planted near-copies so the answer is non-empty
        texts.append(texts[i][:-2] + "zq")
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype="int64"),
                       "text": texts})
    stats: dict = {}
    got = _norm(similarity_join(
        ray.data.from_pandas(df), 0.8, stats_out=stats
    ).to_pandas())
    assert stats["tier"] == "prefix"
    pd.testing.assert_frame_equal(got, _norm(_brute(df, 0.8)))


@pytest.mark.usefixtures("ray_session")
def test_dense_tier_property_random_corpora():
    """Fuzz the dense tier: random corpora across density regimes and
    thresholds must equal brute force exactly (seeded loop — hypothesis
    adds little over seeds here and the Ray session makes per-example
    shrinking expensive)."""
    for seed in range(4):
        rng = np.random.default_rng(seed)
        th = [0.4, 0.6, 0.75, 0.9][seed]
        vocab_sz = [4, 12, 30, 200][seed]  # denser -> sparser
        vocab = [
            "".join(rng.choice(list("abcdefghijklmnop"), 4)) for _ in range(vocab_sz)
        ]
        texts = [
            " ".join(rng.choice(vocab, rng.integers(3, 12))) for _ in range(50)
        ]
        df = pd.DataFrame(
            {"doc_id": np.arange(len(texts), dtype="int64"), "text": texts}
        )
        raw = similarity_join(
            ray.data.from_pandas(df).repartition(3), th, tier="dense"
        ).to_pandas()
        if raw.empty:  # a 0-row Dataset drops its column names in pandas
            raw = pd.DataFrame(columns=["id_a", "id_b", "sim"])
        pd.testing.assert_frame_equal(_norm(raw), _norm(_brute(df, th)))
