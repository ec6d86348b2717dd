"""Dedup stage tests: exact, MinHash-LSH, n-gram Jaccard, SimHash,
embedding-cosine — positive (planted dups caught) and negative (distinct
docs kept) cases on synthesized corpora."""

import numpy as np
import pyarrow as pa
import pytest

from etl_framework_ray.stages.dedup import (
    MinHashConfig,
    _auto_buckets,
    _connected_components,
    components_labels,
    embedding_dedup,
    embedding_dedup_lsh,
    exact_dedup,
    minhash_dedup,
    minhash_edges,
    ngram_jaccard_dedup,
    simhash_dedup,
)


def _corpus():
    """40 distinct docs + planted exact dups + planted near-dups."""
    rng = np.random.default_rng(0)
    vocab = [f"tok{i}" for i in range(300)]
    docs = {}
    for i in range(40):
        docs[i] = " ".join(rng.choice(vocab, 60))
    docs[100] = docs[0]  # exact dup of 0
    docs[101] = docs[1]  # exact dup of 1
    near2 = docs[2].split()
    near2[5] = "CHANGED"
    docs[102] = " ".join(near2)  # near dup of 2 (1 token of 60)
    near3 = docs[3].split()
    near3[10], near3[40] = "X", "Y"
    docs[103] = " ".join(near3)  # near dup of 3 (2 tokens of 60)
    ids = sorted(docs)
    return pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "text": pa.array([docs[i] for i in ids], pa.string())}
    )


@pytest.fixture(scope="module")
def corpus_ds(ray_session):
    import ray.data

    return ray.data.from_arrow(_corpus()).repartition(4)


def test_exact_dedup(corpus_ds):
    kept = exact_dedup(corpus_ds).to_pandas()
    assert len(kept) == 42  # 44 rows − 2 exact dups
    assert 100 not in set(kept.doc_id) and 101 not in set(kept.doc_id)
    assert 0 in set(kept.doc_id) and 1 in set(kept.doc_id)  # min id kept
    assert 102 in set(kept.doc_id)  # near-dup is NOT an exact dup


def test_minhash_lsh_dedup(corpus_ds):
    out = minhash_dedup(corpus_ds, MinHashConfig(jaccard_threshold=0.7)).to_pandas()
    by_id = out.set_index("doc_id")
    # exact + near dups clustered to their originals, originals kept
    assert by_id.loc[100].cluster_id == 0 and not by_id.loc[100].is_kept
    assert by_id.loc[102].cluster_id == 2 and not by_id.loc[102].is_kept
    assert by_id.loc[103].cluster_id == 3 and not by_id.loc[103].is_kept
    assert by_id.loc[0].is_kept and by_id.loc[2].is_kept
    # distinct docs form singleton clusters
    distinct = by_id.loc[4:40]
    assert distinct.is_kept.all()
    assert (distinct.index == distinct.cluster_id).all()


def test_distributed_cc_equals_driver_union_find(corpus_ds):
    """The hash-to-min label propagation must assign the same cluster
    labels as the driver-side union-find on identical verified edges."""
    _, edges = minhash_edges(corpus_ds, MinHashConfig(jaccard_threshold=0.7))
    edges = edges.materialize()
    edge_list = [(int(r["a"]), int(r["b"])) for r in edges.take_all()]
    expected = _connected_components(edge_list)
    # driver_threshold=0 forces the distributed hash-to-min path
    got = components_labels(edges, shuffle_buckets=8, driver_threshold=0)
    got_map = dict(zip(got["node"].astype(int), got["label"].astype(int)))
    assert got_map == expected
    # and the hybrid fast path must agree with it
    fast = components_labels(edges, shuffle_buckets=8)
    assert dict(zip(fast["node"].astype(int), fast["label"].astype(int))) == expected


def test_minhash_partition_invariant(corpus_ds):
    """Cluster assignment must not depend on input partitioning."""
    import ray.data

    one = ray.data.from_arrow(_corpus())  # single block
    a = minhash_dedup(corpus_ds, MinHashConfig(jaccard_threshold=0.7)).to_pandas()
    b = minhash_dedup(one, MinHashConfig(jaccard_threshold=0.7)).to_pandas()
    assert a.sort_values("doc_id").reset_index(drop=True).equals(
        b.sort_values("doc_id").reset_index(drop=True)
    )


def test_cc_chain_components():
    """A long chain (worst case for label propagation) converges to one
    component equal to the union-find answer."""
    import ray.data

    chain = [(i, i + 1) for i in range(0, 40)]
    cross = [(100 + i, 100 + i + 2) for i in range(0, 20, 2)]
    edges = ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array([e[0] for e in chain + cross], pa.int64()),
                "b": pa.array([e[1] for e in chain + cross], pa.int64()),
            }
        )
    ).repartition(4)
    got = components_labels(edges, shuffle_buckets=4, driver_threshold=0)
    expected = _connected_components(chain + cross)
    assert dict(zip(got["node"].astype(int), got["label"].astype(int))) == expected
    assert set(got[got["node"] <= 40]["label"]) == {0}


def test_auto_buckets_scale_with_input():
    assert _auto_buckets(1 << 20) == 16  # floor
    assert _auto_buckets(64 << 30) == 1024  # 64 GiB / 64 MiB
    assert _auto_buckets(1 << 50) == 65536  # ceiling
    assert _auto_buckets(10 << 30) > _auto_buckets(1 << 30)


def test_ngram_jaccard_exact_verify(corpus_ds):
    out = ngram_jaccard_dedup(corpus_ds, MinHashConfig(jaccard_threshold=0.5)).to_pandas()
    by_id = out.set_index("doc_id")
    assert by_id.loc[102].cluster_id == 2
    assert by_id.loc[4:40].is_kept.all()


def test_simhash_dedup(corpus_ds):
    out = simhash_dedup(corpus_ds, max_hamming=10).to_pandas()
    by_id = out.set_index("doc_id")
    assert by_id.loc[100].cluster_id == 0 and not by_id.loc[100].is_kept  # exact dup
    assert by_id.loc[4:40].is_kept.all()  # distinct docs survive


@pytest.mark.usefixtures("ray_session")
def test_embedding_dedup():
    import ray.data

    rng = np.random.default_rng(1)
    base = rng.standard_normal((30, 16)).astype(np.float32)
    vecs = np.vstack([base, base[0] + 0.001 * rng.standard_normal(16).astype(np.float32)])
    t = pa.table(
        {
            "vec_id": pa.array(range(31), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs], pa.list_(pa.float32())),
        }
    )
    out = embedding_dedup(ray.data.from_arrow(t), threshold=0.95).to_pandas().set_index("vec_id")
    assert bool(out.loc[30].is_dup)  # near-copy of vec 0 flagged
    assert not out.loc[0].is_dup  # earliest copy kept
    assert out.loc[1:29].is_dup.sum() == 0  # random gaussians aren't near-dups


@pytest.mark.usefixtures("ray_session")
def test_embedding_dedup_lsh_recall():
    """The bucketed path must recover ≥95% of the exact path's duplicate
    set at τ=0.95 on a corpus with many planted near-dups."""
    import ray.data

    rng = np.random.default_rng(3)
    base = rng.standard_normal((200, 32)).astype(np.float64)
    near = base[:80] + 0.02 * rng.standard_normal((80, 32))  # planted near-dups
    vecs = np.vstack([base, near])
    t = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array([list(v) for v in vecs], pa.list_(pa.float64())),
        }
    )
    ds = ray.data.from_arrow(t).repartition(4)
    exact = embedding_dedup(ds, threshold=0.95).to_pandas()
    lsh = embedding_dedup_lsh(ds, threshold=0.95).to_pandas()
    exact_dups = set(exact[exact.is_dup].vec_id)
    lsh_dups = set(lsh[lsh.is_dup].vec_id)
    assert exact_dups  # the corpus actually contains dups
    assert lsh_dups <= exact_dups  # bucketing can only MISS, never invent
    recall = len(lsh_dups & exact_dups) / len(exact_dups)
    assert recall >= 0.95, f"recall {recall:.3f}"


@pytest.mark.usefixtures("ray_session")
def test_lsh_bucket_truncation_is_counted_and_deterministic():
    """No silent caps: an oversize LSH bucket must increment the reported
    truncation counters; truncation keeps the LOWEST ids so results do not
    depend on within-group row order."""
    import ray.data

    rng = np.random.default_rng(9)
    v = rng.standard_normal(16)
    # 40 near-identical vectors → ONE giant home bucket
    vecs = v[None, :] + 0.0001 * rng.standard_normal((40, 16))
    t = pa.table(
        {
            "vec_id": pa.array(range(40), pa.int64()),
            "embedding": pa.array([list(v_) for v_ in vecs], pa.list_(pa.float64())),
        }
    )
    ds = ray.data.from_arrow(t).repartition(4)
    stats: dict = {}
    out = embedding_dedup_lsh(ds, threshold=0.95, max_bucket=10, stats_out=stats).to_pandas()
    assert stats["truncated_buckets"] >= 1
    assert stats["truncated_rows"] >= 1
    assert stats["num_planes"] >= 8
    # deterministic: ids 1..39 all probe against the 10 lowest-id index
    # rows, every one of which is an earlier near-identical vector
    assert set(out[out.is_dup].vec_id) == set(range(1, 40))

    # minhash family: 30 identical texts overflow max_bucket=8 and report
    docs = pa.table(
        {
            "doc_id": pa.array(range(30), pa.int64()),
            "text": pa.array(["the same exact boilerplate text here"] * 30),
        }
    )
    from etl_framework_ray.stages.dedup import minhash_dedup

    mstats: dict = {}
    clusters = minhash_dedup(
        ray.data.from_arrow(docs).repartition(2),
        MinHashConfig(jaccard_threshold=0.7),
        max_bucket=8,
        stats_out=mstats,
    ).to_pandas()
    assert mstats["truncated_buckets"] >= 1
    # truncation semantics: only the 8 lowest-id rows of the bucket pair
    # up, so 1..7 cluster under 0 and the overflow rows stay singletons —
    # exactly what the reported counter tells the operator about
    assert set(clusters[~clusters.is_kept].doc_id) == set(range(1, 8))


def test_derive_num_planes_scales_with_corpus():
    from etl_framework_ray.stages.dedup import _derive_num_planes

    class _Fake:
        def __init__(self, n):
            self._n = n

        def _meta_count(self):
            return self._n

    assert _derive_num_planes(_Fake(None), 1024) == 8  # unknown → floor
    assert _derive_num_planes(_Fake(1_000), 1024) == 8
    assert _derive_num_planes(_Fake(1 << 20), 1024) == 10  # 1M/1k → 2^10 buckets
    assert _derive_num_planes(_Fake(1 << 40), 1024) == 20  # clamped ceiling


# ---------------------------------------------------------------------------
# semantic_dedup (SemDeDup-style: k-means clusters as candidate generator)
# ---------------------------------------------------------------------------


@pytest.mark.usefixtures("ray_session")
def test_semantic_dedup_recall_vs_exact():
    """Cluster-bucketed dedup must recover ≥90% of the exact tier's
    duplicate set on a corpus of planted near-dups, never inventing any
    (a planted near-pair is ~always co-clustered; the rule is the same
    greedy-by-id as the exact tier)."""
    import ray.data

    from etl_framework_ray.stages.dedup import embedding_dedup, semantic_dedup

    rng = np.random.default_rng(5)
    base = rng.standard_normal((200, 32)).astype(np.float64)
    near = base[:80] + 0.02 * rng.standard_normal((80, 32))
    vecs = np.vstack([base, near])
    t = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array([list(v) for v in vecs], pa.list_(pa.float64())),
        }
    )
    ds = ray.data.from_arrow(t).repartition(4)
    exact = embedding_dedup(ds, threshold=0.95).to_pandas()
    sem = semantic_dedup(ds, threshold=0.95, k=8).to_pandas()
    exact_dups = set(exact[exact.is_dup].vec_id)
    sem_dups = set(sem[sem.is_dup].vec_id)
    assert exact_dups
    assert sem_dups <= exact_dups  # clustering can only MISS, never invent
    recall = len(sem_dups & exact_dups) / len(exact_dups)
    assert recall >= 0.90, f"recall {recall:.3f}"


@pytest.mark.usefixtures("ray_session")
def test_semantic_dedup_truncation_counted():
    """An oversize cluster truncates its INDEX side at the lowest ids and
    counts it — never silent, and dup flags stay deterministic."""
    import ray.data

    from etl_framework_ray.stages.dedup import semantic_dedup

    rng = np.random.default_rng(11)
    v = rng.standard_normal(16)
    vecs = v[None, :] + 0.0001 * rng.standard_normal((50, 16))
    t = pa.table(
        {
            "vec_id": pa.array(range(50), pa.int64()),
            "embedding": pa.array([list(v_) for v_ in vecs], pa.list_(pa.float64())),
        }
    )
    stats: dict = {}
    out = (
        semantic_dedup(
            ray.data.from_arrow(t).repartition(4),
            threshold=0.95,
            k=2,
            max_cluster=10,
            stats_out=stats,
        )
        .to_pandas()
        .sort_values("vec_id")
    )
    assert stats.get("truncated_buckets", 0) >= 1
    assert stats.get("truncated_rows", 0) > 0
    # greedy-by-id is per cluster: each of the (≤2) clusters keeps exactly
    # its lowest id; everyone else is flagged regardless of the index cap
    assert not out.iloc[0]["is_dup"]  # global min id is always kept
    kept = int((~out["is_dup"]).sum())
    assert 1 <= kept <= 2
    assert out["is_dup"].sum() == 50 - kept


@pytest.mark.usefixtures("ray_session")
def test_semantic_dedup_empty_and_tiny_inputs():
    """semantic_dedup on an EMPTY corpus returns it unflagged (no
    pa.concat_tables([]) crash); a corpus smaller than k clamps the
    k-means fit instead of feeding a degenerate sample."""
    import ray.data

    from etl_framework_ray.stages.dedup import semantic_dedup

    empty = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "embedding": pa.array([], pa.list_(pa.float32())),
            }
        )
    )
    out = semantic_dedup(empty)
    assert out.count() == 0

    rng = np.random.default_rng(11)
    tiny = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([0, 1, 2], pa.int64()),
                "embedding": pa.array(
                    [rng.normal(size=8).astype(np.float32) for _ in range(3)],
                    pa.list_(pa.float32()),
                ),
            }
        )
    )
    rows = semantic_dedup(tiny, k=16).take_all()  # k > corpus size
    assert len(rows) == 3
    assert all(r["is_dup"] is False or r["is_dup"] is True for r in rows)


def test_exact_dedup_output_schema_matches_input(corpus_ds):
    """The internal hash routing column must never leak into results."""
    out = exact_dedup(corpus_ds)
    sch = out.schema()
    assert list(sch.names) == ["doc_id", "text"]
    assert dict(zip(sch.names, sch.types))["doc_id"] == pa.int64()


def test_exact_dedup_explicit_buckets_exact(corpus_ds):
    """An explicit num_buckets is honored exactly and stays correct."""
    kept = exact_dedup(corpus_ds, num_buckets=3).to_pandas()
    assert len(kept) == 42
    assert 100 not in set(kept.doc_id) and 0 in set(kept.doc_id)
