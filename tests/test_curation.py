"""Curation pipeline: funnel monotonicity, planted dups removed, filters
respected (composition of text + dedup stages)."""

import numpy as np
import pyarrow as pa
import pytest

from etl_framework_ray.pipelines.curation import curate_documents
from etl_framework_ray.stages.dedup import MinHashConfig

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_curate_real_documents():
    ds, funnel = curate_documents(SF)
    # exact equality IS the single-execution probe: the funnel counter
    # accumulates across executions, so a re-executed input stage would
    # report 1000/1500, not 500
    assert funnel["input"] == 500
    assert (
        funnel["input"]
        >= funnel["after_lang_quality"]
        >= funnel["after_exact_dedup"]
        >= funnel["after_near_dedup"]
        > 0
    )
    rows = ds.take_all()
    assert all(r["lang_pred"] == "en" for r in rows)
    assert all(r["quality_score"] >= 0.3 for r in rows)
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))


@pytest.mark.usefixtures("ray_session")
def test_curate_removes_planted_duplicates(tmp_path):
    import pyarrow.parquet as pq
    import ray.data  # noqa: F401

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(200)]
    base = [" ".join(rng.choice(vocab, 80)) + " the and of a to in is it that for" for _ in range(20)]
    texts = base + [base[0]] + [base[1].replace("w0", "w199", 1)]  # exact + near dup
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)})
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))

    ds, funnel = curate_documents(str(d), min_quality=0.0, minhash=MinHashConfig(jaccard_threshold=0.7))
    kept = {r["doc_id"] for r in ds.take_all()}
    assert 20 not in kept  # exact dup of doc 0 removed
    assert 21 not in kept  # near dup of doc 1 removed
    assert 0 in kept and 1 in kept
    assert funnel["after_near_dedup"] == len(kept)
    # the broadcast is the O(duplicates) COMPLEMENT, not the kept set:
    # its size must equal exactly the near-dup rows dropped after exact
    # dedup (doc 21; doc 20 is already gone at the exact stage)
    assert (
        funnel["near_dup_dropped_broadcast"]
        == funnel["after_exact_dedup"] - funnel["after_near_dedup"]
    )


@pytest.mark.usefixtures("ray_session")
def test_curate_near_dup_variants(tmp_path):
    import pyarrow.parquet as pq

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(200)]
    base = [" ".join(rng.choice(vocab, 80)) + " the and of a to in is it that for" for _ in range(15)]
    texts = base + [base[0]]  # one exact dup (caught by every family)
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)})
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))

    for method in ("minhash", "ngram", "simhash"):
        ds, funnel = curate_documents(
            str(d), min_quality=0.0, report=True, near_dup=method,
            minhash=MinHashConfig(jaccard_threshold=0.7),
        )
        kept = {r["doc_id"] for r in ds.take_all()}
        assert 15 not in kept, method  # the exact dup never survives
        assert 0 in kept, method
        assert funnel["after_near_dedup"] == len(kept), method

    with pytest.raises(ValueError, match="near_dup"):
        curate_documents(str(d), near_dup="bogus")


@pytest.mark.usefixtures("ray_session")
def test_prepare_pretraining_corpus_end_to_end(tmp_path):
    """The composed prep pipeline: every stage visibly acts (planted
    repetitive doc gated, contaminated doc dropped, mixture rate applied),
    funnel monotonic, packed output respects the token budget."""
    import pyarrow.parquet as pq

    from etl_framework_ray.pipelines.curation import prepare_pretraining_corpus

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(300)]
    stops = ["the", "and", "of", "a", "to", "in", "is", "it", "that", "for"]

    def doc(words: int = 90) -> str:
        # interleave stopwords INTO the random body so no 8-token shingle
        # is shared across documents (a common suffix would legitimately
        # contaminate the whole corpus)
        body = list(rng.choice(vocab, words))
        for s in rng.permutation(stops):
            body.insert(int(rng.integers(0, len(body))), s)
        return " ".join(body)

    texts = [doc() for _ in range(30)]
    texts.append(" ".join(["spam ham eggs"] * 40) + " " + " ".join(stops))  # 30: repetitive
    contaminated = doc()
    texts.append(contaminated)                                   # 31: bench hit
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)})
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))

    packed, funnel = prepare_pretraining_corpus(
        str(d),
        min_quality=0.0,
        max_dup_3gram=0.2,
        mixture={"en": 100},  # explicit stage, no-op rate
        bench_texts=[contaminated],
        max_tokens=40,
        overlap=8,
        pack_budget=80,
    )
    rows = packed.take_all()
    kept_docs = {r["doc_id"] for r in rows}
    assert 30 not in kept_docs  # repetition gate
    assert 31 not in kept_docs  # decontamination
    assert funnel["after_near_dedup"] >= funnel["after_repetition_gate"]
    assert funnel["after_repetition_gate"] >= funnel["after_decontaminate"]
    assert funnel["after_decontaminate"] >= funnel["after_mixture"]
    assert funnel["chunks_packed"] == len(rows) > 0
    # pack budget respected (every chunk is <= max_tokens=40 < budget,
    # so no singleton-oversize exception can apply)
    sums: dict = {}
    for r in rows:
        sums[r["pack_id"]] = sums.get(r["pack_id"], 0) + r["n_tokens"]
    assert all(v <= 80 for v in sums.values())
