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
