"""Training-data curation: the composed document pipeline.

The "switch your corpus pipeline to this engine" story: one streaming
pass over a document table that chains the training-data stages —

1. text stats + quality scoring (vectorized batch maps / actor pools),
2. language filter (keep a target language set),
3. quality floor,
4. exact dedup (content hash, keep min id),
5. near-dup removal (MinHash-LSH clusters, keep cluster minimum),

emitting the curated corpus plus a per-stage funnel report (rows in/out —
the lineage habit from the CDC side applied to corpus curation).

Funnel counts are STAGE-SIDE: a counter actor accumulates per-batch row
counts during the pipeline's single execution — no stage is re-executed
for monitoring. The only mid-pipeline materialization is the
exact-deduped working set, which near-dup clustering and the final
cluster filter both consume (object-store resident, spills under
pressure; at larger-than-store scale checkpoint it to parquet instead).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray

from ..functions.text import LangId, QualityScorer, text_stats
from ..stages.dedup import (
    MinHashConfig,
    exact_dedup,
    minhash_dedup,
    ngram_jaccard_dedup,
    simhash_dedup,
)
from ..stages.util import BatchCounts, cached_stage, in_sorted


def _counted(ds: "ray.data.Dataset", counter: BatchCounts | None, stage: str) -> "ray.data.Dataset":
    """Pass-through stage that streams batches while adding their row
    counts to the funnel sink (file-backed append per batch — no blocking
    actor round-trip in the hot path; see ``stages.util.BatchCounts``)."""
    if counter is None:
        return ds

    def count(batch: pa.Table) -> pa.Table:
        counter.add({stage: batch.num_rows})
        return batch

    return ds.map_batches(count, batch_format="pyarrow")


def curate_documents(
    sf_dir: str,
    languages: tuple[str, ...] = ("en",),
    min_quality: float = 0.3,
    minhash: MinHashConfig = MinHashConfig(jaccard_threshold=0.85),
    report: bool = True,
    near_dup: str = "minhash",  # minhash | ngram | simhash
) -> tuple["ray.data.Dataset", dict]:
    """Returns ``(curated Dataset, funnel dict)``.

    ``near_dup`` selects the near-duplicate family (all three share the
    ``(id, cluster_id, is_kept)`` output contract): ``minhash``
    (signature-Jaccard verify — the default), ``ngram`` (exact
    shingle-set Jaccard verify, slower/stricter), ``simhash``
    (hamming-banded, cheapest payload).

    ``report=False`` skips the funnel entirely (no counter stages, fully
    lazy output); with ``report=True`` every stage executes exactly once
    and the counts fall out of that single pass."""
    if near_dup not in ("minhash", "ngram", "simhash"):
        raise ValueError(f"near_dup must be minhash|ngram|simhash, got {near_dup!r}")
    if report:
        import tempfile

        counter = BatchCounts(tempfile.mkdtemp(prefix="curation_funnel_"))
    else:
        counter = None
    try:
        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
        ds = _counted(ds, counter, "input")

        ds = ds.map_batches(text_stats, batch_format="pyarrow")
        # cheap-state text stages run as cached tasks, not actor pools — see
        # stages/util.cached_stage for the measured decision rule
        ds = ds.map_batches(cached_stage(LangId), batch_format="pyarrow")
        ds = ds.map_batches(cached_stage(QualityScorer), batch_format="pyarrow")

        lang_set = list(languages)

        def keep_lang_quality(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            mask = pc.and_(
                pc.is_in(batch.column("lang_pred"), value_set=pa.array(lang_set)),
                pc.greater_equal(batch.column("quality_score"), min_quality),
            )
            return batch.filter(mask)

        ds = ds.map_batches(keep_lang_quality, batch_format="pyarrow")
        ds = _counted(ds, counter, "after_lang_quality")

        # exact-deduped working set: materialized ONCE — near-dup clustering
        # and the final cluster filter both read it without re-running the
        # upstream stat/filter stages
        ds = exact_dedup(ds, text_col="text", id_col="doc_id").materialize()

        # near-dup clusters over the surviving corpus; keep cluster minima.
        # Broadcast the DROPPED-id set — the complement of the survivors.
        # Survivors are the overwhelming majority of any real corpus, so the
        # kept set is O(corpus); the dropped set is O(duplicates) — the same
        # broadcast economics as ``embedding_dedup_lsh``. ONE sorted int64
        # array via ``ray.put``, probed with searchsorted per batch.
        if near_dup == "simhash":
            clusters = simhash_dedup(ds, text_col="text", id_col="doc_id")
        elif near_dup == "ngram":
            clusters = ngram_jaccard_dedup(ds, minhash, text_col="text", id_col="doc_id")
        else:
            clusters = minhash_dedup(ds, minhash, text_col="text", id_col="doc_id")
        import pyarrow.compute as pc

        dropped_pdf = clusters.map_batches(
            lambda b: b.filter(pc.invert(b.column("is_kept"))).select(["doc_id"]),
            batch_format="pyarrow",
        ).to_pandas()  # O(duplicates) — the broadcast payload
        # a dup-free corpus yields only empty frames (no schema) — same guard
        # as embedding_dedup_lsh
        dropped = (
            dropped_pdf["doc_id"].to_numpy() if "doc_id" in dropped_pdf.columns else np.array([])
        )
        dropped_arr = np.sort(dropped.astype(np.int64))
        dropped_ref = ray.put(dropped_arr)

        def keep_cluster_min(batch: pa.Table) -> pa.Table:
            dropped = ray.get(dropped_ref)
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
            return batch.filter(pa.array(~in_sorted(ids, dropped)))

        out = ds.map_batches(keep_cluster_min, batch_format="pyarrow")
        funnel: dict[str, int] = {}
        if report:
            out = out.materialize()
            funnel = counter.collect()
            counter.cleanup()
            funnel["near_dup_dropped_broadcast"] = int(len(dropped_arr))
            funnel["after_exact_dedup"] = ds.count()  # materialized → metadata
            funnel["after_near_dedup"] = out.count()
        return out, funnel
    except BaseException:
        # a pipeline failure before collect() must not leak the
        # funnel-count sink dir
        if counter is not None:
            counter.cleanup()
        raise


def prepare_pretraining_corpus(
    sf_dir: str,
    languages: tuple[str, ...] = ("en",),
    min_quality: float = 0.3,
    max_dup_3gram: float = 0.2,
    mixture: dict | None = None,
    mixture_default_pct: int = 100,
    bench_texts=None,
    max_tokens: int = 256,
    overlap: int = 32,
    pack_budget: int = 512,
    near_dup: str = "minhash",
    report: bool = True,
) -> tuple["ray.data.Dataset", dict]:
    """The full pretraining-prep pipeline, end to end: curate
    (langid → quality floor → exact + near dedup, :func:`curate_documents`)
    → repetition gate (drop docs whose duplicate-3-gram fraction exceeds
    ``max_dup_3gram`` — the Gopher-style boilerplate filter) → benchmark
    decontamination (``bench_texts``; skipped when None) → stratified
    mixture re-weighting (per-``lang_pred`` keep rates; strata missing
    from ``mixture`` keep ``mixture_default_pct`` — default 100 = keep
    all; skipped when ``mixture`` is None)
    → token-window chunking → sequence packing.

    Everything downstream of curation is shuffle-free batch maps over the
    curated working set, so the composed pipeline adds no exchanges to
    what curation already pays. Returns ``(packed chunks Dataset, funnel)``
    — the funnel extends curation's with one row count per added stage."""
    from ..functions.text import repetition_stats
    from ..stages.contamination import decontaminate
    from ..stages.packing import chunk_documents, pack_chunks, stratified_sample

    ds, funnel = curate_documents(
        sf_dir,
        languages=languages,
        min_quality=min_quality,
        near_dup=near_dup,
        report=report,
    )

    def rep_gate(batch: pa.Table) -> pa.Table:
        stats = repetition_stats(batch, text_col="text", id_col="doc_id")
        keep = stats.column("dup_3gram_frac").to_numpy() <= max_dup_3gram
        return batch.filter(pa.array(keep))

    ds = ds.map_batches(rep_gate, batch_format="pyarrow")
    if report:
        funnel["after_repetition_gate"] = (ds := ds.materialize()).count()

    if bench_texts is not None:
        ds = decontaminate(ds, bench_texts)
        if report:
            funnel["after_decontaminate"] = (ds := ds.materialize()).count()

    if mixture is not None:
        # default 100 (keep), NOT stratified_sample's 0: a language that
        # passed the `languages` filter but is missing from `mixture`
        # should survive by default — silently deleting a whole curated
        # stratum (after paying its full curation cost) is never the
        # intent of an omitted rate
        ds = stratified_sample(
            ds,
            mixture,
            group_col="lang_pred",
            key_col="doc_id",
            default_pct=mixture_default_pct,
        )
        if report:
            funnel["after_mixture"] = (ds := ds.materialize()).count()

    chunks = chunk_documents(ds, max_tokens=max_tokens, overlap=overlap)
    packed = pack_chunks(chunks, budget=pack_budget)
    if report:
        packed = packed.materialize()
        funnel["chunks_packed"] = packed.count()
    return packed, funnel
