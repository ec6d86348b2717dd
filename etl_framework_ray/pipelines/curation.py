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
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray

from ..functions.text import LangId, QualityScorer, text_stats
from ..stages.dedup import MinHashConfig, exact_dedup, minhash_dedup


def curate_documents(
    sf_dir: str,
    languages: tuple[str, ...] = ("en",),
    min_quality: float = 0.3,
    minhash: MinHashConfig = MinHashConfig(jaccard_threshold=0.85),
    report: bool = True,
) -> tuple["ray.data.Dataset", dict]:
    """Returns ``(curated Dataset, funnel dict)``.

    ``report=False`` skips the per-stage counts — each ``count()``
    re-executes the lazy upstream, so the funnel costs ~3 extra passes;
    production runs want the corpus, monitoring runs want the funnel."""
    funnel: dict[str, int] = {}
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    if report:
        funnel["input"] = ds.count()

    ds = ds.map_batches(text_stats, batch_format="pyarrow")
    ds = ds.map_batches(LangId, batch_format="pyarrow", concurrency=(1, 4))
    ds = ds.map_batches(QualityScorer, batch_format="pyarrow", concurrency=(1, 4))

    lang_set = list(languages)

    def keep_lang_quality(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.and_(
            pc.is_in(batch.column("lang_pred"), value_set=pa.array(lang_set)),
            pc.greater_equal(batch.column("quality_score"), min_quality),
        )
        return batch.filter(mask)

    ds = ds.map_batches(keep_lang_quality, batch_format="pyarrow")
    if report:
        funnel["after_lang_quality"] = ds.count()

    ds = exact_dedup(ds, text_col="text", id_col="doc_id")
    if report:
        funnel["after_exact_dedup"] = ds.count()

    # near-dup clusters over the surviving corpus; keep cluster minima
    clusters = minhash_dedup(ds, minhash, text_col="text", id_col="doc_id")
    kept = clusters.filter(pa.compute.field("is_kept")).column("doc_id")
    kept_ref = ray.put(set(kept.to_pylist()))

    def keep_cluster_min(batch: pa.Table) -> pa.Table:
        import numpy as np

        keep = ray.get(kept_ref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(np.isin(ids, list(keep))))

    ds = ds.map_batches(keep_cluster_min, batch_format="pyarrow")
    if report:
        funnel["after_near_dedup"] = ds.count()
    return ds, funnel
