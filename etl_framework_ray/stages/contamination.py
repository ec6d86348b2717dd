"""Benchmark decontamination — drop training documents that overlap an
evaluation set.

The standard LLM-training hygiene step: a document is CONTAMINATED when it
shares any ``n``-token shingle with a benchmark/eval document (the exact
n-gram-overlap rule used by public training-data pipelines; the reference
has no analogue — this is an engine extension, SURVEY.md §2.11).

Scale shape (the part that matters at 100 TB):

- The benchmark side is an EVAL SUITE — thousands of documents, not the
  corpus — so its shingle set is built once and broadcast via ``ray.put``
  (one object-store copy per node, zero-copy numpy view per task), never
  re-shipped per batch and never shuffled against the corpus.
- The corpus side streams: one vectorized ``map_batches`` pass computes
  every document's shingle hashes with a flattened rolling polynomial
  (no per-row Python beyond pandas' C tokenizer loop) and drops rows with
  any hit via sorted-array ``np.isin``.
- Membership is on 64-bit hashes, not strings: the broadcast is
  ``8 bytes x |bench shingles|`` and a false drop needs a SipHash+poly
  collision (~|corpus shingles| x |bench shingles| / 2^64 — negligible).

Tokenization is ``lower(text)`` split on ``[a-z0-9]+`` — chosen because
DuckDB's ``regexp_extract_all`` applies the IDENTICAL rule, which is what
makes the driver's SQL oracle able to replay the whole operator exactly
(`__ray_entry__.py` ``decontaminate_docs``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import stable_hash_array

SHINGLE_N = 8
_POLY_MUL = np.uint64(1099511628211)  # FNV-1a prime; wraps mod 2^64
_TOKEN_RE = r"[a-z0-9]+"


def _shingle_hashes(texts: pd.Series, n: int = SHINGLE_N) -> tuple[np.ndarray, np.ndarray]:
    """``(doc_index, shingle_hash)`` for every n-token shingle in a batch.

    One flattened pass: explode tokens across the whole batch, SipHash
    them vectorized, then combine each in-document window of ``n`` token
    hashes with a rolling polynomial (n is a small constant — the loop is
    over n, not rows). Windows that straddle a document boundary are
    masked out by comparing the exploded doc index at both window ends.
    """
    toks = texts.reset_index(drop=True).fillna("").str.lower().str.findall(_TOKEN_RE)
    flat = toks.explode().dropna()
    if len(flat) < n:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    doc_idx = flat.index.to_numpy(dtype=np.int64)
    h = stable_hash_array(flat.to_numpy())
    win = np.lib.stride_tricks.sliding_window_view(h, n)
    acc = np.zeros(len(win), dtype=np.uint64)
    for j in range(n):
        acc = acc * _POLY_MUL + win[:, j]
    within_doc = doc_idx[: len(win)] == doc_idx[n - 1 :]
    return doc_idx[: len(win)][within_doc], acc[within_doc]


def shingle_hash_set(texts, n: int = SHINGLE_N) -> np.ndarray:
    """Sorted unique shingle hashes of a (small) benchmark text collection.
    Accepts a list/Series/Arrow array of strings; runs on the driver —
    the benchmark side is an eval suite, not a corpus."""
    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = texts.to_pandas()
    _, hashes = _shingle_hashes(pd.Series(texts, dtype=object), n)
    return np.unique(hashes)


def decontaminate(ds, bench_texts, n: int = SHINGLE_N, text_col: str = "text"):
    """Filter ``ds`` down to documents sharing NO n-token shingle with
    ``bench_texts``. Returns the kept rows with their original columns."""
    import ray

    bench_ref = ray.put(shingle_hash_set(bench_texts, n))

    def keep_clean(batch: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)  # zero-copy local object-store view
        doc_idx, hashes = _shingle_hashes(batch.column(text_col).to_pandas(), n)
        if len(hashes) == 0 or len(bench) == 0:
            return batch
        hit_docs = np.unique(doc_idx[np.isin(hashes, bench)])
        mask = np.ones(batch.num_rows, dtype=bool)
        mask[hit_docs] = False
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep_clean, batch_format="pyarrow")
