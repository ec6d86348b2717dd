"""N-gram language-model perplexity scoring — the CCNet/Gopher-family
quality filter: train a word-bigram LM on (a slice of) the corpus, score
every document's perplexity under it, and gate on the score. Documents
far from the corpus distribution (gibberish, boilerplate, wrong-language
text) surface as high perplexity; the filter is standard pretraining-prep
equipment alongside the stopword/repetition heuristics in
``functions/text.py`` (CCNet: Wenzek et al. 2020, arXiv:1911.00359).

Execution shape — train once, broadcast, score as a map:

1. TRAIN: per-block token/bigram hash counts (the ``TOKEN_PATTERN``
   tokenizer shared with every other text stage, hashes from the same
   ``stable_hash_array``) tree-merge in tasks; the driver keeps only the
   top-``vocab_size`` unigrams (everything else is ``<unk>``) and the
   bigrams over that vocabulary — a bounded model, broadcast ONCE via
   ``ray.put``.
2. SCORE: one vectorized pass per batch: token ids via searchsorted on
   the broadcast vocab, bigram probabilities via searchsorted on the
   sorted bigram table, add-k smoothed ``P(w_i | w_{i-1})``, per-doc
   ``ppl = 2^(-mean log2 P)``. No shuffle anywhere; the model never
   re-ships per batch.

Determinism: counts are exact integers, the vocabulary cut is
(count, hash)-ordered, and scoring is pure — same corpus, same scores,
any partitioning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..functions.hashing import stable_hash_array
from ..functions.text import TOKEN_PATTERN
from .joins import _block_refs, _single_threaded_arrow, _tree_reduce

#: sentinel ids inside the packed model
_BOS = np.uint64(0xB05B05B05B05B051)


def _doc_token_hashes(texts: pd.Series) -> list[np.ndarray]:
    """Per-doc token-hash sequences (lowercased TOKEN_PATTERN tokens)."""
    toks = texts.fillna("").str.lower().str.findall(TOKEN_PATTERN)
    out = []
    for t in toks:
        out.append(
            stable_hash_array(np.asarray(t, dtype=object))
            if len(t)
            else np.empty(0, np.uint64)
        )
    return out


def _pair_hash(prev: np.ndarray, cur: np.ndarray) -> np.ndarray:
    """Order-sensitive 64-bit bigram hash (splitmix-style mix)."""
    x = prev * np.uint64(0x9E3779B97F4A7C15) ^ cur
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    return x


def train_ngram_lm(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    vocab_size: int = 65536,
    add_k: float = 0.1,
):
    """Train the bigram LM and return a broadcastable model ref
    (``ray.put``). Model: sorted top-``vocab_size`` unigram hash array +
    counts, sorted bigram hash array + counts, totals, ``add_k``."""

    def count_partial(batch: pa.Table) -> pa.Table:
        _single_threaded_arrow()
        docs = _doc_token_hashes(batch.column(text_col).to_pandas())
        uni: list[np.ndarray] = []
        bi: list[np.ndarray] = []
        for h in docs:
            if not len(h):
                continue
            uni.append(h)
            prev = np.concatenate(([_BOS], h[:-1]))
            bi.append(_pair_hash(prev, h))
        def vc(arrs):
            if not arrs:
                return np.empty(0, np.uint64), np.empty(0, np.int64)
            v, c = np.unique(np.concatenate(arrs), return_counts=True)
            return v, c.astype(np.int64)
        uv, uc = vc(uni)
        bv, bc = vc(bi)
        return pa.table(
            {
                "h": pa.array(np.concatenate([uv, bv])),
                "n": pa.array(np.concatenate([uc, bc])),
                "kind": pa.array(
                    np.concatenate(
                        [np.zeros(len(uv), np.int8), np.ones(len(bv), np.int8)]
                    )
                ),
            }
        )

    @ray.remote
    def _merge(*parts: pa.Table) -> pa.Table:
        _single_threaded_arrow()
        t = pa.concat_tables(parts)
        g = t.group_by(["kind", "h"], use_threads=False).aggregate([("n", "sum")])
        return g.rename_columns(["kind", "h", "n"])

    refs = _block_refs(
        ds.map_batches(count_partial, batch_format="pyarrow", batch_size=None)
    )
    if not refs:
        raise ValueError("train_ngram_lm needs a non-empty corpus")
    tbl = ray.get(_tree_reduce(refs, _merge.remote))
    kind = tbl.column("kind").to_numpy(zero_copy_only=False)
    h = tbl.column("h").to_numpy(zero_copy_only=False)
    n = tbl.column("n").to_numpy(zero_copy_only=False)
    uh, un = h[kind == 0], n[kind == 0]
    bh, bn = h[kind == 1], n[kind == 1]
    if len(uh) > vocab_size:
        # deterministic vocabulary cut: by (count desc, hash asc)
        keep = np.lexsort((uh, -un))[:vocab_size]
        uh, un = uh[keep], un[keep]
    o = np.argsort(uh)
    uh, un = uh[o], un[o]
    o = np.argsort(bh)
    bh, bn = bh[o], bn[o]
    model = {
        "uni_h": uh, "uni_n": un,
        "bi_h": bh, "bi_n": bn,
        "total_tokens": int(un.sum()),
        "vocab": int(len(uh)),
        "add_k": float(add_k),
    }
    return ray.put(model)


def score_perplexity(
    ds: "ray.data.Dataset",
    model_ref,
    text_col: str = "text",
    out_col: str = "ppl",
    round_to: int = 4,
) -> "ray.data.Dataset":
    """Append per-document bigram perplexity: ``2^(-mean log2 P(w|prev))``
    with add-k smoothing, ``<unk>`` for out-of-vocabulary tokens, BOS
    context for the first token. Empty/token-less docs get NULL."""

    def score(batch: pa.Table) -> pa.Table:
        _single_threaded_arrow()
        m = ray.get(model_ref)
        uh, un = m["uni_h"], m["uni_n"]
        bh, bn = m["bi_h"], m["bi_n"]
        k, v = m["add_k"], m["vocab"]

        def lookup(keys, arr_h, arr_n):
            if not len(arr_h) or not len(keys):
                return np.zeros(len(keys), np.int64)
            pos = np.clip(np.searchsorted(arr_h, keys), 0, len(arr_h) - 1)
            out = arr_n[pos].astype(np.int64)
            out[arr_h[pos] != keys] = 0
            return out

        docs = _doc_token_hashes(batch.column(text_col).to_pandas())
        ppl = np.full(batch.num_rows, np.nan)
        for i, hseq in enumerate(docs):
            if not len(hseq):
                continue
            # map OOV tokens to <unk> (hash not in vocab -> count 0)
            cur_n = lookup(hseq, uh, un)
            known = cur_n > 0
            canon = np.where(known, hseq, _BOS ^ np.uint64(1))  # <unk> id
            prev = np.concatenate(([_BOS], canon[:-1]))
            pairs = _pair_hash(prev, canon)
            bi_cnt = lookup(pairs, bh, bn)
            prev_cnt = np.concatenate(([np.int64(0)], lookup(canon[:-1], uh, un)))
            # add-k smoothed conditional; BOS/unk contexts fall back to
            # the unigram distribution under the same smoothing
            p = (bi_cnt + k) / (prev_cnt + k * (v + 1))
            logp = np.log2(p)
            ppl[i] = float(2.0 ** (-logp.mean()))
        snapped = np.round(ppl * 10.0**round_to) / 10.0**round_to
        return batch.append_column(
            out_col,
            pa.array(
                [None if np.isnan(x) else float(x) for x in snapped], pa.float64()
            ),
        )

    return ds.map_batches(score, batch_format="pyarrow", batch_size=None)


def perplexity_filter(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    max_ppl: float | None = None,
    keep_quantile: float = 0.9,
    vocab_size: int = 65536,
    stats_out: dict | None = None,
) -> "ray.data.Dataset":
    """The composed filter: train on the corpus, score it, keep docs at or
    below ``max_ppl`` (or below the ``keep_quantile`` perplexity if no
    absolute bound is given — computed with the engine's own distributed
    rank-select quantiles). Token-less docs are dropped (no evidence)."""
    from .quantiles import rank_select_quantiles

    model = train_ngram_lm(ds, text_col=text_col, vocab_size=vocab_size)
    scored = score_perplexity(ds, model, text_col=text_col).materialize()
    if max_ppl is None:
        qt = rank_select_quantiles(scored, "ppl", (keep_quantile,))
        max_ppl = float(qt.column("v")[0].as_py())
    if stats_out is not None:
        stats_out["max_ppl"] = float(max_ppl)

    def keep(batch: pa.Table) -> pa.Table:
        p = batch.column("ppl")
        return batch.filter(pc.and_(pc.is_valid(p), pc.less_equal(p, max_ppl)))

    return scored.map_batches(keep, batch_format="pyarrow")
