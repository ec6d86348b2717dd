"""Exact string-similarity self-join (fuzzy join): every pair of
documents whose character-``n``-gram sets have Jaccard ≥ θ — the EXACT
counterpart of the MinHash family (``stages/dedup.py``), for the
curation steps that need guaranteed-complete near-dup pairs (legal
dedup, eval-set leakage audits) rather than probabilistic recall.

Algorithm — AllPairs/PPJoin prefix filtering (Bayardo et al., WWW'07;
Xiao et al., WWW'08), the standard exact similarity-join at scale:

1. TOKENIZE once: per doc, the distinct rolling-hashed n-grams as a
   VALUE-SORTED uint64 array (one numpy pass per doc; the sorted array
   doubles as the verify payload).
2. GLOBAL TOKEN ORDER: document frequency ascending, ties by hash. The
   df table is vocabulary-bounded (≤ charset^n distinct n-grams, MBs for
   real text), tree-reduced in tasks and broadcast once — never a
   per-row shuffle.
3. PREFIX EMISSION: a pair with Jaccard ≥ θ must share its globally
   smallest common token within BOTH docs' first ``n - ⌈θ·n⌉ + 1``
   tokens in that order (else the intersection could not reach
   ``⌈θ·n⌉``). So each doc emits only its prefix tokens — (token, id,
   set size), ~``(1-θ)``× the token count, NO payload.
4. CANDIDATES: one direct exchange co-locates prefix rows by token;
   within a token bucket all row pairs passing the size-ratio filter
   (``|small| ≥ θ·|large|``, a Jaccard necessary condition) become
   candidates, capped per token with a counted, never-silent truncation.
   A second tiny exchange on ``id_a`` dedups pairs found via several
   shared prefix tokens.
5. VERIFY exactly: two hash equi-joins attach both docs' sorted token
   arrays to each candidate pair; one ``np.intersect1d`` per pair gives
   the true Jaccard, filtered at θ and snapped for cross-engine compare.
   Prefix math errs toward LONGER prefixes under float rounding — extra
   candidates cost verify work, never recall.

Scale shape: raw text tokenizes once and never shuffles; the exchange
carries (uint64, int64, int64) prefix rows; payloads move only for the
two sides of each surviving candidate. The one distribution hazard is a
token whose bucket exceeds the pair cap — reported in ``stats_out``, and
df-ascending ordering makes prefixes prefer RARE tokens precisely to
keep those buckets small.

DENSE-CORPUS AUTO-TIER: prefix filtering is output-sensitive — on a
corpus whose pairwise similarity is broadly high (equivalently: a tiny
n-gram vocabulary, so every prefix token is frequent), the candidate set
approaches ALL pairs and the candidate exchange dwarfs the answer. The
join therefore counts its own prefix buckets first (one vocabulary-
bounded aggregate) and, when the candidate bound says pruning is not
pruning, routes to an EXACT dense tier: block-nested-loop over the
materialized token sets, per-block-pair intersection counts via one
binary-matrix matmul (vocab-bounded columns), no candidate exchange, no
truncation, every unordered pair evaluated exactly once. Same answer,
bounded Θ(n²/p) cost with a tiny constant — the right shape for the
regime where Θ(n²) is unavoidable. The switch is counter-reported in
``stats_out['tier']`` and logged, never silent; corpora that are BOTH
dense and large-vocabulary keep the capped prefix path (counted
truncation) with MinHash (stages/dedup.py) as the scale escape hatch.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from .joins import (
    _block_refs,
    _direct_grouped_apply,
    _single_threaded_arrow,
    _tree_reduce,
    equi_join,
)
from .util import BatchCounts

#: odd 64-bit mix constants for the rolling n-gram hash (public
#: splitmix64-style multipliers)
_P1 = np.uint64(0x9E3779B97F4A7C15)
_P2 = np.uint64(0xBF58476D1CE4E5B9)
_P3 = np.uint64(0x94D049BB133111EB)


def _ngram_hashes(text: str, n: int) -> np.ndarray:
    """Distinct rolling-hashed character n-grams of ``lower(text)``,
    value-sorted (uint64). Empty for texts shorter than ``n``."""
    cp = np.frombuffer(text.lower().encode("utf-32-le"), dtype=np.uint32)
    if len(cp) < n:
        return np.empty(0, np.uint64)
    acc = np.zeros(len(cp) - n + 1, np.uint64)
    mults = (_P1, _P2, _P3)
    for j in range(n):
        m = mults[j % 3] + np.uint64(2 * j)  # stays odd
        acc = acc + cp[j : len(cp) - n + 1 + j].astype(np.uint64) * m
        acc = acc * _P1 ^ (acc >> np.uint64(31))
    return np.unique(acc)


def _snap(v: np.ndarray, round_to: int) -> np.ndarray:
    scale = 10.0**round_to
    return np.round(v * scale).astype(np.int64) / scale


@ray.remote
def _dense_block_pair(
    ta: pa.Table,
    tb: pa.Table | None,
    vocab: np.ndarray,
    threshold: float,
    round_to: int,
    id_col: str,
) -> pa.Table:
    """Exact similarities for every cross pair of two token-set blocks
    (``tb=None``: within-block, upper triangle only). Intersection counts
    come from ONE binary-matrix matmul over the vocab columns — counts
    ≤ set size ≪ 2²⁴ are exact in float32."""
    _single_threaded_arrow()
    if ta.num_rows == 0 or (tb is not None and tb.num_rows == 0):
        # repartition can hand back schema-less empty blocks
        return pa.table(
            {"id_a": pa.nulls(0, pa.int64()), "id_b": pa.nulls(0, pa.int64()),
             "sim": pa.nulls(0, pa.float64())}
        )

    def mat(t: pa.Table):
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        arr = t.column("toks")
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        offs = arr.offsets.to_numpy(zero_copy_only=False)
        vals = arr.values.to_numpy(zero_copy_only=False)
        X = np.zeros((t.num_rows, len(vocab)), np.float32)
        rows = np.repeat(np.arange(t.num_rows), np.diff(offs))
        X[rows, np.searchsorted(vocab, vals)] = 1.0
        sz = t.column("sz").to_numpy(zero_copy_only=False).astype(np.float64)
        return ids, X, sz

    ia, Xa, sa = mat(ta)
    same = tb is None
    ib, Xb, sb = (ia, Xa, sa) if same else mat(tb)
    inter = (Xa @ Xb.T).astype(np.float64)
    union = sa[:, None] + sb[None, :] - inter
    sim = inter / np.maximum(union, 1.0)
    keep = sim >= threshold
    if same:
        keep &= np.triu(np.ones_like(keep, dtype=bool), k=1)
    ii, jj = np.nonzero(keep)
    a, b = ia[ii], ib[jj]
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    ne = lo != hi  # duplicate ids in a corpus: never self-pair
    return pa.table(
        {
            "id_a": pa.array(lo[ne], pa.int64()),
            "id_b": pa.array(hi[ne], pa.int64()),
            "sim": pa.array(_snap(sim[ii[ne], jj[ne]], round_to), pa.float64()),
        }
    )


def _dense_pairs(
    sets: "ray.data.Dataset",
    vocab: np.ndarray,
    threshold: float,
    round_to: int,
    id_col: str,
    n_docs: int,
) -> "ray.data.Dataset":
    """Exact dense tier: all C(nb+1, 2) block pairs in parallel tasks;
    each unordered doc pair is evaluated exactly once (blocks partition
    the rows), so there is no candidate exchange and no pair dedup.

    Blocks target ~400 ROWS each (per-task memory is quadratic in block
    rows: three rows_a×rows_b float64 matrices), with the block COUNT
    capped at 256 so the task grid stays ≤ ~33k — past ~100k docs block
    rows grow and per-task memory with them, which is why the auto
    router also bounds ``n_docs`` (``dense_max_docs``); a forced
    ``tier="dense"`` beyond that accepts the documented quadratic cost."""
    nb = max(4, min(256, math.ceil(n_docs / 400)))
    blocks = _block_refs(sets.repartition(nb))
    vocab_ref = ray.put(vocab)
    futures = []
    for i in range(len(blocks)):
        futures.append(
            _dense_block_pair.remote(
                blocks[i], None, vocab_ref, threshold, round_to, id_col
            )
        )
        for j in range(i + 1, len(blocks)):
            futures.append(
                _dense_block_pair.remote(
                    blocks[i], blocks[j], vocab_ref, threshold, round_to, id_col
                )
            )
    return ray.data.from_arrow_refs(futures)


def similarity_join(
    ds: "ray.data.Dataset",
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 3,
    max_bucket_pairs: int = 1_000_000,
    round_to: int = 6,
    shuffle_buckets: int | None = None,
    stats_out: dict | None = None,
    tier: str = "auto",
    dense_max_vocab: int = 8192,
    dense_route_factor: float = 0.25,
    dense_max_docs: int = 50_000,
) -> "ray.data.Dataset":
    """All pairs ``(id_a, id_b, sim)`` with ``id_a < id_b`` and n-gram
    Jaccard ``sim ≥ threshold`` — exact under EVERY tier (the dense tier
    evaluates each pair, the prefix tier's verify pass decides).

    ``tier``: ``"auto"`` (default) counts the prefix buckets and routes
    to the dense tier when the candidate bound exceeds
    ``dense_route_factor × C(n,2)`` (pruning is not pruning), the
    vocabulary fits ``dense_max_vocab`` matrix columns, AND the corpus
    fits ``dense_max_docs`` (the dense tier is Θ(n²) with per-task
    memory quadratic in block rows — past the bound the capped prefix
    path stays, with minhash as the scale escape hatch); ``"prefix"`` /
    ``"dense"`` force a tier. ``stats_out``: gets ``tier``,
    ``candidate_bound``, ``vocab_size``, ``n_docs``, plus the prefix
    tier's ``candidate_pairs`` / ``truncated_tokens`` /
    ``truncated_pairs`` counters."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError("threshold must be in (0, 1]")
    if ngram < 1:
        raise ValueError("ngram must be >= 1")
    if tier not in ("auto", "prefix", "dense"):
        raise ValueError(f"tier must be 'auto', 'prefix' or 'dense', got {tier!r}")

    def tokenize(batch: pa.Table) -> pa.Table:
        _single_threaded_arrow()
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        texts = batch.column(text_col).to_pandas()
        out_id, out_toks = [], []
        for i, s in enumerate(texts):
            toks = _ngram_hashes(s or "", ngram)
            if len(toks):
                out_id.append(ids[i])
                out_toks.append(toks)
        return pa.table(
            {
                id_col: pa.array(np.asarray(out_id, np.int64)),
                "toks": pa.array(out_toks, pa.list_(pa.uint64())),
                "sz": pa.array(np.asarray([len(t) for t in out_toks], np.int64)),
            }
        )

    sets = ds.map_batches(tokenize, batch_format="pyarrow", batch_size=None).materialize()

    # ---- global df table: per-block partials, log-depth task merge ----
    def df_partial(batch: pa.Table) -> pa.Table:
        _single_threaded_arrow()
        flat = pc.list_flatten(batch.column("toks"))  # per-doc-distinct already
        vc = flat.value_counts()
        return pa.table(
            {"tok": vc.field("values"), "n": vc.field("counts").cast(pa.int64())}
        )

    @ray.remote
    def _merge_df(*parts: pa.Table) -> pa.Table:
        _single_threaded_arrow()
        t = pa.concat_tables(parts)
        # rename back so the fold is idempotent across tree levels
        g = t.group_by("tok", use_threads=False).aggregate([("n", "sum")])
        return g.rename_columns(["tok", "n"])

    df_refs = _block_refs(
        sets.map_batches(df_partial, batch_format="pyarrow", batch_size=None)
    )
    if not df_refs:
        empty = pa.table(
            {"id_a": pa.nulls(0, pa.int64()), "id_b": pa.nulls(0, pa.int64()),
             "sim": pa.nulls(0, pa.float64())}
        )
        return ray.data.from_arrow(empty)
    df_tbl = ray.get(_tree_reduce(df_refs, _merge_df.remote))
    # vocabulary-bounded broadcast: (sorted token array, df array)
    order = pc.sort_indices(df_tbl.column("tok"))
    toks_sorted = df_tbl.column("tok").take(order).to_numpy(zero_copy_only=False)
    dfs_sorted = df_tbl.column("n").take(order).to_numpy(zero_copy_only=False)
    df_ref = ray.put((toks_sorted, dfs_sorted))

    def emit_prefix(batch: pa.Table) -> pa.Table:
        _single_threaded_arrow()
        vocab, dfs = ray.get(df_ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        szs = batch.column("sz").to_numpy(zero_copy_only=False)
        arr = batch.column("toks")
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        offs = arr.offsets.to_numpy(zero_copy_only=False)
        vals = arr.values.to_numpy(zero_copy_only=False)
        all_dfs = dfs[np.searchsorted(vocab, vals)]
        out_t, out_i, out_s, out_p = [], [], [], []
        for r in range(batch.num_rows):
            t = vals[offs[r] : offs[r + 1]]
            n = len(t)
            # ⌈θ·n⌉ with the float error pushed toward LONGER prefixes
            p = n - math.ceil(threshold * n - 1e-9) + 1
            if p <= 0:
                continue
            d = all_dfs[offs[r] : offs[r + 1]]
            pref = t[np.lexsort((t, d))[:p]]
            out_t.append(pref)
            out_i.append(np.full(len(pref), ids[r], np.int64))
            out_s.append(np.full(len(pref), szs[r], np.int64))
            out_p.append(np.arange(len(pref), dtype=np.int64))
        if not out_t:
            return pa.table(
                {"tok": pa.nulls(0, pa.uint64()), "pid": pa.nulls(0, pa.int64()),
                 "psz": pa.nulls(0, pa.int64()), "pos": pa.nulls(0, pa.int64())}
            )
        return pa.table(
            {"tok": pa.array(np.concatenate(out_t)),
             "pid": pa.array(np.concatenate(out_i)),
             "psz": pa.array(np.concatenate(out_s)),
             "pos": pa.array(np.concatenate(out_p))}
        )

    prefix_rows = sets.map_batches(emit_prefix, batch_format="pyarrow", batch_size=None)

    # ---- tier routing: count the prefix buckets BEFORE paying for them ----
    n_docs = sets.count()
    vocab_size = len(toks_sorted)
    chosen = tier
    cand_bound: int | None = None
    if tier == "auto":
        def bucket_counts(batch: pa.Table) -> pa.Table:
            _single_threaded_arrow()
            vc = batch.column("tok").value_counts()
            return pa.table(
                {"tok": vc.field("values"), "n": vc.field("counts").cast(pa.int64())}
            )

        cnt_refs = _block_refs(
            prefix_rows.map_batches(bucket_counts, batch_format="pyarrow", batch_size=None)
        )
        if cnt_refs:
            cnt_tbl = ray.get(_tree_reduce(cnt_refs, _merge_df.remote))
            m = cnt_tbl.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
            cand_bound = int((m * (m - 1) / 2).sum())
        else:
            cand_bound = 0
        total_pairs = n_docs * (n_docs - 1) / 2
        dense_indicated = total_pairs > 0 and cand_bound > dense_route_factor * total_pairs
        if dense_indicated and vocab_size <= dense_max_vocab and n_docs <= dense_max_docs:
            chosen = "dense"
        else:
            chosen = "prefix"
            if dense_indicated:
                import logging

                logging.getLogger(__name__).warning(
                    "similarity_join: candidate bound %d ≈ all pairs but the "
                    "corpus is outside the dense tier's envelope (vocab %d vs "
                    "dense_max_vocab=%d, docs %d vs dense_max_docs=%d) — "
                    "staying on the capped prefix tier; minhash_dedup is the "
                    "scale path",
                    cand_bound, vocab_size, dense_max_vocab, n_docs, dense_max_docs,
                )
    elif tier == "dense" and vocab_size > dense_max_vocab:
        raise ValueError(
            f"dense tier needs vocab ({vocab_size}) <= dense_max_vocab "
            f"({dense_max_vocab}): per-block matrices are n×vocab"
        )
    if stats_out is not None:
        stats_out["tier"] = chosen
        stats_out["vocab_size"] = vocab_size
        stats_out["n_docs"] = n_docs
        if cand_bound is not None:
            stats_out["candidate_bound"] = cand_bound
    if chosen == "dense":
        if tier == "auto":
            import logging

            logging.getLogger(__name__).warning(
                "similarity_join: prefix candidate bound %d > %.0f%% of all "
                "%d-doc pairs — routing to the exact dense tier (vocab %d)",
                cand_bound, dense_route_factor * 100, n_docs, vocab_size,
            )
        return _dense_pairs(sets, toks_sorted, threshold, round_to, id_col, n_docs)

    pair_schema = [("id_a", pa.int64()), ("id_b", pa.int64())]

    import tempfile

    counter = BatchCounts(tempfile.mkdtemp(prefix="fuzzy_trunc_"))

    def cand_kernel(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return pa.table({n: pa.nulls(0, t) for n, t in pair_schema})
        trunc_tok = trunc_pairs = 0
        out_a, out_b = [], []
        ratio = threshold / (1.0 + threshold)
        for _, g in df.groupby("tok", sort=False):
            m = len(g)
            if m < 2:
                continue
            o = np.argsort(g["psz"].to_numpy(np.int64), kind="mergesort")
            ids = g["pid"].to_numpy(np.int64)[o]
            szs = g["psz"].to_numpy(np.int64)[o]
            pos = g["pos"].to_numpy(np.int64)[o]
            total = m * (m - 1) // 2
            if total > max_bucket_pairs:
                # counted, deterministic truncation: keep the smallest-set
                # rows (ids sorted secondary) — never silent
                keep = int((1 + math.isqrt(1 + 8 * max_bucket_pairs)) // 2)
                trunc_tok += 1
                trunc_pairs += total - keep * (keep - 1) // 2
                ids, szs, pos, m = ids[:keep], szs[:keep], pos[:keep], keep
            ii, jj = np.triu_indices(m, k=1)
            # size-ratio necessary condition: |small| ≥ θ·|large|
            ok = szs[ii] >= threshold * szs[jj] - 1e-9
            # PPJoin positional filter (Xiao et al.): a qualifying pair's
            # MINIMAL shared token has every shared token at or after its
            # position in both docs, so |∩| ≤ min(n_a-pos_a, n_b-pos_b);
            # Jaccard ≥ θ forces |∩| ≥ θ/(1+θ)·(n_a+n_b). Pairs pruned
            # here re-qualify in their minimal-token bucket, so exactness
            # holds (the float slack errs toward KEEPING candidates).
            need = ratio * (szs[ii] + szs[jj]) - 1e-9
            ok &= np.minimum(szs[ii] - pos[ii], szs[jj] - pos[jj]) >= need
            ii, jj = ii[ok], jj[ok]
            a, b = ids[ii], ids[jj]
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            ne = lo != hi  # duplicate ids in a corpus: never self-pair
            out_a.append(lo[ne])
            out_b.append(hi[ne])
        if trunc_tok:
            counter.add({"truncated_tokens": trunc_tok, "truncated_pairs": trunc_pairs})
        if not out_a:
            return pa.table({n: pa.nulls(0, t) for n, t in pair_schema})
        t = pa.table({"id_a": pa.array(np.concatenate(out_a)),
                      "id_b": pa.array(np.concatenate(out_b))})
        # local dedup before the pair exchange
        return t.group_by(["id_a", "id_b"], use_threads=False).aggregate([])

    candidates = _direct_grouped_apply(
        prefix_rows, "tok", cand_kernel, shuffle_buckets
    )

    def dedup_kernel(df: pd.DataFrame) -> pa.Table:
        d = df.drop_duplicates(["id_a", "id_b"])
        return pa.table({"id_a": pa.array(d["id_a"].to_numpy(np.int64)),
                         "id_b": pa.array(d["id_b"].to_numpy(np.int64))})

    # building `pairs` materializes the candidate stage, so the kernel's
    # truncation counters are final here — report them loudly (the
    # dedup-family no-silent-caps contract, dedup.py:_report_truncation)
    pairs = _direct_grouped_apply(candidates, "id_a", dedup_kernel, shuffle_buckets)
    n_pairs = pairs.count()
    counts = counter.collect()
    counter.cleanup()
    if stats_out is not None:
        stats_out["candidate_pairs"] = n_pairs
        stats_out.update(counts)
    if counts.get("truncated_tokens"):
        import logging

        logging.getLogger(__name__).warning(
            "similarity_join: %d token bucket(s) exceeded max_bucket_pairs; "
            "%d candidate pairs were dropped — results may MISS pairs "
            "(raise max_bucket_pairs or lower-df-order the corpus)",
            counts["truncated_tokens"], counts["truncated_pairs"],
        )

    # ---- exact verify: attach both sorted token arrays, intersect ----
    j1 = equi_join(pairs, sets, "id_a", id_col, ["toks", "sz"],
                   shuffle_buckets=shuffle_buckets)
    j1 = j1.map_batches(
        lambda t: t.rename_columns(["id_a", "id_b", "toks_a", "sz_a"]),
        batch_format="pyarrow",
    )
    j2 = equi_join(j1, sets, "id_b", id_col, ["toks", "sz"],
                   shuffle_buckets=shuffle_buckets)

    def verify(batch: pa.Table) -> pa.Table:
        _single_threaded_arrow()
        if batch.num_rows == 0:
            return pa.table({"id_a": pa.nulls(0, pa.int64()),
                             "id_b": pa.nulls(0, pa.int64()),
                             "sim": pa.nulls(0, pa.float64())})
        ta, tb = batch.column("toks_a"), batch.column("r_toks")
        if isinstance(ta, pa.ChunkedArray):
            ta = ta.combine_chunks()
        if isinstance(tb, pa.ChunkedArray):
            tb = tb.combine_chunks()
        oa = ta.offsets.to_numpy(zero_copy_only=False)
        va = ta.values.to_numpy(zero_copy_only=False)
        ob = tb.offsets.to_numpy(zero_copy_only=False)
        vb = tb.values.to_numpy(zero_copy_only=False)
        sa = batch.column("sz_a").to_numpy(zero_copy_only=False).astype(np.float64)
        sb = batch.column("r_sz").to_numpy(zero_copy_only=False).astype(np.float64)
        inter = np.empty(batch.num_rows, np.float64)
        for r in range(batch.num_rows):
            # sorted-unique arrays: searchsort the smaller into the larger
            x = va[oa[r] : oa[r + 1]]
            y = vb[ob[r] : ob[r + 1]]
            if len(x) > len(y):
                x, y = y, x
            pos = np.searchsorted(y, x)
            pos[pos == len(y)] = 0
            inter[r] = np.count_nonzero(y[pos] == x)
        sim = inter / (sa + sb - inter)
        keep = sim >= threshold
        return pa.table(
            {"id_a": batch.column("id_a").filter(pa.array(keep)),
             "id_b": batch.column("id_b").filter(pa.array(keep)),
             "sim": pa.array(_snap(sim[keep], round_to))}
        )

    return j2.map_batches(verify, batch_format="pyarrow")
