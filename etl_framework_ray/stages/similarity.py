"""Similarity search over an embedding column (``list<float>``).

- ``ann_topk``: exact brute-force cosine top-k — the correctness baseline.
  Query matrix broadcast once (``ray.put``); each data batch computes one
  numpy matmul and emits only its LOCAL top-k per query (partial top-k),
  so the shuffle carries Q×k rows per block, not Q×N. A final per-query
  merge keeps the global top-k.
- ``ann_lsh_topk``: scale path #1 — seeded random-hyperplane LSH buckets
  with hamming-1 multiprobe; queries scan ~(planes+1)/2^p of the corpus.
- ``ann_ivf_topk``: scale path #2 — IVF: a spherical k-means coarse
  quantizer (trained on a bounded sample, CACHED per corpus fingerprint)
  partitions the corpus into ``nlist`` cells; queries scan their
  ``nprobe`` nearest cells. With ``nprobe == nlist`` the scan is total
  and the result EQUALS the exact baseline (asserted in tests); recall at
  partial probes is measured.

Exchange shape (round 4): every grouped stage — bucket/cell kernels and
the per-query merges — runs on the engine's DIRECT hash exchange
(:func:`~.joins._direct_grouped_apply`), one kernel dispatch per hash
bucket handling ALL of its groups. The previous
``groupby().map_groups`` route is a sort-based all-to-all whose fixed
costs measured <20% CPU utilization on this engine (BASELINE.md round 2,
the temporal-join finding); the direct exchange already cut those joins
5–15×.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .joins import _direct_grouped_apply


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _stack(col) -> np.ndarray:
    return np.stack(col.to_pandas().to_numpy()).astype(np.float64)


def _bounded_sample(ds: "ray.data.Dataset", vec_col: str, sample_size: int) -> np.ndarray | None:
    """Driver-side bounded vector sample for k-means fits. Returns ``None``
    for an EMPTY dataset (``iter_batches`` yields nothing and
    ``pa.concat_tables([])`` raises — the semantic_dedup empty-input crash)."""
    batches = list(
        ds.limit(sample_size).select_columns([vec_col]).iter_batches(batch_format="pyarrow")
    )
    tbl = pa.concat_tables(batches) if batches else None
    if tbl is None or tbl.num_rows == 0:
        return None
    return _stack(tbl.column(vec_col))


def _empty_topk(id_col: str) -> pa.Table:
    return pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            id_col: pa.array([], pa.int64()),
            "sim": pa.array([], pa.float64()),
        }
    )


def _topk_table(id_col: str, q, v, s) -> pa.Table:
    """(query_id, id, sim) rows at EXPLICIT types — every bucket of the
    exchange (including empty ones) must emit the identical schema."""
    return pa.table(
        {
            "query_id": pa.array(np.asarray(q, dtype=np.int64)),
            id_col: pa.array(np.asarray(v, dtype=np.int64)),
            "sim": pa.array(np.asarray(s, dtype=np.float64)),
        }
    )


def _make_merge_topk(id_col: str, k: int, round_to: int | None, dedupe: bool):
    """Per-exchange-bucket merge kernel: global top-k per query over ALL
    of the bucket's queries (one pandas sort + grouped head, not one UDF
    dispatch per query). ``dedupe`` drops (query, candidate) pairs that
    surfaced via several probes before ranking."""

    def merge(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return _empty_topk(id_col)
        if dedupe:
            df = df.drop_duplicates(["query_id", id_col])
        g = (
            df.sort_values(["sim", id_col], ascending=[False, True], kind="mergesort")
            .groupby("query_id", sort=False)
            .head(k)
        )
        sims = g["sim"].to_numpy(dtype=np.float64)
        if round_to is not None:
            # exact-integer round-trip: int64(round(sim*10^d))/10^d yields
            # the IDENTICAL double in any engine, unlike round(x, d) whose
            # result can differ at the ULP level across implementations
            scale = float(10**round_to)
            sims = np.round(sims * scale).astype(np.int64) / scale
        return _topk_table(id_col, g["query_id"].to_numpy(), g[id_col].to_numpy(), sims)

    return merge


def ann_topk(
    ds: "ray.data.Dataset",
    query_ids: list[int],
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int | None = 4,
) -> "ray.data.Dataset":
    """Exact top-k cosine neighbors for each query id (self excluded).

    Output columns: ``query_id, vec_id, sim`` — sims computed in float64
    and optionally rounded for cross-engine comparison stability.
    """
    qset = set(int(q) for q in query_ids)

    def collect_queries(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        mask = np.isin(ids, list(qset))
        return batch.filter(pa.array(mask)).select([id_col, vec_col])

    q_tbl = pa.concat_tables(
        ds.map_batches(collect_queries, batch_format="pyarrow").iter_batches(batch_format="pyarrow")
    )
    q_ids = q_tbl.column(id_col).to_numpy(zero_copy_only=False)
    q_mat = _normalize(_stack(q_tbl.column(vec_col)))
    qref = ray.put((q_ids, q_mat))

    def partial_topk(batch: pa.Table) -> pa.Table:
        qids, qm = ray.get(qref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        m = _normalize(_stack(batch.column(vec_col)))
        sims = qm @ m.T  # (Q, B)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(qids)):
            row = sims[qi]
            valid = ids != qids[qi]  # exclude self
            cand = np.where(valid)[0]
            if len(cand) == 0:
                continue
            take = min(k, len(cand))
            # deterministic tie-break: (-sim, vec_id) lexicographic
            order = np.lexsort((ids[cand], -row[cand]))
            top = cand[order[:take]]
            out_q.append(np.full(take, qids[qi], dtype=np.int64))
            out_v.append(ids[top].astype(np.int64))
            out_s.append(row[top])
        if not out_q:
            return _empty_topk(id_col)
        return _topk_table(
            id_col, np.concatenate(out_q), np.concatenate(out_v), np.concatenate(out_s)
        )

    partials = ds.map_batches(partial_topk, batch_format="pyarrow")
    return _direct_grouped_apply(
        partials, "query_id", _make_merge_topk(id_col, k, round_to, dedupe=False)
    )


def _bucket_knn_rows(
    g: pd.DataFrame, id_col: str, vec_col: str, k: int
) -> tuple[list, list, list]:
    """One LSH/IVF bucket: (Q, I) cosine matmul, per-query local top-k
    with deterministic (-sim, id) tie-break, self excluded."""
    idx = g[g["role"] == 0]
    qry = g[g["role"] == 1]
    out_q: list = []
    out_v: list = []
    out_s: list = []
    if not len(idx) or not len(qry):
        return out_q, out_v, out_s
    iids = idx[id_col].to_numpy()
    im = _normalize(np.stack(idx[vec_col].to_numpy()).astype(np.float64))
    qids = qry[id_col].to_numpy()
    qm = _normalize(np.stack(qry[vec_col].to_numpy()).astype(np.float64))
    sims = qm @ im.T  # (Q, I)
    for qi in range(len(qids)):
        row = sims[qi]
        cand = np.where(iids != qids[qi])[0]  # exclude self
        if not len(cand):
            continue
        order = np.lexsort((iids[cand], -row[cand]))[: min(k, len(cand))]
        top = cand[order]
        out_q.extend([int(qids[qi])] * len(top))
        out_v.extend(int(v) for v in iids[top])
        out_s.extend(float(s) for s in row[top])
    return out_q, out_v, out_s


def ann_lsh_topk(
    ds: "ray.data.Dataset",
    query_ids: list[int],
    k: int = 5,
    num_planes: int = 6,
    seed: int = 13,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    multiprobe: bool = True,
) -> "ray.data.Dataset":
    """Approximate top-k: random-hyperplane LSH (2^num_planes buckets).

    Index vectors land once in their home bucket; QUERY vectors probe
    their home bucket plus (with ``multiprobe``, default) every 1-bit
    neighbor — the bits most likely flipped by quantization noise. Each
    exchange bucket computes query×index cosine for ALL of its LSH
    buckets and emits bucket-local top-k; a per-query merge keeps the
    global top-k. Scan cost ≈ (planes+1)/2^p of the corpus per query;
    single-probe (multiprobe=False) trades recall for a further
    (planes+1)× cut."""
    qset = sorted(int(q) for q in query_ids)

    # planes derived per batch from (seed, batch dim) — deterministic
    # across batches and avoids a driver-side take(1) partial execution
    def emit_rows(batch: pa.Table) -> pa.Table:
        m = _stack(batch.column(vec_col))
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((m.shape[1], num_planes))
        bits = (m @ planes) > 0
        home = (bits * (1 << np.arange(num_planes))).sum(axis=1).astype(np.int64)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        vecs = batch.column(vec_col)
        n = len(ids)
        parts = [
            pa.table(
                {
                    "bucket": pa.array(home),
                    id_col: pa.array(ids),
                    vec_col: vecs,
                    "role": pa.array(np.zeros(n, dtype=np.int8)),  # index
                }
            )
        ]
        is_q = np.isin(ids, qset)
        if is_q.any():
            q_ids, q_home = ids[is_q], home[is_q]
            q_vecs = batch.filter(pa.array(is_q)).column(vec_col)
            probes = [q_home] + (
                [q_home ^ (1 << p) for p in range(num_planes)] if multiprobe else []
            )
            for pb in probes:
                parts.append(
                    pa.table(
                        {
                            "bucket": pa.array(pb),
                            id_col: pa.array(q_ids),
                            vec_col: q_vecs,
                            "role": pa.array(np.ones(len(q_ids), dtype=np.int8)),
                        }
                    )
                )
        return pa.concat_tables(parts)

    rows = ds.map_batches(emit_rows, batch_format="pyarrow")

    def buckets_knn(df: pd.DataFrame) -> pa.Table:
        out_q: list = []
        out_v: list = []
        out_s: list = []
        if len(df):
            for _, g in df.groupby("bucket", sort=False):
                q, v, s = _bucket_knn_rows(g, id_col, vec_col, k)
                out_q.extend(q)
                out_v.extend(v)
                out_s.extend(s)
        if not out_q:
            return _empty_topk(id_col)
        return _topk_table(id_col, out_q, out_v, out_s)

    local = _direct_grouped_apply(rows, "bucket", buckets_knn)
    # a (query, index) pair can surface via several probes — the merge
    # dedupes before keeping the global top-k
    return _direct_grouped_apply(
        local, "query_id", _make_merge_topk(id_col, k, None, dedupe=True)
    )


def _spherical_kmeans(sample: np.ndarray, nlist: int, seed: int, iters: int = 10) -> np.ndarray:
    """Seeded Lloyd iterations on L2-normalized vectors (cosine metric).
    Pure vectorized numpy over a BOUNDED sample — driver cost is
    O(sample × nlist × iters) regardless of corpus size."""
    rng = np.random.default_rng(seed)
    s = _normalize(sample)
    cent = s[rng.choice(len(s), size=min(nlist, len(s)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(s @ cent.T, axis=1)
        for c in range(len(cent)):
            members = s[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


#: trained coarse quantizers keyed by corpus fingerprint — see train_ivf.
#: Bounded: every compaction/reshard/epoch rewrites the files and mints a
#: NEW key, so without eviction a long-lived driver that re-queries after
#: each epoch leaks centroids + per-file key tuples monotonically.
_IVF_CACHE: "dict[tuple, np.ndarray]" = {}
_IVF_CACHE_MAX = 8


def _ivf_cache_put(key: tuple, cent: np.ndarray) -> None:
    """Insert-with-eviction (oldest-inserted first; dicts are ordered)."""
    while len(_IVF_CACHE) >= _IVF_CACHE_MAX:
        _IVF_CACHE.pop(next(iter(_IVF_CACHE)))
    _IVF_CACHE[key] = cent


def _corpus_fingerprint(ds: "ray.data.Dataset") -> tuple | None:
    """Cheap identity of a dataset for index reuse: the sorted input-file
    list with (size, mtime) per file — metadata-only, no execution. A
    mid-pipeline dataset (no input files) returns None → no caching.
    Compaction/reshard rewrites files, so the fingerprint changes and the
    stale index is never reused."""
    try:
        import os as _os

        files = ds.input_files()
        if not files:
            return None
        return tuple(
            (f, _os.path.getsize(f), _os.path.getmtime(f)) for f in sorted(files)
        )
    except Exception:
        return None


def train_ivf(
    ds: "ray.data.Dataset",
    nlist: int = 16,
    sample_size: int = 4096,
    seed: int = 29,
    vec_col: str = "embedding",
) -> np.ndarray | None:
    """Train (or fetch the cached) IVF coarse quantizer for a corpus.

    The k-means fit runs ONCE per (corpus fingerprint, nlist, seed,
    sample_size) — repeated ``ann_ivf_topk`` calls against the same
    parquet files reuse the centroids with zero Lloyd iterations
    (round-3 verdict: IVF state was rebuilt per call). The cache is
    invalidated naturally: compaction / reshard / new epochs rewrite the
    files and change the fingerprint. Returns ``None`` for an empty
    corpus."""
    fp = _corpus_fingerprint(ds)
    key = (fp, nlist, sample_size, seed, vec_col) if fp is not None else None
    if key is not None and key in _IVF_CACHE:
        return _IVF_CACHE[key]
    sample = _bounded_sample(ds, vec_col, sample_size)
    if sample is None:
        return None
    cent = _spherical_kmeans(sample, nlist, seed)
    if key is not None:
        _ivf_cache_put(key, cent)
    return cent


def ann_ivf_topk(
    ds: "ray.data.Dataset",
    query_ids: list[int],
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    sample_size: int = 4096,
    seed: int = 29,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int | None = 4,
    centroids: np.ndarray | None = None,
) -> "ray.data.Dataset":
    """IVF approximate top-k cosine (the classic inverted-file layout).

    TRAIN: spherical k-means via :func:`train_ivf` — cached per corpus
    fingerprint, so repeat queries reuse the quantizer (pass
    ``centroids`` to inject a persisted index explicitly). INDEX: one
    matmul per batch assigns every vector to its nearest cell. QUERY:
    each query probes its ``nprobe`` nearest cells; one exchange-bucket
    kernel computes query×cell cosine for ALL of its cells and emits
    cell-local top-k; a per-query merge keeps the global top-k. Scan
    fraction ≈ nprobe/nlist. ``nprobe == nlist`` degrades gracefully to
    the exact answer (total scan)."""
    qset = sorted(int(q) for q in query_ids)

    if centroids is None:
        centroids = train_ivf(ds, nlist, sample_size, seed, vec_col)
    if centroids is None:  # empty corpus → no queries, no neighbors
        return ray.data.from_arrow(_empty_topk(id_col))

    # query vectors: tiny collect (Q rows), broadcast with the centroids
    def collect_queries(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(np.isin(ids, qset))).select([id_col, vec_col])

    q_tbl = pa.concat_tables(
        ds.map_batches(collect_queries, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    )
    q_ids = q_tbl.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    q_mat = _normalize(_stack(q_tbl.column(vec_col)))
    # per-query probe cells (nprobe nearest centroids)
    probe = np.argsort(-(q_mat @ centroids.T), axis=1)[:, : min(nprobe, len(centroids))]
    ref = ray.put((q_ids, q_mat, probe, centroids))

    def assign_cell(batch: pa.Table) -> pa.Table:
        _, _, _, cent = ray.get(ref)
        m = _normalize(_stack(batch.column(vec_col)))
        cell = np.argmax(m @ cent.T, axis=1).astype(np.int64)
        return batch.select([id_col, vec_col]).append_column("cell", pa.array(cell))

    def cells_knn(df: pd.DataFrame) -> pa.Table:
        qids, qm, probes, _ = ray.get(ref)
        out_q: list = []
        out_v: list = []
        out_s: list = []
        for cell, g in df.groupby("cell", sort=False) if len(df) else []:
            q_here = np.where((probes == int(cell)).any(axis=1))[0]
            if not len(q_here) or not len(g):
                continue
            iids = g[id_col].to_numpy().astype(np.int64)
            im = _normalize(np.stack(g[vec_col].to_numpy()).astype(np.float64))
            sims = qm[q_here] @ im.T
            for row_i, qi in enumerate(q_here):
                row = sims[row_i]
                cand = np.where(iids != qids[qi])[0]
                if not len(cand):
                    continue
                order = np.lexsort((iids[cand], -row[cand]))[: min(k, len(cand))]
                top = cand[order]
                out_q.extend([int(qids[qi])] * len(top))
                out_v.extend(int(v) for v in iids[top])
                out_s.extend(float(s) for s in row[top])
        if not out_q:
            return _empty_topk(id_col)
        return _topk_table(id_col, out_q, out_v, out_s)

    assigned = ds.map_batches(assign_cell, batch_format="pyarrow")
    local = _direct_grouped_apply(assigned, "cell", cells_knn)
    return _direct_grouped_apply(
        local, "query_id", _make_merge_topk(id_col, k, round_to, dedupe=False)
    )


def cluster_embeddings(
    ds: "ray.data.Dataset",
    k: int = 16,
    sample_size: int = 4096,
    seed: int = 29,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int | None = 6,
) -> "ray.data.Dataset":
    """Assign every embedding to its nearest spherical-k-means centroid —
    the topic/domain-discovery step of a training-data pipeline (cluster
    then inspect / re-weight / prune clusters).

    TRAIN on a bounded driver-side sample (same seeded Lloyd loop as the
    IVF index — O(sample × k × iters) regardless of corpus size), then
    broadcast the k×d centroid matrix once via ``ray.put`` and ASSIGN with
    one matmul per batch — embarrassingly parallel, no shuffle, nothing
    O(corpus) on the driver. Output: ``id_col, cluster, sim`` (cosine to
    the assigned centroid, snapped to ``1/10**round_to`` for run-to-run
    determinism of the artifact)."""
    sample = _bounded_sample(ds, vec_col, sample_size)
    if sample is None:  # empty corpus → empty assignment table
        return ray.data.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "cluster": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        )
    centroids = _spherical_kmeans(sample, k, seed)
    ref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        cent = ray.get(ref)
        m = _normalize(_stack(batch.column(vec_col)))
        sims = m @ cent.T
        cluster = np.argmax(sims, axis=1).astype(np.int64)
        best = sims[np.arange(len(m)), cluster]
        if round_to is not None:
            scale = float(10**round_to)
            best = np.round(best * scale).astype(np.int64) / scale
        return pa.table(
            {
                id_col: batch.column(id_col),
                "cluster": pa.array(cluster, pa.int64()),
                "sim": pa.array(best, pa.float64()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


# -- deterministic text embeddings (feature hashing) -----------------------


def hash_embed(texts, dim: int = 64, seed: int = 0) -> np.ndarray:
    """Deterministic feature-hashing ("hashing trick") embedding of texts:
    each token (lowercased ``TOKEN_PATTERN``, the tokenizer every text
    stage shares) hashes to one of ``dim`` signed coordinates
    (Weinberger et al., "Feature Hashing for Large Scale Multitask
    Learning", ICML 2009); rows are L2-normalized so dot product =
    cosine. No trained state, no vocabulary: two processes embed the
    same text to the SAME vector, which is what lets an incrementally
    maintained vector index recompute only touched rows and still agree
    with a from-scratch rebuild bit-for-bit.

    Returns a ``(len(texts), dim) float32`` matrix (all-zero rows for
    token-less texts stay all-zero — cosine 0 against everything)."""
    from ..functions.text import TOKEN_PATTERN

    s = pd.Series(texts).reset_index(drop=True).fillna("").astype(str)
    toks = s.str.lower().str.findall(TOKEN_PATTERN)
    M = np.zeros((len(s), dim), np.float32)
    ex = toks.explode().dropna()
    if len(ex):
        rows = ex.index.to_numpy(np.int64)
        # pandas siphash with its fixed default key — deterministic across
        # processes/machines; the seed folds in as a splitmix-style xor
        h = pd.util.hash_array(ex.to_numpy(dtype=object), categorize=False)
        h = h ^ np.uint64((seed * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
        idx = (h % np.uint64(dim)).astype(np.int64)
        sign = np.where(
            (h >> np.uint64(32)) & np.uint64(1), np.float32(1.0), np.float32(-1.0)
        )
        np.add.at(M, (rows, idx), sign)
    norms = np.linalg.norm(M, axis=1, keepdims=True)
    return (M / np.maximum(norms, 1e-12)).astype(np.float32)


def hyperplane_buckets(vecs: np.ndarray, planes: int, seed: int = 0) -> np.ndarray:
    """Seeded random-hyperplane LSH bucket per row (sign pattern packed
    into an int64; Charikar, "Similarity estimation techniques from
    rounding algorithms", STOC 2002). ``planes == 0`` puts everything in
    bucket 0 (the exact tier). The hyperplanes are regenerated from the
    seed wherever needed — no trained state to persist or drift."""
    n, dim = vecs.shape
    if planes == 0:
        return np.zeros(n, np.int64)
    if planes > 62:
        raise ValueError("planes must fit an int64 bucket (<= 62)")
    H = np.random.default_rng(seed).standard_normal((dim, planes)).astype(np.float32)
    bits = (vecs @ H) > 0
    weights = (np.uint64(1) << np.arange(planes, dtype=np.uint64))
    return (bits.astype(np.uint64) @ weights).astype(np.int64)


def hamming_ball_buckets(bucket: int, planes: int, radius: int) -> np.ndarray:
    """All bucket ids within Hamming distance ``radius`` of ``bucket``
    (multiprobe candidate set; O(planes^radius) ids — radius 1 or 2)."""
    from itertools import combinations

    out = [bucket]
    for r in range(1, radius + 1):
        for flip in combinations(range(planes), r):
            b = bucket
            for i in flip:
                b ^= 1 << i
            out.append(b)
    return np.array(sorted(set(out)), np.int64)
