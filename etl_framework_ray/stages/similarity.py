"""Similarity search over an embedding column (``list<float>``).

- ``ann_topk``: exact brute-force cosine top-k — the correctness baseline.
  Query matrix broadcast once (``ray.put``); each data batch computes one
  numpy matmul and emits only its LOCAL top-k per query (partial top-k),
  so the shuffle carries Q×k rows per block, not Q×N. A final per-query
  ``map_groups`` merges partials.
- ``ann_lsh_topk``: scale path #1 — seeded random-hyperplane LSH buckets
  with hamming-1 multiprobe; queries scan ~(planes+1)/2^p of the corpus.
- ``ann_ivf_topk``: scale path #2 — IVF: a spherical k-means coarse
  quantizer (trained on a bounded sample) partitions the corpus into
  ``nlist`` cells; queries scan their ``nprobe`` nearest cells. With
  ``nprobe == nlist`` the scan is total and the result EQUALS the exact
  baseline (asserted in tests); recall at partial probes is measured.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _stack(col) -> np.ndarray:
    return np.stack(col.to_pandas().to_numpy()).astype(np.float64)


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
            return pa.table(
                {"query_id": pa.array([], pa.int64()), id_col: pa.array([], pa.int64()), "sim": pa.array([], pa.float64())}
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                id_col: pa.array(np.concatenate(out_v)),
                "sim": pa.array(np.concatenate(out_s)),
            }
        )

    def merge_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["sim", id_col], ascending=[False, True]).head(k)
        if round_to is not None:
            # exact-integer round-trip: int64(round(sim*10^d))/10^d yields
            # the IDENTICAL double in any engine, unlike round(x, d) whose
            # result can differ at the ULP level across implementations
            scale = float(10**round_to)
            g = g.assign(sim=np.round(g["sim"].to_numpy() * scale).astype(np.int64) / scale)
        return g

    return (
        ds.map_batches(partial_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(merge_topk, batch_format="pandas")
    )


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
    bucket computes query×index cosine, emits bucket-local top-k, and a
    per-query merge keeps the global top-k. Scan cost ≈ (planes+1)/2^p of
    the corpus per query; single-probe (multiprobe=False) trades recall
    for a further (planes+1)× cut."""
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

    def bucket_knn(group: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "query_id": np.array([], np.int64),
                id_col: np.array([], np.int64),
                "sim": np.array([], np.float64),
            }
        )
        idx = group[group["role"] == 0]
        qry = group[group["role"] == 1]
        if not len(idx) or not len(qry):
            return empty
        iids = idx[id_col].to_numpy()
        im = _normalize(np.stack(idx[vec_col].to_numpy()).astype(np.float64))
        out_q, out_v, out_s = [], [], []
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
        if not out_q:
            return empty
        return pd.DataFrame(
            {
                "query_id": np.asarray(out_q, dtype=np.int64),
                id_col: np.asarray(out_v, dtype=np.int64),
                "sim": np.asarray(out_s, dtype=np.float64),
            }
        )

    def merge_topk(group: pd.DataFrame) -> pd.DataFrame:
        # a (query, index) pair can surface via several probes — dedupe,
        # then keep the global top-k
        g = group.drop_duplicates(["query_id", id_col])
        return g.sort_values(["sim", id_col], ascending=[False, True]).head(k)

    return (
        rows.groupby("bucket")
        .map_groups(bucket_knn, batch_format="pandas")
        .groupby("query_id")
        .map_groups(merge_topk, batch_format="pandas")
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
) -> "ray.data.Dataset":
    """IVF approximate top-k cosine (the classic inverted-file layout).

    TRAIN: spherical k-means on ``ds.limit(sample_size)`` (driver-side,
    bounded); centroids broadcast once. INDEX: one matmul per batch
    assigns every vector to its nearest cell. QUERY: each query probes
    its ``nprobe`` nearest cells; one ``groupby('cell')`` computes
    query×cell cosine where needed and emits cell-local top-k; a
    per-query merge keeps the global top-k. Scan fraction ≈
    nprobe/nlist. ``nprobe == nlist`` degrades gracefully to the exact
    answer (total scan)."""
    qset = sorted(int(q) for q in query_ids)

    sample_tbl = pa.concat_tables(
        ds.limit(sample_size).select_columns([vec_col]).iter_batches(batch_format="pyarrow")
    )
    centroids = _spherical_kmeans(_stack(sample_tbl.column(vec_col)), nlist, seed)

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

    def cell_knn(group: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "query_id": np.array([], np.int64),
                id_col: np.array([], np.int64),
                "sim": np.array([], np.float64),
            }
        )
        qids, qm, probes, _ = ray.get(ref)
        cell = int(group["cell"].iloc[0])
        q_here = np.where((probes == cell).any(axis=1))[0]
        if not len(q_here) or not len(group):
            return empty
        iids = group[id_col].to_numpy().astype(np.int64)
        im = _normalize(np.stack(group[vec_col].to_numpy()).astype(np.float64))
        sims = qm[q_here] @ im.T
        out_q, out_v, out_s = [], [], []
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
            return empty
        return pd.DataFrame(
            {
                "query_id": np.asarray(out_q, np.int64),
                id_col: np.asarray(out_v, np.int64),
                "sim": np.asarray(out_s, np.float64),
            }
        )

    def merge_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["sim", id_col], ascending=[False, True]).head(k)
        if round_to is not None:
            scale = float(10**round_to)
            g = g.assign(sim=np.round(g["sim"].to_numpy() * scale).astype(np.int64) / scale)
        return g

    return (
        ds.map_batches(assign_cell, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(cell_knn, batch_format="pandas")
        .groupby("query_id")
        .map_groups(merge_topk, batch_format="pandas")
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
    sample_tbl = pa.concat_tables(
        ds.limit(sample_size).select_columns([vec_col]).iter_batches(batch_format="pyarrow")
    )
    centroids = _spherical_kmeans(_stack(sample_tbl.column(vec_col)), k, seed)
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
