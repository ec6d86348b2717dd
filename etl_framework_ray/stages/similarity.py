"""Similarity search over an embedding column (``list<float>``).

- ``ann_topk``: exact brute-force cosine top-k — the correctness baseline.
  Query matrix broadcast once (``ray.put``); each data batch computes one
  numpy matmul and emits only its LOCAL top-k per query (partial top-k),
  so the shuffle carries Q×k rows per block, not Q×N. A final per-query
  ``map_groups`` merges partials.
- ``ann_lsh_topk``: the scale path — seeded random-hyperplane LSH buckets;
  queries only scan their own bucket (probing the exact-match bucket).
  Approximate; recall measured against ``ann_topk`` in tests.
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
) -> "ray.data.Dataset":
    """Approximate top-k: random-hyperplane LSH (2^num_planes buckets);
    each query scans only its bucket. Trade recall for a 2^p scan cut."""
    qset = sorted(int(q) for q in query_ids)

    # planes derived per batch from (seed, batch dim) — deterministic
    # across batches and avoids a driver-side take(1) partial execution
    def add_bucket(batch: pa.Table) -> pa.Table:
        m = _stack(batch.column(vec_col))
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((m.shape[1], num_planes))
        bits = (m @ planes) > 0
        bucket = (bits * (1 << np.arange(num_planes))).sum(axis=1).astype(np.int64)
        return batch.append_column("bucket", pa.array(bucket))

    with_bucket = ds.map_batches(add_bucket, batch_format="pyarrow")

    def bucket_knn(group: pd.DataFrame) -> pd.DataFrame:
        ids = group[id_col].to_numpy()
        m = _normalize(np.stack(group[vec_col].to_numpy()).astype(np.float64))
        q_idx = np.where(np.isin(ids, qset))[0]
        out_q, out_v, out_s = [], [], []
        for qi in q_idx:
            sims = m[qi] @ m.T
            order = np.argsort(-sims)
            picked = [j for j in order if j != qi][:k]
            for j in picked:
                out_q.append(int(ids[qi]))
                out_v.append(int(ids[j]))
                out_s.append(float(sims[j]))
        return pd.DataFrame(
            {
                "query_id": np.asarray(out_q, dtype=np.int64),
                id_col: np.asarray(out_v, dtype=np.int64),
                "sim": np.asarray(out_s, dtype=np.float64),
            }
        )

    return with_bucket.groupby("bucket").map_groups(bucket_knn, batch_format="pandas")
