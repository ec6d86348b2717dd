"""Document chunking and sequence packing — the tokenizer-side operators
every LLM training-data pipeline runs after curation.

- ``chunk_documents``: split each document into ≤ ``max_tokens``-token
  windows with ``overlap`` tokens of context carry-over (flat-map shape:
  one input row → N chunk rows). Token = whitespace token (the engine's
  ``n_tokens`` definition); chunk ids are deterministic (doc_id,
  chunk_idx).
- ``pack_chunks``: greedy first-fit packing of chunks into fixed
  ``budget``-token sequences WITHOUT splitting a chunk across packs —
  the "sequence packing" step that turns a curated corpus into
  fixed-length training rows. Packing is PARTITION-LOCAL (each block
  packs independently, pack ids are salted by block via the first
  doc id) — at scale that is exactly what you want: no global state, no
  shuffle, deterministic for a fixed input partitioning; cross-block
  bin-perfection is not worth an all-to-all (document the trade).

Both stages stream; neither holds more than one batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def chunk_documents(
    ds: "object",
    max_tokens: int = 512,
    overlap: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """One row per (doc, window): ``doc_id, chunk_idx, n_tokens, text``.

    Windows advance by ``max_tokens − overlap``; a document at or under
    ``max_tokens`` yields exactly one chunk. Deterministic."""
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    step = max_tokens - overlap

    def chunk(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pandas().fillna("")
        src_idx, out_idx, out_n, out_text = [], [], [], []
        for i, t in enumerate(texts):
            words = t.split()
            if not words:
                continue
            starts = range(0, max(1, len(words) - overlap), step)
            for ci, s in enumerate(starts):
                w = words[s : s + max_tokens]
                src_idx.append(i)
                out_idx.append(ci)
                out_n.append(len(w))
                out_text.append(" ".join(w))
        return pa.table(
            {
                # take() preserves the id column's own type (int, string, …)
                id_col: batch.column(id_col).take(pa.array(src_idx, pa.int64())),
                "chunk_idx": pa.array(out_idx, pa.int32()),
                "n_tokens": pa.array(out_n, pa.int64()),
                text_col: pa.array(out_text, pa.string()),
            }
        )

    return ds.map_batches(chunk, batch_format="pyarrow")


def pack_chunks(
    ds: "object",
    budget: int = 2048,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
):
    """Greedy first-fit sequence packing: assigns every chunk a
    ``(pack_id, pack_pos)`` such that each pack's token sum ≤ ``budget``
    (chunks above ``budget`` get a singleton pack). Partition-local —
    the pack-id base is a 62-bit stable hash of the block's first
    (id, chunk_idx), so ids are deterministic for a fixed partitioning
    and collide across blocks only with probability ≲2⁻⁶² per pair
    (a block's first row belongs to exactly one block)."""
    from ..functions.hashing import stable_hash_array

    def pack(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            t = batch.append_column("pack_id", pa.array([], pa.int64()))
            return t.append_column("pack_pos", pa.array([], pa.int32()))
        toks = batch.column(tokens_col).to_numpy(zero_copy_only=False).astype(np.int64)
        cidx0 = (
            int(batch.column("chunk_idx")[0].as_py())
            if "chunk_idx" in batch.column_names
            else 0
        )
        # block-unique (w.h.p.) pack-id base: hash of first (id, chunk_idx)
        first_key = f"{batch.column(id_col)[0].as_py()}|{cidx0}"
        base = int(
            stable_hash_array(np.asarray([first_key], dtype=object))[0] % np.uint64(1 << 62)
        )
        pack_id = np.zeros(n, dtype=np.int64)
        pack_pos = np.zeros(n, dtype=np.int32)
        bins: list[int] = []  # remaining budget per open bin (first-fit)
        for i in range(n):  # chunk count per block is batch-bounded
            t = int(toks[i])
            placed = None
            for b, rem in enumerate(bins):
                if t <= rem:
                    placed = b
                    break
            if placed is None:
                bins.append(max(0, budget - t))
                placed = len(bins) - 1
            else:
                bins[placed] -= t
            pack_id[i] = base + placed
        # positions within each pack in arrival order
        order = np.argsort(pack_id, kind="stable")
        pos = np.zeros(n, dtype=np.int32)
        seen: dict[int, int] = {}
        for i in order:
            p = int(pack_id[i])
            pos[i] = seen.get(p, 0)
            seen[p] = pos[i] + 1
        out = batch.append_column("pack_id", pa.array(pack_id, pa.int64()))
        return out.append_column("pack_pos", pa.array(pos, pa.int32()))

    return ds.map_batches(pack, batch_format="pyarrow")


def sample_mod(
    ds: "object", rate_pct: int, key_col: str = "doc_id", modulus: int = 100
):
    """Deterministic sampling: keep rows where ``key % modulus <
    rate_pct`` — reproducible across runs/engines and SQL-expressible
    (the oracle states the identical predicate). For keys with skewed
    low-order bits, hash the key first (``stable_hash_array``) — modulo
    on sequential ids is already uniform. Requires NON-NEGATIVE keys
    (raises otherwise): numpy's modulo takes the divisor's sign while
    SQL's takes the dividend's, so negative keys would silently diverge
    from the oracle."""

    def keep(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(k) and k.min() < 0:
            raise ValueError("sample_mod requires non-negative keys (SQL % sign parity)")
        return batch.filter(pa.array((k % modulus) < rate_pct))

    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_sample(
    ds: "object",
    rates: dict,
    group_col: str = "lang",
    key_col: str = "doc_id",
    default_pct: int = 0,
    modulus: int = 100,
):
    """Deterministic per-stratum sampling — the mixture-weighting step of
    a training-data pipeline (down-weight over-represented languages /
    sources, up-weight rare ones). Keeps a row iff
    ``key % modulus < rates.get(group, default_pct)``.

    Same engine-vs-SQL parity contract as :func:`sample_mod` (the oracle
    states the identical CASE predicate; non-negative keys required). The
    per-row rate lookup is one vectorized ``pandas.Series.map`` per batch
    — rates ship inside the serialized closure (a dict of strata, tiny),
    no shuffle, no driver pass."""
    items = dict(rates)

    def keep(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(k) and k.min() < 0:
            raise ValueError("stratified_sample requires non-negative keys (SQL % parity)")
        g = batch.column(group_col).to_pandas()
        r = g.map(items).fillna(default_pct).to_numpy(dtype=np.int64)
        return batch.filter(pa.array((k % modulus) < r))

    return ds.map_batches(keep, batch_format="pyarrow")


def _md5_keys(ids, seed: int) -> "np.ndarray":
    """Deterministic per-row sample keys: ``md5(str(id) || ':' || seed)``
    hex — chosen over the engine's SipHash because DuckDB computes the
    IDENTICAL value (``md5(id::VARCHAR || ':seed')``), so an exactly-k
    sample has an EXACT SQL oracle, not just a statistical one."""
    import hashlib

    s = f":{seed}".encode()
    return np.array(
        [hashlib.md5(str(i).encode() + s).hexdigest() for i in ids], dtype=object
    )


def bottom_k_sample(
    ds: "ray.data.Dataset",
    k: int,
    id_col: str,
    seed: int = 7,
) -> "ray.data.Dataset":
    """EXACTLY-k uniform sample of the whole dataset — bottom-k rows by
    the md5 sample key (every row's key is an i.i.d. uniform draw keyed
    by its id, so the k smallest are a uniform simple random sample;
    deterministic across runs and partitionings). Scale shape: each block
    keeps its own local bottom-k (tiny), one merge task picks the global
    k — the dataset itself never shuffles. Oracle:
    ``ORDER BY md5(id::VARCHAR || ':seed') LIMIT k``."""
    from .joins import _direct_grouped_apply

    def local(batch: pa.Table) -> pa.Table:
        keys = _md5_keys(batch.column(id_col).to_numpy(zero_copy_only=False), seed)
        order = np.argsort(keys, kind="stable")[:k]
        out = batch.take(pa.array(order))
        return out.append_column("_sk", pa.array(keys[order], pa.string()))

    def merge(t: pa.Table) -> pa.Table:
        # Arrow-native merge keeps the exact input types (no pandas
        # round-trip re-inference)
        idx = pc.sort_indices(t, sort_keys=[("_sk", "ascending")])
        return t.take(idx.slice(0, k)).drop_columns(["_sk", "_one"])

    trimmed = ds.map_batches(
        local, batch_format="pyarrow", batch_size=None
    ).map_batches(
        lambda t: t.append_column("_one", pa.array(np.zeros(t.num_rows, np.int64))),
        batch_format="pyarrow",
    )
    # one bucket: all local bottom-k partials (≤ k × blocks rows) merge once
    return _direct_grouped_apply(
        trimmed, "_one", merge, shuffle_buckets=1, kernel_format="pyarrow"
    )


def bottom_k_per_group(
    ds: "ray.data.Dataset",
    k: int,
    group_col: str,
    id_col: str,
    seed: int = 7,
) -> "ray.data.Dataset":
    """EXACTLY-k-per-group uniform sample: the grouped form of
    :func:`bottom_k_sample`, running on the engine's ``group_topk``
    machinery (block pre-trim, one kernel per bucket). Oracle:
    ``ROW_NUMBER() OVER (PARTITION BY g ORDER BY md5(...)) <= k``."""
    from .joins import group_topk

    def with_key(batch: pa.Table) -> pa.Table:
        keys = _md5_keys(batch.column(id_col).to_numpy(zero_copy_only=False), seed)
        return batch.append_column("_sk", pa.array(keys, pa.string()))

    keyed = ds.map_batches(with_key, batch_format="pyarrow")
    out = group_topk(keyed, group_col, ["_sk"], k, descending=False)
    return out.map_batches(lambda t: t.drop_columns(["_sk"]), batch_format="pyarrow")
