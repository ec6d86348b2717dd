"""Deduplication stages for training-data pipelines.

Five dedup families, each expressed Ray-Data-first:

- **exact**: content-hash routing on the direct exchange + per-bucket
  keep-min-id over distinct texts — the generalization of the reference's
  ``distinct`` (A3, /root/reference/src/models/data_quality_evaluator.py:64)
  to content dedup at scale.
- **MinHash + LSH**: word-shingle → k-minhash signature → banded LSH
  bucketing → IN-BUCKET candidate pair-gen + signature-Jaccard verify
  (one direct-exchange round over band keys; the signature ships WITH its
  band rows so verification is co-partitioned — nothing O(corpus) ever
  lands on the driver) → distributed connected components (hash-to-min
  label propagation, a few exchange rounds) → keep min id per cluster.
- **n-gram Jaccard**: same pipeline, but band rows carry the exact
  shingle-hash sets and buckets verify with true set Jaccard.
- **SimHash**: 64-bit simhash, banded into 4×16-bit keys, in-bucket
  hamming-≤-t verify, same distributed component path.
- **embedding cosine**: exact all-pairs greedy-by-id (SQL-expressible
  oracle tier) plus a hyperplane-LSH bucketed variant
  (``embedding_dedup_lsh``) that only compares within (multiprobed)
  buckets — the 100-TB path.

Scale design (what shuffles, what is driver-side):

- band rows shuffle the signature payload (bands × sig ≈ 8 KB/doc for the
  64-perm default) instead of the raw text; slimmer two-phase designs
  (slim pair-gen + co-partitioned payload join) trade one shuffle for two
  and only pay off when signatures dwarf candidate density.
- verified duplicate EDGES are the only thing that leaves the bucket
  stage — O(duplicates), not O(corpus); that bound is the LSH design
  goal, not an accident.
- connected components run as hash-to-min rounds (Rastogi et al. 2013,
  "Finding Connected Components in Map-Reduce") over the edge set; the
  final (node → cluster-min) label table is O(duplicate nodes) and is
  broadcast once (``ray.put`` of two sorted int64 arrays) to label the
  full corpus in one streaming pass.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..functions.hashing import stable_hash_array

_MERSENNE = np.uint64((1 << 61) - 1)
_MIX = np.uint64(0x9E3779B97F4A7C15)  # 64-bit golden-ratio mixer


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


from .joins import _auto_buckets  # noqa: F401  (canonical home: joins.py)

#: internal routing column for exact_dedup — 8 bytes/row on the exchange
_TEXT_HASH_COL = "_texth"


def exact_dedup(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int | None = None,
):
    """Keep the min-id row per distinct text. Returns the kept rows.

    Round 4: runs on the engine's DIRECT hash exchange
    (:func:`~.joins._direct_grouped_apply`) keyed on a PRECOMPUTED int64
    hash of the text — equal texts co-locate by hash while the exchange's
    routing copy stays 8 bytes/row (routing on the text column itself
    would serialize every document's bytes TWICE through the
    memcpy-bound shuffle: payload + ``_key``). One vectorized pandas
    dedup per bucket — on the actual text, so hash collisions cannot
    merge distinct documents — handles ALL of its texts; none of the
    Dataset ``groupby().map_groups`` sort-exchange fixed costs apply
    (the temporal-join finding, BASELINE.md round 2). A per-block
    pre-trim drops within-block duplicates before anything ships.

    ``num_buckets=None`` auto-sizes to max(2×CPU, corpus bytes / 64 MiB)
    — bucket count scales with the DATA so one bucket's distinct text
    always fits a worker (the memory contract every bucket kernel makes);
    an explicit count is honored EXACTLY. For corpora where even hashes
    are too heavy, see the slim-signature design of
    :func:`minhash_dedup` (ship signatures, not text)."""
    from .joins import _direct_grouped_apply, _typed_out

    def pretrim(batch: pa.Table) -> pa.Table:
        names = list(batch.schema.names)
        types = dict(zip(names, batch.schema.types))
        df = batch.to_pandas().sort_values(id_col).drop_duplicates(text_col, keep="first")
        out = _typed_out(df.reset_index(drop=True), names, types, {})
        h = stable_hash_array(
            out.column(text_col).to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        return out.append_column(_TEXT_HASH_COL, pa.array(h, pa.int64()))

    def dedup_bucket(t: pa.Table) -> pa.Table:
        t = t.drop_columns([_TEXT_HASH_COL])
        names = list(t.schema.names)
        types = dict(zip(names, t.schema.types))
        out = t.to_pandas().sort_values(id_col).drop_duplicates(text_col, keep="first")
        return _typed_out(out.reset_index(drop=True), names, types, {})

    return _direct_grouped_apply(
        ds.map_batches(pretrim, batch_format="pyarrow"),
        _TEXT_HASH_COL,
        dedup_bucket,
        shuffle_buckets=num_buckets,
        kernel_format="pyarrow",
        target_bucket_bytes=64 << 20,
    )


# ---------------------------------------------------------------------------
# shingles + minhash signatures
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class MinHashConfig:
    num_perm: int = 64
    bands: int = 16  # rows per band = num_perm // bands
    shingle_size: int = 3  # word n-grams
    jaccard_threshold: float = 0.8
    seed: int = 7


_SHINGLE_MUL = np.uint64(0x100000001B3)  # FNV-ish odd multiplier


from .util import BatchCounts
from .util import cached_stage as _cached_stage  # shared deployment helper
from .util import in_sorted


def _trunc_counter() -> BatchCounts:
    import tempfile

    return BatchCounts(tempfile.mkdtemp(prefix="lsh_trunc_"))


def _report_truncation(counter: BatchCounts, stats_out: dict | None, op: str) -> None:
    """Surface bucket-cap truncation after the verify stage has executed
    (the brief's no-silent-caps rule): totals go to the caller's
    ``stats_out`` and any non-zero truncation is logged loudly."""
    counts = counter.collect()
    counter.cleanup()
    if stats_out is not None:
        stats_out.update(counts)
    if counts.get("truncated_buckets"):
        import logging

        logging.getLogger(__name__).warning(
            "%s: %d LSH bucket(s) exceeded max_bucket; %d id-sorted candidate "
            "rows were excluded from pair generation (raise max_bucket or "
            "re-shard hot buckets if these are not boilerplate)",
            op,
            counts["truncated_buckets"],
            counts["truncated_rows"],
        )


def _shingle_hashes(text: str, n: int) -> np.ndarray:
    """Unique word-n-gram hashes. Words are hashed once (vectorized) and
    combined with a rolling polynomial — no n-gram string materialization
    (the naive join-then-hash version measured ~3× slower)."""
    words = text.lower().split()
    if not words:
        return np.zeros(0, dtype=np.uint64)
    h = stable_hash_array(np.asarray(words, dtype=object))
    if len(h) < n:
        acc = np.uint64(0)
        for v in h:
            acc = acc * _SHINGLE_MUL + v
        return np.asarray([acc], dtype=np.uint64)
    win = np.lib.stride_tricks.sliding_window_view(h, n)
    acc = np.zeros(len(win), dtype=np.uint64)
    for j in range(n):  # n is a small constant (3)
        acc = acc * _SHINGLE_MUL + win[:, j]
    return np.unique(acc)


class MinHasher:
    """Signature stage: permutation params drawn once per instance from
    the config seed; per batch the k×m universal-hash min is one numpy
    matmul-shaped reduction per doc.

    Deployed as STATELESS TASKS via ``_cached_stage`` (lazy one-time init
    per worker process), not an actor pool: the state is two 64-element
    arrays (~microseconds to derive) while actor-pool spin-up measured
    ~2 s — the pool pattern is reserved for stages with heavy state
    (LangId profiles, models). ``emit_shingles=True`` additionally
    carries the exact shingle-hash set per doc (for n-gram-Jaccard
    verification downstream)."""

    def __init__(
        self,
        cfg: MinHashConfig,
        text_col: str = "text",
        id_col: str = "doc_id",
        emit_shingles: bool = False,
    ):
        self.cfg = cfg
        self.text_col = text_col
        self.id_col = id_col
        self.emit_shingles = emit_shingles
        rng = np.random.default_rng(cfg.seed)
        self.a = rng.integers(1, int(_MERSENNE), cfg.num_perm, dtype=np.uint64)
        self.b = rng.integers(0, int(_MERSENNE), cfg.num_perm, dtype=np.uint64)

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        if len(shingles) == 0:
            return np.full(self.cfg.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        # (k, m) universal hashes, min over shingles — vectorized
        hs = (self.a[:, None] * shingles[None, :] + self.b[:, None]) % _MERSENNE
        return hs.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pandas().fillna("")
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        shingle_sets = [_shingle_hashes(t, self.cfg.shingle_size) for t in texts]
        sigs = (
            np.stack([self.signature(s) for s in shingle_sets])
            if shingle_sets
            else np.zeros((0, self.cfg.num_perm), dtype=np.uint64)
        )
        cols = {
            self.id_col: pa.array(ids),
            "sig": pa.array(list(sigs.astype(np.int64)), pa.list_(pa.int64())),
        }
        if self.emit_shingles:
            cols["shingles"] = pa.array(
                [s.astype(np.int64) for s in shingle_sets], pa.list_(pa.int64())
            )
        return pa.table(cols)


# ---------------------------------------------------------------------------
# distributed LSH bucket verify + connected components
# ---------------------------------------------------------------------------


def _band_tbl(
    sig_batch: pa.Table, cfg: MinHashConfig, id_col: str, payload_col: str
) -> pa.Table:
    """Explode signatures into (id, band, band_hash, payload, _bk) rows.

    The verification payload (signature or shingle set) travels WITH the
    band row so the bucket stage can verify candidates co-partitioned —
    the per-doc shuffle cost is ``bands × payload`` instead of a driver
    round-trip. ``_bk`` mixes (band, band_hash) into one routing key for
    the direct exchange: rows of the SAME LSH bucket co-locate, and one
    exchange-bucket kernel dispatch handles ALL of its LSH buckets
    (per-LSH-bucket dispatch measured 15 s vs <0.5 s for a 5 k-doc
    corpus)."""
    ids = sig_batch.column(id_col)
    payload = sig_batch.column(payload_col)
    if sig_batch.num_rows == 0:
        return pa.table(
            {
                id_col: ids,
                "band": pa.array([], pa.int64()),
                "band_hash": pa.array([], pa.int64()),
                "payload": payload,
                "_bk": pa.array([], pa.int64()),
            }
        )
    col = sig_batch.column("sig")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # zero-copy (n, k) view of the list<int64> column — the pandas
    # object-array stack measured ~2 s alone at 5 k docs × 16 bands
    sigs = col.flatten().to_numpy().reshape(sig_batch.num_rows, -1).astype(np.uint64)
    r = cfg.num_perm // cfg.bands
    parts = []
    n = len(ids)
    for b in range(cfg.bands):
        seg = sigs[:, b * r : (b + 1) * r]
        h = np.zeros(n, dtype=np.uint64)
        for j in range(r):
            h = h * np.uint64(1099511628211) + seg[:, j]
        bk = (h * _MIX) + np.uint64(b)
        parts.append(
            pa.table(
                {
                    id_col: ids,
                    "band": pa.array(np.full(n, b, dtype=np.int64)),
                    "band_hash": pa.array(h.astype(np.int64)),
                    "payload": payload,
                    "_bk": pa.array(bk.astype(np.int64)),
                }
            )
        )
    return pa.concat_tables(parts)


def _make_bucket_verifier(
    id_col: str,
    bucket_cols: list[str],
    verify: str,  # "sig_jaccard" | "exact_jaccard" | "hamming"
    threshold: float,
    max_bucket: int,
    counter=None,  # stages.util.BatchCounts | None — truncation reporting
):
    """Per-exchange-bucket kernel (:func:`~.joins._direct_grouped_apply`):
    generate candidate pairs inside every true LSH bucket co-located in
    this exchange bucket and verify them against the co-located payloads,
    emitting only the surviving duplicate EDGES (a < b) as a typed Arrow
    table. Buckets larger than ``max_bucket`` are truncated
    DETERMINISTICALLY (id-sorted rows keep the lowest ids) — a giant
    bucket means near-identical boilerplate where any spanning pairing
    suffices; components still merge via CC. Every truncation is COUNTED
    through ``counter`` (no silent caps — callers log and surface the
    totals)."""

    def verify_group(df: pd.DataFrame) -> pa.Table:
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        dup = df[df.duplicated(bucket_cols, keep=False)]
        for _, g in dup.groupby(bucket_cols, sort=False):
            order = np.argsort(g[id_col].to_numpy(), kind="stable")
            if len(order) > max_bucket:
                if counter is not None:
                    counter.add(
                        {"truncated_buckets": 1, "truncated_rows": len(order) - max_bucket}
                    )
                order = order[:max_bucket]
            ids = g[id_col].to_numpy()[order]
            if len(ids) < 2:
                continue
            ia, ib = np.triu_indices(len(ids), k=1)
            if verify == "sig_jaccard":
                sig = np.stack(g["payload"].to_numpy()[order])  # (n, k)
                j = (sig[ia] == sig[ib]).mean(axis=1)
                keep = j >= threshold
            elif verify == "exact_jaccard":
                sets = g["payload"].to_numpy()[order]
                j = np.empty(len(ia))
                for p in range(len(ia)):
                    sa, sb = np.asarray(sets[ia[p]]), np.asarray(sets[ib[p]])
                    inter = np.intersect1d(sa, sb, assume_unique=True).size
                    union = sa.size + sb.size - inter
                    j[p] = inter / union if union else 0.0
                keep = j >= threshold
            else:  # hamming over 64-bit simhash payloads
                h = g["payload"].to_numpy()[order].astype(np.uint64)
                x = h[ia] ^ h[ib]
                tbl = np.array([bin(v).count("1") for v in range(256)], dtype=np.uint8)
                dist = tbl[x.view(np.uint8).reshape(len(x), 8)].sum(axis=1)
                keep = dist <= threshold
            if keep.any():
                out_a.append(ids[ia[keep]].astype(np.int64))
                out_b.append(ids[ib[keep]].astype(np.int64))
        if not out_a:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        pairs = pd.DataFrame(
            {"a": np.concatenate(out_a), "b": np.concatenate(out_b)}
        ).drop_duplicates()
        return pa.table(
            {
                "a": pa.array(pairs["a"].to_numpy(np.int64)),
                "b": pa.array(pairs["b"].to_numpy(np.int64)),
            }
        )

    return verify_group


def _connected_components(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find over an edge list — the driver-side REFERENCE
    implementation, kept for equivalence testing of the distributed path
    (and usable directly when the edge list is known to be tiny)."""
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _labels_checksum(labels: "ray.data.Dataset") -> tuple[int, int]:
    """Distributed order-independent checksum of a (node, label) dataset —
    the hash-to-min fixpoint detector. One tiny row per block reaches the
    driver."""

    def partial(batch: pa.Table) -> pa.Table:
        node = batch.column("node").to_numpy(zero_copy_only=False).astype(np.uint64)
        lab = batch.column(1).to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            s = int(((node * _MIX) ^ lab).sum(dtype=np.uint64))
        return pa.table({"n": pa.array([batch.num_rows], pa.int64()), "s": pa.array([s], pa.uint64())})

    rows = labels.map_batches(partial, batch_format="pyarrow").take_all()
    return (sum(r["n"] for r in rows), sum(int(r["s"]) for r in rows) & ((1 << 64) - 1))


def components_labels(
    edges: "ray.data.Dataset",
    shuffle_buckets: int | None = None,
    max_rounds: int = 16,
    driver_threshold: int = 2_000_000,
) -> pd.DataFrame:
    """Distributed connected components over an (a, b) edge Dataset via
    hash-to-min label propagation (Rastogi et al. 2013): each round every
    node sends its neighborhood to its minimum neighbor and the minimum to
    its whole neighborhood — one DIRECT hash exchange round keyed on
    ``node`` (:func:`~.joins._direct_grouped_apply`; round 4 retired the
    ``groupby("_cb").map_groups`` sort exchange here), all per-node math
    vectorized pandas. Converges in O(log d) rounds (fixpoint detected by
    a distributed checksum).

    Returns the (node, label) frame — O(nodes-with-edges), i.e.
    O(duplicate docs), which the callers broadcast to label the corpus.

    Edge lists at or below ``driver_threshold`` short-circuit to the
    driver union-find: the label frame they produce is the same size
    either way (it is pulled to the driver for the broadcast regardless),
    and union-find on a small list beats the per-round shuffle fixed cost
    by ~50× (measured 4.8 s → 0.1 s for 3 k edges). The distributed
    rounds take over when the edge set itself is too big for a Python
    dict — equivalence of the two paths is unit-tested."""

    from .joins import _direct_grouped_apply

    def seed(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
        node = np.concatenate([a, b, a, b])
        nbr = np.concatenate([b, a, a, b])  # both directions + self-loops
        return pa.table({"node": pa.array(node), "nbr": pa.array(nbr)})

    def h2m_round(df: pd.DataFrame) -> pa.Table:
        df = df[["node", "nbr"]].drop_duplicates()
        m = df.groupby("node")["nbr"].transform("min").to_numpy()
        nbr = df["nbr"].to_numpy()
        out = pd.DataFrame(
            {"node": np.concatenate([m, nbr]), "nbr": np.concatenate([nbr, m])}
        ).drop_duplicates()
        return pa.table(
            {
                "node": pa.array(out["node"].to_numpy(np.int64)),
                "nbr": pa.array(out["nbr"].to_numpy(np.int64)),
            }
        )

    edges = edges.materialize()  # O(duplicate edges); consumed twice below
    n_edges = edges.count()
    if n_edges == 0:
        return pd.DataFrame({"node": np.array([], np.int64), "label": np.array([], np.int64)})
    if n_edges <= driver_threshold:
        pdf = edges.to_pandas()
        comp = _connected_components(
            list(zip(pdf["a"].astype(int), pdf["b"].astype(int)))
        )
        nodes = np.sort(np.fromiter(comp.keys(), dtype=np.int64, count=len(comp)))
        return pd.DataFrame(
            {"node": nodes, "label": np.array([comp[int(k)] for k in nodes], np.int64)}
        )
    adj = edges.map_batches(seed, batch_format="pyarrow")
    prev = None
    for _ in range(max_rounds):
        adj = _direct_grouped_apply(adj, "node", h2m_round, shuffle_buckets).materialize()
        labels = adj.groupby("node").min("nbr")
        cur = _labels_checksum(labels)
        if cur == prev:
            break
        prev = cur
    pdf = labels.to_pandas()  # O(duplicate nodes) — the broadcast payload
    pdf.columns = ["node", "label"]
    return pdf.sort_values("node").reset_index(drop=True)


def _assign_clusters(
    ids_ds: "ray.data.Dataset",
    labels_pdf: pd.DataFrame,
    id_col: str,
    keep_cols: tuple[str, ...] = (),
    flag: str = "is_kept",
    include_id: bool = True,
) -> "ray.data.Dataset":
    """Label every id with its cluster min via ONE broadcast of the small
    (sorted-node, label) arrays — nodes absent from any edge are their own
    singleton cluster. Streaming; never materializes the corpus.

    ``keep_cols`` pass through from the input unchanged (e.g. a string
    conv_id travelling beside its int64 hash node); ``flag`` selects the
    emitted marker polarity (``is_kept`` = cluster representative,
    ``is_dup`` = its negation); ``include_id=False`` drops the int node
    column from the output when a passthrough column is the real key."""
    nodes = labels_pdf["node"].to_numpy().astype(np.int64)
    labs = labels_pdf["label"].to_numpy().astype(np.int64)
    ref = ray.put((nodes, labs))

    def mark(batch: pa.Table) -> pa.Table:
        ns, ls = ray.get(ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ns):
            # one searchsorted serves both membership and label gather
            idx = np.clip(np.searchsorted(ns, ids), 0, len(ns) - 1)
            hit = ns[idx] == ids
            cluster = np.where(hit, ls[idx], ids)
        else:
            cluster = ids
        cols: dict = {c: batch.column(c) for c in keep_cols}
        if include_id:
            cols[id_col] = pa.array(ids)
        cols["cluster_id"] = pa.array(cluster.astype(np.int64))
        kept = cluster == ids
        cols[flag] = pa.array(kept if flag == "is_kept" else ~kept)
        return pa.table(cols)

    return ids_ds.map_batches(mark, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash-LSH / n-gram-Jaccard dedup (distributed end-to-end)
# ---------------------------------------------------------------------------


def minhash_edges(
    ds: "ray.data.Dataset",
    cfg: MinHashConfig = MinHashConfig(),
    text_col: str = "text",
    id_col: str = "doc_id",
    exact_verify: bool = False,
    shuffle_buckets: int | None = None,
    max_bucket: int = 200,
    counter: BatchCounts | None = None,
) -> tuple["ray.data.Dataset", "ray.data.Dataset"]:
    """Signature + verified-duplicate-edge stages of the MinHash pipeline.

    Returns ``(sigs, edges)`` — both Datasets. Exposed separately so tests
    can compare the distributed component labeling against the driver
    union-find on identical edges. ``counter`` receives bucket-cap
    truncation counts during the verify stage. Band rows route on their
    full-range ``_bk`` key through the direct exchange — equal LSH
    buckets co-locate; one verifier dispatch per exchange bucket handles
    all of its LSH buckets."""
    from .joins import _direct_grouped_apply

    sigs = ds.map_batches(
        _cached_stage(MinHasher, cfg, text_col, id_col, exact_verify),
        batch_format="pyarrow",
    ).materialize()  # reused by banding AND final labeling

    payload_col = "shingles" if exact_verify else "sig"
    bands = sigs.map_batches(
        lambda b: _band_tbl(b, cfg, id_col, payload_col),
        batch_format="pyarrow",
    )
    verify = "exact_jaccard" if exact_verify else "sig_jaccard"
    edges = _direct_grouped_apply(
        bands,
        "_bk",
        _make_bucket_verifier(
            id_col, ["band", "band_hash"], verify, cfg.jaccard_threshold, max_bucket, counter
        ),
        shuffle_buckets,
    )
    return sigs, edges


def minhash_dedup(
    ds: "ray.data.Dataset",
    cfg: MinHashConfig = MinHashConfig(),
    text_col: str = "text",
    id_col: str = "doc_id",
    exact_verify: bool = False,
    shuffle_buckets: int | None = None,
    max_bucket: int = 200,
    stats_out: dict | None = None,
) -> "ray.data.Dataset":
    """Full MinHash-LSH near-dup pipeline, distributed end-to-end.

    Returns a Dataset ``(id, cluster_id, is_kept)`` for ALL ids
    (cluster = min id; ``is_kept`` marks cluster minima). The driver only
    ever holds the (node → label) table for documents that participate in
    a duplicate edge — O(duplicates), not O(corpus).

    ``exact_verify=True`` verifies candidates with exact shingle-set
    Jaccard (the n-gram-Jaccard dedup variant); band rows then carry the
    shingle sets instead of the signatures. ``stats_out`` (optional dict)
    receives truncation counts — oversize-bucket caps are never silent."""
    counter = _trunc_counter()
    try:
        sigs, edges = minhash_edges(
            ds, cfg, text_col, id_col, exact_verify, shuffle_buckets, max_bucket, counter=counter
        )
        labels = components_labels(edges, shuffle_buckets)
    except BaseException:
        counter.cleanup()  # failed pipeline must not leak the sink dir
        raise
    _report_truncation(counter, stats_out, "minhash_dedup")
    return _assign_clusters(sigs.select_columns([id_col]), labels, id_col)


def ngram_jaccard_dedup(
    ds: "ray.data.Dataset", cfg: MinHashConfig = MinHashConfig(), **kw
) -> "ray.data.Dataset":
    """MinHash-LSH candidates verified with EXACT n-gram Jaccard."""
    return minhash_dedup(ds, cfg, exact_verify=True, **kw)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit simhash per doc: sign of the token-hash bit-vote sum."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self.bit_idx = np.arange(64, dtype=np.uint64)

    def simhash(self, text: str) -> np.uint64:
        words = text.lower().split()
        if not words:
            return np.uint64(0)
        h = stable_hash_array(np.asarray(words, dtype=object))
        bits = (h[:, None] >> self.bit_idx[None, :]) & np.uint64(1)  # (m, 64)
        votes = bits.astype(np.int64).sum(axis=0) * 2 - len(h)
        return np.uint64(np.packbits((votes > 0)[::-1]).view(">u8")[0])

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pandas().fillna("")
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        sh = np.array([self.simhash(t) for t in texts], dtype=np.uint64)
        return pa.table({self.id_col: pa.array(ids), "simhash": pa.array(sh.astype(np.int64))})


def simhash_dedup(
    ds: "ray.data.Dataset",
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    shuffle_buckets: int | None = None,
    max_bucket: int = 200,
    stats_out: dict | None = None,
) -> "ray.data.Dataset":
    """Near-dup by simhash hamming distance ≤ t, distributed end-to-end.

    Banding: 4×16-bit keys — any pair within distance 3 shares at least
    one exact band (pigeonhole). The 8-byte simhash IS the verification
    payload, so band rows stay slim; verify + component labeling run on
    the same direct-exchange path as MinHash (routing key ``_bk`` mixes
    band index into the band key)."""
    from .joins import _direct_grouped_apply

    sh = ds.map_batches(
        _cached_stage(SimHasher, text_col, id_col),
        batch_format="pyarrow",
    ).materialize()  # tiny: (id, int64) per doc; reused for final labeling

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        h = batch.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(h)
        parts = []
        for b in range(4):
            key = ((h >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
            bk = (key.astype(np.uint64) * _MIX) + np.uint64(b)
            parts.append(
                pa.table(
                    {
                        id_col: ids,
                        "band": pa.array(np.full(n, b, dtype=np.int64)),
                        "band_hash": pa.array(key),
                        "payload": pa.array(h.astype(np.int64)),
                        "_bk": pa.array(bk.astype(np.int64)),
                    }
                )
            )
        return pa.concat_tables(parts)

    counter = _trunc_counter()
    try:
        edges = _direct_grouped_apply(
            sh.map_batches(band_rows, batch_format="pyarrow"),
            "_bk",
            _make_bucket_verifier(
                id_col, ["band", "band_hash"], "hamming", max_hamming, max_bucket, counter
            ),
            shuffle_buckets,
        )
        labels = components_labels(edges, shuffle_buckets)
    except BaseException:
        counter.cleanup()
        raise
    _report_truncation(counter, stats_out, "simhash_dedup")
    return _assign_clusters(sh.select_columns([id_col]), labels, id_col)


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_dedup(
    ds: "ray.data.Dataset",
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> "ray.data.Dataset":
    """Keep a vector iff no LOWER-id vector has cosine ≥ threshold.

    Greedy-by-id — deterministic and SQL-expressible (the oracle is an
    anti-join). EXACT all-pairs tier: the reference matrix is
    L2-normalized once on the driver and broadcast (``ray.put``); each
    batch is one blocked matmul. O(N²) — this is the oracle/correctness
    tier for corpora whose embedding matrix fits one worker;
    ``embedding_dedup_lsh`` is the scale path."""
    full = ds.select_columns([id_col, vec_col]).to_pandas().sort_values(id_col)
    ids = full[id_col].to_numpy()
    mat = np.stack(full[vec_col].to_numpy()).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids, mat))

    def mark(batch: pa.Table) -> pa.Table:
        all_ids, m = ray.get(ref)
        bids = batch.column(id_col).to_numpy(zero_copy_only=False)
        bvec = np.stack(batch.column(vec_col).to_pandas().to_numpy()).astype(np.float64)
        bvec /= np.maximum(np.linalg.norm(bvec, axis=1, keepdims=True), 1e-12)
        sims = bvec @ m.T  # (B, N)
        earlier = all_ids[None, :] < bids[:, None]
        dup = ((sims >= threshold) & earlier).any(axis=1)
        return batch.append_column("is_dup", pa.array(dup, pa.bool_()))

    return ds.map_batches(mark, batch_format="pyarrow")


def _derive_num_planes(ds: "ray.data.Dataset", target_bucket: int) -> int:
    """Plane count sized so the EXPECTED bucket population ≈
    ``target_bucket``: ``ceil(log2(N / target_bucket))``, clamped to
    [8, 20]. N comes from dataset METADATA only (``_meta_count`` — row
    counts of a bare read / materialized set); a mid-pipeline dataset
    whose size would require execution falls back to the 8-plane floor.
    A fixed plane count would let bucket population grow linearly with
    corpus size — the round-2 scale wart this closes."""
    n = None
    try:
        n = ds._meta_count()  # metadata-only; None when unknown
    except Exception:
        n = None
    if not n:
        return 8
    import math

    return int(min(20, max(8, math.ceil(math.log2(max(n, 1) / max(target_bucket, 1))))))


def embedding_dedup_lsh(
    ds: "ray.data.Dataset",
    threshold: float = 0.95,
    num_planes: int | None = None,
    seed: int = 13,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_bucket: int = 4096,
    target_bucket: int = 1024,
    shuffle_buckets: int | None = None,
    stats_out: dict | None = None,
) -> "ray.data.Dataset":
    """Bucketed approximation of ``embedding_dedup`` — the 100-TB path.

    Random-hyperplane LSH (2^num_planes buckets) with hamming-1 multiprobe:
    each vector lands once in its home bucket ("index" role) and probes
    its own + every 1-bit-flipped bucket ("query" role). Within a bucket
    one matmul compares queries against index rows; any query with an
    EARLIER-id index neighbor at cosine ≥ τ is flagged. Only bucket-local
    work — no O(N²), no driver materialization; the flagged-id set
    (O(duplicates)) is broadcast to mark the corpus.

    ``num_planes=None`` (default) derives the plane count from the
    corpus size when metadata knows it (expected bucket ≈
    ``target_bucket``), so buckets stay bounded as the corpus grows.
    LSH buckets route on ``bucket`` through the DIRECT hash exchange
    (:func:`~.joins._direct_grouped_apply`) — one kernel dispatch per
    exchange bucket handles all of its LSH buckets (the per-group
    dispatch cost pattern measured at 15 s vs 0.5 s elsewhere). Buckets
    larger than ``max_bucket`` compare only the ``max_bucket`` LOWEST-id
    index rows (deterministic under any row order) and the truncation is
    counted into ``stats_out`` and logged — never silent.

    Shuffle cost: (num_planes + 2) copies of each vector. Recall is
    measured against the exact tier in tests (≥0.95 on the seeded corpus
    at τ=0.95); residual misses are pairs whose buckets differ in ≥2 bits.
    """
    from .joins import _direct_grouped_apply

    if num_planes is None:
        num_planes = _derive_num_planes(ds, target_bucket)
    if stats_out is not None:
        stats_out["num_planes"] = num_planes

    def emit_probe_rows(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    id_col: pa.array([], pa.int64()),
                    vec_col: batch.column(vec_col),
                    "role": pa.array([], pa.int8()),
                }
            )
        m = np.stack(batch.column(vec_col).to_pandas().to_numpy()).astype(np.float64)
        rng = np.random.default_rng(seed)  # deterministic per (seed, dim)
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
            ),
            pa.table(
                {
                    "bucket": pa.array(home),
                    id_col: pa.array(ids),
                    vec_col: vecs,
                    "role": pa.array(np.ones(n, dtype=np.int8)),  # query, home probe
                }
            ),
        ]
        for p in range(num_planes):  # hamming-1 probes
            probe = home ^ (1 << p)
            parts.append(
                pa.table(
                    {
                        "bucket": pa.array(probe),
                        id_col: pa.array(ids),
                        vec_col: vecs,
                        "role": pa.array(np.ones(n, dtype=np.int8)),
                    }
                )
            )
        return pa.concat_tables(parts)

    counter = _trunc_counter()

    def bucket_dups(group: pd.DataFrame) -> pa.Table:
        """All LSH buckets of one exchange bucket, one dispatch; per LSH
        bucket one (Q, I) matmul against the id-sorted (capped) index
        rows."""
        out: list[np.ndarray] = []
        for _, g in group.groupby("bucket", sort=False) if len(group) else []:
            idx = g[g["role"] == 0]
            qry = g[g["role"] == 1]
            if not len(idx) or not len(qry):
                continue
            order = np.argsort(idx[id_col].to_numpy(), kind="stable")
            if len(order) > max_bucket:  # deterministic: lowest ids kept
                counter.add(
                    {"truncated_buckets": 1, "truncated_rows": len(order) - max_bucket}
                )
                order = order[:max_bucket]
            iids = idx[id_col].to_numpy()[order]
            im = np.stack(idx[vec_col].to_numpy()[order]).astype(np.float64)
            im /= np.maximum(np.linalg.norm(im, axis=1, keepdims=True), 1e-12)
            qids = qry[id_col].to_numpy()
            qm = np.stack(qry[vec_col].to_numpy()).astype(np.float64)
            qm /= np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)
            sims = qm @ im.T  # (Q, I)
            hit = (sims >= threshold) & (iids[None, :] < qids[:, None])
            out.append(qids[hit.any(axis=1)].astype(np.int64))
        d = np.unique(np.concatenate(out)) if out else np.array([], np.int64)
        return pa.table({"dup_id": pa.array(d.astype(np.int64))})

    try:
        dup_rows = _direct_grouped_apply(
            ds.map_batches(emit_probe_rows, batch_format="pyarrow"),
            "bucket",
            bucket_dups,
            shuffle_buckets,
        ).to_pandas()  # O(duplicates) — the broadcast payload
    except BaseException:
        counter.cleanup()
        raise
    _report_truncation(counter, stats_out, "embedding_dedup_lsh")
    # a fully-duplicate-free corpus yields only empty frames (no schema)
    dups = dup_rows["dup_id"].to_numpy() if "dup_id" in dup_rows.columns else np.array([])
    dup_ids = np.unique(dups.astype(np.int64))
    ref = ray.put(dup_ids)

    def mark(batch: pa.Table) -> pa.Table:
        d = ray.get(ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column("is_dup", pa.array(in_sorted(ids, d), pa.bool_()))

    return ds.map_batches(mark, batch_format="pyarrow")


def semantic_dedup(
    ds: "ray.data.Dataset",
    threshold: float = 0.95,
    k: int | None = None,
    sample_size: int = 4096,
    seed: int = 29,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_cluster: int = 8192,
    shuffle_buckets: int | None = None,
    stats_out: dict | None = None,
) -> "ray.data.Dataset":
    """SemDeDup-style semantic near-dup removal (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space with spherical
    k-means, then flag near-duplicates WITHIN each cluster only — the
    k-means partition replaces the LSH banding of
    :func:`embedding_dedup_lsh` as the candidate generator, trading its
    multiprobe shuffle fanout ((num_planes+2)× vector copies) for ONE
    copy per vector plus a bounded driver-side centroid fit.

    Same greedy-by-id rule as the exact tier (``is_dup`` iff an
    EARLIER-id neighbor in the same cluster has cosine ≥ threshold), so
    recall is directly measurable against :func:`embedding_dedup`; the
    approximation misses pairs k-means separates (SemDeDup accepts this
    by construction — near-dups co-locate semantically).

    Scale shape: centroids train on a bounded driver sample and broadcast
    once (``ray.put``); assignment is one matmul per batch; clusters
    route on ``cluster`` through the direct hash exchange (one kernel
    dispatch handles all of an exchange bucket's clusters); within a
    cluster one (Q, I) matmul against the id-sorted index side, capped at
    ``max_cluster`` lowest ids with a counted, never-silent truncation;
    the flagged-id broadcast is O(duplicates).

    ``k=None`` (default) scales the cluster count with the corpus —
    ``clamp(n/2048, 16, 1024)`` — so the mean cluster stays well under
    ``max_cluster`` at any size (a FIXED k silently saturates the cap as
    the corpus grows: at 500 k vectors, k=16 put ~31 k vectors in every
    cluster and the cap truncated recall to 0.32; auto-k restores ≥0.97
    — measured in ``bench --dedup-scale`` at 100×)."""
    import math as _math

    from .joins import _direct_grouped_apply
    from .similarity import _bounded_sample, _spherical_kmeans, _stack

    if k is None:
        n_total = ds.count()  # parquet metadata count on file-backed inputs
        k = int(min(1024, max(16, _math.ceil(n_total / 2048))))
        sample_size = max(sample_size, 8 * k)
    sample = _bounded_sample(ds, vec_col, sample_size)
    if sample is None:
        # EMPTY corpus: nothing to cluster (pa.concat_tables([]) would
        # raise before any work) — every row of the (empty) input is
        # trivially non-duplicate, matching embedding_dedup_lsh's behavior
        return ds.map_batches(
            lambda b: b.append_column("is_dup", pa.array([False] * b.num_rows, pa.bool_())),
            batch_format="pyarrow",
        )
    centroids = _spherical_kmeans(sample, min(k, len(sample)), seed)
    cent_ref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    vec_col: batch.column(vec_col),
                    "cluster": pa.array([], pa.int64()),
                }
            )
        cent = ray.get(cent_ref)
        m = _stack(batch.column(vec_col))
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        cluster = np.argmax(m @ cent.T, axis=1).astype(np.int64)
        return pa.table(
            {
                id_col: batch.column(id_col).cast(pa.int64()),
                vec_col: batch.column(vec_col),
                "cluster": pa.array(cluster),
            }
        )

    counter = _trunc_counter()

    def cluster_dups(group: pd.DataFrame) -> pa.Table:
        out: list[np.ndarray] = []
        for _, g in group.groupby("cluster", sort=False) if len(group) else []:
            if len(g) < 2:
                continue
            order = np.argsort(g[id_col].to_numpy(), kind="stable")
            ids = g[id_col].to_numpy()[order]
            m = np.stack(g[vec_col].to_numpy()[order]).astype(np.float64)
            m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            if len(ids) > max_cluster:  # deterministic: lowest ids indexed
                counter.add(
                    {"truncated_buckets": 1, "truncated_rows": len(ids) - max_cluster}
                )
            im = m[:max_cluster]
            iids = ids[:max_cluster]
            sims = m @ im.T  # (Q, I) — queries are the whole cluster
            hit = (sims >= threshold) & (iids[None, :] < ids[:, None])
            out.append(ids[hit.any(axis=1)].astype(np.int64))
        d = np.unique(np.concatenate(out)) if out else np.array([], np.int64)
        return pa.table({"dup_id": pa.array(d.astype(np.int64))})

    try:
        dup_rows = _direct_grouped_apply(
            ds.map_batches(assign, batch_format="pyarrow"),
            "cluster",
            cluster_dups,
            shuffle_buckets,
        ).to_pandas()  # O(duplicates) — the broadcast payload
    except BaseException:
        counter.cleanup()
        raise
    _report_truncation(counter, stats_out, "semantic_dedup")
    dups = dup_rows["dup_id"].to_numpy() if "dup_id" in dup_rows.columns else np.array([])
    dup_ids = np.unique(dups.astype(np.int64))
    ref = ray.put(dup_ids)

    def mark(batch: pa.Table) -> pa.Table:
        d = ray.get(ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column("is_dup", pa.array(in_sorted(ids, d), pa.bool_()))

    return ds.map_batches(mark, batch_format="pyarrow")
