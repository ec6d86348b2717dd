"""Full-text retrieval: BM25 top-k scoring and a token-partitioned
inverted index — the lexical sibling of the ANN family
(stages/similarity.py), and the operator a training-data pipeline uses
for corpus search, eval-set leakage triage, and hard-negative mining.

Two tiers, mirroring the embedding operators:

- :func:`bm25_topk` — scan tier. ONE vectorized tokenization pass
  compacts the corpus to a per-doc ``(doc_id, dl, tf…)`` table (a few
  ints per doc — ~1000× smaller than the text), global stats (N, avgdl,
  df) come from a native Ray aggregate over it, and per-block partial
  top-k's merge on the direct exchange. No shuffle of anything
  text-sized; SQL-oracle-checkable (DuckDB expresses BM25 exactly).
- :func:`build_text_index` + :func:`bm25_search` — indexed tier. The
  build runs one direct hash exchange keyed on token and writes
  token-bucketed posting lists ``(token, doc_id, tf, dl)``; a query
  then reads ONLY the buckets its terms hash to (skip counters in
  ``stats_out`` prove it), so query cost is O(postings of the query
  terms), not O(corpus) — the path that still works when the corpus is
  100 TB and the index is built once. Scores are IDENTICAL to the scan
  tier by construction (same integer tf/dl/df inputs, same float64
  arithmetic), so both tiers share one SQL oracle.

Scoring is Lucene-variant BM25: ``idf = ln(1 + (N - df + .5)/(df + .5))``
(never negative), ``w = tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl))``,
score = Σ_terms idf·w. Scores are SNAPPED to the repo's
``int64(round(x·10^d))/10^d`` round-trip BEFORE ranking, and ranking is
(snapped score desc, doc_id asc): float summation order differs between
the scan tier (fixed-term-order matmul), the indexed tier (groupby sum
over exchange-ordered posting rows) and the SQL oracle, so raw-float
ranking would flip mathematical ties on ULP noise — snapping first makes
all three rankings identical, and the emitted score value-hashes
bit-for-bit against DuckDB.

Partitioning assumptions (per the operator brief): one token's posting
list fits a worker (same contract as every bucketed kernel here — a
stop-word-free vocabulary at web scale holds; cap-and-count if not),
and query top-k's fit the driver (they are k rows per query).
"""

from __future__ import annotations

import json
import math
import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..functions.hashing import stable_hash_array
from ..functions.text import TOKEN_PATTERN
from .joins import _block_refs, _direct_grouped_apply, _single_threaded_arrow, resolve_buckets

DEFAULT_K1 = 1.2
DEFAULT_B = 0.75

_TERM_RE = re.compile(r"^[a-z0-9_]+$")


def _parse_queries(queries) -> tuple[list[int], list[list[str]], list[str]]:
    """Normalize ``{query_id: [terms…]}`` (or ``[(qid, terms)…]``) and
    validate terms are lowercase word tokens — the only shape both the
    tokenizer and the SQL oracle agree on."""
    items = sorted(queries.items()) if isinstance(queries, dict) else [
        (int(q), list(t)) for q, t in queries
    ]
    if not items:
        raise ValueError("at least one query is required")
    qids, termlists = [], []
    for qid, terms in items:
        # sorted-set semantics: BM25 ignores query term frequency, and a
        # canonical term order keeps the scan tier's matmul summation
        # deterministic (the indexed tier and SQL sum in their own orders;
        # snap-before-rank absorbs the ULP spread — see module docstring)
        terms = sorted({str(t).lower() for t in terms})
        if not terms:
            raise ValueError(f"query {qid} has no terms")
        for t in terms:
            if not _TERM_RE.match(t):
                raise ValueError(
                    f"query term {t!r} is not a lowercase word token "
                    "(BM25 terms must match [a-z0-9_]+)"
                )
        qids.append(int(qid))
        termlists.append(terms)
    uniq = sorted({t for terms in termlists for t in terms})
    return qids, termlists, uniq


def _tokenize(text: "pd.Series") -> "pd.Series":
    return text.fillna("").str.lower().str.findall(TOKEN_PATTERN)


def _empty_hits() -> pa.Table:
    return pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
        }
    )


def _hits_table(q, d, s) -> pa.Table:
    return pa.table(
        {
            "query_id": pa.array(np.asarray(q, np.int64)),
            "doc_id": pa.array(np.asarray(d, np.int64)),
            "score": pa.array(np.asarray(s, np.float64)),
        }
    )


def _snap(scores, round_to: int) -> np.ndarray:
    """The repo's exact-integer float snap (CLAUDE.md): applied BEFORE
    ranking so every tier and the SQL oracle rank the same values."""
    scale = float(10**round_to)
    return np.round(np.asarray(scores, np.float64) * scale).astype(np.int64) / scale


def _make_merge_hits(k: int):
    """Final per-query merge over already-snapped partials: rank (score
    desc, doc_id asc), keep k — identical to the oracle's ROW_NUMBER."""

    def merge(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return _empty_hits()
        g = (
            df.sort_values(["score", "doc_id"], ascending=[False, True], kind="mergesort")
            .groupby("query_id", sort=False)
            .head(k)
        )
        return _hits_table(
            g["query_id"].to_numpy(), g["doc_id"].to_numpy(), g["score"].to_numpy(np.float64)
        )

    return merge


def _block_topk(score: np.ndarray, doc_ids: np.ndarray, k: int):
    """Indices of the block's top-k positive snapped scores (desc, doc
    asc). Each doc lives in exactly one block/bucket, and truncation uses
    the same total order as the final merge, so any dropped row is
    strictly worse than k kept rows globally — a valid partial."""
    pos = np.flatnonzero(score > 0.0)
    if len(pos) > k:
        part = pos[np.argpartition(-score[pos], k - 1)[:k]]
        # argpartition breaks score ties arbitrarily; widen to ALL rows
        # tied with the cut so the doc_id tie-break stays deterministic
        cut = score[part].min()
        pos = pos[score[pos] >= cut]
    order = np.lexsort((doc_ids[pos], -score[pos]))[:k]
    return pos[order]


def bm25_topk(
    ds: "ray.data.Dataset",
    queries,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    round_to: int = 6,
    shuffle_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Scan-tier BM25: top-k documents per query over the raw corpus.

    Shape: one tokenization pass → compact per-doc ``(doc_id, dl,
    tf_j…)`` ints (materialized — ~40 B/doc, independent of text size);
    N / avgdl / df via ONE native Ray sum over it; per-block partial
    top-k → direct-exchange merge per query. The text column is read
    once and never shuffled."""
    qids, termlists, terms = _parse_queries(queries)
    tcount = len(terms)
    tindex = {t: j for j, t in enumerate(terms)}

    def compact(batch: pa.Table) -> pa.Table:
        toks = _tokenize(batch.column(text_col).to_pandas())
        dl = toks.str.len().to_numpy(np.int64)
        tf = np.zeros((batch.num_rows, tcount), np.int64)
        ex = toks.explode()
        ex = ex[ex.isin(tindex)]
        if len(ex):
            rows = ex.index.to_numpy(np.int64)
            cols = ex.map(tindex).to_numpy(np.int64)
            np.add.at(tf, (rows, cols), 1)
        out = {id_col: batch.column(id_col), "dl": pa.array(dl)}
        for j in range(tcount):
            out[f"tf{j}"] = pa.array(tf[:, j])
        return pa.table(out)

    compact_ds = ds.map_batches(compact, batch_format="pyarrow").materialize()

    def stats_partial(batch: pa.Table) -> pa.Table:
        row = {
            "n_docs": pa.array([batch.num_rows], pa.int64()),
            "total_len": pa.array([pc.sum(batch.column("dl")).as_py() or 0], pa.int64()),
        }
        for j in range(tcount):
            df_j = pc.sum(
                pc.cast(pc.greater(batch.column(f"tf{j}"), 0), pa.int64())
            ).as_py()
            row[f"df{j}"] = pa.array([df_j or 0], pa.int64())
        return pa.table(row)

    cols = ["n_docs", "total_len"] + [f"df{j}" for j in range(tcount)]
    totals = compact_ds.map_batches(stats_partial, batch_format="pyarrow").sum(cols)
    n_docs = int(totals.get("sum(n_docs)") or 0) if totals else 0
    if n_docs == 0:
        return ray.data.from_arrow(_empty_hits())
    avgdl = float(totals["sum(total_len)"]) / n_docs
    df = np.array([int(totals[f"sum(df{j})"]) for j in range(tcount)], np.float64)
    idf = np.log1p((n_docs - df + 0.5) / (df + 0.5))
    qterm_idx = [np.array([tindex[t] for t in tl], np.int64) for tl in termlists]

    def partial(batch: pa.Table) -> pa.Table:
        dl = batch.column("dl").to_numpy(zero_copy_only=False).astype(np.float64)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        tf = np.stack(
            [
                batch.column(f"tf{j}").to_numpy(zero_copy_only=False).astype(np.float64)
                for j in range(tcount)
            ],
            axis=1,
        )
        denom = tf + (k1 * (1.0 - b + b * dl / avgdl))[:, None]
        w = tf * (k1 + 1.0) / denom  # tf=0 rows contribute exactly 0
        out_q: list = []
        out_d: list = []
        out_s: list = []
        for qi, qid in enumerate(qids):
            ti = qterm_idx[qi]
            score = _snap(w[:, ti] @ idf[ti], round_to)
            keep = _block_topk(score, ids, k)
            out_q.extend([qid] * len(keep))
            out_d.extend(int(i) for i in ids[keep])
            out_s.extend(float(s) for s in score[keep])
        if not out_q:
            return _empty_hits()
        return _hits_table(out_q, out_d, out_s)

    partials = compact_ds.map_batches(partial, batch_format="pyarrow")
    return _direct_grouped_apply(partials, "query_id", _make_merge_hits(k), shuffle_buckets)


# ---------------------------------------------------------------------------
# Indexed tier: token-bucketed posting lists on disk
# ---------------------------------------------------------------------------


@ray.remote
def _split_postings_task(
    text_col: str, id_col: str, nb: int, *blocks: pa.Table
) -> list:
    """Tokenize a stride of corpus blocks and hash-split the posting rows
    ``(token, doc_id, tf, dl)`` by token into ``nb`` bucket slices."""
    _single_threaded_arrow()
    parts: list[pa.Table] = []
    for blk in blocks:
        toks = _tokenize(blk.column(text_col).to_pandas())
        dl = toks.str.len().to_numpy(np.int64)
        ids = blk.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ex = toks.explode().dropna()
        if not len(ex):
            continue
        rows = ex.index.to_numpy(np.int64)
        grp = pd.DataFrame({"r": rows, "t": ex.to_numpy()})
        tf = grp.groupby(["r", "t"], sort=False).size()
        ridx = tf.index.get_level_values(0).to_numpy(np.int64)
        parts.append(
            pa.table(
                {
                    "token": pa.array(tf.index.get_level_values(1), pa.string()),
                    "doc_id": pa.array(ids[ridx]),
                    "tf": pa.array(tf.to_numpy(np.int64)),
                    "dl": pa.array(dl[ridx]),
                }
            )
        )
    if not parts:
        empty = pa.table(
            {
                "token": pa.array([], pa.string()),
                "doc_id": pa.array([], pa.int64()),
                "tf": pa.array([], pa.int64()),
                "dl": pa.array([], pa.int64()),
            }
        )
        return [empty] * nb if nb > 1 else [[empty]]
    t = pa.concat_tables(parts)
    bucket = (stable_hash_array(t.column("token")) % np.uint64(nb)).astype(np.int64)
    order = np.argsort(bucket, kind="stable")
    sorted_t = t.take(order)
    bounds = np.searchsorted(bucket[order], np.arange(nb + 1))
    out = [sorted_t.slice(bounds[i], bounds[i + 1] - bounds[i]) for i in range(nb)]
    return out if nb > 1 else [out]


@ray.remote
def _write_bucket_task(postings_dir: str, bid: int, *slices: pa.Table) -> dict:
    """Concatenate one bucket's slices, sort by (token, doc_id) so each
    posting list is contiguous, and write the bucket file."""
    import pyarrow.parquet as pq

    _single_threaded_arrow()
    t = pa.concat_tables([s for s in slices if s.num_rows] or [slices[0]])
    t = t.sort_by([("token", "ascending"), ("doc_id", "ascending")])
    path = os.path.join(postings_dir, f"bucket={bid:05d}.parquet")
    pq.write_table(t, path)
    return {"bucket": bid, "postings": t.num_rows, "tokens": len(pc.unique(t.column("token")))}


def build_text_index(
    ds: "ray.data.Dataset",
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int | None = None,
) -> dict:
    """Build a token-partitioned inverted index at ``index_dir``.

    Layout: ``postings/bucket=NNNNN.parquet`` rows ``(token, doc_id, tf,
    dl)`` — doc length denormalized into every posting so queries never
    join a doc-length table — plus ``_stats.json`` (corpus N / total_len
    / bucket count). df per term is NOT stored: a term's pruned posting
    read IS its exact df. One direct hash exchange on token; the build
    is committed by an atomic directory rename (a killed build leaves no
    readable index). Returns the stats dict."""
    if os.path.exists(index_dir):
        raise ValueError(f"index_dir already exists: {index_dir}")
    nb = resolve_buckets(num_buckets)

    def stats_partial(batch: pa.Table) -> pa.Table:
        low = pc.utf8_lower(pc.coalesce(batch.column(text_col), pa.scalar("")))
        dl = pc.count_substring_regex(low, TOKEN_PATTERN)
        return pa.table(
            {
                "n_docs": pa.array([batch.num_rows], pa.int64()),
                "total_len": pa.array(
                    [pc.sum(pc.cast(dl, pa.int64())).as_py() or 0], pa.int64()
                ),
            }
        )

    mat = ds.materialize()
    totals = mat.map_batches(stats_partial, batch_format="pyarrow").sum(
        ["n_docs", "total_len"]
    ) or {"sum(n_docs)": 0, "sum(total_len)": 0}
    refs = _block_refs(mat)
    staging = index_dir.rstrip("/") + f".staging-{os.getpid()}"
    postings_dir = os.path.join(staging, "postings")
    os.makedirs(postings_dir, exist_ok=True)
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        n_tasks = min(len(refs), max(1, cpus)) or 1
        groups = [refs[i::n_tasks] for i in range(n_tasks) if refs[i::n_tasks]]
        outs = [
            _split_postings_task.options(num_returns=nb if nb > 1 else None).remote(
                text_col, id_col, nb, *grp
            )
            for grp in groups
        ]
        splits = outs if nb > 1 else [[o] for o in outs]
        metas = (
            ray.get(
                [
                    _write_bucket_task.remote(postings_dir, i, *[s[i] for s in splits])
                    for i in range(nb)
                ]
            )
            if splits
            else []  # empty corpus: no posting buckets, _stats.json n_docs=0
        )
        stats = {
            "n_docs": int(totals.get("sum(n_docs)") or 0),
            "total_len": int(totals.get("sum(total_len)") or 0),
            "num_buckets": nb,
            "postings": int(sum(m["postings"] for m in metas)),
            "text_col": text_col,
            "id_col": id_col,
        }
        with open(os.path.join(staging, "_stats.json"), "w") as f:
            json.dump(stats, f)
        os.rename(staging, index_dir)
        return stats
    except BaseException:
        import shutil

        shutil.rmtree(staging, ignore_errors=True)
        raise


def bm25_search(
    index_dir: str,
    queries,
    k: int = 10,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    round_to: int = 6,
    shuffle_buckets: int | None = None,
    stats_out: dict | None = None,
) -> "ray.data.Dataset":
    """Query the inverted index: top-k docs per query, scores identical
    to :func:`bm25_topk` on the same corpus.

    Only the buckets the query terms hash to are read (``stats_out``
    records ``buckets_read``/``buckets_total``), with a token-equality
    predicate pushed into the parquet scan — query cost scales with the
    terms' posting lists, not the corpus. Per-doc scores are summed on
    one doc_id-keyed exchange (a doc's terms live in different buckets),
    then the per-query merge ranks exactly like the scan tier."""
    qids, termlists, terms = _parse_queries(queries)
    with open(os.path.join(index_dir, "_stats.json")) as f:
        st = json.load(f)
    nb = int(st["num_buckets"])
    n_docs = int(st["n_docs"])
    if n_docs == 0:
        return ray.data.from_arrow(_empty_hits())
    avgdl = float(st["total_len"]) / n_docs
    tarr = np.array(terms, dtype=object)
    tbuckets = sorted(set((stable_hash_array(tarr) % np.uint64(nb)).astype(int).tolist()))
    if stats_out is not None:
        stats_out["buckets_read"] = len(tbuckets)
        stats_out["buckets_total"] = nb
    paths = [
        os.path.join(index_dir, "postings", f"bucket={bid:05d}.parquet")
        for bid in tbuckets
    ]
    import pyarrow.dataset as pads

    pruned = ray.data.read_parquet(
        paths, filter=pads.field("token").isin(terms)
    ).materialize()

    # exact df per term = posting-list length (one tiny partial per block)
    def df_partial(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch.column("token"))
        return pa.table(
            {
                "token": vc.field("values"),
                "n": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    df_map: dict[str, int] = {t: 0 for t in terms}
    for blk in pruned.map_batches(df_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for tok, n in zip(blk.column("token").to_pylist(), blk.column("n").to_pylist()):
            df_map[tok] = df_map.get(tok, 0) + int(n)
    idf = {t: math.log1p((n_docs - d + 0.5) / (d + 0.5)) for t, d in df_map.items()}
    term_sets = [set(tl) for tl in termlists]

    def contrib(batch: pa.Table) -> pa.Table:
        tok = batch.column("token").to_pandas()
        tf = batch.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        dl = batch.column("dl").to_numpy(zero_copy_only=False).astype(np.float64)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        w = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        contribs = w * tok.map(idf).to_numpy(np.float64)
        out_q: list = []
        out_d: list = []
        out_s: list = []
        for qi, qid in enumerate(qids):
            m = tok.isin(term_sets[qi]).to_numpy()
            if m.any():
                out_q.extend([qid] * int(m.sum()))
                out_d.extend(int(i) for i in ids[m])
                out_s.extend(float(s) for s in contribs[m])
        if not out_q:
            return _empty_hits()
        return _hits_table(out_q, out_d, out_s)

    contribs_ds = pruned.map_batches(contrib, batch_format="pyarrow")

    def sum_and_topk(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return _empty_hits()
        s = df.groupby(["query_id", "doc_id"], sort=False)["score"].sum().reset_index()
        out = []
        for qid, g in s.groupby("query_id", sort=False):
            sc = _snap(g["score"].to_numpy(np.float64), round_to)
            ids = g["doc_id"].to_numpy(np.int64)
            keep = _block_topk(sc, ids, k)
            out.append(_hits_table([qid] * len(keep), ids[keep], sc[keep]))
        return pa.concat_tables(out) if out else _empty_hits()

    # each (query, doc) lands in exactly one doc_id bucket, so the bucket
    # kernel's per-query top-k is a valid partial for the final merge
    local = _direct_grouped_apply(contribs_ds, "doc_id", sum_and_topk, shuffle_buckets)
    return _direct_grouped_apply(local, "query_id", _make_merge_hits(k), shuffle_buckets)


# ---------------------------------------------------------------------------
# Posting-rows tier: BM25 over an already-maintained posting table
# ---------------------------------------------------------------------------


def bm25_postings_search(
    postings: "ray.data.Dataset",
    queries,
    k: int = 10,
    id_col: str = "conv_id",
    id_type: "pa.DataType | None" = None,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    round_to: int = 6,
    shuffle_buckets: int | None = None,
) -> "ray.data.Dataset":
    """BM25 top-k over a POSTING-ROWS dataset — the query engine for any
    posting table regardless of who maintains it (the incremental text
    index view feeds it; `pipelines/incremental.IncrementalTextIndex`).

    Contract: columns ``(id_col, token, tf, dl)`` where NULL-token rows
    are per-document stat rows (one per doc, ``dl`` = doc token length)
    and non-null rows are postings with ``dl`` denormalized. df per term
    is the term's posting-row count; N/avgdl come from the stat rows —
    so corpus statistics need no side-channel and stay exact under
    incremental maintenance. Doc ids may be ANY hashable Arrow type
    (strings for conversations); ranking and score snapping are identical
    to the other two tiers, so one SQL oracle covers all three.

    Scale shape: one pruned pass over the posting table (token filter —
    push it into the parquet read upstream when the caller has file
    paths), then the same two direct exchanges as :func:`bm25_search`
    (doc-keyed partial sum+topk, query-keyed merge). Cost is O(index),
    not O(text): the posting table is integers + tokens.
    """
    qids, termlists, terms = _parse_queries(queries)
    id_type = id_type or pa.string()

    def hits(q, ids, s) -> pa.Table:
        return pa.table(
            {
                "query_id": pa.array(np.asarray(q, np.int64)),
                id_col: pa.array(list(ids), id_type),
                "score": pa.array(np.asarray(s, np.float64)),
            }
        )

    empty = hits([], [], [])
    term_set = pa.array(terms, pa.string())

    def prune(batch: pa.Table) -> pa.Table:
        tok = batch.column("token")
        keep = pc.or_(pc.is_null(tok), pc.is_in(tok, value_set=term_set))
        return batch.filter(keep)

    pruned = postings.map_batches(prune, batch_format="pyarrow").materialize()

    def stats_partial(batch: pa.Table) -> pa.Table:
        tok = batch.column("token")
        isnull = pc.is_null(tok)
        row = {
            "n_docs": pa.array(
                [pc.sum(pc.cast(isnull, pa.int64())).as_py() or 0], pa.int64()
            ),
            "total_len": pa.array(
                [
                    pc.sum(
                        pc.if_else(isnull, batch.column("dl"), pa.scalar(0, pa.int64()))
                    ).as_py()
                    or 0
                ],
                pa.int64(),
            ),
        }
        for j, t in enumerate(terms):
            row[f"df{j}"] = pa.array(
                [pc.sum(pc.cast(pc.equal(tok, t), pa.int64())).as_py() or 0], pa.int64()
            )
        return pa.table(row)

    cols = ["n_docs", "total_len"] + [f"df{j}" for j in range(len(terms))]
    totals = pruned.map_batches(stats_partial, batch_format="pyarrow").sum(cols)
    n_docs = int(totals.get("sum(n_docs)") or 0) if totals else 0
    if n_docs == 0:
        return ray.data.from_arrow(empty)
    avgdl = float(totals["sum(total_len)"]) / n_docs
    idf = {
        t: math.log1p((n_docs - int(totals[f"sum(df{j})"]) + 0.5)
                      / (int(totals[f"sum(df{j})"]) + 0.5))
        for j, t in enumerate(terms)
    }
    term_sets = [set(tl) for tl in termlists]

    def contrib(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column("token")))
        if not batch.num_rows:
            return empty
        tok = batch.column("token").to_pandas()
        tf = batch.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        dl = batch.column("dl").to_numpy(zero_copy_only=False).astype(np.float64)
        ids = batch.column(id_col).to_pandas()
        w = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        contribs = w * tok.map(idf).to_numpy(np.float64)
        out_q: list = []
        out_i: list = []
        out_s: list = []
        for qi, qid in enumerate(qids):
            m = tok.isin(term_sets[qi]).to_numpy()
            if m.any():
                out_q.extend([qid] * int(m.sum()))
                out_i.extend(ids[m])
                out_s.extend(float(s) for s in contribs[m])
        if not out_q:
            return empty
        return hits(out_q, out_i, out_s)

    contribs_ds = pruned.map_batches(contrib, batch_format="pyarrow")

    def sum_and_topk(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return empty
        s = df.groupby(["query_id", id_col], sort=False)["score"].sum().reset_index()
        s["score"] = _snap(s["score"].to_numpy(np.float64), round_to)
        s = s[s["score"] > 0.0]
        # full stable sort (no argpartition) — plain head(k) IS the best-k
        # in the exact total order the final merge and the oracle use
        s = s.sort_values(
            ["query_id", "score", id_col], ascending=[True, False, True], kind="mergesort"
        )
        g = s.groupby("query_id", sort=False).head(k)
        return hits(g["query_id"].to_numpy(), g[id_col], g["score"].to_numpy(np.float64))

    def merge(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return empty
        g = (
            df.sort_values(["score", id_col], ascending=[False, True], kind="mergesort")
            .groupby("query_id", sort=False)
            .head(k)
        )
        return hits(g["query_id"].to_numpy(), g[id_col], g["score"].to_numpy(np.float64))

    local = _direct_grouped_apply(contribs_ds, id_col, sum_and_topk, shuffle_buckets)
    return _direct_grouped_apply(local, "query_id", merge, shuffle_buckets)
