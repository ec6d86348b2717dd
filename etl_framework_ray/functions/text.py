"""Text analysis for training-data pipelines: token counting, quality
scoring, language ID, document fingerprinting.

These are the engine's training-data extensions (not present in the
reference, which has no text operators — SURVEY.md §2.8 notes only
regex/cast/string-escape helpers). All hot paths are vectorized: Arrow
``count_substring_regex`` kernels for counting, pandas explode+merge for
the stopword scorer, numpy rolling hashes per document for fingerprints.
Stateful pieces (compiled regexes, stopword tables) live in actor-pool
classes — built once per actor in ``__init__``, used per batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import stable_hash_array

#: BPE-ish token pattern: word runs or single non-space punctuation.
#: RE2-compatible (both pyarrow and DuckDB use RE2) so the SQL oracle can
#: count the same tokens with regexp_extract_all.
TOKEN_PATTERN = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"


def text_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Stateless per-batch stats: chars, whitespace tokens, BPE-ish tokens,
    alpha chars. Pure Arrow kernels; SQL-oracle-expressible by design."""
    text = batch.column(text_col)
    out = batch.append_column("n_chars_actual", pc.utf8_length(text).cast(pa.int64()))
    out = out.append_column("n_tokens", pc.count_substring_regex(text, r"\S+").cast(pa.int64()))
    out = out.append_column(
        "n_bpe_tokens", pc.count_substring_regex(text, TOKEN_PATTERN).cast(pa.int64())
    )
    out = out.append_column(
        "n_alpha", pc.count_substring_regex(text, r"[A-Za-z]").cast(pa.int64())
    )
    return out


#: tiny per-language stopword profiles for the n-gram/stopword heuristic
#: language identifier (public-knowledge word lists)
_STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "that", "for", "on", "with"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "los", "las", "por", "con"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu", "mit", "den", "von"},
    "fr": {"le", "la", "les", "de", "des", "et", "est", "une", "un", "dans", "que", "pour"},
    "zh": {"的", "是", "了", "在", "我", "有", "和", "就", "不", "人", "这", "中"},
}


class LangId:
    """Actor-pool language identifier: stopword-hit scoring with a CJK
    codepoint-ratio prior. Profiles built once per actor; per batch it is
    one pandas explode + merge (vectorized), no per-row Python."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        rows = [(w, lang) for lang, ws in _STOPWORDS.items() for w in ws]
        self.profile = pd.DataFrame(rows, columns=["token", "lang"])

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column(self.text_col).to_pandas().fillna("")
        toks = text.str.lower().str.findall(r"[^\W\d_]+")
        exploded = toks.explode().rename("token").reset_index()
        hits = exploded.merge(self.profile, on="token", how="inner")
        scores = hits.groupby(["index", "lang"]).size().unstack(fill_value=0)
        n_docs = len(text)
        best = scores.idxmax(axis=1) if len(scores) else pd.Series(dtype=object)
        pred = pd.Series(["unknown"] * n_docs, index=range(n_docs), dtype=object)
        pred.update(best)
        # CJK ratio overrides stopword score (zh text rarely space-splits)
        cjk = text.str.count(r"[一-鿿]")
        total = text.str.len().clip(lower=1)
        pred[cjk / total > 0.2] = "zh"
        return batch.append_column("lang_pred", pa.array(pred.to_numpy(dtype=object), pa.string()))


class QualityScorer:
    """Actor-pool quality scoring: length/punct/stopword ratios combined
    into a [0,1] heuristic score (training-data filtering staple). The
    stopword count uses the SAME ``[a-z]+`` tokenization as always but
    vectorized with pandas explode + isin (the same trick LangId uses) —
    no per-row Python, identical scores to the original per-token loop
    (a \\b-regex alternative was rejected: word boundaries disagree with
    the tokenizer around digits/underscores, silently changing scores)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.en_stop = _STOPWORDS["en"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column(self.text_col).to_pandas().fillna("")
        n_chars = text.str.len().clip(lower=1)
        n_tokens = text.str.count(r"\S+")
        punct_ratio = text.str.count(r"[^\w\s]") / n_chars
        toks = text.str.lower().str.findall(r"[a-z]+").explode()
        hits = toks[toks.isin(self.en_stop)].groupby(level=0).size()
        stop_hits = pd.Series(0, index=text.index, dtype="int64")
        stop_hits.update(hits)
        stop_ratio = stop_hits / n_tokens.clip(lower=1)
        len_score = (n_tokens.clip(upper=512) / 512.0) ** 0.5
        score = (
            0.4 * len_score + 0.3 * (1.0 - punct_ratio.clip(upper=1.0)) + 0.3 * stop_ratio.clip(upper=1.0)
        )
        out = batch.append_column("punct_ratio", pa.array(punct_ratio.to_numpy(np.float64)))
        out = out.append_column("stop_ratio", pa.array(stop_ratio.to_numpy(np.float64)))
        return out.append_column("quality_score", pa.array(score.to_numpy(np.float64)))


def normalize_text(
    batch: pa.Table, text_col: str = "text", lowercase: bool = False
) -> pa.Table:
    """Boilerplate-stripping normalization (curation pre-pass): remove
    HTML-ish tags, collapse whitespace runs, trim. Pure Arrow RE2 kernels
    — the SQL oracle applies the IDENTICAL patterns via
    ``regexp_replace(..., 'g')``, so outputs match byte-for-byte."""
    t = batch.column(text_col)
    t = pc.replace_substring_regex(t, r"<[^>]*>", " ")
    t = pc.replace_substring_regex(t, r"\s+", " ")
    # trim SPACES only: after the collapse every RE2-\s boundary run is a
    # single space, and DuckDB's trim() also strips only ' ' — trimming
    # full Unicode whitespace here (e.g. \x0b, which RE2 \s excludes)
    # would silently break the byte-parity contract
    t = pc.utf8_trim(t, " ")
    if lowercase:
        t = pc.utf8_lower(t)
    i = batch.schema.get_field_index(text_col)
    return batch.set_column(i, text_col, t)


def token_counts(
    ds: "object", text_col: str = "text", k: int | None = 100
) -> "object":
    """Corpus vocabulary: global token frequencies (BPE-ish TOKEN_PATTERN,
    RE2-parity with the SQL oracle), optionally truncated to the top-k by
    ``(count DESC, token ASC)`` — a deterministic total order.

    Shape: per-batch explode+value_counts partials (vectorized pandas) →
    ONE native ``groupby(token).sum`` (no per-group UDF dispatch) → sort +
    limit. Shuffle volume is distinct-tokens × blocks, not token
    occurrences."""

    def partial(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col).to_pandas().fillna("")
        vc = text.str.findall(TOKEN_PATTERN).explode().value_counts()
        return pa.table(
            {
                "token": pa.array(vc.index.astype(str), pa.string()),
                "n": pa.array(vc.to_numpy(), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
    )
    out = out.sort(["n", "token"], descending=[True, False])
    if k is not None:
        out = out.limit(k)
    return out


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# (pattern, replacement), applied IN ORDER — email first so the phone/IP
# rules never eat digits inside an address; SSN before phone (3-2-4 vs
# 3-3-4 groups). Both pyarrow and DuckDB run RE2, so the SQL oracle
# (nested regexp_replace built from THIS list in __ray_entry__.py) is
# byte-for-byte parity, not merely equivalent.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (r"(\+\d{1,2}[ ])?\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def redact_pii(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Replace emails / SSNs / phone numbers / IPv4 addresses with typed
    placeholders — the scrubbing pass a training-data pipeline runs before
    anything leaves the raw zone. Pure Arrow RE2 kernels, zero-copy in."""
    t = batch.column(text_col)
    for pattern, replacement in PII_PATTERNS:
        t = pc.replace_substring_regex(t, pattern, replacement)
    i = batch.schema.get_field_index(text_col)
    return batch.set_column(i, text_col, t)


# ---------------------------------------------------------------------------
# Document fingerprinting (rolling hash / winnowing-lite)
# ---------------------------------------------------------------------------

_FP_WINDOW = 4
_FP_MUL = np.uint64(0x9E3779B97F4A7C15)


def _doc_fingerprint(token_hashes: np.ndarray, window: int = _FP_WINDOW) -> np.uint64:
    """XOR of rolling-window hashes over the token-hash stream. Equal docs
    → equal fingerprints; local edits only perturb nearby windows (used as
    a cheap near-dup prefilter and content address)."""
    h = token_hashes.astype(np.uint64)
    if len(h) == 0:
        return np.uint64(0)
    if len(h) < window:
        acc = np.uint64(0)
        for v in h:
            acc = np.uint64((int(acc) * int(_FP_MUL) + int(v)) % (1 << 64))
        return acc
    # rolling polynomial over each window, fully vectorized via strides
    win = np.lib.stride_tricks.sliding_window_view(h, window)
    acc = np.zeros(len(win), dtype=np.uint64)
    for j in range(window):  # window is a small constant (4)
        acc = acc * _FP_MUL + win[:, j]
    return np.bitwise_xor.reduce(acc)


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-doc rolling-hash fingerprint. Token hashing is vectorized per
    document; the outer loop is per doc (bounded by batch size)."""
    text = batch.column(text_col).to_pandas().fillna("")
    toks = text.str.lower().str.findall(r"\S+")
    fps = np.zeros(len(toks), dtype=np.uint64)
    for i, words in enumerate(toks):
        if words:
            fps[i] = _doc_fingerprint(stable_hash_array(np.asarray(words, dtype=object)))
    return batch.append_column("fingerprint", pa.array(fps.astype(np.int64), pa.int64()))


# ---------------------------------------------------------------------------
# Repetition metrics (Gopher-style quality filters)
# ---------------------------------------------------------------------------


def repetition_stats(
    batch: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    snap: int = 1_000_000,
) -> pa.Table:
    """Per-document repetition metrics for quality filtering (the
    duplicate-n-gram family popularized by the Gopher data work,
    Rae et al. 2021 — public method):

    - ``n_words``: space-delimited word count (``str_split`` parity with
      the SQL oracle — consecutive spaces yield empty tokens BOTH sides).
    - ``dup_word_frac``: fraction of words that are repeats of an earlier
      word in the same document.
    - ``dup_3gram_frac``: fraction of word 3-grams that are repeats.

    Highly repetitive machine-generated or boilerplate text scores near 1;
    normal prose sits low. Fractions are snapped to ``1/snap`` on both the
    Ray and SQL sides (CLAUDE.md float-aggregate rule). Fully vectorized:
    one Arrow split per batch, duplicate detection via a single hash-based
    ``pandas.duplicated`` over the exploded (doc, token) frame, per-doc
    counts via ``np.bincount`` — no per-row Python."""
    text = pc.coalesce(batch.column(text_col), pa.scalar("", pa.large_string()))
    lst = pc.split_pattern(text, " ")
    if isinstance(lst, pa.ChunkedArray):
        lst = lst.combine_chunks()
    flat = lst.values.to_pandas()
    lens = pc.list_value_length(lst).to_numpy().astype(np.int64)
    n = len(lens)
    idx = np.repeat(np.arange(n), lens)

    dup_w = np.bincount(
        idx[pd.DataFrame({"i": idx, "w": flat}).duplicated(["i", "w"]).to_numpy()],
        minlength=n,
    )

    w = flat.to_numpy()
    if len(w) >= 3:
        # 3-gram j is valid iff tokens j..j+2 fall in the same document
        valid = idx[:-2] == idx[2:]
        grams = (
            pd.Series(w[:-2], dtype=object)
            + " "
            + pd.Series(w[1:-1], dtype=object)
            + " "
            + pd.Series(w[2:], dtype=object)
        ).to_numpy()[valid]
        gi = idx[:-2][valid]
        dup_3 = np.bincount(
            gi[pd.DataFrame({"i": gi, "g": grams}).duplicated(["i", "g"]).to_numpy()],
            minlength=n,
        )
        n3 = np.bincount(gi, minlength=n)
    else:
        dup_3 = np.zeros(n, dtype=np.int64)
        n3 = np.zeros(n, dtype=np.int64)

    # lens >= 1 always: splitting "" yields [""]. Snap with floor(x+0.5),
    # NOT np.round: numpy rounds half-to-even while DuckDB ROUND rounds
    # half away from zero, and exact .5 ties are reachable (1e6*dup/n hits
    # .5 whenever n divides 2e6 with an odd quotient multiple, e.g. one
    # dup in 640 words). Values are non-negative, so floor(x+0.5) IS
    # half-away-from-zero here — byte parity with the SQL oracle.
    dup_word_frac = np.floor(snap * dup_w / lens + 0.5).astype(np.int64) / snap
    dup_3gram_frac = np.where(
        n3 == 0,
        0.0,
        np.floor(snap * dup_3 / np.maximum(n3, 1) + 0.5).astype(np.int64) / snap,
    )
    return pa.table(
        {
            id_col: batch.column(id_col),
            "n_words": pa.array(lens, pa.int64()),
            "dup_word_frac": pa.array(dup_word_frac, pa.float64()),
            "dup_3gram_frac": pa.array(dup_3gram_frac, pa.float64()),
        }
    )
