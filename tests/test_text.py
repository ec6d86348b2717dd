"""Text analysis tests: stats vs DuckDB, langid accuracy, fingerprints."""

import duckdb
import pyarrow as pa
import pytest

from etl_framework_ray.functions.text import (
    LangId,
    QualityScorer,
    TOKEN_PATTERN,
    fingerprint_batch,
    text_stats,
)

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_text_stats_match_duckdb():
    import ray.data

    ds = ray.data.read_parquet(f"{SF}/documents.parquet")
    got = (
        ds.map_batches(text_stats, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = con.sql(
        f"""SELECT doc_id, length(text) AS n_chars_actual,
              length(regexp_extract_all(text, '\\S+')) AS n_tokens,
              length(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS n_bpe_tokens,
              length(regexp_extract_all(text, '[A-Za-z]')) AS n_alpha
            FROM read_parquet('{SF}/documents.parquet') ORDER BY doc_id"""
    ).df()
    for c in ["n_chars_actual", "n_tokens", "n_bpe_tokens", "n_alpha"]:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c


@pytest.mark.usefixtures("ray_session")
def test_langid_accuracy_on_labeled_docs():
    import ray.data

    # testdata "lang" labels are synthetic (all text is English word-soup),
    # so accuracy is asserted on real sample sentences instead
    samples = {
        "en": "the cat sat on the mat and it is a fine day for a walk in the park",
        "es": "el perro corre por la calle y una mujer mira los coches con un niño",
        "de": "der Hund läuft und die Katze ist nicht mit einem Ball zu sehen",
        "fr": "le chien est dans la maison et les enfants jouent dans une rue pour le plaisir",
        "zh": "今天的天气很好我们一起去公园散步这是一个不错的主意",
    }
    import pyarrow as pa

    batch = pa.table(
        {"doc_id": pa.array(range(len(samples))), "text": pa.array(list(samples.values()))}
    )
    ds = ray.data.from_arrow(batch)
    out = ds.map_batches(LangId, batch_format="pyarrow", concurrency=2).to_pandas()
    assert list(out.lang_pred) == list(samples.keys())
    # and the word-soup corpus classifies overwhelmingly as English
    docs = ray.data.read_parquet(f"{SF}/documents.parquet")
    soup = docs.map_batches(LangId, batch_format="pyarrow", concurrency=2).to_pandas()
    assert (soup.lang_pred == "en").mean() > 0.9


@pytest.mark.usefixtures("ray_session")
def test_quality_scorer_ranges():
    import ray.data

    ds = ray.data.read_parquet(f"{SF}/documents.parquet")
    out = ds.map_batches(QualityScorer, batch_format="pyarrow", concurrency=2).to_pandas()
    assert out.quality_score.between(0, 1).all()
    assert out.punct_ratio.between(0, 1).all()
    # an empty-ish doc scores lower than a long clean doc
    t = pa.table({"doc_id": pa.array([1, 2]), "text": pa.array(["x.", "the quick brown fox is in the field and it is fine " * 20])})
    s = QualityScorer()(t).to_pylist()
    assert s[1]["quality_score"] > s[0]["quality_score"]


def test_fingerprint_properties():
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3]),
            "text": pa.array(
                [
                    "alpha beta gamma delta epsilon zeta",
                    "alpha beta gamma delta epsilon zeta",  # identical
                    "alpha beta gamma delta epsilon eta",  # one-token edit
                    "",
                ]
            ),
        }
    )
    out = fingerprint_batch(t).to_pylist()
    assert out[0]["fingerprint"] == out[1]["fingerprint"]  # equal docs equal fp
    assert out[0]["fingerprint"] != out[2]["fingerprint"]
    assert out[3]["fingerprint"] == 0


@pytest.mark.usefixtures("ray_session")
def test_token_counts_vocabulary(tmp_path):
    import pyarrow.parquet as pq
    import ray.data

    from etl_framework_ray.functions.text import token_counts

    t = pa.table({"text": pa.array(["a b b c! c c", "c a-b", None], pa.string())})
    d = tmp_path / "docs.parquet"
    pq.write_table(t, str(d))
    out = token_counts(ray.data.read_parquet(str(d)), k=3).to_pandas()
    # c:4  b:3  a:2  (- and ! are single-punct tokens, below the cut)
    assert list(out.token) == ["c", "b", "a"]
    assert list(out.n) == [4, 3, 2]
    # k=None returns the whole vocabulary
    full = token_counts(ray.data.read_parquet(str(d)), k=None).to_pandas()
    assert set(full.token) == {"a", "b", "c", "!", "-"}


def test_redact_pii_typed_placeholders():
    from etl_framework_ray.functions.text import redact_pii

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array(
                [
                    "mail me at jane.doe+x@sub.example.org today",
                    "ssn 123-45-6789 on file",
                    "call +1 555-123-4567 or (212) 555-0100",
                    "host 192.168.1.250 is up",
                    "clean text, no pii at all",
                ],
                pa.string(),
            ),
        }
    )
    out = redact_pii(t).column("text").to_pylist()
    assert out == [
        "mail me at <EMAIL> today",
        "ssn <SSN> on file",
        "call <PHONE> or <PHONE>",
        "host <IP> is up",
        "clean text, no pii at all",
    ]


def test_redact_pii_duckdb_byte_parity():
    # both engines run RE2 — nesting regexp_replace in PII_PATTERNS order
    # must be byte-identical (this is what the driver oracle relies on)
    from etl_framework_ray.functions.text import PII_PATTERNS, redact_pii

    texts = [
        "a@b.io then 123-45-6789 then +12 555-123-4567 then 10.0.0.7 done",
        "overlap 999-99-9999x (not ssn: no right boundary? yes it is)x",
        "edge .5.6.7.8. and user@@double.at and 555 123 4567 spaced",
    ]
    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()), "text": pa.array(texts)})
    got = redact_pii(t).column("text").to_pylist()
    expr = "text"
    for pat, rep in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{rep}', 'g')"
    con = duckdb.connect()
    con.register("docs", t)
    exp = [r[0] for r in con.sql(f"SELECT {expr} FROM docs ORDER BY doc_id").fetchall()]
    assert got == exp


def test_normalize_text_strips_tags_and_whitespace():
    from etl_framework_ray.functions.text import normalize_text

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                ["<p>Hello   <b>World</b></p>", "  spaced\t\nout  ", "plain"],
                pa.string(),
            ),
        }
    )
    out = normalize_text(t).column("text").to_pylist()
    assert out == ["Hello World", "spaced out", "plain"]
    low = normalize_text(t, lowercase=True).column("text").to_pylist()
    assert low[0] == "hello world"


def test_repetition_stats_matches_duckdb_and_flags_repeats():
    """Gopher-style dup-word / dup-3gram fractions: byte parity with the
    DuckDB list-kernel oracle, and a hand-built repetitive doc scores
    high while a distinct doc scores 0."""
    import duckdb

    from etl_framework_ray.functions.text import repetition_stats

    texts = [
        "a b c d e f g h",                 # all distinct → 0, 0
        "spam spam spam spam spam spam",   # one word repeated
        "x y z x y z x y z x y z",         # repeated 3-grams
        "",                                # empty → 1 token ([''])
        "one two  three",                  # double space → empty token
        # exact snapping tie: 1 dup in 640 words → 1e6/640 = 1562.5;
        # numpy half-to-even says 1562, DuckDB ROUND says 1563 — the
        # engine must match DuckDB (floor(x+0.5))
        " ".join([f"w{i}" for i in range(639)] + ["w0"]),
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)})
    out = repetition_stats(t).to_pandas().sort_values("doc_id").reset_index(drop=True)

    con = duckdb.connect()
    con.register("documents", t)
    exp = con.execute("""
        WITH w AS (
            SELECT doc_id, str_split(COALESCE(text, ''), ' ') AS ws FROM documents
        ), g AS (
            SELECT doc_id, ws,
                   CASE WHEN len(ws) >= 3 THEN
                       list_transform(generate_series(1, len(ws) - 2),
                           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
                   ELSE [] END AS gs
            FROM w
        )
        SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,
               CAST(ROUND(1000000.0 * (len(ws) - len(list_distinct(ws))) / len(ws))
                    AS BIGINT) / 1000000.0 AS dup_word_frac,
               CASE WHEN len(gs) = 0 THEN 0.0 ELSE
                   CAST(ROUND(1000000.0 * (len(gs) - len(list_distinct(gs))) / len(gs))
                        AS BIGINT) / 1000000.0 END AS dup_3gram_frac
        FROM g ORDER BY doc_id
    """).df()
    import pandas as pd

    pd.testing.assert_frame_equal(out, exp, check_dtype=False)
    assert out.loc[0, "dup_word_frac"] == 0.0 and out.loc[0, "dup_3gram_frac"] == 0.0
    assert out.loc[1, "dup_word_frac"] > 0.8
    assert out.loc[2, "dup_3gram_frac"] > 0.5
    assert out.loc[3, "n_words"] == 1
    assert out.loc[5, "dup_word_frac"] == 0.001563  # half-away-from-zero tie


def test_repetition_stats_chunked_input():
    """A multi-chunk Arrow column (as Ray blocks concatenated from several
    files produce) computes identically to the single-chunk form."""
    from etl_framework_ray.functions.text import repetition_stats

    texts1 = ["a b a", "x y z"]
    texts2 = ["q q q q", "m n"]
    chunked = pa.table(
        {
            "doc_id": pa.chunked_array([pa.array([0, 1], pa.int64()), pa.array([2, 3], pa.int64())]),
            "text": pa.chunked_array([pa.array(texts1), pa.array(texts2)]),
        }
    )
    flat = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(texts1 + texts2),
        }
    )
    assert repetition_stats(chunked).to_pydict() == repetition_stats(flat).to_pydict()
