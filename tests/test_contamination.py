"""Benchmark decontamination: shingle hashing, filtering, DuckDB parity."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from etl_framework_ray.stages.contamination import (
    _shingle_hashes,
    decontaminate,
    shingle_hash_set,
)

SF = "/root/testdata/sf0.001"

WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def _doc(*idx):
    return " ".join(WORDS[i % len(WORDS)] for i in idx)


def test_shingle_hashes_windows_and_boundaries():
    texts = pd.Series(
        [
            " ".join(WORDS),  # 10 tokens -> 3 windows of 8
            "short doc only",  # < 8 tokens -> none
            None,  # null -> none
            " ".join(WORDS),  # duplicate of row 0
        ]
    )
    doc_idx, hashes = _shingle_hashes(texts, n=8)
    assert list(doc_idx) == [0, 0, 0, 3, 3, 3]
    # identical docs yield identical window hashes; shifted windows differ
    assert list(hashes[:3]) == list(hashes[3:])
    assert len(set(hashes[:3])) == 3
    # no window may straddle a document boundary: a fabricated pair whose
    # concatenated token stream contains the probe 8-gram must NOT hit
    left = " ".join(WORDS[:4])
    right = " ".join(WORDS[4:8])
    probe = shingle_hash_set([" ".join(WORDS[:8])], n=8)
    _, straddle = _shingle_hashes(pd.Series([left, right]), n=8)
    assert not np.isin(straddle, probe).any()


def test_shingle_hash_set_tokenization_matches_duckdb_rule():
    # lower + [a-z0-9]+ is the contract the SQL oracle replays
    a = shingle_hash_set(["Alpha, BETA; gamma! delta? epsilon zeta eta theta"], n=8)
    b = shingle_hash_set(["alpha beta gamma delta epsilon zeta eta theta"], n=8)
    assert list(a) == list(b) and len(a) == 1


@pytest.mark.usefixtures("ray_session")
def test_decontaminate_drops_overlapping_docs():
    import ray.data

    bench = [_doc(*range(8))]  # the contaminating 8-gram
    corpus = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(
                [
                    "intro words then " + _doc(*range(8)) + " trailing",  # contaminated
                    _doc(*range(1, 9)),  # shifted window -> clean
                    "entirely different text with many other words here now",
                ]
            ),
        }
    )
    out = decontaminate(ray.data.from_arrow(corpus), bench, n=8).to_pandas()
    assert sorted(out.doc_id) == [1, 2]


@pytest.mark.usefixtures("ray_session")
def test_decontaminate_matches_duckdb_on_corpus():
    import ray.data

    import pyarrow.parquet as pq

    path = f"{SF}/documents.parquet"
    bt = pq.read_table(path, columns=["doc_id", "text"])
    bench = bt.filter(pa.array(bt.column("doc_id").to_numpy() % 20 == 0)).column("text")

    def non_bench(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.array(batch.column("doc_id").to_numpy() % 20 != 0))

    corpus = ray.data.read_parquet(path, columns=["doc_id", "text"]).map_batches(
        non_bench, batch_format="pyarrow"
    )
    got = sorted(decontaminate(corpus, bench, n=8).to_pandas().doc_id)

    con = duckdb.connect()
    exp = [
        r[0]
        for r in con.sql(
            f"""
            WITH toks AS (
                SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
                FROM read_parquet('{path}')
            ), sh AS (
                SELECT doc_id, array_to_string(t[i : i + 7], ' ') AS shingle
                FROM toks, UNNEST(range(1, len(t) - 6)) AS u(i)
            ), bench AS (
                SELECT DISTINCT shingle FROM sh WHERE doc_id % 20 = 0
            ), hit AS (
                SELECT DISTINCT s.doc_id FROM sh s JOIN bench b USING (shingle)
                WHERE s.doc_id % 20 <> 0
            )
            SELECT doc_id FROM read_parquet('{path}')
            WHERE doc_id % 20 <> 0 AND doc_id NOT IN (SELECT doc_id FROM hit)
            ORDER BY doc_id"""
        ).fetchall()
    ]
    assert got == exp
    assert len(got) < len(bt) - len(bench)  # the corpus has real dup overlap
