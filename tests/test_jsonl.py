"""JSONL source/sink: round-trip, bronze ingest with frozen schema."""

import json
import os

import pyarrow as pa
import pytest

from etl_framework_ray.sources.jsonl import ingest_jsonl_directory, read_jsonl, write_jsonl


def _write_jsonl_file(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


@pytest.mark.usefixtures("ray_session")
def test_jsonl_roundtrip(tmp_path):
    import ray.data

    rows = [{"doc_id": i, "text": f"doc {i}", "score": i / 10} for i in range(200)]
    src = str(tmp_path / "docs.jsonl")
    _write_jsonl_file(src, rows)

    ds = read_jsonl(src, columns=["doc_id", "text"])
    got = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(got.columns) == ["doc_id", "text"]
    assert len(got) == 200 and got.text[5] == "doc 5"

    out = str(tmp_path / "export")
    n = write_jsonl(ray.data.from_items(rows), out)
    assert n == 200
    back = read_jsonl(out).to_pandas()
    assert len(back) == 200
    assert sorted(back.doc_id) == list(range(200))


@pytest.mark.usefixtures("ray_session")
def test_jsonl_bronze_ingest(tmp_path):
    from etl_framework_ray.pipelines.cdc import CDCEngine

    d = tmp_path / "raw"
    d.mkdir()
    _write_jsonl_file(str(d / "notes.jsonl"), [{"k": i, "note": f"n{i}"} for i in range(50)])
    specs = ingest_jsonl_directory(str(d), str(tmp_path / "lake"))
    assert set(specs) == {"notes"}
    assert specs["notes"].column("note").nullable
    eng = CDCEngine(str(tmp_path / "lake" / "notes"), spec=specs["notes"], create_if_missing=False)
    assert eng.snapshot_arrow().num_rows == 50
