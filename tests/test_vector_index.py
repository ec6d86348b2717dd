"""Incrementally-maintained vector (similarity-search) index
(IncrementalVectorIndex): advance ≡ rebuild, exact tier ≡ brute force
over the assembled corpus, LSH multiprobe finds planted near-duplicates,
and the kernel-fingerprint guard refuses mismatched configs."""

import datetime

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from etl_framework_ray.pipelines.cdc import CDCEngine
from etl_framework_ray.pipelines.incremental import IncrementalVectorIndex
from etl_framework_ray.sources.changelog import ChangeLog
from etl_framework_ray.sources.generator import (
    CHANGELOG_SCHEMA,
    GenConfig,
    generate_changelog,
)
from etl_framework_ray.stages.similarity import hash_embed


def _setup(tmp_path, **gen_kw):
    cfg = GenConfig(
        num_events=gen_kw.pop("num_events", 4000),
        num_conversations=gen_kw.pop("num_conversations", 60),
        seed=gen_kw.pop("seed", 31),
        delete_frac=gen_kw.pop("delete_frac", 0.05),
        **gen_kw,
    )
    log = generate_changelog(cfg)
    clog = ChangeLog(str(tmp_path / "log"))
    clog.write_segments(log, segment_rows=800)
    eng = CDCEngine(str(tmp_path / "tbl"), num_partitions=8, compact_every=100)
    return clog, eng


def _assembled(eng) -> pd.DataFrame:
    """Driver-side reference assembly: role-tagged dialogue per conv
    (the CorpusKernel / assemble_conversations rendering)."""
    snap = eng.snapshot_arrow().to_pandas()
    snap["line"] = snap["role"].fillna("") + ": " + snap["text"].fillna("")
    snap = snap.sort_values(["conv_id", "turn_idx"])
    return (
        snap.groupby("conv_id", sort=True)["line"]
        .apply(lambda s: "\n".join(s))
        .rename("dialogue")
        .reset_index()
    )


def _brute_topk(docs: pd.DataFrame, query: str, k: int, dim: int, seed: int):
    V = hash_embed(docs["dialogue"], dim, seed)
    q = hash_embed([query], dim, seed)[0]
    s = (
        np.round((V.astype(np.float64) @ q.astype(np.float64)) * 1e6).astype(np.int64)
        / 1e6
    )
    order = sorted(range(len(s)), key=lambda i: (-s[i], docs["conv_id"].iloc[i]))[:k]
    return [(docs["conv_id"].iloc[i], s[i]) for i in order]


@pytest.mark.usefixtures("ray_session")
def test_vector_index_advance_equals_rebuild_and_brute_force(tmp_path):
    clog, eng = _setup(tmp_path)
    epochs = clog.epochs(1)
    for ep in epochs[:3]:
        eng.apply_epoch(ep)
    view = IncrementalVectorIndex(eng, str(tmp_path / "view"), dim=32, planes=8)
    s1 = view.advance()
    assert s1["touched_convs"] == -1  # bootstrap

    for ep in epochs[3:]:
        eng.apply_epoch(ep)
    s2 = view.advance()
    assert s2["touched_convs"] > 0

    # advance ≡ rebuild, bit for bit (deterministic embedding, no state)
    incr = view.read_arrow().to_pandas().sort_values("conv_id").reset_index(drop=True)
    view2 = IncrementalVectorIndex(eng, str(tmp_path / "view2"), dim=32, planes=8)
    view2.rebuild()
    full = view2.read_arrow().to_pandas().sort_values("conv_id").reset_index(drop=True)
    assert incr["conv_id"].tolist() == full["conv_id"].tolist()
    assert incr["bucket"].tolist() == full["bucket"].tolist()
    assert all(np.array_equal(a, b) for a, b in zip(incr["vec"], full["vec"]))

    # exact tier (radius=None) ≡ driver brute force over the assembly
    docs = _assembled(eng)
    assert sorted(docs["conv_id"]) == sorted(incr["conv_id"])
    query = docs["dialogue"].iloc[7]
    got = view.search([query], k=5, radius=None)
    want = _brute_topk(docs, query, 5, 32, 7)
    assert [
        (r["conv_id"], r["score"]) for r in got.to_pylist()
    ] == want
    assert got.column("rank").to_pylist() == [1, 2, 3, 4, 5]


@pytest.mark.usefixtures("ray_session")
def test_vector_index_lifecycle_and_lsh_probe(tmp_path):
    """A planted near-duplicate conversation is the LSH multiprobe's top
    hit; deleting it removes it from the index on the next advance."""
    clog = ChangeLog(str(tmp_path / "log"))
    eng = CDCEngine(str(tmp_path / "tbl"), num_partitions=4, compact_every=1_000_000)
    ts0 = datetime.datetime(2025, 1, 1)
    lsn = 0

    def append(rows):
        nonlocal lsn
        full = [
            {
                "lsn": (lsn := lsn + 1),
                "ts": ts0 + datetime.timedelta(seconds=lsn),
                "role": None,
                "text": None,
                "tool": None,
                **r,
            }
            for r in rows
        ]
        clog.write_segments(
            pa.Table.from_pylist(full, schema=CHANGELOG_SCHEMA), segment_rows=len(full)
        )
        eng.replay(clog, segments_per_epoch=100)

    rng = np.random.default_rng(5)
    vocab = [f"tok{i}" for i in range(300)]
    rows = []
    for c in range(30):
        text = " ".join(rng.choice(vocab, size=60))
        rows += [
            {"op": "U", "conv_id": f"conv-{c:03d}", "turn_idx": t, "role": "user", "text": text}
            for t in range(2)
        ]
    target_text = " ".join(rng.choice(vocab, size=60))
    rows += [
        {"op": "U", "conv_id": "conv-target", "turn_idx": t, "role": "user", "text": target_text}
        for t in range(2)
    ]
    append(rows)

    view = IncrementalVectorIndex(eng, str(tmp_path / "view"), dim=64, planes=10)
    view.advance()

    probe = "user: " + target_text  # near the assembled rendering
    hits = view.search([probe], k=3, radius=1)
    assert hits.num_rows >= 1
    assert hits.to_pylist()[0]["conv_id"] == "conv-target"
    assert hits.to_pylist()[0]["score"] > 0.9

    # delete the target → next advance drops it from the index
    append([{"op": "D", "conv_id": "conv-target", "turn_idx": t} for t in range(2)])
    view.advance()
    assert "conv-target" not in view.read_arrow().column("conv_id").to_pylist()
    hits = view.search([probe], k=3, radius=None)
    assert all(r["conv_id"] != "conv-target" for r in hits.to_pylist())


@pytest.mark.usefixtures("ray_session")
def test_vector_index_fingerprint_guard(tmp_path):
    clog, eng = _setup(tmp_path, num_events=600, num_conversations=10)
    eng.replay(clog)
    view = IncrementalVectorIndex(eng, str(tmp_path / "view"), dim=32, planes=8)
    view.advance()
    other = IncrementalVectorIndex(eng, str(tmp_path / "view"), dim=16, planes=8)
    with pytest.raises(RuntimeError, match="kernel"):
        other.advance()
