"""Streamed row-group partition merge: the k-way chunk merge must produce
byte-identical results to the full in-memory merge-on-read, across chunk
boundaries, schema-evolved old files, tombstones, and an in-memory extra
stream (the compaction path's epoch changes). No Ray needed."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etl_framework_ray.pipelines.cdc import (
    _write_merged_stream,
    iter_merged_partition,
    merge_partition_files,
)
from etl_framework_ray.stages.lww import lww_reduce

LAKE = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("text", pa.large_string()),
        pa.field("ts", pa.timestamp("us")),
        pa.field("_lsn", pa.int64(), nullable=False),
        pa.field("_deleted", pa.bool_(), nullable=False),
    ]
)
KEYS = ("conv_id", "turn_idx")


def _file(tmp_path, name, rows, drop_text=False):
    t = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "text": pa.array([r[2] for r in rows], pa.large_string()),
            "ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
            "_lsn": pa.array([r[4] for r in rows], pa.int64()),
            "_deleted": pa.array([r[5] for r in rows], pa.bool_()),
        }
    )
    t = lww_reduce(t, KEYS, ("ts", "_lsn"))  # engine files are LWW outputs
    if drop_text:
        t = t.drop_columns(["text"])  # pre-evolution file
    p = str(tmp_path / name)
    pq.write_table(t, p)
    return p


def _synth_partition(tmp_path):
    rng = np.random.default_rng(9)
    files = []
    lsn = 0
    for e in range(4):  # 4 "epochs" of deltas over overlapping keys
        rows = []
        for _ in range(600):
            c = f"conv-{rng.integers(0, 12):04d}"
            t = int(rng.integers(0, 40))
            lsn += 1
            rows.append((c, t, f"v{lsn}", lsn * 1000, lsn, bool(rng.random() < 0.05)))
        files.append(
            _file(tmp_path, f"base-00000-{e:012d}.parquet" if e == 0 else f"delta-00000-{e:012d}.parquet", rows, drop_text=(e == 0))
        )
    return files


def test_streamed_equals_full_merge(tmp_path):
    files = _synth_partition(tmp_path)
    full = merge_partition_files(files, LAKE, KEYS)
    for chunk_rows in (7, 64, 100000):  # force many/one chunk(s)
        chunks = list(iter_merged_partition(files, LAKE, KEYS, chunk_rows=chunk_rows))
        streamed = pa.concat_tables(chunks)
        assert streamed.equals(full), f"chunk_rows={chunk_rows}"
        # key-complete chunks: strictly increasing keys across the stream
        keys = list(zip(streamed.column("conv_id").to_pylist(), streamed.column("turn_idx").to_pylist()))
        assert keys == sorted(keys) and len(set(keys)) == len(keys)


def test_streamed_with_extra_changes(tmp_path):
    files = _synth_partition(tmp_path)
    extra_rows = [("conv-0002", t, f"new{t}", 10_000_000, 100_000 + t, False) for t in range(50)]
    extra = pa.table(
        {
            "conv_id": pa.array([r[0] for r in extra_rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in extra_rows], pa.int32()),
            "text": pa.array([r[2] for r in extra_rows], pa.large_string()),
            "ts": pa.array([r[3] for r in extra_rows], pa.timestamp("us")),
            "_lsn": pa.array([r[4] for r in extra_rows], pa.int64()),
            "_deleted": pa.array([r[5] for r in extra_rows], pa.bool_()),
        }
    )
    from etl_framework_ray.state.schema import normalize_table

    extra = normalize_table(lww_reduce(extra, KEYS, ("ts", "_lsn")), LAKE)
    full = lww_reduce(
        pa.concat_tables([merge_partition_files(files, LAKE, KEYS), extra]), KEYS, ("ts", "_lsn")
    )
    streamed = pa.concat_tables(
        iter_merged_partition(files, LAKE, KEYS, extra_sorted=extra, chunk_rows=64)
    )
    assert streamed.equals(full)
    # every new-change key won the merge
    by_key = {
        (c, t): x
        for c, t, x in zip(
            streamed.column("conv_id").to_pylist(),
            streamed.column("turn_idx").to_pylist(),
            streamed.column("text").to_pylist(),
        )
    }
    for t in range(50):
        assert by_key[("conv-0002", t)] == f"new{t}"


def test_write_merged_stream_file_and_ttl(tmp_path):
    files = _synth_partition(tmp_path)
    out = str(tmp_path / "folded.parquet")
    rows, tomb, zstats = _write_merged_stream(out, files, LAKE, KEYS)
    folded = pq.read_table(out)
    assert folded.equals(merge_partition_files(files, LAKE, KEYS))
    assert rows == folded.num_rows
    assert tomb == folded.column("_deleted").to_pandas().sum()
    # zone stats accumulated over the streamed chunks describe the file
    import pyarrow.compute as pc

    mm = pc.min_max(folded.column("turn_idx"))
    assert zstats["turn_idx"]["min"] == float(mm["min"].as_py())
    assert zstats["turn_idx"]["max"] == float(mm["max"].as_py())
    assert zstats["turn_idx"]["rows"] == folded.num_rows
    # TTL drops old tombstones chunk-locally, identically to the full path
    out2 = str(tmp_path / "folded_ttl.parquet")
    rows2, tomb2, _ = _write_merged_stream(out2, files, LAKE, KEYS, epoch_id=3000, ttl=500)
    folded2 = pq.read_table(out2)
    assert rows2 < rows and tomb2 < tomb
    import pyarrow.compute as pc

    expired = pc.and_(folded.column("_deleted"), pc.less(folded.column("_lsn"), 3000 - 500))
    assert folded2.equals(folded.filter(pc.invert(expired)))


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(
    n_files=st.integers(1, 5),
    rows_per_file=st.integers(1, 120),
    n_convs=st.integers(1, 10),
    max_turn=st.integers(1, 25),
    chunk_rows=st.sampled_from([3, 17, 1000]),
    seed=st.integers(0, 10_000),
)
def test_streamed_merge_property(tmp_path_factory, n_files, rows_per_file, n_convs, max_turn, chunk_rows, seed):
    """For ANY stack of LWW-reduced files, the streamed k-way merge equals
    the full in-memory merge (same rows, same order)."""
    tmp = tmp_path_factory.mktemp("prop")
    rng = np.random.default_rng(seed)
    files = []
    lsn = 0
    for fi in range(n_files):
        rows = []
        for _ in range(rows_per_file):
            lsn += 1
            rows.append(
                (
                    f"c{rng.integers(0, n_convs):03d}",
                    int(rng.integers(0, max_turn)),
                    f"v{lsn}",
                    int(lsn * 1000),
                    lsn,
                    bool(rng.random() < 0.1),
                )
            )
        files.append(_file(tmp, f"delta-00000-{fi:012d}.parquet", rows))
    full = merge_partition_files(files, LAKE, KEYS)
    streamed = pa.concat_tables(
        iter_merged_partition(files, LAKE, KEYS, chunk_rows=chunk_rows)
    )
    assert streamed.equals(full)


def _multi_group_partition(tmp_path):
    """One PK-sorted base with many small row groups + one delta, so
    footer stats give tight per-group key ranges."""
    rows = []
    lsn = 0
    for c in range(40):
        for t in range(10):
            lsn += 1
            rows.append((f"conv-{c:04d}", t, f"v{lsn}", lsn * 1000, lsn, False))
    base = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "text": pa.array([r[2] for r in rows], pa.large_string()),
            "ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
            "_lsn": pa.array([r[4] for r in rows], pa.int64()),
            "_deleted": pa.array([False] * len(rows), pa.bool_()),
        }
    )
    bp = str(tmp_path / "base-00000-000000000400.parquet")
    pq.write_table(base, bp, row_group_size=50)  # 8 groups, 5 convs each
    # a delta updating one conv (sorted, LWW-reduced by construction)
    drows = [(f"conv-0007", t, f"new{t}", 10_000_000 + t, 500 + t, False) for t in range(10)]
    dp = _file(tmp_path, "delta-00000-000000000500.parquet", drows)
    return [bp, dp]


def test_row_group_pushdown_streamed(tmp_path):
    """PK conjuncts skip row groups inside the PK-sorted base; the
    surviving rows for matching keys are identical to a full merge."""
    files = _multi_group_partition(tmp_path)
    cj = [("conv_id", "==", "conv-0007")]
    full = merge_partition_files(files, LAKE, KEYS)
    import pyarrow.compute as pc

    exact = full.filter(pc.equal(full.column("conv_id"), "conv-0007"))
    pushed = pa.concat_tables(list(iter_merged_partition(files, LAKE, KEYS, conjuncts=cj)))
    # pushdown decoded FAR fewer rows than the table holds...
    assert pushed.num_rows < full.num_rows // 4
    # ...but every row of the matching key survives, LWW-correct (delta wins)
    got = pushed.filter(pc.equal(pushed.column("conv_id"), "conv-0007"))
    assert got.equals(exact)
    assert set(got.column("text").to_pylist()) == {f"new{t}" for t in range(10)}

    # full-merge path honors the same conjuncts
    pushed2 = merge_partition_files(files, LAKE, KEYS, conjuncts=cj)
    got2 = pushed2.filter(pc.equal(pushed2.column("conv_id"), "conv-0007"))
    assert got2.equals(exact)
    assert pushed2.num_rows < full.num_rows // 4

    # a conjunct matching nothing yields nothing from the streamed path
    none = list(iter_merged_partition(files, LAKE, KEYS, conjuncts=[("conv_id", "==", "zz")]))
    assert sum(t.num_rows for t in none) == 0

    # range conjunct: correct superset semantics (residual filtering is
    # the caller's job), full coverage of the matching range
    rng_cj = [("conv_id", ">=", "conv-0030")]
    pushed3 = pa.concat_tables(list(iter_merged_partition(files, LAKE, KEYS, conjuncts=rng_cj)))
    exact3 = full.filter(pc.greater_equal(full.column("conv_id"), "conv-0030"))
    got3 = pushed3.filter(pc.greater_equal(pushed3.column("conv_id"), "conv-0030"))
    assert got3.equals(exact3)
