"""Lifecycle composition test: every round-2 feature interacting in one
table history — residual hot-key skew (auto salt + migrate), schema
evolution mid-stream, aggressive compaction with changefeed retention,
deletes/tombstones, restart/resume, writer deletes — and the committed
state still equals the oracle at every checkpoint."""

import pyarrow as pa
import pytest

from etl_framework_ray.pipelines.cdc import CDCEngine
from etl_framework_ray.sources.changelog import ChangeLog
from etl_framework_ray.sources.generator import GenConfig, generate_changelog, oracle_replay


def _cfg(n, start, seed):
    return GenConfig(
        num_events=n,
        num_conversations=40,
        max_turns=8,
        hot_key_frac=0.35,
        hot_max_turns=2_000,  # residual skew (many distinct keys, one conv)
        delete_frac=0.04,
        out_of_order=True,
        seed=seed,
        lsn_start=start,
    )


@pytest.mark.usefixtures("ray_session")
def test_full_lifecycle_composition(tmp_path):
    def engine():
        return CDCEngine(
            str(tmp_path / "tbl"),
            num_partitions=8,
            compact_every=2,  # aggressive folding
            changefeed_retention_lsn=50_000,
            tombstone_ttl_lsn=50_000,
        )

    clog = ChangeLog(str(tmp_path / "log"))

    # phase 1: skewed feed, auto mitigation kicks in
    log1 = generate_changelog(_cfg(8_000, 1, 1))
    clog.write_segments(log1, segment_rows=1_000)
    eng = engine()
    eng.replay(clog, segments_per_epoch=2, auto_mitigate_skew=True)
    assert eng.salt_map  # the hot conversation got salted + migrated
    watermark = eng.manifest.applied_lsn
    state_mid = {
        (r["conv_id"], r["turn_idx"]): r for r in eng.snapshot_arrow().to_pylist()
    }
    version_mid = eng.manifest.version

    # phase 2: schema evolution mid-stream (new column appears) + restart
    log2 = generate_changelog(_cfg(8_000, 8_001, 2))
    log2 = log2.append_column("priority", pa.array([1] * log2.num_rows, pa.int32()))
    clog.write_segments(log2, segment_rows=1_000)
    eng2 = engine()  # restart: salt map + watermark resume from manifest
    assert eng2.salt_map == eng.salt_map
    # vacuum=False: keep phase-1's superseded files so time travel to the
    # phase-1 checkpoint stays valid (vacuum ends time travel by design)
    stats = eng2.replay(clog, segments_per_epoch=2, auto_mitigate_skew=True, vacuum=False)
    assert any("add priority" in c for c in stats.schema_changes)

    # oracle equivalence over the FULL history (old rows: priority null)
    full = pa.concat_tables(
        [
            log1.append_column("priority", pa.nulls(log1.num_rows, pa.int32())),
            log2,
        ]
    )
    oracle = oracle_replay(full)
    got = eng2.snapshot_arrow().to_pylist()
    assert len(got) == len(oracle)
    for r in got[:3000]:
        exp = oracle[(r["conv_id"], r["turn_idx"])]
        assert r["text"] == exp["text"]

    # changefeed across two compaction cycles + a salt migration still
    # reconstructs the state delta (retention path)
    changes = eng2.read_changes(since_lsn=watermark)
    replayed = dict(state_mid)
    for r in changes.to_pylist():
        k = (r["conv_id"], r["turn_idx"])
        if r["_deleted"]:
            replayed.pop(k, None)
        else:
            replayed[k] = r
    assert len(replayed) == len(oracle)

    # time travel to the phase-1 checkpoint still works (no vacuum yet)
    assert eng2.snapshot_arrow(version=version_mid).num_rows == len(state_mid)

    # writer-path delete composes with the CDC history
    from etl_framework_ray.pipelines.writer import LakeWriter

    victim = next(iter(state_mid))
    w = LakeWriter.from_engine(eng2)  # writer surface over the SAME table
    import ray.data

    w.delete(
        ray.data.from_arrow(
            pa.table(
                {
                    "conv_id": pa.array([victim[0]], pa.string()),
                    "turn_idx": pa.array([victim[1]], pa.int32()),
                }
            )
        )
    )
    after = {(r["conv_id"], r["turn_idx"]) for r in eng2.snapshot_arrow().to_pylist()}
    assert victim not in after
    assert len(after) == len(oracle) - (1 if victim in {(k[0], k[1]) for k in oracle} else 0)


def test_cli_assemble_exports_sft_corpus(tmp_path, ray_session):
    """`assemble` CLI: replayed lake → one role-tagged document per
    conversation, parquet and jsonl forms both readable and equal."""
    import json as _json

    import pyarrow.parquet as pq

    from etl_framework_ray.__main__ import main as cli_main
    from etl_framework_ray.pipelines.cdc import CDCEngine
    from etl_framework_ray.sources.changelog import ChangeLog
    from etl_framework_ray.sources.generator import GenConfig, generate_changelog

    log = generate_changelog(GenConfig(num_events=2000, num_conversations=40, seed=9))
    clog = ChangeLog(str(tmp_path / "log"))
    clog.write_segments(log, segment_rows=500)
    eng = CDCEngine(str(tmp_path / "tbl"), num_partitions=4)
    eng.replay(clog)

    out_pq = str(tmp_path / "corpus_pq")
    assert cli_main(["assemble", "--table", str(tmp_path / "tbl"), "--out", out_pq]) == 0
    import glob as _glob

    files = _glob.glob(out_pq + "/*.parquet")
    assert files
    t = pq.read_table(out_pq)
    assert set(t.column_names) == {"conv_id", "n_turns", "dialogue"}
    assert t.num_rows == 40

    out_jl = str(tmp_path / "corpus_jl")
    assert (
        cli_main(
            ["assemble", "--table", str(tmp_path / "tbl"), "--out", out_jl, "--format", "jsonl"]
        )
        == 0
    )
    rows = []
    for f in sorted(_glob.glob(out_jl + "/*.json")):
        with open(f) as fh:
            rows += [_json.loads(line) for line in fh if line.strip()]
    assert len(rows) == 40
    jd = {r["conv_id"]: r["dialogue"] for r in rows}
    pd_ = {c: d for c, d in zip(t.column("conv_id").to_pylist(), t.column("dialogue").to_pylist())}
    assert jd == pd_

    # re-running into the non-empty dir must refuse (part filenames are
    # unique per run — stale files would duplicate conversations) ...
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        cli_main(["assemble", "--table", str(tmp_path / "tbl"), "--out", out_pq])
    # ... and --overwrite replaces, never accumulates
    assert (
        cli_main(
            ["assemble", "--table", str(tmp_path / "tbl"), "--out", out_pq, "--overwrite"]
        )
        == 0
    )
    assert pq.read_table(out_pq).num_rows == 40


def test_cli_ivm_curation_thresholds(tmp_path, ray_session):
    """`ivm --kind curation --min-turns/--min-chars`: the thresholds are
    part of the kernel fingerprint, so a CLI advance with the same flags
    succeeds and a mismatched config refuses (rebuild re-keys)."""
    import pytest as _pytest

    from etl_framework_ray.__main__ import main as cli_main
    from etl_framework_ray.pipelines.cdc import CDCEngine
    from etl_framework_ray.sources.changelog import ChangeLog
    from etl_framework_ray.sources.generator import GenConfig, generate_changelog

    log = generate_changelog(GenConfig(num_events=1500, num_conversations=30, seed=13))
    clog = ChangeLog(str(tmp_path / "log"))
    clog.write_segments(log, segment_rows=500)
    eng = CDCEngine(str(tmp_path / "tbl"), num_partitions=4, compact_every=1_000_000)
    eng.replay(clog)

    view = str(tmp_path / "view")
    args = ["ivm", "--kind", "curation", "--table", str(tmp_path / "tbl"),
            "--view", view, "--min-turns", "3", "--min-chars", "40"]
    assert cli_main(args) == 0
    assert cli_main(args) == 0  # same config: no-op advance
    with _pytest.raises(RuntimeError, match="kernel"):
        cli_main(["ivm", "--kind", "curation", "--table", str(tmp_path / "tbl"),
                  "--view", view])  # default thresholds != built-with
