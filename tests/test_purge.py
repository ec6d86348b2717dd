"""Right-to-be-forgotten hard delete (CDCEngine.purge).

A purge must leave NO physical trace of the key anywhere under the table
directory — current files, superseded versions, tombstones, retained
changefeed deltas, the salt map — which is strictly stronger than a CDC
delete event (whose tombstone records the key forever). The strongest
assertion here greps every remaining parquet file for the purged values.
"""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etl_framework_ray.pipelines.cdc import CDCEngine
from etl_framework_ray.sources.changelog import ChangeLog
from etl_framework_ray.sources.generator import GenConfig, generate_changelog, oracle_replay


def _all_key_values(table_dir: str) -> set:
    """Every conv_id present in ANY parquet file under the table dir —
    the physical-erasure audit."""
    vals: set = set()
    for f in glob.glob(os.path.join(table_dir, "data", "**", "*.parquet"), recursive=True):
        t = pq.read_table(f, columns=["conv_id"])
        vals.update(t.column("conv_id").to_pylist())
    return vals


def _replayed(tmp_path, cfg: GenConfig, **eng_kw):
    log = generate_changelog(cfg)
    clog = ChangeLog(str(tmp_path / "log"))
    clog.write_segments(log, segment_rows=500)
    eng = CDCEngine(str(tmp_path / "tbl"), num_partitions=4, **eng_kw)
    eng.replay(clog, segments_per_epoch=2, vacuum=False)
    return eng, log


@pytest.mark.usefixtures("ray_session")
def test_purge_erases_keys_physically(tmp_path):
    eng, log = _replayed(
        tmp_path, GenConfig(num_events=4000, num_conversations=50, seed=71)
    )
    oracle = oracle_replay(log)
    live_convs = sorted({k[0] for k in oracle})
    victims = live_convs[:5]
    survivors = [c for c in live_convs if c not in victims]

    res = eng.purge(victims)
    assert res["rows_removed"] > 0
    assert res["partitions_touched"] >= 1
    assert res["vacuumed"] >= 0

    # committed state == oracle minus the victims
    snap = eng.snapshot_arrow()
    got = {
        (r["conv_id"], r["turn_idx"]): r["text"] for r in snap.to_pylist()
    }
    want = {k: v["text"] for k, v in oracle.items() if k[0] not in victims}
    assert got == want

    # physical erasure: no file anywhere under the table still holds them
    remaining = _all_key_values(eng.table_dir)
    assert not (remaining & set(victims))
    assert set(survivors) <= remaining

    # point lookup finds nothing; history records counts only
    assert eng.lookup(victims).num_rows == 0
    purge_rows = [r for r in eng.manifest.history if r.get("op") == "purge"]
    assert purge_rows and purge_rows[-1]["keys"] == len(victims)
    assert not any(v in str(purge_rows[-1]) for v in victims)

    # fsck still green after the rewrite
    audit = eng.fsck()
    assert audit["ok"], audit["issues"]


@pytest.mark.usefixtures("ray_session")
def test_purge_covers_retained_changefeed(tmp_path):
    # retention keeps folded deltas readable — purge must scrub those too
    eng, log = _replayed(
        tmp_path,
        GenConfig(num_events=3000, num_conversations=40, seed=72),
        compact_every=2,
        changefeed_retention_lsn=10**9,
    )
    eng.compact()  # force folds → retained registry populated
    assert eng.manifest.properties.get("retained_deltas")
    oracle = oracle_replay(log)
    victims = sorted({k[0] for k in oracle})[:3]

    eng.purge(victims)
    assert not (_all_key_values(eng.table_dir) & set(victims))
    # the feed from LSN 0 (served from retained deltas) never mentions them
    feed = eng.read_changes(0)
    assert not set(feed.column("conv_id").to_pylist()) & set(victims)


@pytest.mark.usefixtures("ray_session")
def test_purge_salted_key_and_salt_map(tmp_path):
    eng, log = _replayed(
        tmp_path,
        GenConfig(
            num_events=6000,
            num_conversations=30,
            seed=73,
            hot_key_frac=0.4,
            hot_max_turns=3000,  # many DISTINCT keys → residual skew
        ),
    )
    eng.mitigate_skew(factor=1.5, fanout=4, min_share=0.25)
    assert eng.salt_map, "fixture must produce a salted key"
    hot = next(iter(eng.salt_map))

    eng.purge([hot])
    assert hot not in _all_key_values(eng.table_dir)
    # the key VALUE left the manifest too (salt map included)
    man_json = eng.store.load().to_json()
    assert hot not in str(man_json.get("properties", {}).get("salt_map", {}))
    got = {k[0] for k in oracle_replay(log)} - {hot}
    assert {r["conv_id"] for r in eng.snapshot_arrow().to_pylist()} == got


@pytest.mark.usefixtures("ray_session")
def test_purge_absent_key_is_noop_but_vacuums(tmp_path):
    eng, _ = _replayed(tmp_path, GenConfig(num_events=1000, num_conversations=10, seed=74))
    v_before = eng.manifest.version
    res = eng.purge(["conv-does-not-exist"])
    assert res["rows_removed"] == 0
    assert eng.manifest.version == v_before  # no-op: no new commit
    # superseded epoch files were still vacuumed (physical hygiene)
    live = set(eng.manifest.data_files())
    on_disk = set(
        glob.glob(os.path.join(eng.table_dir, "data", "**", "*.parquet"), recursive=True)
    )
    assert on_disk == live


@pytest.mark.usefixtures("ray_session")
def test_cli_purge(tmp_path, capsys):
    import json

    from etl_framework_ray.__main__ import main

    eng, log = _replayed(tmp_path, GenConfig(num_events=1000, num_conversations=12, seed=76))
    victim = sorted({k[0] for k in oracle_replay(log)})[0]
    main(["purge", "--table", str(tmp_path / "tbl"), "--key", victim])
    out = json.loads(capsys.readouterr().out.strip())
    assert out["rows_removed"] > 0
    assert victim not in _all_key_values(str(tmp_path / "tbl"))


@pytest.mark.usefixtures("ray_session")
def test_purge_ends_time_travel_and_requires_pk(tmp_path):
    eng, log = _replayed(tmp_path, GenConfig(num_events=2000, num_conversations=20, seed=75))
    victims = sorted({k[0] for k in oracle_replay(log)})[:2]
    pre_version = eng.manifest.version
    eng.purge(victims)
    with pytest.raises(ValueError, match="vacuum"):
        eng.restore(pre_version)

    from etl_framework_ray.state.schema import TableSpec, ColumnSpec

    spec = TableSpec(
        name="audit",
        columns=(
            ColumnSpec("ts", pa.timestamp("us")),
            ColumnSpec("msg", pa.string()),
        ),
        primary_key=(),
    )
    eng2 = CDCEngine(str(tmp_path / "nopk"), spec=spec, num_partitions=2)
    with pytest.raises(ValueError, match="primary-keyed"):
        eng2.purge(["x"])
