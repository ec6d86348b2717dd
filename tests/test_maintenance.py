"""Maintenance ops: forced compaction (OPTIMIZE) + vacuum + CLI surface."""

import glob
import os

import pytest

from etl_framework_ray.pipelines.cdc import CDCEngine
from etl_framework_ray.sources.changelog import ChangeLog
from etl_framework_ray.sources.generator import GenConfig, generate_changelog, oracle_replay


@pytest.mark.usefixtures("ray_session")
def test_compact_and_vacuum(tmp_path):
    log = generate_changelog(GenConfig(num_events=4000, num_conversations=60, seed=91))
    clog = ChangeLog(str(tmp_path / "log"))
    clog.write_segments(log, segment_rows=500)
    # compaction threshold high → replay leaves deep delta stacks
    eng = CDCEngine(str(tmp_path / "tbl"), num_partitions=4, compact_every=100)
    eng.replay(clog, segments_per_epoch=1, vacuum=False)
    depths = [len(ps.files) for ps in eng.manifest.partitions.values()]
    assert max(depths) > 1
    before = eng.snapshot_arrow()

    n = eng.compact()
    assert n == sum(1 for d in depths if d > 1)
    assert all(len(ps.files) == 1 for ps in eng.manifest.partitions.values())
    assert eng.snapshot_arrow().equals(before)  # state unchanged
    assert eng.compact() == 0  # idempotent

    # superseded files still on disk (time travel) until vacuum
    all_files = glob.glob(os.path.join(eng.table_dir, "data", "**", "*.parquet"), recursive=True)
    live = set(eng.manifest.data_files())
    assert len(all_files) > len(live)
    removed = eng.vacuum()
    assert removed == len(all_files) - len(live)
    assert eng.snapshot_arrow().num_rows == len(oracle_replay(log))


@pytest.mark.usefixtures("ray_session")
def test_cli_snapshot_and_metrics(tmp_path, capsys):
    from etl_framework_ray.__main__ import main

    log = generate_changelog(GenConfig(num_events=1000, num_conversations=20, seed=92))
    clog = ChangeLog(str(tmp_path / "log"))
    clog.write_segments(log, segment_rows=500)
    eng = CDCEngine(str(tmp_path / "tbl"), num_partitions=2)
    eng.replay(clog)

    import json

    main(["snapshot", "--table", str(tmp_path / "tbl")])
    out = json.loads(capsys.readouterr().out.strip())
    assert out["rows"] == len(oracle_replay(log))
    main(["metrics", "--table", str(tmp_path / "tbl")])
    out = json.loads(capsys.readouterr().out.strip())
    assert out["lineage_rows"] > 0


@pytest.mark.usefixtures("ray_session")
def test_cli_readonly_rejects_missing_table(tmp_path, capsys):
    """A mistyped --table path must error, not create an empty table."""
    from etl_framework_ray.__main__ import main

    bogus = str(tmp_path / "no_such_table")
    with pytest.raises(SystemExit) as ei:
        main(["snapshot", "--table", bogus])
    assert ei.value.code == 2
    assert "no table manifest" in capsys.readouterr().err
    assert not os.path.exists(os.path.join(bogus, "_manifest"))
    assert not os.path.exists(bogus) or not os.listdir(bogus)
