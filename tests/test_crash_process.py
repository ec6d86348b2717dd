"""REAL kill-resume proof: a separate driver process replaying the
changelog is SIGKILLed (uncatchable — no atexit, no finally, no Ray
shutdown) after a few committed epochs; a fresh engine must resume from
the durable watermark and converge to the dict oracle. This is the
north-star sentence "jobs killed mid-run resume from the last committed
epoch" executed literally, not simulated by interleaving."""

import os
import shutil
import signal
import subprocess
import sys
import textwrap

import pytest

from etl_framework_ray.pipelines.cdc import CDCEngine
from etl_framework_ray.sources.changelog import ChangeLog
from etl_framework_ray.sources.generator import GenConfig, generate_changelog, oracle_replay

_VICTIM = textwrap.dedent(
    """
    import os, sys
    import ray
    ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    from etl_framework_ray.pipelines.cdc import CDCEngine
    from etl_framework_ray.sources.changelog import ChangeLog

    root = sys.argv[1]
    eng = CDCEngine(os.path.join(root, "tbl"), num_partitions=8)
    for ep in ChangeLog(os.path.join(root, "log")).epochs(1):
        eng.apply_epoch(ep)
        print(f"EPOCH {ep.epoch_id}", flush=True)  # parent kills us on line 3
    print("DRAINED", flush=True)
    """
)


@pytest.mark.usefixtures("ray_session")
def test_sigkill_after_three_commits_resumes_to_oracle(tmp_path):
    log = generate_changelog(
        GenConfig(num_events=24_000, num_conversations=300, seed=13, out_of_order=True)
    )
    clog = ChangeLog(str(tmp_path / "log"))
    clog.write_segments(log, segment_rows=2_000)  # 12 one-segment epochs

    victim = tmp_path / "victim.py"
    victim.write_text(_VICTIM)
    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.dirname(__file__)))
    proc = subprocess.Popen(
        [sys.executable, str(victim), str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    committed = []
    try:
        for line in proc.stdout:
            if line.startswith("EPOCH"):
                committed.append(int(line.split()[1]))
                if len(committed) == 3:
                    os.kill(proc.pid, signal.SIGKILL)  # uncatchable, mid-run
                    break
            assert not line.startswith("DRAINED"), "victim finished before the kill"
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=60)
    assert proc.returncode == -signal.SIGKILL
    assert len(committed) == 3

    # the manifest survived the hard kill at (at least) the 3rd epoch's
    # watermark; a fresh engine resumes and converges to the oracle
    eng = CDCEngine(str(tmp_path / "tbl"), num_partitions=8)
    assert eng.manifest.applied_lsn >= committed[-1]
    stats = eng.replay(clog, segments_per_epoch=1)
    assert stats.epochs_applied + stats.epochs_skipped <= 12

    oracle = oracle_replay(log)
    state = eng.snapshot_arrow().to_pylist()
    assert len(state) == len(oracle)
    for row, k in zip(state, sorted(oracle)):
        assert (row["conv_id"], row["turn_idx"]) == k
        assert row["text"] == oracle[k]["text"]

    # nothing left to do: re-replay is a no-op on the recovered table
    assert eng.replay(clog, segments_per_epoch=1).epochs_applied == 0
    shutil.rmtree(str(tmp_path / "victim.py"), ignore_errors=True)
