"""Process-level kill/resume test (F6.1 strong form): SIGKILL a replication
mid-flight, resume in a fresh process, final state must equal a one-shot
replay (offset-fenced idempotent commits + per-partition watermarks)."""

import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN_SNIPPET = """
import sys
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from database_delta_plugins_ray.pipelines.replicate import run_replication
print("START", flush=True)
run_replication({log!r}, {lake!r}, num_partitions=6)
print("DONE", flush=True)
ray.shutdown()
"""


@pytest.mark.usefixtures("ray_session")
def test_sigkill_mid_replication_then_resume(tmp_path):
    from database_delta_plugins_ray.pipelines.oracle import replay
    from database_delta_plugins_ray.pipelines.replicate import (
        final_state,
        run_replication,
    )
    from database_delta_plugins_ray.sources.gen import GenConfig, generate_log

    log = str(tmp_path / "log")
    generate_log(log, GenConfig(n_keys=500, n_events=6000, n_repos=8, seed=21,
                                n_segments=6))
    lake = str(tmp_path / "lake")

    # run replication in a subprocess and SIGKILL it mid-flight
    code = RUN_SNIPPET.format(repo=REPO, log=log, lake=lake)
    p = subprocess.Popen([sys.executable, "-c", code],
                         stdout=subprocess.PIPE, text=True)
    assert p.stdout is not None
    assert p.stdout.readline().strip() == "START"
    # give it time to get partway through (some partitions committed)
    time.sleep(6.0)
    p.send_signal(signal.SIGKILL)
    p.wait()

    # resume in THIS session: must converge to the oracle final state,
    # regardless of how many partitions the killed run managed to commit
    s = run_replication(log, lake, num_partitions=6)
    oracle = replay(log)
    rows = final_state(lake).take_all()
    got = {(r["table"], r["repo"], r["path"]): r for r in rows}
    assert set(got) == set(oracle)
    for k, o in oracle.items():
        assert got[k]["content_sha"] == o["content_sha"], k
        assert got[k]["_sequence_num"] == o["_sequence_num"], k


RUN_SNIPPET_FRAG = """
import sys
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from database_delta_plugins_ray.pipelines.replicate import run_replication
print("START", flush=True)
run_replication({log!r}, {lake!r}, num_partitions=6, exchange="fragment")
print("DONE", flush=True)
ray.shutdown()
"""


@pytest.mark.usefixtures("ray_session")
def test_sigkill_mid_fragment_replication_then_resume(tmp_path):
    """SIGKILL during a FRAGMENT-exchange replication (possibly mid
    fragment-write or mid partition-merge); resume must converge — leftover
    fragments fold in idempotently, half-written tmp files are ignored."""
    from database_delta_plugins_ray.pipelines.oracle import replay
    from database_delta_plugins_ray.pipelines.replicate import (
        final_state,
        run_replication,
    )
    from database_delta_plugins_ray.sources.gen import GenConfig, generate_log

    log = str(tmp_path / "log")
    generate_log(log, GenConfig(n_keys=500, n_events=6000, n_repos=8, seed=23,
                                n_segments=6))
    lake = str(tmp_path / "lake")

    code = RUN_SNIPPET_FRAG.format(repo=REPO, log=log, lake=lake)
    p = subprocess.Popen([sys.executable, "-c", code],
                         stdout=subprocess.PIPE, text=True)
    assert p.stdout is not None
    assert p.stdout.readline().strip() == "START"
    time.sleep(6.0)
    p.send_signal(signal.SIGKILL)
    p.wait()

    run_replication(log, lake, num_partitions=6, exchange="fragment")
    oracle = replay(log)
    rows = final_state(lake).take_all()
    got = {(r["table"], r["repo"], r["path"]): r for r in rows}
    assert set(got) == set(oracle)
    for k, o in oracle.items():
        assert got[k]["content_sha"] == o["content_sha"], k
        assert got[k]["_sequence_num"] == o["_sequence_num"], k
