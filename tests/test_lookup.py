"""Point lookups on the lake's primary (key-hash) index."""
import numpy as np
import pytest

from database_delta_plugins_ray.pipelines.replicate import (
    final_state,
    lookup_keys,
    partition_of_keys,
    run_replication,
)
from database_delta_plugins_ray.sources.gen import GenConfig, generate_log
from database_delta_plugins_ray.state import checkpoint as ckpt


@pytest.fixture(scope="module")
def lookup_lake(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("lookup")
    log = str(d / "log")
    generate_log(log, GenConfig(n_keys=400, n_events=3000, seed=31))
    lake = str(d / "lake")
    run_replication(log, lake, num_partitions=8)
    return log, lake


def _final_by_key(lake):
    rows = final_state(lake).take_all()
    return {(r["table"], r["repo"], r["path"]): r for r in rows}


def test_routing_matches_actual_placement(lookup_lake):
    """partition_of_keys must agree with where the merger actually put
    every live row."""
    import pyarrow.parquet as pq

    _, lake = lookup_lake
    placed = {}
    for part, m in ckpt.all_manifests(lake).items():
        for f in (m.get("files") or [m["file"]]):
            t = pq.read_table(f, columns=["table", "repo", "path"])
            for r in t.to_pylist():
                placed[(r["table"], r["repo"], r["path"])] = part
    keys = sorted(placed)
    got = partition_of_keys(lake, keys)
    assert [placed[k] for k in keys] == list(got)


def test_lookup_values_and_pruning(lookup_lake):
    _, lake = lookup_lake
    want = _final_by_key(lake)
    keys = sorted(want)[:7]
    out = lookup_keys(lake, keys)
    got = {(r["table"], r["repo"], r["path"]): r for r in out.to_pylist()}
    assert set(got) == set(keys)
    for k in keys:
        assert got[k]["content_sha"] == want[k]["content_sha"]
        assert got[k]["_sequence_num"] == want[k]["_sequence_num"]
    # 7 keys on 8 partitions: strictly fewer partitions touched than exist
    assert len(set(partition_of_keys(lake, keys))) <= 7


def test_lookup_absent_and_deleted_keys(lookup_lake):
    _, lake = lookup_lake
    out = lookup_keys(lake, [("inventory.code_files", "no-such-repo", "nope")])
    assert out.num_rows == 0
    # a soft-deleted key returns nothing: find one via the raw lake
    from database_delta_plugins_ray.pipelines.replicate import read_lake

    dead = [r for r in read_lake(lake).take_all() if r["_is_deleted"]]
    if dead:  # the seeded log has deletes, so this should hold
        k = (dead[0]["table"], dead[0]["repo"], dead[0]["path"])
        assert lookup_keys(lake, [k]).num_rows == 0
    assert dead, "seeded log should produce tombstones"


def test_lookup_salted_mode_exact(ray_session, tmp_path):
    """repo_salted routing: a salted repo's keys spread over partitions,
    yet every key still routes to exactly its partition."""
    log = str(tmp_path / "log")
    generate_log(log, GenConfig(n_keys=300, n_events=2500, seed=33))
    lake = str(tmp_path / "lake")
    run_replication(log, lake, num_partitions=8, partition_mode="repo_salted")
    want = _final_by_key(lake)
    keys = sorted(want)[::17]
    out = lookup_keys(lake, keys)
    got = {(r["table"], r["repo"], r["path"]) for r in out.to_pylist()}
    assert got == set(keys)


def test_cli_lookup_and_read(lookup_lake):
    """CLI verbs wrap lookup_keys / final_state(as_of)."""
    import json
    import subprocess
    import sys

    _, lake = lookup_lake
    want = _final_by_key(lake)
    k = sorted(want)[0]
    r = subprocess.run(
        [sys.executable, "-m", "database_delta_plugins_ray", "--num-cpus",
         "2", "lookup", "--lake", lake, "--key", ",".join(k)],
        capture_output=True, text=True, timeout=300)
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["rows"] == 1
    assert out["result"][0]["content_sha"] == want[k]["content_sha"]
