"""Partition-mode tests (SURVEY.md §4 skew handling): all three modes give
identical final state; salting spreads a hot repo across partitions."""

import collections

import pytest

from database_delta_plugins_ray.pipelines.oracle import replay, state_signature
from database_delta_plugins_ray.pipelines.replicate import (
    compute_repo_salt,
    final_state,
    run_replication,
)
from database_delta_plugins_ray.sources.gen import GenConfig, generate_log
from database_delta_plugins_ray.state import checkpoint as ckpt


@pytest.fixture(scope="module")
def skewed_log(tmp_path_factory, ray_session):
    d = str(tmp_path_factory.mktemp("skew") / "log")
    # few repos + zipf keys -> strongly skewed per-repo event counts
    generate_log(d, GenConfig(n_keys=400, n_events=4000, n_repos=6, seed=13,
                              skew="zipf", zipf_a=1.2, ddl_plan=False,
                              n_segments=4))
    return d


def lake_sig(lake):
    rows = final_state(lake).take_all()
    import hashlib

    h = hashlib.sha256()
    for k in sorted((r["table"], r["repo"], r["path"]) for r in rows):
        h.update(str(k).encode())
    return len(rows), h.hexdigest()


@pytest.mark.usefixtures("ray_session")
def test_modes_agree_and_salting_spreads(skewed_log, tmp_path):
    sigs = {}
    part_rows = {}
    for mode in ("key_hash", "repo", "repo_salted"):
        lake = str(tmp_path / f"lake_{mode}")
        run_replication(skewed_log, lake, num_partitions=8,
                        partition_mode=mode)
        sigs[mode] = lake_sig(lake)
        ms = ckpt.all_manifests(lake)
        part_rows[mode] = sorted(m["rows"] for m in ms.values())

    # correctness is partitioning-invariant
    assert sigs["key_hash"] == sigs["repo"] == sigs["repo_salted"]

    # skew: repo mode concentrates rows (6 repos -> <=6 non-empty partitions,
    # one huge); salted mode uses more partitions with a smaller max
    def imbalance(rows):
        return max(rows) / (sum(rows) / len(rows))

    assert len(part_rows["repo"]) <= 6
    assert len(part_rows["repo_salted"]) > len(part_rows["repo"])
    assert max(part_rows["repo_salted"]) < max(part_rows["repo"])
    # fully-hashed partitioning is the most balanced
    assert imbalance(part_rows["key_hash"]) <= imbalance(part_rows["repo_salted"]) + 0.5


@pytest.mark.usefixtures("ray_session")
def test_repo_salt_factors(skewed_log):
    salt = compute_repo_salt(skewed_log, num_partitions=8)
    # at least the hottest repo exceeds its fair share and gets k > 1
    assert salt and max(salt.values()) > 1


@pytest.mark.usefixtures("ray_session")
def test_partition_config_pinned(skewed_log, tmp_path):
    """Changing num_partitions or partition_mode on an existing lake is
    rejected (the watermark fence is only valid under one key mapping)."""
    lake = str(tmp_path / "lake")
    run_replication(skewed_log, lake, num_partitions=8)
    with pytest.raises(ValueError, match="partitioning config"):
        run_replication(skewed_log, lake, num_partitions=16)
    with pytest.raises(ValueError, match="partitioning config"):
        run_replication(skewed_log, lake, num_partitions=8, partition_mode="repo")
    # same config still fine (no-op)
    s = run_replication(skewed_log, lake, num_partitions=8)
    assert s["events_applied"] == 0
