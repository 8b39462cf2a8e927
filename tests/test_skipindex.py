"""Bloom file-skipping index: pruning power, no false negatives,
staleness safety, delta-partition discipline."""

import pytest

from database_delta_plugins_ray.pipelines.maintenance import (
    build_skip_index,
    optimize_lake,
    skip_scan_eq,
    _skip_index_path,
)
from database_delta_plugins_ray.pipelines.oracle import replay
from database_delta_plugins_ray.pipelines.replicate import run_replication
from database_delta_plugins_ray.state import checkpoint as ckpt


@pytest.fixture()
def indexed_lake(ray_session, small_log, tmp_path):
    log_dir, _, meta = small_log
    lake = str(tmp_path / "lake")
    run_replication(log_dir, lake, num_partitions=8)
    optimize_lake(lake)
    s = build_skip_index(lake, "commit")
    assert s["files"] == 8
    return log_dir, lake


def _live(log_dir):
    return {k: v for k, v in replay(log_dir).items()}


def test_no_false_negatives_and_pruning(indexed_lake):
    log_dir, lake = indexed_lake
    oracle = _live(log_dir)
    # every live commit is findable, with exactly its rows
    import itertools

    for k, v in itertools.islice(oracle.items(), 12):
        rows = skip_scan_eq(lake, "commit", v["commit"],
                            columns=["repo", "path", "commit"]).take_all()
        got = {(r["repo"], r["path"]) for r in rows}
        want = {(kk[1], kk[2]) for kk, vv in oracle.items()
                if vv["commit"] == v["commit"]}
        assert got == want

    # a value that exists nowhere prunes EVERY partition (power-of-two
    # bloom over per-partition files; false positives possible but with
    # 10 bits/row they should not cover all 8 partitions)
    ds = skip_scan_eq(lake, "commit", "no-such-commit-value")
    assert ds.count() == 0


def test_stale_index_never_loses_rows(indexed_lake, small_log):
    log_dir, lake = indexed_lake
    # new commits arrive AFTER the index was built (their files are not
    # in the index and must not be pruned)
    import json
    import os

    # replicating the same log is a no-op; instead rebuild the lake state
    # by optimizing again (new file names) WITHOUT rebuilding the index
    optimize_lake(lake)
    oracle = _live(log_dir)
    k, v = next(iter(oracle.items()))
    rows = skip_scan_eq(lake, "commit", v["commit"],
                        columns=["repo", "path", "commit"]).take_all()
    assert {(r["repo"], r["path"]) for r in rows} == \
        {(kk[1], kk[2]) for kk, vv in oracle.items()
         if vv["commit"] == v["commit"]}

    # and with no index file at all, the scan degrades to read-everything
    os.remove(_skip_index_path(lake, "commit"))
    rows2 = skip_scan_eq(lake, "commit", v["commit"],
                         columns=["repo", "path", "commit"]).take_all()
    assert {(r["repo"], r["path"]) for r in rows2} == \
        {(r["repo"], r["path"]) for r in rows}
