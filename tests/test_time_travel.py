"""Time travel over retained versions (history mode).

``run_replication(history=True)`` appends every partition commit to a
version log and retains superseded data files;
``read_lake(as_of_lsn=...)`` resolves each partition to its latest
retained version at/below the position (commit-granularity time travel,
the Delta-Lake versions model). ``vacuum_history`` prunes versions past
a retention horizon.
"""
import json
import os

import pytest

from database_delta_plugins_ray.pipelines.maintenance import (
    vacuum_history,
    vacuum_lake,
)
from database_delta_plugins_ray.pipelines.replicate import (
    final_state,
    run_replication,
)
from database_delta_plugins_ray.sources.gen import GenConfig, generate_log
from database_delta_plugins_ray.state import checkpoint as ckpt

KEY_COLS = ["repo", "path", "commit", "content_sha", "_sequence_num"]


def _rows(lake, **kw):
    return {
        (r["repo"], r["path"]): (r["commit"], r["content_sha"], r["_sequence_num"])
        for r in final_state(lake, columns=KEY_COLS[:4] + ["_sequence_num"], **kw)
        .take_all()
    }


@pytest.fixture(scope="module")
def travel_lake(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("ttravel")
    log = str(d / "log")
    meta = generate_log(log, GenConfig(n_keys=400, n_events=3000, seed=21))
    boundary = meta["max_lsn"] * 4 // 5  # past the 70%-of-stream DDLs
    lake = str(d / "lake")
    run_replication(log, lake, num_partitions=8, upto_lsn=boundary,
                    history=True)
    run_replication(log, lake, num_partitions=8, history=True)
    return log, lake, boundary, str(d)


def test_as_of_equals_bounded_one_shot(travel_lake):
    log, lake, boundary, d = travel_lake
    lake2 = os.path.join(d, "lake_oneshot")
    run_replication(log, lake2, num_partitions=8, upto_lsn=boundary)
    assert _rows(lake, as_of_lsn=boundary) == _rows(lake2)


def test_as_of_differs_from_final(travel_lake):
    log, lake, boundary, _ = travel_lake
    assert _rows(lake, as_of_lsn=boundary) != _rows(lake)


def test_as_of_before_first_commit_raises(travel_lake):
    _, lake, _, _ = travel_lake
    with pytest.raises(FileNotFoundError):
        final_state(lake, as_of_lsn=0)


def test_no_history_mode_has_no_versions(travel_lake, tmp_path):
    log, _, _, _ = travel_lake
    lake = str(tmp_path / "plain")
    run_replication(log, lake, num_partitions=8)
    assert ckpt.version_log(lake, 0) == []
    with pytest.raises(FileNotFoundError):
        final_state(lake, as_of_lsn=10**9)


def test_version_log_tolerates_torn_tail(travel_lake):
    _, lake, _, _ = travel_lake
    part = next(iter(ckpt.all_manifests(lake)))
    before = ckpt.version_log(lake, part)
    assert len(before) >= 2  # both legs committed
    with open(ckpt.version_log_path(lake, part), "a") as fh:
        fh.write('{"last_lsn": 999')  # crash mid-append
    assert ckpt.version_log(lake, part) == before


def test_tombstone_vacuum_preserves_history(travel_lake):
    log, lake, boundary, _ = travel_lake
    before = _rows(lake, as_of_lsn=boundary)
    vacuum_lake(lake)
    assert _rows(lake, as_of_lsn=boundary) == before


def test_append_after_torn_tail_is_not_swallowed(tmp_path):
    """A torn tail must not concatenate with (and swallow) the NEXT
    legitimate append."""
    lake = str(tmp_path / "lk")
    ckpt.append_version(lake, 0, {"last_lsn": 1, "file": "a"})
    with open(ckpt.version_log_path(lake, 0), "a") as fh:
        fh.write('{"last_lsn": 99')  # crash mid-append
    ckpt.append_version(lake, 0, {"last_lsn": 2, "file": "b"})
    assert [m["last_lsn"] for m in ckpt.version_log(lake, 0)] == [1, 2]


def test_lake_diff_change_kinds(travel_lake):
    """lake_diff classifies c/u/d against a brute-force comparison of the
    two final_state reads."""
    import pandas as pd

    from database_delta_plugins_ray.pipelines.replicate import lake_diff

    log, lake, boundary, _ = travel_lake
    old = _rows(lake, as_of_lsn=boundary)
    new = _rows(lake)
    want = {}
    for k in new.keys() | old.keys():
        if k not in old:
            want[k] = "c"
        elif k not in new:
            want[k] = "d"
        elif new[k][2] != old[k][2]:  # winning _sequence_num differs
            want[k] = "u"
    got_rows = lake_diff(lake, boundary).take_all()
    got = {(r["repo"], r["path"]): r["change"] for r in got_rows}
    assert got == want
    # new-side payload rides along; null on deletes
    by_key = {(r["repo"], r["path"]): r for r in got_rows}
    for k, kind in want.items():
        if kind in ("c", "u"):
            assert by_key[k]["content_sha"] == new[k][1]
        else:
            assert by_key[k]["content_sha"] is None or \
                by_key[k]["content_sha"] != by_key[k]["content_sha"]  # null/NaN
    assert set(want.values()) == {"c", "u", "d"}  # all three kinds occur


def test_snapshot_read_isolated_from_concurrent_commit(travel_lake, tmp_path):
    """A snapshot read pinned before a new commit keeps returning the
    pre-commit state even after partitions start advancing (simulated by
    committing a new leg between the pin and the read)."""
    from database_delta_plugins_ray.pipelines.replicate import (
        read_lake_snapshot,
        run_replication,
    )
    from database_delta_plugins_ray.sources.gen import GenConfig, generate_log

    log = str(tmp_path / "log")
    meta = generate_log(log, GenConfig(n_keys=200, n_events=1500, seed=41))
    half = meta["max_lsn"] // 2
    lake = str(tmp_path / "lake")
    run_replication(log, lake, num_partitions=4, upto_lsn=half, history=True)

    def snap_rows():
        return {(r["repo"], r["path"]): r["_sequence_num"]
                for r in read_lake_snapshot(lake).take_all()
                if not r["_is_deleted"]}

    before = snap_rows()
    # a concurrent run advances partition manifests past the pinned
    # watermark; the snapshot read must not see it until the run's own
    # global watermark lands — and our pin predates it
    run_replication(log, lake, num_partitions=4, history=True)
    # NEW pin sees the new state; but an as_of at the OLD watermark (the
    # pinned position of the earlier reader) still returns exactly the
    # old rows
    from database_delta_plugins_ray.pipelines.replicate import read_lake

    old_again = {(r["repo"], r["path"]): r["_sequence_num"]
                 for r in read_lake(lake, as_of_lsn=half).take_all()
                 if not r["_is_deleted"]}
    assert old_again == before
    assert snap_rows() != before


def test_reads_below_horizon_error_not_partial(ray_session, tmp_path):
    """After vacuum_history, asking for a position below the horizon must
    raise — NOT silently reconstruct an everything-looks-created state."""
    from database_delta_plugins_ray.pipelines.maintenance import vacuum_history
    from database_delta_plugins_ray.pipelines.replicate import (
        lake_diff,
        read_lake,
        run_replication,
    )
    from database_delta_plugins_ray.sources.gen import GenConfig, generate_log

    log = str(tmp_path / "log")
    meta = generate_log(log, GenConfig(n_keys=150, n_events=1200, seed=51))
    half = meta["max_lsn"] // 2
    lake = str(tmp_path / "lake")
    run_replication(log, lake, num_partitions=4, upto_lsn=half, history=True)
    run_replication(log, lake, num_partitions=4, history=True)
    assert lake_diff(lake, half).count() > 0  # works pre-vacuum
    vacuum_history(lake, keep_from_lsn=half + 1)
    with pytest.raises(ValueError, match="horizon"):
        lake_diff(lake, half)
    with pytest.raises(ValueError, match="horizon"):
        read_lake(lake, as_of_lsn=half)


def test_vacuum_history_prunes_and_keeps_live(travel_lake):
    """Runs LAST on the shared lake: vacuuming is destructive to its
    retained history."""
    log, lake, boundary, d = travel_lake
    live_before = _rows(lake)
    old_files = {
        f for p in ckpt.all_manifests(lake)
        for m in ckpt.version_log(lake, p) if m["last_lsn"] <= boundary
        for f in (m.get("files") or [m["file"]])
    }
    assert old_files
    res = vacuum_history(lake, keep_from_lsn=boundary + 1)
    assert res["versions_dropped"] >= 1
    with pytest.raises(ValueError, match="horizon"):
        final_state(lake, as_of_lsn=boundary)
    assert _rows(lake) == live_before  # live read untouched
    current = {
        f for m in ckpt.all_manifests(lake).values()
        for f in (m.get("files") or [m["file"]])
    }
    for f in old_files - current:
        assert not os.path.exists(f)
