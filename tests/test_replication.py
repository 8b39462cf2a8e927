"""End-to-end CDC replication: Ray pipeline vs pure-Python oracle replay.

Covers the reference's e2e contract (final-state equality under per-row
content sha256, BQValidation.java:86-90) plus the resume / exactly-once
scenarios of FIXTURES.md §F6.
"""

import hashlib
import os

import pyarrow.compute as pc
import pytest

from database_delta_plugins_ray.pipelines.oracle import replay
from database_delta_plugins_ray.pipelines.replicate import (
    final_state,
    run_replication,
)


def lake_as_dict(lake_dir):
    ds = final_state(lake_dir)
    rows = ds.take_all()
    return {(r["table"], r["repo"], r["path"]): r for r in rows}


def assert_parity(lake_dir, log_dir, upto_lsn=None):
    oracle = replay(log_dir, upto_lsn=upto_lsn)
    got = lake_as_dict(lake_dir)
    assert set(got) == set(oracle)
    for k, orow in oracle.items():
        grow = got[k]
        # per-row invariant: content sha256 equality (BASELINE.json)
        assert grow["content_sha"] == orow["content_sha"], k
        assert hashlib.sha256(grow["content"].encode()).hexdigest() == orow["content_sha"]
        assert grow["commit"] == orow["commit"], k
        # before the rename DDL the live column is still named `lang`
        assert grow.get("language", grow.get("lang")) == orow["language"], k
        assert grow.get("stars") == orow["stars"], k
        assert grow["_sequence_num"] == orow["_sequence_num"], k


@pytest.mark.usefixtures("ray_session")
def test_full_replay_parity(small_log, tmp_path):
    log_dir, cfg, meta = small_log
    lake = str(tmp_path / "lake")
    s = run_replication(log_dir, lake, num_partitions=8)
    assert s["events_applied"] > 0
    assert s["last_lsn"] == meta["max_lsn"]
    assert_parity(lake, log_dir)


@pytest.mark.usefixtures("ray_session")
def test_idempotent_rerun(small_log, tmp_path):
    """Replaying the same log twice leaves identical state and applies 0 events
    (exactly-once effect, F6.2)."""
    log_dir, _, _ = small_log
    lake = str(tmp_path / "lake")
    run_replication(log_dir, lake, num_partitions=8)
    before = lake_as_dict(lake)
    s2 = run_replication(log_dir, lake, num_partitions=8)
    assert s2["events_applied"] == 0
    assert lake_as_dict(lake) == before


@pytest.mark.usefixtures("ray_session")
def test_resume_from_checkpoint(small_log, tmp_path):
    """Kill after partial apply -> resume -> identical to one-shot replay
    (F6.1: offset fence per partition)."""
    log_dir, _, meta = small_log
    lake = str(tmp_path / "lake")
    half = meta["max_lsn"] // 2
    s1 = run_replication(log_dir, lake, num_partitions=8, upto_lsn=half)
    assert s1["last_lsn"] <= half
    assert_parity(lake, log_dir, upto_lsn=half)
    s2 = run_replication(log_dir, lake, num_partitions=8)
    assert s2["resume_watermark"] > 0
    assert_parity(lake, log_dir)


@pytest.mark.usefixtures("ray_session")
def test_soft_deletes_present(small_log, tmp_path):
    """Deleted keys stay as tombstones with _is_deleted=true (target
    bookkeeping contract, BQValidation.java:86-87)."""
    from database_delta_plugins_ray.pipelines.replicate import read_lake

    log_dir, _, _ = small_log
    lake = str(tmp_path / "lake")
    run_replication(log_dir, lake, num_partitions=8)
    all_rows = read_lake(lake).take_all()
    assert any(r["_is_deleted"] for r in all_rows)
    for r in all_rows:
        assert set(k for k in r if k.startswith("_")) == {
            "_row_id", "_source_timestamp", "_is_deleted", "_sequence_num",
        }


@pytest.mark.usefixtures("ray_session")
def test_incremental_segment_arrival(small_log, tmp_path):
    """Streaming-tail simulation: new binlog segments appear between runs;
    each run applies only the new events (S3 resume contract)."""
    import shutil

    log_dir, _, meta = small_log
    segs = sorted(f for f in os.listdir(log_dir) if f.startswith("seg-"))
    inc = str(tmp_path / "inc_log")
    os.makedirs(inc)
    for f in segs[:2]:
        shutil.copy(os.path.join(log_dir, f), os.path.join(inc, f))

    lake = str(tmp_path / "lake")
    s1 = run_replication(inc, lake, num_partitions=8)
    assert s1["events_applied"] > 0

    for f in segs[2:]:
        shutil.copy(os.path.join(log_dir, f), os.path.join(inc, f))
    s2 = run_replication(inc, lake, num_partitions=8)
    assert s2["resume_watermark"] > 0
    assert s2["last_lsn"] == meta["max_lsn"]
    assert_parity(lake, log_dir)


@pytest.mark.usefixtures("ray_session")
def test_fragment_exchange_parity(tmp_path):
    """The fragment (hash-partitioned-write) exchange must produce exactly
    the same lake as the sort exchange, including across resume."""
    from database_delta_plugins_ray.pipelines.oracle import replay
    from database_delta_plugins_ray.pipelines.replicate import (
        final_state,
        run_replication,
    )
    from database_delta_plugins_ray.sources.gen import GenConfig, generate_log

    log = str(tmp_path / "log")
    meta = generate_log(log, GenConfig(n_keys=400, n_events=4000, n_repos=8,
                                       seed=41, n_segments=4))
    lake = str(tmp_path / "lake_frag")
    half = meta["max_lsn"] // 2
    run_replication(log, lake, num_partitions=4, upto_lsn=half,
                    exchange="fragment")
    s = run_replication(log, lake, num_partitions=4, exchange="fragment")
    # no-op poll via the fragment path as well
    s2 = run_replication(log, lake, num_partitions=4, exchange="fragment")
    assert s2["events_applied"] == 0

    oracle = replay(log)
    rows = final_state(lake).take_all()
    got = {(r["table"], r["repo"], r["path"]): r for r in rows}
    assert set(got) == set(oracle)
    for k, o in oracle.items():
        assert got[k]["content_sha"] == o["content_sha"], k
        assert got[k]["_sequence_num"] == o["_sequence_num"], k
    assert s["live_rows"] == len(oracle)
    # fragments are consumed after the merge
    import glob
    assert not glob.glob(str(tmp_path / "lake_frag" / "_fragments" / "part=*" / "*.parquet"))


@pytest.mark.usefixtures("ray_session")
def test_fragment_buckets_bound_file_count(tmp_path):
    """Bulk-backfill file-count asymptote (round-2 verdict #3): with P
    partitions sharing B buckets and coarsened scatter batches, the
    exchange writes O(batches x B) fragments — NOT O(batches x P) — and
    parity still holds in the bucketed regime (several partitions per
    fragment file, folds pruned by part row-group stats)."""
    from database_delta_plugins_ray.pipelines.oracle import replay
    from database_delta_plugins_ray.pipelines.replicate import (
        final_state,
        run_replication,
    )
    from database_delta_plugins_ray.sources.gen import GenConfig, generate_log

    log = str(tmp_path / "log")
    meta = generate_log(log, GenConfig(n_keys=400, n_events=5000, n_repos=8,
                                       seed=43, n_segments=4))
    lake = str(tmp_path / "lake")
    s = run_replication(
        log, lake, num_partitions=24, exchange="fragment",
        batch_size=512, scatter_batch_size=2048, fragment_buckets=4,
    )
    n_files = s["phases"]["fragment_files"]
    assert n_files > 0
    # ceil(events/scatter_batch) write calls x <= 4 buckets each; blocks
    # can split batches so allow 2x headroom — still far below the
    # per-(batch, partition) count of the old layout
    n_batches = -(-meta["total_events"] // 2048)
    assert n_files <= 2 * n_batches * 4, (n_files, n_batches)

    oracle = replay(log)
    rows = final_state(lake).take_all()
    got = {(r["table"], r["repo"], r["path"]): r for r in rows}
    assert set(got) == set(oracle)
    for k, o in oracle.items():
        assert got[k]["content_sha"] == o["content_sha"], k
        assert got[k]["_sequence_num"] == o["_sequence_num"], k


@pytest.mark.usefixtures("ray_session")
def test_fragment_leftovers_respect_upto(tmp_path):
    """A crashed FULLER run's leftover fragments must not leak events past
    a subsequent run's upto_lsn horizon; the eventual full run converges."""
    import glob as _glob

    import pyarrow.parquet as _pq

    from database_delta_plugins_ray.pipelines.oracle import replay
    from database_delta_plugins_ray.pipelines.replicate import (
        final_state,
        run_replication,
    )
    from database_delta_plugins_ray.sources.gen import GenConfig, generate_log
    from database_delta_plugins_ray.state import checkpoint as ckpt

    log = str(tmp_path / "log")
    meta = generate_log(log, GenConfig(n_keys=200, n_events=2000, n_repos=4,
                                       seed=47, n_segments=4, ddl_plan=False))
    lake = str(tmp_path / "lake")
    half = meta["max_lsn"] // 2

    # simulate a crashed full-range run: replicate fully into a SCRATCH lake
    # with fragment exchange, then steal one written fragment as a leftover
    scratch = str(tmp_path / "scratch")
    run_replication(log, scratch, num_partitions=3, exchange="fragment")
    # build a leftover fragment holding rows beyond `half` by re-running the
    # full normalize into fragments only: easiest faithful source is the
    # scratch lake's own state rows re-shaped as a fragment
    m = ckpt.read_manifest(scratch, 0)
    state = _pq.read_table(m["file"])
    beyond = state.filter(
        __import__("pyarrow.compute", fromlist=["compute"]).greater(
            state["_sequence_num"], half)
    )
    frag_dir = os.path.join(lake, "_fragments", "part=00000")
    os.makedirs(frag_dir, exist_ok=True)
    import pyarrow as _pa
    import pyarrow.compute as _pc

    frag = _pa.table({
        "part": _pa.array([0] * beyond.num_rows, _pa.int64()),
        "table": beyond["table"],
        "repo": beyond["repo"],
        "path": beyond["path"],
        "commit": beyond["commit"],
        "lang": beyond["lang"],
        "content": beyond["content"],
        "content_sha": beyond["content_sha"],
        "op": _pc.if_else(beyond["_is_deleted"], _pa.scalar("D"), _pa.scalar("U")),
        "lsn": beyond["_sequence_num"],
        "tx_id": beyond["_row_id"],
        "ingest_ts": beyond["_source_timestamp"],
    })
    _pq.write_table(frag, os.path.join(frag_dir, "frag-leftover.parquet"))

    # run with upto=half: the leftover's beyond-half rows must NOT apply
    run_replication(log, lake, num_partitions=3, exchange="fragment",
                    upto_lsn=half)
    rows = final_state(lake).take_all()
    assert max(r["_sequence_num"] for r in rows) <= half
    oracle_half = replay(log, upto_lsn=half)
    got = {(r["table"], r["repo"], r["path"]): r["_sequence_num"] for r in rows}
    assert got == {k: v["_sequence_num"] for k, v in oracle_half.items()}

    # moving the horizon to the full log converges to the full oracle
    run_replication(log, lake, num_partitions=3, exchange="fragment")
    rows = final_state(lake).take_all()
    oracle = replay(log)
    got = {(r["table"], r["repo"], r["path"]): r["content_sha"] for r in rows}
    assert got == {k: v["content_sha"] for k, v in oracle.items()}
    assert not _glob.glob(os.path.join(lake, "_fragments", "part=*", "*.parquet"))
