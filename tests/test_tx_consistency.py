"""Transaction-boundary semantics: contiguous multi-event transactions in
the generated binlog and the complete-transactions-only replay fence
(reference contract: Debezium's embedded engine only emits committed
transactions; every DMLEvent of a tx carries the same transactionId,
MySqlRecordConsumer.java:209-225)."""

import os

import numpy as np
import pytest

from database_delta_plugins_ray.pipelines.replicate import (
    final_state,
    log_max_lsn,
    run_replication,
    tx_consistent_lsn,
)
from database_delta_plugins_ray.sources.gen import GenConfig, generate_log


@pytest.fixture(scope="module")
def tx_log(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("txlog") / "log")
    generate_log(d, GenConfig(n_keys=400, n_events=3_000, n_repos=8,
                              n_segments=4, seed=52, tx_size=5))
    return d


def _segs(log_dir):
    return [os.path.join(log_dir, f) for f in sorted(os.listdir(log_dir))
            if f.startswith("seg-") and f.endswith(".parquet")]


def _load(log_dir):
    import pyarrow.dataset as pads

    tbl = pads.dataset(_segs(log_dir), format="parquet").to_table(
        columns=["lsn", "tx_id", "op", "is_snapshot"])
    order = np.argsort(tbl["lsn"].to_numpy())
    return (
        tbl["lsn"].to_numpy()[order],
        np.array(tbl["tx_id"].to_pylist())[order],
        np.array(tbl["op"].to_pylist())[order],
    )


def _tx_start(tx_ids):
    return np.array([int(t.rsplit(":", 1)[1]) for t in tx_ids], np.int64)


def test_transactions_are_contiguous_lsn_runs(tx_log):
    lsn, tx, op = _load(tx_log)
    stream = np.array([t.startswith("binlog.") and not t.startswith("binlog.000001")
                       for t in tx]) & (op != "DDL")
    starts = _tx_start(tx[stream])
    lsns = lsn[stream]
    # multi-event txs exist and average near the configured size
    _, counts = np.unique(starts, return_counts=True)
    assert counts.max() > 1
    assert 2.0 < counts.mean() < 10.0
    # each tx's lsns are consecutive integers beginning at its tx_start
    for s in np.unique(starts)[:200]:
        ls = np.sort(lsns[starts == s])
        assert ls[0] == s
        assert np.array_equal(ls, np.arange(s, s + len(ls)))
    # no DDL lsn falls inside any tx's [start, end] span (DDL is autocommit)
    ddl_lsn = lsn[op == "DDL"]
    for s in np.unique(starts):
        e = lsns[starts == s].max()
        assert not np.any((ddl_lsn >= s) & (ddl_lsn <= e))


def test_fence_lowers_mid_tx_and_keeps_boundary(ray_session, tx_log):
    lsn, tx, op = _load(tx_log)
    starts = _tx_start(tx)
    # pick a tx with >= 3 events in the stream phase
    uniq, counts = np.unique(starts[(op != "DDL") & (starts > lsn.min() + 10)],
                             return_counts=True)
    s = int(uniq[counts >= 3][len(uniq[counts >= 3]) // 2])
    members = np.sort(lsn[starts == s])
    mid = int(members[1])            # inside the tx, not its last event
    end = int(members[-1])           # the commit boundary
    assert tx_consistent_lsn(tx_log, mid) == s - 1
    assert tx_consistent_lsn(tx_log, end) == end
    mx = log_max_lsn(tx_log)
    assert tx_consistent_lsn(tx_log, mx) == mx
    assert tx_consistent_lsn(tx_log, mx + 100) == mx + 100


def test_tx_consistent_replay_never_half_applies(ray_session, tx_log, tmp_path):
    """The catalog query's exact shape: bound 3/5 through the log must land
    mid-tx (discriminative), and the lake must equal the LWW over the
    complete-tx prefix — never over the raw bound prefix."""
    bound = log_max_lsn(tx_log) * 3 // 5
    fence = tx_consistent_lsn(tx_log, bound)
    assert fence < bound, "bound landed on a commit boundary; pick another"

    lake = str(tmp_path / "lake_txc")
    run_replication(tx_log, lake, num_partitions=4, upto_lsn=bound,
                    tx_consistent=True)
    got = final_state(lake, columns=["repo", "path", "_sequence_num"]).to_pandas()
    assert got["_sequence_num"].max() <= fence

    # oracle: plain python LWW over lsn <= fence
    import pyarrow.dataset as pads

    tbl = pads.dataset(_segs(tx_log), format="parquet").to_table(
        columns=["lsn", "op", "after", "before"]).to_pandas()
    tbl = tbl[tbl["op"] != "DDL"]
    key = tbl.apply(
        lambda r: ((r["after"] or r["before"])["repo"],
                   (r["after"] or r["before"])["path"]), axis=1)
    tbl = tbl.assign(key=key)
    pre = tbl[tbl["lsn"] <= fence].sort_values("lsn").groupby("key").tail(1)
    want = pre[pre["op"] != "D"]
    assert len(got) == len(want)
    got_keys = set(zip(got["repo"], got["path"]))
    want_keys = set(want["key"])
    assert got_keys == want_keys
    want_seq = dict(zip(want["key"], want["lsn"]))
    got_seq = dict(zip(zip(got["repo"], got["path"]), got["_sequence_num"]))
    assert got_seq == want_seq

    # and: the naive raw-bound replay WOULD differ (the fence mattered)
    naive = tbl[tbl["lsn"] <= bound].sort_values("lsn").groupby("key").tail(1)
    naive = naive[naive["op"] != "D"]
    assert dict(zip(naive["key"], naive["lsn"])) != want_seq


def test_tx_fence_then_full_resume_equals_one_shot(ray_session, tx_log, tmp_path):
    bound = log_max_lsn(tx_log) * 3 // 5
    lake_a = str(tmp_path / "lake_a")
    run_replication(tx_log, lake_a, num_partitions=4, upto_lsn=bound,
                    tx_consistent=True)
    run_replication(tx_log, lake_a, num_partitions=4)
    lake_b = str(tmp_path / "lake_b")
    run_replication(tx_log, lake_b, num_partitions=4)
    cols = ["repo", "path", "commit", "content_sha", "_sequence_num"]
    a = final_state(lake_a, columns=cols).to_pandas().sort_values(
        ["repo", "path"]).reset_index(drop=True)
    b = final_state(lake_b, columns=cols).to_pandas().sort_values(
        ["repo", "path"]).reset_index(drop=True)
    assert a.equals(b)

def test_fence_is_token_shape_independent(ray_session, tx_log, tmp_path):
    """The fence measures tx starts from the log; it must give identical
    answers when every token is replaced by an OPAQUE id (no ':', no
    embedded lsn — the shape a real Oracle txId / Mongo lsid has)."""
    import hashlib

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    opaque = str(tmp_path / "opaque_log")
    os.makedirs(opaque)
    for f in _segs(tx_log):
        t = pq.read_table(f)
        toks = [hashlib.md5(x.encode()).hexdigest()
                for x in t["tx_id"].to_pylist()]
        t = t.set_column(t.schema.get_field_index("tx_id"), "tx_id",
                         pa.array(toks, t["tx_id"].type))
        pq.write_table(t, os.path.join(opaque, os.path.basename(f)))

    lsn, tx, op = _load(tx_log)
    starts = _tx_start(tx)
    uniq, counts = np.unique(
        starts[(op != "DDL") & (starts > lsn.min() + 10)],
        return_counts=True)
    s = int(uniq[counts >= 3][len(uniq[counts >= 3]) // 2])
    members = np.sort(lsn[starts == s])
    mid, end = int(members[1]), int(members[-1])
    assert tx_consistent_lsn(opaque, mid) == s - 1
    assert tx_consistent_lsn(opaque, end) == end

    # the huge-continuing-set groupby fallback computes the same fence
    from database_delta_plugins_ray.pipelines import replicate as repl

    cap = repl._FENCE_BROADCAST_CAP
    try:
        repl._FENCE_BROADCAST_CAP = 0
        assert tx_consistent_lsn(opaque, mid) == s - 1
        assert tx_consistent_lsn(opaque, end) == end
    finally:
        repl._FENCE_BROADCAST_CAP = cap
