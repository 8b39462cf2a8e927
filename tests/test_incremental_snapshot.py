"""DBLog-style incremental snapshot: chunked base-table reads interleaved
with the live stream, reconciled by ordering chunk rows at their chunk's
low watermark (Andreakis & Papapanagiotou 2019; Debezium incremental
snapshots). The discriminating property vs plain replay: ARRIVAL order in
the log differs from commit (effective) order."""

import os

import numpy as np
import pandas as pd
import pytest

from database_delta_plugins_ray.pipelines.replicate import (
    final_state,
    run_replication,
)
from database_delta_plugins_ray.sources.gen import GenConfig, generate_log


@pytest.fixture(scope="module")
def dblog(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dblog") / "log")
    generate_log(d, GenConfig(n_keys=700, n_events=4_000, n_repos=8, seed=21,
                              ddl_plan=False, incremental_snapshot=True,
                              snapshot_chunks=5))
    return d


def _events(log_dir):
    import pyarrow.dataset as pads

    segs = [os.path.join(log_dir, f) for f in sorted(os.listdir(log_dir))
            if f.startswith("seg-")]
    return pads.dataset(segs, format="parquet").to_table().to_pandas()


def _brute_effective_lww(t: pd.DataFrame) -> pd.DataFrame:
    d = t[t["op"] != "DDL"].copy()
    d["eff"] = np.where(
        d["tx_id"].str.startswith("chunk:"),
        d["tx_id"].str.split(":").str[1].astype(np.int64),
        d["lsn"])
    d["key"] = d.apply(
        lambda r: ((r["after"] or r["before"])["repo"],
                   (r["after"] or r["before"])["path"]), axis=1)
    last = d.sort_values("eff").groupby("key").tail(1)
    return last[last["op"] != "D"]


def test_log_shape(dblog):
    t = _events(dblog)
    lsn = np.sort(t["lsn"].to_numpy())
    assert lsn[0] == 1 and (np.diff(lsn) == 1).all()  # dense, unique
    ch = t[t["tx_id"].str.startswith("chunk:")]
    assert ch["tx_id"].nunique() == 5          # one low watermark per chunk
    assert ch["is_snapshot"].all()
    assert (ch["op"] == "I").all()
    # every chunk row's effective lsn (low watermark) <= its arrival lsn,
    # strictly less for all but the block's first row: commit order and
    # arrival order genuinely diverge
    eff = ch["tx_id"].str.split(":").str[1].astype(np.int64)
    assert (eff <= ch["lsn"]).all()
    assert (eff < ch["lsn"]).sum() > len(ch) * 0.9
    # the stream supersedes some chunk rows: at least one key has BOTH a
    # chunk row and a later stream event (the watermark-window case)
    d = t[t["op"] != "DDL"]
    keys = d.apply(lambda r: ((r["after"] or r["before"])["repo"],
                              (r["after"] or r["before"])["path"]), axis=1)
    d = d.assign(key=keys, is_chunk=d["tx_id"].str.startswith("chunk:"))
    per = d.groupby("key")["is_chunk"].agg(["any", "all"])
    assert ((per["any"]) & (~per["all"])).sum() > 10


def test_final_state_matches_effective_lww(ray_session, dblog, tmp_path):
    lake = str(tmp_path / "lake")
    run_replication(dblog, lake, num_partitions=4, incremental_snapshot=True)
    got = final_state(lake, columns=["repo", "path", "commit",
                                     "_sequence_num"]).to_pandas()
    want = _brute_effective_lww(_events(dblog))
    gk = dict(zip(zip(got["repo"], got["path"]), got["_sequence_num"]))
    wk = dict(zip(want["key"], want["eff"]))
    assert gk == wk
    gc = dict(zip(zip(got["repo"], got["path"]), got["commit"]))
    wc = dict(zip(want["key"], want["after"].apply(lambda a: a["commit"])))
    assert gc == wc


def test_resume_mid_chunk_equals_one_shot(ray_session, dblog, tmp_path):
    """Bound the replay INSIDE a chunk block, resume, and the final state
    must equal the one-shot replay. Chunk blocks are atomic for bounded
    replay: the engine lowers the bound to just before the split block
    (chunk rows carry an effective lsn below their arrival lsn, so a
    half-applied block would strand its tail behind the resume fence)."""
    t = _events(dblog)
    ch = t[t["tx_id"].str.startswith("chunk:")]
    blocks = ch.groupby("tx_id")["lsn"].agg(["min", "max"])
    b = blocks.iloc[len(blocks) // 2]
    mid = int((b["min"] + b["max"]) // 2)
    assert b["min"] < mid < b["max"]

    lake_a = str(tmp_path / "a")
    run_replication(dblog, lake_a, num_partitions=4,
                    incremental_snapshot=True, upto_lsn=mid)
    run_replication(dblog, lake_a, num_partitions=4,
                    incremental_snapshot=True)
    lake_b = str(tmp_path / "b")
    run_replication(dblog, lake_b, num_partitions=4,
                    incremental_snapshot=True)
    cols = ["repo", "path", "commit", "content_sha", "_sequence_num"]
    a = final_state(lake_a, columns=cols).to_pandas().sort_values(
        ["repo", "path"]).reset_index(drop=True)
    bdf = final_state(lake_b, columns=cols).to_pandas().sort_values(
        ["repo", "path"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, bdf)


def test_incompatible_config_rejected():
    with pytest.raises(ValueError, match="incremental_snapshot"):
        generate_log("/tmp/never", GenConfig(incremental_snapshot=True,
                                             ddl_plan=True))
