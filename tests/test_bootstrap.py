"""Snapshot bootstrap from an existing Parquet table (the reference's
replicateExistingData path), then continue with a live wire feed into
the same lake."""
import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _source_table(n=120):
    return pd.DataFrame({
        "repo": [f"org/repo{i % 7}" for i in range(n)],
        "path": [f"src/f{i}.py" for i in range(n)],
        "commit": [f"c{i:06d}" for i in range(n)],
        "lang": ["py" if i % 3 else "rs" for i in range(n)],
        "content": [f"def f{i}(): return {i}\n" * 3 for i in range(n)],
    })


def test_bootstrap_snapshot_and_live_tail(ray_session, tmp_path):
    from database_delta_plugins_ray.model import DEFAULT_TABLE
    from database_delta_plugins_ray.pipelines.replicate import (
        final_state, run_replication)
    from database_delta_plugins_ray.sources.bootstrap import (
        SNAPSHOT_LSN, bootstrap_snapshot_segments)
    from database_delta_plugins_ray.sources.debezium_json import (
        jsonl_to_segments)

    df = _source_table()
    src = str(tmp_path / "source.parquet")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), src)

    segs = str(tmp_path / "snap_segs")
    meta = bootstrap_snapshot_segments(src, segs)
    assert meta["dml_events"] == len(df)
    assert meta["snapshot_shared_lsn"] == SNAPSHOT_LSN

    lake = str(tmp_path / "lake")
    s = run_replication(segs, lake, num_partitions=8)
    assert s["last_lsn"] == SNAPSHOT_LSN
    rows = final_state(lake).take_all()
    got = {(r["repo"], r["path"]): r["commit"] for r in rows}
    assert got == {(r.repo, r.path): r.commit for r in df.itertuples()}
    # snapshot rows are flagged and share the snapshot position
    assert all(r["_sequence_num"] == SNAPSHOT_LSN for r in rows)

    # rerun is a no-op (the shared snapshot offset is behind the fence)
    s2 = run_replication(segs, lake, num_partitions=8)
    assert s2["events_applied"] == 0

    # live tail: a Debezium JSONL feed with positions PAST the snapshot
    # updates one key and deletes another — standard handoff, no wiring
    upd_key = ("org/repo1", "src/f1.py")
    del_key = ("org/repo2", "src/f2.py")
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    envs = [
        {"op": "u",
         "before": None,
         "after": {"repo": upd_key[0], "path": upd_key[1],
                   "commit": "cLIVE", "lang": "py", "content": "new"},
         "source": {"db": "inventory", "table": "code_files",
                    "pos": SNAPSHOT_LSN + 1, "txId": f"t:{SNAPSHOT_LSN+1}",
                    "snapshot": False, "schema_version": 0},
         "ts_ms": 1000},
        {"op": "d",
         "before": {"repo": del_key[0], "path": del_key[1],
                    "commit": "c000002", "lang": "rs", "content": "x"},
         "after": None,
         "source": {"db": "inventory", "table": "code_files",
                    "pos": SNAPSHOT_LSN + 2, "txId": f"t:{SNAPSHOT_LSN+2}",
                    "snapshot": False, "schema_version": 0},
         "ts_ms": 2000},
    ]
    with open(os.path.join(feed, "live-000.jsonl"), "w") as fh:
        for e in envs:
            fh.write(json.dumps({"payload": e}) + "\n")
    live_segs = str(tmp_path / "live_segs")
    jsonl_to_segments(feed, live_segs)
    s3 = run_replication(live_segs, lake, num_partitions=8)
    assert s3["events_applied"] == 2

    rows = final_state(lake).take_all()
    got = {(r["repo"], r["path"]): r["commit"] for r in rows}
    assert got[upd_key] == "cLIVE"
    assert del_key not in got
    assert len(got) == len(df) - 1
    assert meta["table"] == DEFAULT_TABLE


def test_bootstrap_validates_shape_and_fresh_dir(ray_session, tmp_path):
    from database_delta_plugins_ray.sources.bootstrap import (
        bootstrap_snapshot_segments)

    bad = str(tmp_path / "bad.parquet")
    pq.write_table(pa.table({"repo": ["a"], "path": ["b"]}), bad)
    with pytest.raises(ValueError, match="lacks required columns"):
        bootstrap_snapshot_segments(bad, str(tmp_path / "s1"))

    good = str(tmp_path / "good.parquet")
    pq.write_table(pa.Table.from_pandas(_source_table(5),
                                        preserve_index=False), good)
    segs = str(tmp_path / "s2")
    bootstrap_snapshot_segments(good, segs)
    with pytest.raises(ValueError, match="fresh directory"):
        bootstrap_snapshot_segments(good, segs)


def test_bootstrap_carries_optional_stars(ray_session, tmp_path):
    from database_delta_plugins_ray.pipelines.replicate import (
        final_state, run_replication)
    from database_delta_plugins_ray.sources.bootstrap import (
        bootstrap_snapshot_segments)

    df = _source_table(20)
    df["stars"] = range(100, 120)
    src = str(tmp_path / "src.parquet")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), src)
    segs = str(tmp_path / "segs")
    bootstrap_snapshot_segments(src, segs)
    lake = str(tmp_path / "lake")
    run_replication(segs, lake, num_partitions=4)
    rows = final_state(lake).take_all()
    got = {(r["repo"], r["path"]): r["stars"] for r in rows}
    assert got == {(r.repo, r.path): r.stars for r in df.itertuples()}

def test_bootstrap_rejects_duplicate_keys(ray_session, tmp_path):
    """Every bootstrap row shares one lsn and tx token, so duplicate
    (repo, path) keys would make LWW nondeterministic — reject them."""
    from database_delta_plugins_ray.sources.bootstrap import (
        bootstrap_snapshot_segments)

    df = _source_table(6)
    df.loc[5, ["repo", "path"]] = df.loc[2, ["repo", "path"]].values
    src = str(tmp_path / "dup.parquet")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), src)
    with pytest.raises(ValueError, match="duplicate"):
        bootstrap_snapshot_segments(src, str(tmp_path / "segs"))
