"""Foreign-store sink (stages/sink_duckdb.py) — the BQValidation-style
e2e contract: full load, incremental apply off the change feed with
target schema evolution, two-sided validation, idempotent re-apply."""
import json
import os

import duckdb
import pytest


def _mk(tmp_path, **kw):
    from database_delta_plugins_ray.sources.gen import (
        GenConfig, generate_log)

    log = str(tmp_path / "log")
    generate_log(log, GenConfig(n_keys=300, n_events=2500, seed=13, **kw))
    return log


def _setup(tmp_path, ray_session):
    from database_delta_plugins_ray.pipelines.replicate import (
        run_replication)
    from database_delta_plugins_ray.stages.sink_duckdb import (
        duckdb_full_load)

    log = _mk(tmp_path)
    with open(os.path.join(log, "meta.json")) as fh:
        half = json.load(fh)["max_lsn"] // 2
    lake = str(tmp_path / "lake")
    db = str(tmp_path / "target.duckdb")
    run_replication(log, lake, num_partitions=4, history=True,
                    upto_lsn=half)
    m = duckdb_full_load(lake, db)
    assert m["rows"] > 0
    run_replication(log, lake, num_partitions=4, history=True)
    return log, lake, db


def test_full_cycle_parity_with_deletes_and_rename(ray_session, tmp_path):
    from database_delta_plugins_ray.pipelines.oracle import replay
    from database_delta_plugins_ray.stages.sink_duckdb import (
        duckdb_apply_changes, duckdb_validate)

    log, lake, db = _setup(tmp_path, ray_session)
    s = duckdb_apply_changes(lake, db)
    assert s["changed"] > 0
    v = duckdb_validate(lake, db)
    assert v["parity"], v

    # the target's rows equal the pure-Python oracle replay (including
    # rows DELETED after the full load, and the lang->language rename
    # the generated DDL plan performs mid-stream)
    con = duckdb.connect(db)
    rows = con.execute(
        'SELECT repo, path, content_sha, "_sequence_num" '
        "FROM lake_target").fetchall()
    cols = {r[0] for r in con.execute("DESCRIBE lake_target").fetchall()}
    con.close()
    assert "language" in cols and "lang" not in cols
    got = {(r, p): (sha, int(seq)) for r, p, sha, seq in rows}
    want = {(k[1], k[2]): (v["content_sha"], v["_sequence_num"])
            for k, v in replay(log).items()}
    assert got == want


def test_apply_is_idempotent_and_noop_when_caught_up(ray_session,
                                                     tmp_path):
    from database_delta_plugins_ray.stages.sink_duckdb import (
        duckdb_apply_changes, duckdb_validate)

    _, lake, db = _setup(tmp_path, ray_session)
    s1 = duckdb_apply_changes(lake, db)
    assert s1["changed"] > 0
    # caught up: nothing to do
    s2 = duckdb_apply_changes(lake, db)
    assert s2["changed"] == 0 and s2["watermark"] == s1["watermark"]
    # simulate a crash BEFORE the watermark bump: rewind the stamp and
    # re-apply — the delete+insert upsert converges to the same state
    con = duckdb.connect(db)
    con.execute("UPDATE _sink_state SET watermark = ?",
                [s1["watermark"] // 2])
    con.close()
    duckdb_apply_changes(lake, db)
    assert duckdb_validate(lake, db)["parity"]


def test_validate_catches_target_corruption(ray_session, tmp_path):
    from database_delta_plugins_ray.stages.sink_duckdb import (
        duckdb_apply_changes, duckdb_validate)

    _, lake, db = _setup(tmp_path, ray_session)
    duckdb_apply_changes(lake, db)
    con = duckdb.connect(db)
    con.execute("UPDATE lake_target SET content_sha = 'corrupt' WHERE "
                "rowid IN (SELECT rowid FROM lake_target LIMIT 1)")
    con.close()
    v = duckdb_validate(lake, db)
    assert not v["parity"]
    assert v["only_in_source"] == 1 and v["only_in_target"] == 1
