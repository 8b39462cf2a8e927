"""Schema-evolution registry unit tests (DDL transition function +
persisted history; MySqlRecordConsumer.java:238-318 / DBSchemaHistory
analogs)."""

import json

import pyarrow as pa
import pytest

from database_delta_plugins_ray.state.ddl import DeltaFailure, Registry


def create(reg, table="db.t", cols=None, pk=("id",)):
    cols = cols or [["id", "int64"], ["name", "string"]]
    reg.apply(1, "CREATE_TABLE", table, "",
              json.dumps({"columns": cols, "primary_key": list(pk)}))


def test_create_and_plan():
    reg = Registry()
    create(reg)
    plan = reg.coalesce_plan("db.t")
    assert [(f, h) for f, h, _ in plan] == [("id", ["id"]), ("name", ["name"])]
    assert reg.tables["db.t"].primary_key == ["id"]


def test_no_pk_rejected():
    # SqlServerRecordConsumer.java:129-133
    reg = Registry()
    with pytest.raises(DeltaFailure):
        create(reg, pk=())


def test_alter_add_rename_widen():
    reg = Registry()
    create(reg)
    reg.apply(5, "ALTER_TABLE", "db.t", "",
              json.dumps({"action": "add", "column": "n", "type": "int32"}))
    reg.apply(6, "ALTER_TABLE", "db.t", "",
              json.dumps({"action": "widen", "column": "n", "type": "int64"}))
    reg.apply(7, "ALTER_TABLE", "db.t", "",
              json.dumps({"action": "rename", "column": "name", "new_name": "label"}))
    plan = {f: (h, t) for f, h, t in reg.coalesce_plan("db.t")}
    assert plan["n"][1] == pa.int64()
    assert plan["label"][0] == ["label", "name"]  # newest-first history
    assert reg.tables["db.t"].version == 3


def test_illegal_widen_rejected():
    reg = Registry()
    create(reg, cols=[["id", "int64"], ["n", "int64"]])
    with pytest.raises(DeltaFailure):
        reg.apply(5, "ALTER_TABLE", "db.t", "",
                  json.dumps({"action": "widen", "column": "n", "type": "int32"}))


def test_truncate_and_drop_fences():
    reg = Registry()
    create(reg)
    reg.apply(100, "TRUNCATE_TABLE", "db.t", "", "{}")
    assert reg.fences() == {"db.t": 100}
    reg.apply(200, "DROP_TABLE", "db.t", "", "{}")
    assert reg.fences() == {"db.t": 200}


def test_rename_table():
    reg = Registry()
    create(reg)
    reg.apply(50, "RENAME_TABLE", "db.t2", "db.t",
              json.dumps({"new_name": "db.t2"}))
    assert reg.resolve_table("db.t") == "db.t2"
    assert "db.t2" in reg.tables and "db.t" not in reg.tables


def test_history_roundtrip(tmp_path):
    # DBSchemaHistory.java:60-95 persist + replay
    reg = Registry()
    create(reg)
    reg.apply(5, "ALTER_TABLE", "db.t", "",
              json.dumps({"action": "add", "column": "n", "type": "int32"}))
    p = str(tmp_path / "hist.jsonl")
    reg.save(p)
    reg2 = Registry.load(p)
    assert [c for c, _ in reg2.tables["db.t"].columns] == ["id", "name", "n"]
    assert reg2.tables["db.t"].version == 1


def test_ddl_blacklist_skips_events(tmp_path):
    # M10: per-table DDL-kind suppression (MySqlRecordConsumer.java:347-356)
    from database_delta_plugins_ray.sources.gen import GenConfig, generate_log
    from database_delta_plugins_ray.state.ddl import build_registry

    d = str(tmp_path / "log")
    generate_log(d, GenConfig(n_keys=30, n_events=200, n_repos=2, seed=4,
                              ddl_plan=True, n_segments=1))
    reg_all = build_registry(d)
    t = "inventory.code_files"
    assert reg_all.tables[t].version == 3
    reg_bl = build_registry(
        d, ddl_blacklist={(t, "ALTER_TABLE")})
    assert reg_bl.tables[t].version == 0
    assert [c for c, _ in reg_bl.tables[t].columns] == [
        "repo", "path", "commit", "lang", "content"]
