"""SQL-text DDL front-end (V14 enum-option escaping, V15 quoted-identifier
parsing, M11 SQL route) — unit tests mirror the reference parser's
behaviors (MySqlAntlrDdlParser.java:89-101 escapeOption, :286-322
parseQualifiedTableId, :134-258 type table); the end-to-end test rewrites
a generated log's structured DDL rows into raw SQL and proves the
replicated lake is identical."""

import json

import pytest

from database_delta_plugins_ray.state import sqlddl as sd
from database_delta_plugins_ray.state.ddl import Registry


# ---------------------------------------------------------------------------
# V15: quoted identifiers
# ---------------------------------------------------------------------------


def test_qualified_id_plain_and_quoted():
    assert sd.split_qualified_id("db.tbl") == ("db", "tbl")
    assert sd.split_qualified_id("`db`.`tbl`") == ("db", "tbl")
    assert sd.split_qualified_id("tbl", "dflt") == ("dflt", "tbl")
    assert sd.split_qualified_id('"db"."tbl"') == ("db", "tbl")


def test_qualified_id_quoted_dot_is_part_of_name():
    # a dot inside quotes is NOT a separator (reference :311-314)
    assert sd.split_qualified_id("`my.db`.`ta.ble`") == ("my.db", "ta.ble")


def test_qualified_id_doubled_quote_escape():
    # escape of quote by doubling (reference :300-306)
    assert sd.split_qualified_id("`my``db`.`t``bl`") == ("my`db", "t`bl")


def test_qualified_id_foreign_quote_is_literal():
    # a quote char different from the opening quote is part of the name
    assert sd.split_qualified_id("`it's`.`x\"y`") == ("it's", 'x"y')


# ---------------------------------------------------------------------------
# V14: enum/set option escaping
# ---------------------------------------------------------------------------


def test_escape_option_reference_rules():
    # comma -> backslash-comma; \' -> '; '' -> '
    assert sd.escape_option("a,b") == "a\\,b"
    assert sd.escape_option("it\\'s") == "it's"
    assert sd.escape_option("it''s") == "it's"


def test_extract_enum_and_set_options():
    raw = ["'a'", "'b''c'", "'d\\'e'", "'f,g'"]
    assert sd.extract_enum_and_set_options(raw) == [
        "a", "b'c", "d'e", "f\\,g"]


def test_enum_type_maps_with_options():
    typ, conv = sd.map_column_type("ENUM('red','green','bl''ue')")
    assert typ == "string"
    assert conv == "enum:red,green,bl'ue"


# ---------------------------------------------------------------------------
# type table (MySqlAntlrDdlParser.java:134-258)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("text,want", [
    ("BIGINT(20)", ("int64", None)),
    ("BIGINT(20) UNSIGNED", ("decimal(20,0)", "unsigned:BIGINT")),
    ("MEDIUMINT(9)", ("int32", None)),
    ("MEDIUMINT(8) UNSIGNED", ("int32", "unsigned:MEDIUMINT")),
    ("INT(10) UNSIGNED", ("int64", "unsigned:INT")),
    ("SERIAL", ("int64", None)),
    ("DECIMAL(10,2)", ("decimal(10,2)", None)),
    ("NUMERIC", ("decimal(10,0)", None)),
    ("TIMESTAMP", ("timestamp_micros", None)),  # zoned (:216-218)
    ("DATETIME", ("datetime", None)),           # local
    ("YEAR", ("int32", "year")),
    ("LONGTEXT", ("large_string", None)),
    ("TINYTEXT", ("large_string", None)),
    ("BINARY(8)", ("binary(8)", "binary_pad:8")),
    ("VARBINARY(100)", ("bytes", None)),
    ("JSON", ("string", "json")),
    ("BIT(1)", ("bool", None)),
    ("TIME(6)", ("time_micros", None)),
])
def test_type_table(text, want):
    assert sd.map_column_type(text) == want


# ---------------------------------------------------------------------------
# statements
# ---------------------------------------------------------------------------


def test_create_table_inline_and_table_level_pk():
    evs = sd.parse_ddl_sql(
        "CREATE TABLE `inventory`.`t1` ("
        "`id` VARCHAR(100) PRIMARY KEY, "
        "`n` INT(11), "
        "`e` ENUM('A','B'), "
        "KEY idx_n (`n`))")
    (op, table, prev, payload), = evs
    doc = json.loads(payload)
    assert (op, table, prev) == ("CREATE_TABLE", "inventory.t1", "")
    assert doc["primary_key"] == ["id"]
    assert doc["columns"] == [["id", "string"], ["n", "int32"],
                              ["e", "string", "enum:A,B"]]

    evs2 = sd.parse_ddl_sql(
        "CREATE TABLE t2 (a VARCHAR(10), b VARCHAR(10), c BIGINT, "
        "PRIMARY KEY (a, b))", default_db="inventory")
    doc2 = json.loads(evs2[0][3])
    assert evs2[0][1] == "inventory.t2"
    assert doc2["primary_key"] == ["a", "b"]


def test_alter_clauses_and_change_expansion():
    evs = sd.parse_ddl_sql(
        "ALTER TABLE `inventory`.`t1` ADD COLUMN `stars` BIGINT, "
        "RENAME COLUMN `lang` TO `language`, "
        "MODIFY COLUMN `n` BIGINT")
    assert [json.loads(p)["action"] for _, _, _, p in evs] == [
        "add", "rename", "widen"]
    # CHANGE old new type == rename + widen
    evs2 = sd.parse_ddl_sql(
        "ALTER TABLE inventory.t1 CHANGE `a` `b` BIGINT")
    assert [json.loads(p)["action"] for _, _, _, p in evs2] == [
        "rename", "widen"]
    assert json.loads(evs2[0][3]) == {
        "action": "rename", "column": "a", "new_name": "b"}


def test_rename_drop_truncate_database():
    assert sd.parse_ddl_sql("CREATE DATABASE IF NOT EXISTS `inv`") == [
        ("CREATE_DATABASE", "inv", "", "{}")]
    assert sd.parse_ddl_sql("DROP DATABASE inv") == [
        ("DROP_DATABASE", "inv", "", "{}")]
    assert sd.parse_ddl_sql("DROP TABLE IF EXISTS `inv`.`t`") == [
        ("DROP_TABLE", "inv.t", "", "{}")]
    assert sd.parse_ddl_sql("TRUNCATE TABLE `inv`.`t`") == [
        ("TRUNCATE_TABLE", "inv.t", "", "{}")]
    (op, table, prev, payload), = sd.parse_ddl_sql(
        "RENAME TABLE `inv`.`old` TO `inv`.`new`")
    assert (op, table, prev) == ("RENAME_TABLE", "inv.new", "inv.old")


def test_registry_from_sql_matches_structured():
    """The SQL route must land the registry in the same state as the
    structured-DDL route for the generator's schema + ALTER plan."""
    stmts = [
        "CREATE DATABASE `inventory`",
        ("CREATE TABLE `inventory`.`code_files` (`repo` VARCHAR(255), "
         "`path` VARCHAR(255), `commit` VARCHAR(64), `lang` VARCHAR(32), "
         "`content` LONGTEXT, PRIMARY KEY (`repo`, `path`))"),
        "ALTER TABLE `inventory`.`code_files` ADD COLUMN `stars` BIGINT",
        "ALTER TABLE `inventory`.`code_files` RENAME COLUMN `lang` TO `language`",
        "ALTER TABLE `inventory`.`code_files` MODIFY COLUMN `stars` BIGINT",
    ]
    reg = Registry()
    lsn = 0
    for stmt in stmts:
        for op, table, prev, payload in sd.parse_ddl_sql(stmt):
            lsn += 1
            reg.apply(lsn, op, table, prev, payload)
    ts = reg.tables["inventory.code_files"]
    assert [c for c, _ in ts.columns] == [
        "repo", "path", "commit", "language", "content", "stars"]
    assert dict(ts.columns)["content"] == "large_string"
    assert dict(ts.columns)["stars"] == "int64"
    assert ts.primary_key == ["repo", "path"]
    assert ts.version == 3
    assert ts.history_names["language"] == ["language", "lang"]


@pytest.mark.usefixtures("ray_session")
def test_sql_ddl_log_replicates_identically(tmp_path):
    """End-to-end M11 SQL route: rewrite a generated log's structured DDL
    rows as raw SQL statements (op in the ddl struct becomes 'SQL', the
    payload carries the statement); replication over the rewritten log
    must produce the SAME lake as the oracle replay of the original."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from database_delta_plugins_ray.pipelines.oracle import replay
    from database_delta_plugins_ray.pipelines.replicate import (
        final_state,
        run_replication,
    )
    from database_delta_plugins_ray.sources.gen import GenConfig, generate_log

    log = str(tmp_path / "log")
    generate_log(log, GenConfig(n_keys=300, n_events=2500, n_repos=6,
                                seed=71, n_segments=3))

    def to_sql(op, table, prev, payload):
        doc = json.loads(payload) if payload else {}
        db, _, name = table.partition(".")
        tid = f"`{db}`.`{name}`" if name else f"`{table}`"
        if op == "DROP_TABLE":
            return f"DROP TABLE IF EXISTS {tid}"
        if op == "DROP_DATABASE":
            return f"DROP DATABASE IF EXISTS `{table}`"
        if op == "CREATE_DATABASE":
            return f"CREATE DATABASE `{table}`"
        if op == "CREATE_TABLE":
            type_sql = {"string": "VARCHAR(255)", "large_string": "LONGTEXT",
                        "int64": "BIGINT", "int32": "INT"}
            cols = ", ".join(
                f"`{c[0]}` {type_sql[c[1]]}" for c in doc["columns"])
            pk = ", ".join(f"`{k}`" for k in doc["primary_key"])
            return f"CREATE TABLE {tid} ({cols}, PRIMARY KEY ({pk}))"
        if op == "ALTER_TABLE":
            a = doc["action"]
            if a == "add":
                return (f"ALTER TABLE {tid} ADD COLUMN "
                        f"`{doc['column']}` BIGINT")
            if a == "rename":
                return (f"ALTER TABLE {tid} RENAME COLUMN "
                        f"`{doc['column']}` TO `{doc['new_name']}`")
            if a == "widen":
                return (f"ALTER TABLE {tid} MODIFY COLUMN "
                        f"`{doc['column']}` BIGINT")
        raise AssertionError(f"unhandled ddl op {op}")

    sql_log = str(tmp_path / "sql_log")
    os.makedirs(sql_log)
    for f in sorted(os.listdir(log)):
        if not f.startswith("seg-"):
            continue
        t = pq.read_table(os.path.join(log, f))
        rows = t.to_pylist()
        for r in rows:
            if r["ddl"] is not None:
                stmt = to_sql(r["ddl"]["op"], r["ddl"]["table"],
                              r["ddl"]["prev_table"], r["ddl"]["payload"])
                r["ddl"] = {"op": "SQL", "table": r["ddl"]["table"],
                            "prev_table": "",
                            "payload": json.dumps({"sql": stmt})}
        pq.write_table(pa.Table.from_pylist(rows, schema=t.schema),
                       os.path.join(sql_log, f))

    lake = str(tmp_path / "lake")
    run_replication(sql_log, lake, num_partitions=4)
    oracle = replay(log)
    rows = final_state(lake).take_all()
    got = {(r["table"], r["repo"], r["path"]): r for r in rows}
    assert set(got) == set(oracle)
    for k, o in oracle.items():
        assert got[k]["content_sha"] == o["content_sha"], k
        assert got[k]["_sequence_num"] == o["_sequence_num"], k


@pytest.mark.usefixtures("ray_session")
def test_debezium_envelope_with_raw_sql_ddl(tmp_path):
    """Debezium schema-change envelopes carry RAW SQL in the ddl block;
    the reader maps them to the SQL route and a full replication over the
    feed applies the parsed DDL (schema includes the ALTER-added
    column)."""
    from database_delta_plugins_ray.pipelines.replicate import (
        final_state,
        run_replication,
    )
    from database_delta_plugins_ray.sources.debezium_json import (
        jsonl_to_segments,
    )

    lines = [
        {"payload": {"source": {"db": "inv", "table": "t", "pos": 1},
                     "ts_ms": 0,
                     "ddl": {"sql": "CREATE DATABASE `inv`"}}},
        {"payload": {"source": {"db": "inv", "table": "t", "pos": 2},
                     "ts_ms": 0,
                     "ddl": {"sql": (
                         "CREATE TABLE `inv`.`t` (`repo` VARCHAR(64), "
                         "`path` VARCHAR(64), `content` LONGTEXT, "
                         "PRIMARY KEY (`repo`,`path`))")}}},
        {"payload": {"op": "c", "ts_ms": 5,
                     "source": {"db": "inv", "table": "t", "pos": 3,
                                "txId": "tx3"},
                     "after": {"repo": "r1", "path": "p1",
                               "content": "hello"}}},
        {"payload": {"source": {"db": "inv", "table": "t", "pos": 4},
                     "ts_ms": 0,
                     "ddl": {"sql": ("ALTER TABLE `inv`.`t` ADD COLUMN "
                                     "`stars` BIGINT")}}},
        {"payload": {"op": "u", "ts_ms": 6,
                     "source": {"db": "inv", "table": "t", "pos": 5,
                                "txId": "tx5"},
                     "before": {"repo": "r1", "path": "p1",
                                "content": "hello"},
                     "after": {"repo": "r1", "path": "p1",
                               "content": "world", "stars": 7}}},
    ]
    feed = tmp_path / "feed.jsonl"
    with open(feed, "w") as fh:
        for ln in lines:
            fh.write(json.dumps(ln) + "\n")

    segs = str(tmp_path / "segs")
    meta = jsonl_to_segments(str(feed), segs)
    assert meta["total_events"] == 5
    lake = str(tmp_path / "lake")
    run_replication(segs, lake, num_partitions=2, compute_sha=False)
    rows = final_state(lake).take_all()
    assert len(rows) == 1
    r = rows[0]
    assert (r["repo"], r["path"], r["content"]) == ("r1", "p1", "world")
    assert r["stars"] == 7  # ALTER-added column flowed through


# ---------------------------------------------------------------------------
# round-5 grammar breadth (MySqlAntlrDdlParser.java:103-258 dialect paths):
# DROP COLUMN, charset/collate clauses, generated columns, multi-ADD,
# no-schema-shape clauses, multi-statement scripts
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("text,want", [
    ("VARCHAR(255) CHARACTER SET utf8mb4 COLLATE utf8mb4_bin",
     ("string", "charset:utf8mb4")),
    ("VARCHAR(10) CHARSET latin1", ("string", "charset:latin1")),
    ("TEXT CHARACTER SET `greek`", ("large_string", "charset:greek")),
    ("VARCHAR(64) COLLATE utf8_general_ci", ("string", None)),
    ("CHAR(3)", ("string", None)),
    # generated columns keep their declared type; the expression (and
    # any UNSIGNED/CHARSET words inside it) is stripped
    ("VARCHAR(101) GENERATED ALWAYS AS (CONCAT(a, ' ', b)) VIRTUAL",
     ("string", None)),
    ("INT AS (price * qty) STORED", ("int32", None)),
    ("BIGINT GENERATED ALWAYS AS (CAST(x AS UNSIGNED)) STORED",
     ("int64", None)),
])
def test_type_table_charset_collate_generated(text, want):
    assert sd.map_column_type(text) == want


def _reg_with_t():
    reg = Registry()
    for ev in sd.parse_ddl_sql(
            "CREATE TABLE db.t (id INT PRIMARY KEY, a INT, b TEXT)"):
        reg.apply(1, *ev)
    return reg


def test_alter_drop_column():
    reg = _reg_with_t()
    (ev,) = sd.parse_ddl_sql("ALTER TABLE db.t DROP COLUMN a")
    reg.apply(2, *ev)
    assert [c for c, _ in reg.tables["db.t"].columns] == ["id", "b"]
    # bare DROP (no COLUMN keyword) is the same statement
    (ev2,) = sd.parse_ddl_sql("ALTER TABLE db.t DROP b")
    reg.apply(3, *ev2)
    assert [c for c, _ in reg.tables["db.t"].columns] == ["id"]


def test_drop_primary_key_column_rejected():
    from database_delta_plugins_ray.state.ddl import DeltaFailure

    reg = _reg_with_t()
    (ev,) = sd.parse_ddl_sql("ALTER TABLE db.t DROP COLUMN id")
    with pytest.raises(DeltaFailure):
        reg.apply(2, *ev)


def test_alter_multi_add_parenthesized():
    events = sd.parse_ddl_sql(
        "ALTER TABLE db.t ADD COLUMN (x INT, y VARCHAR(5) "
        "CHARACTER SET latin1)")
    docs = [json.loads(p) for _, _, _, p in events]
    assert [(d["action"], d["column"], d["type"]) for d in docs] == [
        ("add", "x", "int32"), ("add", "y", "string")]
    assert docs[1]["converter"] == "charset:latin1"


def test_alter_ignorable_clauses_emit_nothing():
    for stmt in [
        "ALTER TABLE db.t ADD INDEX idx_a (a)",
        "ALTER TABLE db.t ADD UNIQUE KEY uk (a, b)",
        "ALTER TABLE db.t ADD CONSTRAINT fk FOREIGN KEY (a) REFERENCES o(id)",
        "ALTER TABLE db.t DROP INDEX idx_a",
        "ALTER TABLE db.t ALTER COLUMN a SET DEFAULT 7",
        "ALTER TABLE db.t ALTER a DROP DEFAULT",
        "ALTER TABLE db.t ENGINE = InnoDB",
        "ALTER TABLE db.t AUTO_INCREMENT = 100",
        "ALTER TABLE db.t DEFAULT CHARACTER SET utf8mb4",
        "ALTER TABLE db.t CONVERT TO CHARACTER SET utf8mb4",
        "ALTER TABLE db.t COMMENT = 'hi'",
    ]:
        assert sd.parse_ddl_sql(stmt) == [], stmt
    # mixed clause list: only the schema-shaping clause emits
    events = sd.parse_ddl_sql(
        "ALTER TABLE db.t ADD COLUMN z INT, ADD INDEX iz (z), "
        "ENGINE = InnoDB")
    assert len(events) == 1
    assert json.loads(events[0][3])["column"] == "z"


def test_split_statements_comments_and_quotes():
    script = (
        "CREATE TABLE a (id INT PRIMARY KEY); -- trailing comment; fake\n"
        "# hash comment; also fake\n"
        "/* block ; comment */\n"
        "INSERT_MARKER 'a ; literal ''x'' stays';\n"
    )
    stmts = sd.split_statements(script)
    assert stmts[0].startswith("CREATE TABLE a")
    assert stmts[1] == "INSERT_MARKER 'a ; literal ''x'' stays'"
    assert len(stmts) == 2


def test_parse_ddl_script_use_and_skips():
    script = """
    SET NAMES utf8mb4;
    USE inventory;
    CREATE TABLE t (id INT PRIMARY KEY, v VARCHAR(10));
    CREATE INDEX iv ON t (v);
    LOCK TABLES t WRITE;
    ALTER TABLE t ADD COLUMN w TEXT;
    UNLOCK TABLES;
    USE other;
    DROP TABLE t2;
    """
    events = sd.parse_ddl_script(script)
    assert [(op, t) for op, t, _, _ in events] == [
        ("CREATE_TABLE", "inventory.t"),
        ("ALTER_TABLE", "inventory.t"),
        ("DROP_TABLE", "other.t2"),
    ]


def test_parse_ddl_script_skip_unsupported():
    script = "CREATE TABLE t (id INT PRIMARY KEY); WEIRD STATEMENT 1;"
    with pytest.raises(ValueError):
        sd.parse_ddl_script(script, "db")
    events = sd.parse_ddl_script(script, "db", skip_unsupported=True)
    assert [op for op, *_ in events] == ["CREATE_TABLE"]


def test_script_registry_lifecycle_with_drop_and_charset():
    reg = Registry()
    for ev in sd.parse_ddl_script("""
        USE shop;
        CREATE TABLE items (
          id INT PRIMARY KEY,
          name VARCHAR(40) CHARACTER SET latin1,
          qty INT,
          total BIGINT GENERATED ALWAYS AS (qty * 2) STORED,
          KEY k_name (name)
        );
        ALTER TABLE items DROP COLUMN qty, ADD COLUMN price DECIMAL(10,2);
    """):
        reg.apply(1, *ev)
    ts = reg.tables["shop.items"]
    assert [c for c, _ in ts.columns] == ["id", "name", "total", "price"]
    assert dict(ts.columns)["price"] == "decimal(10,2)"
    assert ts.converters["name"] == "charset:latin1"


def test_create_table_partition_options_and_like():
    """Balanced body extraction: trailing table options with parens
    (PARTITION BY RANGE COLUMNS(...) (...)) must not leak into the
    column list; CREATE TABLE ... LIKE clones the source schema."""
    reg = Registry()
    for ev in sd.parse_ddl_script("""
      CREATE TABLE db.t (id INT PRIMARY KEY, v TEXT)
        PARTITION BY RANGE COLUMNS(id, v)
        (PARTITION p0 VALUES LESS THAN (10, 'mm'));
      CREATE TABLE db.t2 LIKE db.t;
      CREATE TABLE db.t3 (a INT PRIMARY KEY, note VARCHAR(20)
        DEFAULT 'a(b');
    """):
        reg.apply(1, *ev)
    assert reg.tables["db.t"].columns == [("id", "int32"),
                                          ("v", "large_string")]
    assert reg.tables["db.t2"].columns == reg.tables["db.t"].columns
    assert reg.tables["db.t2"].primary_key == ["id"]
    # quoted default containing an unbalanced paren parses intact
    assert reg.tables["db.t3"].columns == [("a", "int32"),
                                           ("note", "string")]


def test_create_like_unknown_source_rejected():
    from database_delta_plugins_ray.state.ddl import DeltaFailure

    reg = Registry()
    (ev,) = sd.parse_ddl_sql("CREATE TABLE db.x LIKE db.nope")
    with pytest.raises(DeltaFailure):
        reg.apply(1, *ev)


def test_primary_key_change_raises_loudly():
    """ADD/DROP PRIMARY KEY changes the row-identity rule every fence
    and LWW merge keys on — it must fail fast, never be silently
    swallowed as an ignorable index clause."""
    for stmt in [
        "ALTER TABLE db.t DROP PRIMARY KEY",
        "ALTER TABLE db.t DROP PRIMARY KEY, ADD PRIMARY KEY (uid)",
        "ALTER TABLE db.t ADD CONSTRAINT pk PRIMARY KEY (uid)",
        "ALTER TABLE db.t ADD COLUMN id2 INT PRIMARY KEY",
    ]:
        with pytest.raises(ValueError, match="primary-key change"):
            sd.parse_ddl_sql(stmt)
    # a quoted literal mentioning the phrase is NOT a key change
    events = sd.parse_ddl_sql(
        "ALTER TABLE db.t ADD COLUMN note VARCHAR(30) "
        "DEFAULT 'primary key'")
    assert len(events) == 1


def test_quoted_literals_do_not_confuse_modifier_scans():
    """'AS (', 'CHARACTER SET x', 'UNSIGNED' inside quoted literals
    (ENUM options, DEFAULTs, COMMENTs) must not alter the parsed type."""
    typ, conv = sd.map_column_type("ENUM('x','as (b)')")
    assert (typ, conv) == ("string", "enum:x,as (b)")
    typ, conv = sd.map_column_type("ENUM('a)','b')")
    assert (typ, conv) == ("string", "enum:a),b")
    typ, conv = sd.map_column_type(
        "VARCHAR(10) DEFAULT 'character set foo'")
    assert (typ, conv) == ("string", None)
    typ, conv = sd.map_column_type("INT COMMENT 'unsigned'")
    assert (typ, conv) == ("int32", None)
    typ, conv = sd.map_column_type(
        "VARCHAR(10) CHARACTER SET latin1 COMMENT 'charset utf8'")
    assert (typ, conv) == ("string", "charset:latin1")


def test_pk_change_alternative_spellings_raise():
    """MODIFY/CHANGE ... PRIMARY KEY, the bare KEY column attribute, and
    MySQL's index-name spelling DROP INDEX `PRIMARY` are all primary-key
    changes and must raise — while UNIQUE KEY stays an ignorable index
    clause and key-ish column NAMES stay legal."""
    for stmt in [
        "ALTER TABLE db.t MODIFY COLUMN id INT PRIMARY KEY",
        "ALTER TABLE db.t CHANGE id uid BIGINT PRIMARY KEY",
        "ALTER TABLE db.t ADD COLUMN id2 INT KEY",
        "ALTER TABLE db.t DROP INDEX `PRIMARY`",
        "ALTER TABLE db.t DROP KEY `PRIMARY`",
    ]:
        with pytest.raises(ValueError, match="primary-key change"):
            sd.parse_ddl_sql(stmt)
    with pytest.raises(ValueError, match="primary-key change"):
        sd.parse_ddl_script("DROP INDEX `PRIMARY` ON db.t;")
    # NOT key changes: unique-key clause, plain index drop, key-ish names
    assert sd.parse_ddl_sql("ALTER TABLE db.t ADD UNIQUE KEY uk (a)") == []
    assert sd.parse_ddl_sql("ALTER TABLE db.t DROP INDEX idx_key") == []
    (ev,) = sd.parse_ddl_sql(
        "ALTER TABLE db.t ADD COLUMN key_col INT UNIQUE KEY")
    assert json.loads(ev[3])["column"] == "key_col"
