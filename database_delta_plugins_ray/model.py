"""Data model for the Ray-Data-native CDC engine.

Mirrors the reference event model (CDAP database-delta-plugins):

* ``DMLEvent`` — op INSERT/UPDATE/DELETE + row / previousRow + offset
  (reference: mysql-delta-plugins/src/main/java/io/cdap/delta/mysql/
  MySqlRecordConsumer.java:209-225).
* ``DDLEvent`` — CREATE/ALTER/RENAME/DROP/TRUNCATE with schema + primary key
  (MySqlRecordConsumer.java:238-318).
* ``Offset`` — portable, comparable source position
  (sqlserver SqlServerOffset.java:33-94); here a monotone int64 ``lsn``.

The change stream is a single Arrow table schema (the *event log*): one row
per event, ``before`` / ``after`` as struct columns holding the row image in
the **union payload schema** (the superset of all columns across schema
versions, so every Parquet log segment has an identical physical schema even
while the *logical* schema evolves — version validity is tracked by the
schema registry, see state/ddl.py).
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# Logical table / primary key (per BASELINE.json input_hint)
# ---------------------------------------------------------------------------

DEFAULT_TABLE = "inventory.code_files"
DEFAULT_DATABASE = "inventory"

#: Primary key of the governed input shape (repo, path).
PRIMARY_KEY = ("repo", "path")

# ---------------------------------------------------------------------------
# Payload schemas
# ---------------------------------------------------------------------------

#: Schema version 0 of the source-code table (BASELINE.json input_hint).
BASE_PAYLOAD_FIELDS = [
    pa.field("repo", pa.string(), nullable=False),
    pa.field("path", pa.string(), nullable=False),
    pa.field("commit", pa.string(), nullable=False),
    pa.field("lang", pa.string(), nullable=True),
    pa.field("content", pa.large_string(), nullable=False),
]

#: Union payload = every column that exists in ANY schema version of the
#: default DDL evolution plan (gen.DDL_PLAN_DEFAULT):
#:   v0: repo path commit lang content
#:   v1: + stars (ALTER ADD COLUMN, nullable int64)
#:   v2: lang RENAMED to language
#: Physical log files always carry the union; the registry says which fields
#: are live for a given schema_version.
UNION_PAYLOAD_FIELDS = BASE_PAYLOAD_FIELDS + [
    pa.field("stars", pa.int64(), nullable=True),
    pa.field("language", pa.string(), nullable=True),
]

UNION_PAYLOAD_SCHEMA = pa.schema(UNION_PAYLOAD_FIELDS)
PAYLOAD_STRUCT = pa.struct(UNION_PAYLOAD_FIELDS)

#: Final logical schema after the default evolution plan is fully applied
#: (lang renamed to language, stars added).
FINAL_PAYLOAD_FIELDS = [
    pa.field("repo", pa.string()),
    pa.field("path", pa.string()),
    pa.field("commit", pa.string()),
    pa.field("language", pa.string()),
    pa.field("content", pa.large_string()),
    pa.field("stars", pa.int64()),
]

# ---------------------------------------------------------------------------
# Event log schema (FIXTURES.md F4)
# ---------------------------------------------------------------------------

OP_INSERT = "I"
OP_UPDATE = "U"
OP_DELETE = "D"
OP_DDL = "DDL"

DML_OPS = (OP_INSERT, OP_UPDATE, OP_DELETE)

#: DDL operation names, mirroring the reference DDLOperation enum
#: (MySqlRecordConsumer.java:238-318).
DDL_DROP_TABLE = "DROP_TABLE"
DDL_DROP_DATABASE = "DROP_DATABASE"
DDL_CREATE_DATABASE = "CREATE_DATABASE"
DDL_CREATE_TABLE = "CREATE_TABLE"
DDL_ALTER_TABLE = "ALTER_TABLE"
DDL_RENAME_TABLE = "RENAME_TABLE"
DDL_TRUNCATE_TABLE = "TRUNCATE_TABLE"

DDL_STRUCT = pa.struct(
    [
        pa.field("op", pa.string()),
        pa.field("table", pa.string()),
        pa.field("prev_table", pa.string()),
        # JSON document describing the change:
        #   CREATE_TABLE: {"columns": [[name, type], ...], "primary_key": [...]}
        #   ALTER_TABLE:  {"action": "add"|"rename"|"widen",
        #                  "column": ..., "new_name": ..., "type": ...}
        pa.field("payload", pa.string()),
    ]
)


def event_log_schema() -> pa.Schema:
    """Arrow schema of one binlog segment file (FIXTURES.md F4)."""
    return pa.schema(
        [
            pa.field("lsn", pa.int64(), nullable=False),
            pa.field("tx_id", pa.string()),
            pa.field("op", pa.string(), nullable=False),
            pa.field("table", pa.string(), nullable=False),
            pa.field("before", PAYLOAD_STRUCT),
            pa.field("after", PAYLOAD_STRUCT),
            pa.field("ddl", DDL_STRUCT),
            pa.field("is_snapshot", pa.bool_()),
            pa.field("ingest_ts", pa.timestamp("ms")),
            pa.field("schema_version", pa.int32()),
        ]
    )


# ---------------------------------------------------------------------------
# Target bookkeeping columns
# ---------------------------------------------------------------------------
# The reference's target contract adds _row_id, _source_timestamp,
# _is_deleted, _sequence_num to every target row and compares final state
# ignoring them (mysql-delta-plugins/src/e2e-test/java/io/cdap/plugin/
# BQValidation.java:86-90). We carry the same columns in the lake.

SEQUENCE_NUM = "_sequence_num"  # = lsn of the winning event for this PK
SOURCE_TIMESTAMP = "_source_timestamp"  # = ingest_ts of the winning event
IS_DELETED = "_is_deleted"  # soft-delete marker
ROW_ID = "_row_id"  # tx id of the winning event

BOOKKEEPING_COLUMNS = (ROW_ID, SOURCE_TIMESTAMP, IS_DELETED, SEQUENCE_NUM)
