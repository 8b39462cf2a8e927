"""Type system: portable type names <-> Arrow types, and the design-time
column assessor reproducing the reference's JDBC -> CDAP mapping rules
(SURVEY.md §1.2b).

Runtime mapping analog of Records.java:313-391 (Connect schema -> CDAP
schema); design-time analog of MySqlTableAssessor.evaluateColumn
(mysql-delta-plugins/src/main/java/io/cdap/delta/mysql/MySqlTableAssessor.java:87-162)
and SqlServerTableAssessor.evaluateColumn
(sqlserver-delta-plugins/src/main/java/io/cdap/delta/sqlserver/SqlServerTableAssessor.java:59-171).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pyarrow as pa

# ---------------------------------------------------------------------------
# portable type-name <-> Arrow
# ---------------------------------------------------------------------------

_SIMPLE = {
    "bool": pa.bool_(),
    "boolean": pa.bool_(),
    "int32": pa.int32(),
    "int": pa.int32(),
    "int64": pa.int64(),
    "long": pa.int64(),
    "float32": pa.float32(),
    "float": pa.float32(),
    "float64": pa.float64(),
    "double": pa.float64(),
    "string": pa.string(),
    "large_string": pa.large_string(),
    "bytes": pa.binary(),
    "binary": pa.binary(),
    "date": pa.date32(),
    "date32": pa.date32(),
    "time_millis": pa.time32("ms"),
    "time_micros": pa.time64("us"),
    "datetime": pa.timestamp("us"),  # timezone-less (Records.java:354-357)
    "timestamp_micros": pa.timestamp("us", tz="UTC"),  # Records.java:333-334
    "timestamp_millis": pa.timestamp("ms", tz="UTC"),
}

_DECIMAL_RE = re.compile(r"decimal\((\d+),\s*(\d+)\)")
_FIXED_BINARY_RE = re.compile(r"binary\((\d+)\)")


def arrow_type(name: str) -> pa.DataType:
    """Resolve a portable type name to an Arrow type."""
    n = name.strip().lower()
    if n in _SIMPLE:
        return _SIMPLE[n]
    m = _DECIMAL_RE.fullmatch(n)
    if m:
        return pa.decimal128(int(m.group(1)), int(m.group(2)))
    m = _FIXED_BINARY_RE.fullmatch(n)
    if m:
        return pa.binary(int(m.group(1)))
    raise ValueError(f"unknown type name: {name!r}")


def type_name(t: pa.DataType) -> str:
    for name, typ in _SIMPLE.items():
        if typ == t:
            return name
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_fixed_size_binary(t):
        return f"binary({t.byte_width})"
    raise ValueError(f"no portable name for {t}")


# ---------------------------------------------------------------------------
# widening lattice (schema evolution; north_star: "widens ... exactly as the
# reference's assessor tests dictate")
# ---------------------------------------------------------------------------

#: allowed widenings src -> dst (INT16 widened to int per Records.java:289-290;
#: unsigned widening chain per MySqlValueConverters.java:270-300;
#: time millis->micros per SqlServerTableAssessor scale rules :107-119).
_WIDEN: dict[str, set[str]] = {
    "int32": {"int64", "decimal(20,0)", "float64"},
    "int64": {"decimal(20,0)", "float64"},
    "float32": {"float64"},
    "time_millis": {"time_micros"},
    "timestamp_millis": {"timestamp_micros"},
    "string": {"large_string"},
}


def can_widen(src: str, dst: str) -> bool:
    if src == dst:
        return True
    return dst in _WIDEN.get(src, set())


# ---------------------------------------------------------------------------
# design-time assessor (SURVEY.md §1.2b)
# ---------------------------------------------------------------------------

SUPPORT_YES = "YES"
SUPPORT_PARTIAL = "PARTIAL"
SUPPORT_NO = "NO"

MAX_SUPPORTED_SCALE = 6  # SqlServerTableAssessor.java:45
MILLIS_SCALE = 3  # SqlServerTableAssessor.java:46


@dataclass
class ColumnAssessment:
    name: str
    source_type: str
    support: str
    arrow_type: pa.DataType | None = None
    suggestion: str = ""


@dataclass
class SourceColumnSpec:
    """A design-time source column (JDBC-catalog analog)."""

    name: str
    sql_type: str  # e.g. "INT", "DECIMAL", "DATETIME2", "TIME", "GEOMETRY"
    precision: int | None = None
    scale: int | None = None
    nullable: bool = True
    unsigned: bool = False


def evaluate_column(col: SourceColumnSpec) -> ColumnAssessment:
    """Map one source column to an Arrow type + support level.

    Rules transcribed from MySqlTableAssessor.evaluateColumn
    (MySqlTableAssessor.java:87-162) and SqlServerTableAssessor.evaluateColumn
    (SqlServerTableAssessor.java:59-171): BIT->bool, TINYINT/SMALLINT/INT->int
    (unsigned widened per MySqlValueConverters.java:270-300), BIGINT->long
    (unsigned -> decimal(20,0)), REAL/FLOAT->float, DOUBLE->double,
    NUMERIC/DECIMAL->decimal(p,s), DATE->date, TIME scale<=3 -> TIME_MILLIS
    else TIME_MICROS with scale>6 PARTIAL, DATETIME/DATETIME2 -> DATETIME with
    scale>6 PARTIAL, TIMESTAMP->TIMESTAMP_MICROS, binary family->bytes,
    char/text family->string, GEOMETRY/GEOGRAPHY/SQLXML/DATETIMEOFFSET -> NO.
    """
    t = col.sql_type.upper()
    name = col.name

    def yes(at):
        return ColumnAssessment(name, t, SUPPORT_YES, at)

    if t == "BIT":
        return yes(pa.bool_())
    if t in ("TINYINT", "SMALLINT", "MEDIUMINT"):
        return yes(pa.int32())
    if t in ("INT", "INTEGER"):
        return yes(pa.int64() if col.unsigned else pa.int32())
    if t == "BIGINT":
        return yes(pa.decimal128(20, 0) if col.unsigned else pa.int64())
    if t in ("REAL", "FLOAT"):
        return yes(pa.float32())
    if t in ("DOUBLE", "DOUBLE PRECISION"):
        return yes(pa.float64())
    if t in ("NUMERIC", "DECIMAL"):
        p = col.precision if col.precision is not None else 38
        s = col.scale if col.scale is not None else 0
        return yes(pa.decimal128(p, s))
    if t == "DATE":
        return yes(pa.date32())
    if t == "TIME":
        s = col.scale if col.scale is not None else 0
        if s <= MILLIS_SCALE:
            return yes(pa.time32("ms"))
        if s <= MAX_SUPPORTED_SCALE:
            return yes(pa.time64("us"))
        return ColumnAssessment(
            name, t, SUPPORT_PARTIAL, pa.time64("us"),
            "precision reduced to microseconds",
        )
    if t in ("DATETIME", "DATETIME2", "SMALLDATETIME"):
        s = col.scale if col.scale is not None else 0
        if s <= MAX_SUPPORTED_SCALE:
            return yes(pa.timestamp("us"))
        return ColumnAssessment(
            name, t, SUPPORT_PARTIAL, pa.timestamp("us"),
            "precision reduced to microseconds",
        )
    if t == "TIMESTAMP":
        return yes(pa.timestamp("us", tz="UTC"))
    if t in ("BINARY", "VARBINARY", "LONGVARBINARY", "BLOB", "TINYBLOB",
             "MEDIUMBLOB", "LONGBLOB", "IMAGE"):
        return yes(pa.binary())
    if t in ("CHAR", "VARCHAR", "NCHAR", "NVARCHAR", "TEXT", "TINYTEXT",
             "MEDIUMTEXT", "LONGTEXT", "NTEXT", "JSON", "ENUM", "SET"):
        return yes(pa.string())
    if t in ("YEAR",):
        return yes(pa.int32())
    # unsupported (SqlServerTableAssessor.java:133-161)
    return ColumnAssessment(
        name, t, SUPPORT_NO, None,
        f"column type {t} is not supported; consider a supported cast",
    )


@dataclass
class TableAssessment:
    table: str
    columns: list[ColumnAssessment] = field(default_factory=list)

    @property
    def supported(self) -> list[ColumnAssessment]:
        return [c for c in self.columns if c.support != SUPPORT_NO]


def assess_table(table: str, columns: list[SourceColumnSpec]) -> TableAssessment:
    return TableAssessment(table, [evaluate_column(c) for c in columns])


def standardize(assessment: TableAssessment, primary_key: list[str]) -> pa.Schema:
    """Build the replicated schema, dropping NO-support columns
    (MySqlTableRegistry.java:88-100, SqlServerTableRegistry.java:151-163).

    Raises if a primary-key column is unsupported (a table whose PK can't be
    replicated is a hard failure, cf. SqlServerRecordConsumer.java:129-133).
    """
    fields = []
    kept = {c.name for c in assessment.supported}
    for pk in primary_key:
        if pk not in kept:
            raise ValueError(f"primary key column {pk!r} unsupported in {assessment.table}")
    for c in assessment.supported:
        fields.append(pa.field(c.name, c.arrow_type, nullable=c.name not in primary_key))
    return pa.schema(fields)
