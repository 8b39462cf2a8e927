"""Assessor / type-mapping unit tests, mirroring the reference's assessor
tests (SqlServerTableAssessorTest.java:49-157 — the 'assessor tests' the
north star names) and the widening lattice."""

import pyarrow as pa
import pytest

from database_delta_plugins_ray.functions.types import (
    SUPPORT_NO,
    SUPPORT_PARTIAL,
    SUPPORT_YES,
    SourceColumnSpec,
    arrow_type,
    assess_table,
    can_widen,
    evaluate_column,
    standardize,
    type_name,
)


def col(t, **kw):
    return SourceColumnSpec(name="c", sql_type=t, **kw)


class TestEvaluateColumn:
    def test_bit_bool(self):
        a = evaluate_column(col("BIT"))
        assert a.support == SUPPORT_YES and a.arrow_type == pa.bool_()

    def test_small_ints(self):
        for t in ("TINYINT", "SMALLINT", "MEDIUMINT"):
            assert evaluate_column(col(t)).arrow_type == pa.int32()

    def test_int_unsigned_widens(self):
        # MySqlValueConverters.java:279-286 unsigned widening
        assert evaluate_column(col("INT")).arrow_type == pa.int32()
        assert evaluate_column(col("INT", unsigned=True)).arrow_type == pa.int64()

    def test_bigint_unsigned_decimal(self):
        # MySqlValueConverters.java:287-300
        assert evaluate_column(col("BIGINT")).arrow_type == pa.int64()
        assert evaluate_column(col("BIGINT", unsigned=True)).arrow_type == pa.decimal128(20, 0)

    def test_decimal_precision_scale(self):
        a = evaluate_column(col("DECIMAL", precision=10, scale=2))
        assert a.arrow_type == pa.decimal128(10, 2)

    def test_time_scale_boundaries(self):
        # SqlServerTableAssessor.java:107-119: <=3 -> millis, <=6 -> micros,
        # >6 -> PARTIAL micros
        assert evaluate_column(col("TIME", scale=3)).arrow_type == pa.time32("ms")
        a6 = evaluate_column(col("TIME", scale=6))
        assert a6.arrow_type == pa.time64("us") and a6.support == SUPPORT_YES
        a7 = evaluate_column(col("TIME", scale=7))
        assert a7.support == SUPPORT_PARTIAL
        assert "microseconds" in a7.suggestion

    def test_datetime2_scale(self):
        # SqlServerTableAssessor.java:120-131
        a = evaluate_column(col("DATETIME2", scale=6))
        assert a.support == SUPPORT_YES and a.arrow_type == pa.timestamp("us")
        a7 = evaluate_column(col("DATETIME2", scale=7))
        assert a7.support == SUPPORT_PARTIAL

    def test_timestamp_utc(self):
        assert evaluate_column(col("TIMESTAMP")).arrow_type == pa.timestamp("us", tz="UTC")

    def test_unsupported_geometry(self):
        # SqlServerTableAssessor.java:133-142
        for t in ("GEOMETRY", "GEOGRAPHY", "SQLXML", "DATETIMEOFFSET"):
            a = evaluate_column(col(t))
            assert a.support == SUPPORT_NO and a.arrow_type is None

    def test_string_family(self):
        for t in ("VARCHAR", "CHAR", "TEXT", "JSON", "ENUM", "SET"):
            assert evaluate_column(col(t)).arrow_type == pa.string()

    def test_binary_family(self):
        for t in ("BLOB", "VARBINARY", "BINARY", "LONGBLOB"):
            assert evaluate_column(col(t)).arrow_type == pa.binary()

    def test_year_int(self):
        assert evaluate_column(col("YEAR")).arrow_type == pa.int32()


class TestStandardize:
    def test_drops_unsupported(self):
        # MySqlTableRegistry.java:88-100 drops NO-support columns
        a = assess_table("t", [
            SourceColumnSpec("id", "INT", nullable=False),
            SourceColumnSpec("geo", "GEOMETRY"),
            SourceColumnSpec("name", "VARCHAR"),
        ])
        schema = standardize(a, ["id"])
        assert schema.names == ["id", "name"]
        assert not schema.field("id").nullable

    def test_unsupported_pk_raises(self):
        a = assess_table("t", [SourceColumnSpec("id", "GEOMETRY")])
        with pytest.raises(ValueError):
            standardize(a, ["id"])


class TestWidenLattice:
    def test_allowed(self):
        assert can_widen("int32", "int64")
        assert can_widen("int64", "decimal(20,0)")
        assert can_widen("time_millis", "time_micros")
        assert can_widen("float32", "float64")
        assert can_widen("string", "large_string")
        assert can_widen("int32", "int32")

    def test_disallowed(self):
        assert not can_widen("int64", "int32")
        assert not can_widen("string", "int64")
        assert not can_widen("time_micros", "time_millis")


def test_type_name_roundtrip():
    # name -> type -> name -> type must be a fixed point (aliases collapse)
    for n in ("bool", "int32", "int64", "float32", "float64", "string",
              "large_string", "binary", "date32", "time_micros", "datetime",
              "timestamp_micros", "decimal(20,0)"):
        t = arrow_type(n)
        assert arrow_type(type_name(t)) == t
