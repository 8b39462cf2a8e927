"""Value-kernel unit tests, mirroring RecordsTest.java:36-71 (INT16
widening, ZonedTimestamp -> TIMESTAMP_MICROS UTC) and the vendored MySQL
converter semantics."""

import datetime as dt

import pyarrow as pa
import pytest

from database_delta_plugins_ray.functions import values as v


def test_epoch_days_to_date():
    out = v.epoch_days_to_date([0, 1, 366])
    assert out.to_pylist() == [dt.date(1970, 1, 1), dt.date(1970, 1, 2),
                               dt.date(1971, 1, 2)]


def test_epoch_to_datetime_units():
    ms = v.epoch_to_datetime([1_000], "ms")
    us = v.epoch_to_datetime([1_000_000], "us")
    ns = v.epoch_to_datetime([1_000_000_000], "ns")
    want = dt.datetime(1970, 1, 1, 0, 0, 1)
    assert ms.to_pylist() == us.to_pylist() == ns.to_pylist() == [want]
    assert ms.type == pa.timestamp("us")  # DATETIME: no tz


def test_epoch_to_timestamp_utc():
    out = v.epoch_to_timestamp_utc([1_500], "ms")
    assert out.type == pa.timestamp("us", tz="UTC")
    assert out.to_pylist()[0].microsecond == 500_000


def test_iso8601_to_timestamp():
    # RecordsTest.java:56-71 ZonedTimestamp semantics
    out = v.iso8601_to_timestamp(["2018-07-18T14:00:41Z"])
    got = out.to_pylist()[0]
    assert (got.year, got.hour, got.minute, got.second) == (2018, 14, 0, 41)
    assert got.tzinfo is not None


def test_enum_decode():
    # index 0 -> '', 1-based labels (MySqlValueConverters.java:604-626)
    out = v.enum_decode([0, 1, 3, 9], ["A", "B", "C"])
    assert out.to_pylist() == ["", "A", "C", None]


def test_set_decode():
    out = v.set_decode([0b101, 0, 0b010], ["X", "y", "Z"])
    assert out.to_pylist() == ["X,Z", "", "y"]


def test_year_adjust():
    out = v.year_adjust([0, 69, 70, 99, 1985, 2024])
    assert out.to_pylist() == [2000, 2069, 1970, 1999, 1985, 2024]


def test_unsigned_widen():
    assert v.unsigned_widen([200], "TINYINT").type == pa.int32()
    assert v.unsigned_widen([70000], "INT").type == pa.int64()
    big = v.unsigned_widen(pa.array([2**63], pa.uint64()), "BIGINT")
    assert big.type == pa.decimal128(20, 0)
    assert int(big.to_pylist()[0]) == 2**63
    with pytest.raises(ValueError):
        v.unsigned_widen([1], "VARCHAR")


def test_int16_widen():
    out = v.int16_widen(pa.array([1, -5], pa.int16()))
    assert out.type == pa.int32()


def test_time_duration_range():
    lim = (838 * 3600 + 59 * 60 + 59) * 1_000_000
    out = v.time_duration_micros([0, -lim, lim, lim + 1])
    assert out.to_pylist() == [0, -lim, lim, None]


def test_zero_date_null():
    out = v.zero_date_to_null(["0000-00-00", "2020-01-02", "0000-00-00 00:00:00"])
    assert out.to_pylist() == [None, "2020-01-02", None]


def test_json_text():
    out = v.json_text(["", None, '{"a":1}', "  "])
    assert out.to_pylist() == ["{}", "{}", '{"a":1}', "{}"]


def test_binary_zero_pad():
    out = v.binary_zero_pad([b"ab", b"abcd", None], 3)
    assert out.to_pylist() == [b"ab\x00", b"abc", None]
    assert out.type == pa.binary(3)


def test_micros_past_midnight():
    out = v.micros_past_midnight_to_time([3_600_000_000])
    assert out.to_pylist() == [dt.time(1, 0)]


def test_charset_decode_latin1_is_cp1252():
    """V12a (MySqlValueConverters.java:381-399,421-474): MySQL latin1 IS
    Windows cp1252 — 0x80 must decode to Euro, not a C1 control."""
    raw = pa.array(["café €".encode("cp1252"), b"plain", None], pa.binary())
    out = v.charset_decode(raw, "latin1")
    assert out.to_pylist() == ["café €", "plain", None]
    assert out.type == pa.string()


def test_charset_decode_malformed_replaces():
    # Java's new String(bytes, charset) substitutes U+FFFD for unmappable
    # bytes; cp1252 leaves 0x81 undefined
    out = v.charset_decode(pa.array([b"a\x81b"], pa.binary()), "latin1")
    assert out.to_pylist() == ["a�b"]


def test_charset_decode_multibyte_and_utf8():
    raw = pa.array(["héllo".encode("utf-16-be")], pa.binary())
    assert v.charset_decode(raw, "ucs2").to_pylist() == ["héllo"]
    raw8 = pa.array(["héllo".encode("utf-8")], pa.binary())
    assert v.charset_decode(raw8, "utf8mb4").to_pylist() == ["héllo"]


def test_charset_decode_fixed_size_binary_and_slices():
    raw = pa.array([b"ab", b"cd", b"ef"], pa.binary(2))
    out = v.charset_decode(raw.slice(1, 2), "ascii")
    assert out.to_pylist() == ["cd", "ef"]


def test_charset_decode_unmapped_raises():
    with pytest.raises(ValueError):
        v.charset_decode(pa.array([b"x"], pa.binary()), "klingon")


def test_charset_decode_malformed_utf8_replaces():
    """ADVICE r2: a dirty byte in a utf8 column must become U+FFFD (like
    Java's new String(bytes, cs)), not abort the replication job."""
    raw = pa.array([b"ok", b"bad\xffbyte", None, "é".encode()], pa.binary())
    out = v.charset_decode(raw, "utf8mb4")
    assert out.to_pylist() == ["ok", "bad�byte", None, "é"]


def test_charset_and_hex_handle_large_binary():
    """ADVICE r2: large_binary has int64 offsets; reading them as int32
    produced garbage slices instead of erroring."""
    vals = [b"alpha", None, b"bravo!", b""]
    raw = pa.array(vals, pa.large_binary())
    assert v.charset_decode(raw, "latin1").to_pylist() == \
        ["alpha", None, "bravo!", ""]
    assert v.hex_string(raw).to_pylist() == \
        ["616c706861", None, "627261766f21", ""]
    assert v.base64_string(raw).to_pylist() == \
        ["YWxwaGE=", None, "YnJhdm8h", ""]
    # malformed utf-8 inside large_binary exercises both fixes at once
    bad = pa.array([b"x\x80y"], pa.large_binary())
    assert v.charset_decode(bad, "utf8").to_pylist() == ["x�y"]
