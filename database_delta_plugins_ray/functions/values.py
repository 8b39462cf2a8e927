"""Runtime value-conversion kernels (SURVEY.md §2.3) — vectorized pyarrow /
numpy implementations of the reference's MySQL/Connect value semantics:

* logical time/date conversions (Records.java:186-271)
* MySQL-specific converters (vendored MySqlValueConverters.java):
  ENUM index -> label (:604-626), SET bitmask -> CSV labels (:642-653),
  YEAR two-digit adjust (:571-589), unsigned widening (:270-300,801-901),
  TIME signed-duration micros (:918-927), zero-date -> null (:195-229),
  JSON binary -> JSON string (:485-507), BINARY(n) zero-pad (:783-790).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _arr(x) -> pa.Array | pa.ChunkedArray:
    return x if isinstance(x, (pa.Array, pa.ChunkedArray)) else pa.array(x)


def _fsb_to_binary(arr: pa.Array) -> pa.Array:
    """fixed_size_binary -> binary. pyarrow 16 SEGFAULTS casting a SLICED
    fixed_size_binary array (non-zero offset); compact via take first."""
    if arr.offset:
        arr = arr.take(pa.array(np.arange(len(arr), dtype=np.int64)))
    return pc.cast(arr, pa.binary())


def _binary_offsets(arr: pa.Array) -> np.ndarray:
    """Offsets buffer of a (large_)binary array as numpy, honoring the
    element width — large_binary carries int64 offsets, binary int32;
    reading them with the wrong dtype silently misslices values."""
    if pa.types.is_large_binary(arr.type) or pa.types.is_large_string(arr.type):
        dt, width = np.int64, 8
    else:
        dt, width = np.int32, 4
    return np.frombuffer(arr.buffers()[1], dtype=dt,
                         count=len(arr) + 1, offset=arr.offset * width)


# ---------------------------------------------------------------------------
# logical date/time conversions (Records.java:186-271)
# ---------------------------------------------------------------------------


def epoch_days_to_date(a) -> pa.Array:
    """V1: epoch-day int32 -> date32 (Records.java:187-189)."""
    return pc.cast(pc.cast(_arr(a), pa.int32()), pa.date32())


def epoch_to_datetime(a, unit: str) -> pa.Array:
    """V2: ms/us/ns epoch -> timezone-less DATETIME at micros
    (Records.java:191-216; DATETIME is local, Records.java:354-357)."""
    factor = {"ms": 1_000, "us": 1, "ns": None}[unit]
    x = pc.cast(_arr(a), pa.int64())
    if unit == "ns":
        x = pc.divide(x, 1_000)
    elif factor != 1:
        x = pc.multiply(x, factor)
    return pc.cast(x, pa.timestamp("us"))


def epoch_to_timestamp_utc(a, unit: str) -> pa.Array:
    """V3: epoch ms/us -> TIMESTAMP_MICROS UTC (Records.java:218-229)."""
    x = pc.cast(_arr(a), pa.int64())
    if unit == "ms":
        x = pc.multiply(x, 1_000)
    return pc.cast(x, pa.timestamp("us", tz="UTC"))


def iso8601_to_timestamp(a) -> pa.Array:
    """V4: ISO-8601 / ZonedTimestamp string -> TIMESTAMP_MICROS UTC
    (Records.java:226-229). Handles fractional seconds and non-UTC offsets —
    the reference's own fixture is ``2011-12-03T10:15:30.030431+01:00``
    (RecordsTest.java:56-71); Arrow's ISO parser normalizes the offset to
    UTC. Offset-less strings (defensive; Debezium always emits one) are
    interpreted as UTC."""
    arr = _arr(a)
    # normalize offset-less strings to 'Z' FIRST so a mixed batch (some
    # values with offsets, some without) casts in one pass
    s = pc.cast(arr, pa.string())
    has_off = pc.match_substring_regex(s, r"(Z|[+-]\d{2}:?\d{2})$")
    fixed = pc.if_else(
        has_off, s, pc.binary_join_element_wise(s, pa.scalar("Z"), "")
    )
    return pc.cast(fixed, pa.timestamp("us", tz="UTC"))


def micros_past_midnight_to_time(a) -> pa.Array:
    """V5a: micros past midnight -> time64('us') (Records.java:231-240)."""
    return pc.cast(pc.cast(_arr(a), pa.int64()), pa.time64("us"))


def nanos_past_midnight_to_time(a) -> pa.Array:
    """V5b: SQL Server TIME(7) nanos past midnight -> time64('us'), nanos
    truncated toward zero (Records.java:241-246; scale>6 is PARTIAL support,
    'precision reduced to microseconds', SqlServerTableAssessor.java:107-119)."""
    ns = pc.cast(_arr(a), pa.int64())
    return pc.cast(pc.divide(ns, 1_000), pa.time64("us"))


# ---------------------------------------------------------------------------
# MySQL-specific converters
# ---------------------------------------------------------------------------


def enum_decode(indices, options: list[str]) -> pa.Array:
    """V8a: ENUM 1-based index -> label; 0 -> '' (MySqlValueConverters.java:604-626)."""
    table = pa.array([""] + list(options))
    idx = pc.cast(_arr(indices), pa.int64())
    n = len(options)
    idx = pc.if_else(pc.and_(pc.greater_equal(idx, 0), pc.less_equal(idx, n)),
                     idx, pa.scalar(None, pa.int64()))
    return pc.take(table, idx)


def set_decode(bitmasks, options: list[str]) -> pa.Array:
    """V8b: SET bitmask -> comma-joined labels
    (MySqlValueConverters.java:642-653,695-718). Null-safe and vectorized:
    per-bit label-or-empty arrays joined with Arrow's element-wise concat,
    then the spurious separators collapsed."""
    arr = pc.cast(_arr(bitmasks), pa.int64())
    null_mask = pc.is_null(arr)
    m = pc.fill_null(arr, 0).to_numpy(zero_copy_only=False).astype(np.int64)
    # label when the bit is set, '' otherwise; join all with ',' then strip
    # the runs of separators left by unset bits
    parts = [
        pa.array(np.where((m >> bit) & 1 == 1, opt, ""))
        for bit, opt in enumerate(options)
    ]
    joined = pc.binary_join_element_wise(*parts, ",") if len(parts) > 1 else parts[0]
    joined = pc.replace_substring_regex(joined, pattern=",{2,}", replacement=",")
    joined = pc.replace_substring_regex(joined, pattern="^,|,$", replacement="")
    return pc.if_else(null_mask, pa.scalar(None, pa.string()), joined)


def year_adjust(years) -> pa.Array:
    """V9: YEAR 2-digit adjust 00-69 -> 2000s, 70-99 -> 1900s
    (MySqlValueConverters.java:155-165; MySqlEventReader.java:215-225)."""
    y = pc.cast(_arr(years), pa.int32())
    two = pc.and_(pc.greater_equal(y, 0), pc.less(y, 100))
    adj = pc.if_else(pc.less(y, 70), pc.add(y, 2000), pc.add(y, 1900))
    return pc.if_else(two, adj, y)


def unsigned_widen(a, source_type: str) -> pa.Array:
    """V10: unsigned integer widening (MySqlValueConverters.java:270-300):
    TINYINT U -> int32, SMALLINT U -> int32, INT U -> int64,
    BIGINT U -> decimal(20,0)."""
    t = source_type.upper()
    x = _arr(a)
    if t in ("TINYINT", "SMALLINT", "MEDIUMINT"):
        return pc.cast(x, pa.int32())
    if t in ("INT", "INTEGER"):
        return pc.cast(x, pa.int64())
    if t == "BIGINT":
        return pc.cast(x, pa.decimal128(20, 0))
    raise ValueError(f"not an unsigned-widening source type: {source_type}")


def time_duration_micros(a) -> pa.Array:
    """V11: TIME as signed micros duration, range +/-838:59:59
    (MySqlValueConverters.java:918-927). Out-of-range -> null."""
    x = pc.cast(_arr(a), pa.int64())
    lim = (838 * 3600 + 59 * 60 + 59) * 1_000_000
    ok = pc.and_(pc.greater_equal(x, -lim), pc.less_equal(x, lim))
    return pc.if_else(ok, x, pa.scalar(None, pa.int64()))


def zero_date_to_null(date_strings) -> pa.Array:
    """V13: '0000-00-00...' zero-dates -> null (MySqlValueConverters.java:195-229)."""
    s = _arr(date_strings)
    is_zero = pc.starts_with(s, "0000-00-00")
    return pc.if_else(is_zero, pa.scalar(None, pa.string()), s)


def json_text(a) -> pa.Array:
    """V7: MySQL JSON binary -> JSON string; empty -> '{}'
    (MySqlValueConverters.java:485-507)."""
    s = pc.cast(_arr(a), pa.string())
    empty = pc.or_kleene(
        pc.is_null(s), pc.equal(pc.utf8_length(pc.utf8_trim_whitespace(s)), 0)
    )
    return pc.if_else(empty, pa.scalar("{}"), s)


def binary_zero_pad(a, length: int) -> pa.Array:
    """V12b: fixed-length BINARY(n) right-padded with 0x00
    (MySqlValueConverters.java:783-790). Vectorized: append a full-length
    zero pad to every value, slice back to n, cast to fixed_size_binary."""
    arr = _arr(a)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = pc.cast(arr, pa.binary())
    padded = pc.binary_join_element_wise(
        arr, pa.scalar(b"\x00" * length, pa.binary()), pa.scalar(b"", pa.binary())
    )
    return pc.cast(pc.binary_slice(padded, 0, length), pa.binary(length))


def int16_widen(a) -> pa.Array:
    """INT16 -> int widening (Records.java:289-290)."""
    return pc.cast(_arr(a), pa.int32())


def hex_string(a) -> pa.Array:
    """binary.handling.mode=hex (Debezium; applied via connector args,
    MySqlEventReader.java:135-138): binary values -> lowercase hex strings.
    Vectorized: one C-level hex of the whole data buffer, then per-row
    slicing by offsets — no per-byte Python."""
    arr = _arr(a)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_fixed_size_binary(arr.type):
        arr = _fsb_to_binary(arr)
    null_mask = pc.is_null(arr)
    filled = pc.fill_null(arr, b"")
    # offsets buffer entries are ABSOLUTE byte positions in the data buffer;
    # a sliced array's elements start at entry `filled.offset`
    offs = _binary_offsets(filled)
    data = filled.buffers()[2]
    full = (data.to_pybytes().hex() if data is not None else "")
    out = pa.array(
        [full[2 * offs[i]:2 * offs[i + 1]] for i in range(len(filled))],
        pa.string(),
    )
    return pc.if_else(null_mask, pa.scalar(None, pa.string()), out)


def base64_string(a) -> pa.Array:
    """binary.handling.mode=base64: binary values -> base64 strings.
    Per-row b64 is inherent (3-byte blocks don't decompose across rows);
    rows are sliced as zero-copy memoryviews of the data buffer."""
    import base64

    arr = _arr(a)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_fixed_size_binary(arr.type):
        arr = _fsb_to_binary(arr)
    null_mask = pc.is_null(arr)
    filled = pc.fill_null(arr, b"")
    offs = _binary_offsets(filled)
    buf = filled.buffers()[2]
    mv = memoryview(buf) if buf is not None else memoryview(b"")
    out = pa.array(
        [base64.b64encode(mv[offs[i]:offs[i + 1]]).decode()
         for i in range(len(filled))],
        pa.string(),
    )
    return pc.if_else(null_mask, pa.scalar(None, pa.string()), out)


#: MySQL charset name -> Python codec — the CharsetMapping analog the
#: reference resolves reflectively from the JDBC driver
#: (MySqlValueConverters.java:421-474 charsetFor). Mapping per public MySQL
#: docs; notably MySQL's "latin1" IS Windows cp1252, not ISO-8859-1.
_MYSQL_CHARSETS: dict[str, str] = {
    "latin1": "cp1252", "latin2": "iso8859-2", "latin5": "iso8859-9",
    "latin7": "iso8859-13", "ascii": "ascii",
    "utf8": "utf-8", "utf8mb3": "utf-8", "utf8mb4": "utf-8",
    "ucs2": "utf-16-be", "utf16": "utf-16-be", "utf16le": "utf-16-le",
    "utf32": "utf-32-be",
    "cp1250": "cp1250", "cp1251": "cp1251", "cp1256": "cp1256",
    "cp1257": "cp1257", "greek": "iso8859-7", "hebrew": "iso8859-8",
    "koi8r": "koi8-r", "koi8u": "koi8-u", "tis620": "tis-620",
    "macroman": "mac-roman",
    "sjis": "shift_jis", "cp932": "cp932", "gbk": "gbk",
    "gb2312": "gb2312", "big5": "big5", "euckr": "euc-kr", "ujis": "euc-jp",
}

#: codecs where one byte decodes to exactly one character — enables the
#: whole-buffer decode fast path (byte offsets == char offsets)
_SINGLE_BYTE_CODECS = {
    "cp1252", "iso8859-2", "iso8859-9", "iso8859-13", "ascii", "cp1250",
    "cp1251", "cp1256", "cp1257", "iso8859-7", "iso8859-8", "koi8-r",
    "koi8-u", "tis-620", "mac-roman",
}


def charset_decode(a, mysql_charset: str) -> pa.Array:
    """V12a: column-charset-aware bytes -> string
    (MySqlValueConverters.java:381-399 convertString + :421-474 charsetFor).
    Malformed bytes become U+FFFD, matching Java's ``new String(bytes, cs)``.

    Single-byte charsets (the common MySQL legacy case) decode the whole
    Arrow data buffer in ONE codec call and re-slice by the existing offsets
    buffer — valid because 1 byte == 1 decoded char, so byte offsets are
    character offsets in the decoded text. UTF-8 family is a zero-copy Arrow
    cast; multi-byte legacy codecs fall back to per-row decode."""
    codec = _MYSQL_CHARSETS.get(mysql_charset.lower())
    if codec is None:
        raise ValueError(f"unmapped MySQL charset: {mysql_charset!r}")
    arr = _arr(a)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        return arr
    if pa.types.is_fixed_size_binary(arr.type):
        arr = _fsb_to_binary(arr)
    if codec == "utf-8":
        try:
            return pc.cast(arr, pa.string())
        except pa.ArrowInvalid:
            # malformed UTF-8 bytes must become U+FFFD like Java's
            # new String(bytes, cs) — fall through to the per-row
            # errors='replace' path instead of aborting the job
            pass
    null_mask = pc.is_null(arr)
    filled = pc.fill_null(arr, b"")
    offs = _binary_offsets(filled)
    data = filled.buffers()[2]
    if codec in _SINGLE_BYTE_CODECS:
        full = (data.to_pybytes().decode(codec, errors="replace")
                if data is not None else "")
        vals = [full[offs[i]:offs[i + 1]] for i in range(len(filled))]
    else:
        mv = memoryview(data) if data is not None else memoryview(b"")
        vals = [bytes(mv[offs[i]:offs[i + 1]]).decode(codec, errors="replace")
                for i in range(len(filled))]
    out = pa.array(vals, pa.string())
    return pc.if_else(null_mask, pa.scalar(None, pa.string()), out)


# ---------------------------------------------------------------------------
# converter dispatch (declared per column in CREATE_TABLE DDL; applied by the
# normalize stage — the analog of Debezium logical-type decoding, where the
# wire carries raw encodings and the schema names the logical type,
# Records.java:186-271)
# ---------------------------------------------------------------------------

_CONVERTERS = {
    "epoch_days_date": lambda a, arg: epoch_days_to_date(a),
    "epoch_ms_datetime": lambda a, arg: epoch_to_datetime(a, "ms"),
    "epoch_us_datetime": lambda a, arg: epoch_to_datetime(a, "us"),
    "epoch_ns_datetime": lambda a, arg: epoch_to_datetime(a, "ns"),
    "epoch_ms_ts_utc": lambda a, arg: epoch_to_timestamp_utc(a, "ms"),
    "epoch_us_ts_utc": lambda a, arg: epoch_to_timestamp_utc(a, "us"),
    "iso8601_ts": lambda a, arg: iso8601_to_timestamp(a),
    "micros_time": lambda a, arg: micros_past_midnight_to_time(a),
    "nanos_time": lambda a, arg: nanos_past_midnight_to_time(a),
    "enum": lambda a, arg: enum_decode(a, arg.split(",")),
    "set": lambda a, arg: set_decode(a, arg.split(",")),
    "year": lambda a, arg: year_adjust(a),
    "unsigned": lambda a, arg: unsigned_widen(a, arg),
    "time_duration": lambda a, arg: time_duration_micros(a),
    "zero_date_null": lambda a, arg: zero_date_to_null(a),
    "json": lambda a, arg: json_text(a),
    "binary_pad": lambda a, arg: binary_zero_pad(a, int(arg)),
    "int16_widen": lambda a, arg: int16_widen(a),
    "hex_string": lambda a, arg: hex_string(a),
    "base64_string": lambda a, arg: base64_string(a),
    "charset": lambda a, arg: charset_decode(a, arg),
    "connect_ms": lambda a, arg: connect_ms_truncate(a),
}


def connect_ms_truncate(a) -> pa.Array:
    """``time.precision.mode=connect``: Debezium's Kafka-Connect mode
    carries temporal values at MILLISECOND precision (Time/Timestamp
    logical types) — micros truncate away on the wire. The engine keeps
    its microsecond column types and truncates the VALUES to ms, which
    is bit-identical to round-tripping through the connect
    representation (io.debezium.time.Timestamp vs MicroTimestamp,
    public Debezium temporal-types contract)."""
    arr = _arr(a)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    if not ((pa.types.is_time64(t) or pa.types.is_timestamp(t))
            and t.unit == "us"):
        return arr  # ms/date types already at-or-below connect precision
    iv = arr.cast(pa.int64())
    iv = pc.multiply(pc.divide(iv, pa.scalar(1000, pa.int64())),
                     pa.scalar(1000, pa.int64()))
    return iv.cast(t)


def apply_converter(a, spec: str) -> pa.Array:
    """Apply a converter spec: ``name``, ``name:arg``, or a ``|``-chain
    (e.g. ``binary_pad:8|hex_string`` when binary.handling.mode=hex is
    layered on a fixed-length column)."""
    for part in spec.split("|"):
        name, _, arg = part.partition(":")
        fn = _CONVERTERS.get(name)
        if fn is None:
            raise ValueError(f"unknown value converter {part!r}")
        a = fn(a, arg)
    return a
