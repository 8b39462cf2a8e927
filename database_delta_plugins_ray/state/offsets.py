"""Composite source offsets — the SQL-Server-style two-level position
surface (SqlServerOffset.java:33-123) mapped onto the engine's monotone
``int64 lsn`` ordering.

The reference tracks ``(change_lsn, commit_lsn)`` hex positions plus
``snapshot`` / ``snapshot_completed`` flags and the ``ddl_event_sent``
table set, serialized as a string map (SqlServerOffset.getAsOffset,
:63-80); resume fencing compares CHANGE lsns only — an event is skipped
iff it is not a snapshot event AND its offset isBeforeOrAt the resume
offset (SqlServerRecordConsumer.java:93-97, SqlServerOffset.java:91-94).
LSN comparison follows Debezium's public ``Lsn`` semantics: a 10-byte
binary compared byte-wise, rendered ``VVVVVVVV:BBBBBBBB:RRRR`` hex
(virtual-log-file : block : record), with NULL ordering below every
valid LSN.

Internally the engine keeps ONE monotone int64 per event; the composite
surface round-trips through it: ``Lsn.from_int`` packs the int64 into
(vlf, block, record) so that integer order == byte-wise LSN order, and
``Lsn.to_int`` inverts it. A real Debezium SQL Server feed's positions
(arbitrary hex LSNs) map in via ``Lsn.to_int`` directly — byte order is
preserved because the 10-byte value IS the integer, big-endian.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

#: offset-map keys (public Debezium SourceInfo / reference constants:
#: SqlServerOffset.java:36-55, SqlServerConstantOffsetBackingStore.java:37)
CHANGE_LSN_KEY = "change_lsn"
COMMIT_LSN_KEY = "commit_lsn"
SNAPSHOT_KEY = "snapshot"
SNAPSHOT_COMPLETED_KEY = "snapshot_completed"
DDL_EVENT_SENT_KEY = "ddl_event_sent"
_DELIMITER = ","  # SqlServerOffset.java:34

#: MySQL offset-map keys (MySqlConstantOffsetBackingStore.java:39-45)
MYSQL_FILE_KEY = "file"
MYSQL_POS_KEY = "pos"
MYSQL_ROW_KEY = "row"
MYSQL_EVENT_KEY = "event"
MYSQL_GTID_SET_KEY = "gtids"
TRX_ID_SEP = ":"  # MySqlRecordConsumer.java:53


@functools.total_ordering
class Lsn:
    """Debezium-style SQL Server LSN value object: 10 bytes, byte-wise
    comparable, hex-rendered in three parts. ``Lsn.NULL`` (from a missing
    or unparseable string) sorts below every valid LSN — matching
    ``Lsn.valueOf(null).compareTo(...)`` in the public Debezium source."""

    __slots__ = ("_bytes",)

    def __init__(self, raw: bytes | None) -> None:
        self._bytes = raw if raw else None

    @classmethod
    def parse(cls, text: str | None) -> "Lsn":
        if not text:
            return cls(None)
        try:
            parts = text.split(":")
            if len(parts) != 3:
                return cls(None)
            vlf, block, rec = (int(p, 16) for p in parts)
            return cls(vlf.to_bytes(4, "big") + block.to_bytes(4, "big")
                       + rec.to_bytes(2, "big"))
        except (ValueError, OverflowError):
            return cls(None)

    @classmethod
    def from_int(cls, v: int) -> "Lsn":
        """Pack the engine's monotone int64 so integer order == LSN byte
        order: high bits -> vlf, middle -> block, low 16 -> record."""
        if v < 0:
            raise ValueError("engine lsns are non-negative")
        rec = v & 0xFFFF
        block = (v >> 16) & 0xFFFFFFFF
        vlf = v >> 48
        if vlf > 0xFFFFFFFF:
            raise ValueError("lsn exceeds the 80-bit composite range")
        return cls(vlf.to_bytes(4, "big") + block.to_bytes(4, "big")
                   + rec.to_bytes(2, "big"))

    def to_int(self) -> int:
        """The 10-byte value as an integer (big-endian) — byte-wise LSN
        order IS integer order, so fences can stay int comparisons."""
        if self._bytes is None:
            return -1  # NULL sorts below every valid lsn (>= 0)
        return int.from_bytes(self._bytes, "big")

    @property
    def is_available(self) -> bool:
        return self._bytes is not None

    def __str__(self) -> str:
        if self._bytes is None:
            return "NULL"
        b = self._bytes
        return (f"{int.from_bytes(b[0:4], 'big'):08x}:"
                f"{int.from_bytes(b[4:8], 'big'):08x}:"
                f"{int.from_bytes(b[8:10], 'big'):04x}")

    def __eq__(self, other) -> bool:
        return isinstance(other, Lsn) and self.to_int() == other.to_int()

    def __lt__(self, other: "Lsn") -> bool:
        return self.to_int() < other.to_int()

    def __hash__(self) -> int:
        return hash(self.to_int())


@dataclass(frozen=True)
class CompositeOffset:
    """SqlServerOffset analog: (change_lsn, commit_lsn, snapshot flags,
    ddl_event_sent) with the reference's comparability and string-map
    serialization contract."""

    change_lsn: str | None = None
    commit_lsn: str | None = None
    snapshot: bool = False
    snapshot_completed: bool = True  # default per SqlServerOffset.java:52-54
    ddl_event_sent: frozenset[str] = field(default_factory=frozenset)

    def is_before_or_at(self, other: "CompositeOffset") -> bool:
        """SqlServerOffset.isBeforeOrAt (:91-94): CHANGE lsns only;
        commit_lsn and flags do not participate in the comparison."""
        return Lsn.parse(self.change_lsn) <= Lsn.parse(other.change_lsn)

    def should_skip_on_resume(self, resume: "CompositeOffset") -> bool:
        """The duplicate-replay fence exactly as the consumer applies it
        (SqlServerRecordConsumer.java:93-97): replayed events at or below
        the resume position are dropped — EXCEPT snapshot events, which
        all share one offset and must re-apply on a snapshot restart."""
        return (not self.snapshot) and self.is_before_or_at(resume)

    # -- string-map serialization (SqlServerOffset.getAsOffset, :63-80) --

    def as_map(self) -> dict[str, str]:
        out: dict[str, str] = {}
        if self.change_lsn is not None:
            out[CHANGE_LSN_KEY] = self.change_lsn
        if self.commit_lsn is not None:
            out[COMMIT_LSN_KEY] = self.commit_lsn
        out[SNAPSHOT_KEY] = "true" if self.snapshot else "false"
        out[SNAPSHOT_COMPLETED_KEY] = (
            "true" if self.snapshot_completed else "false")
        if self.ddl_event_sent:
            out[DDL_EVENT_SENT_KEY] = _DELIMITER.join(
                sorted(self.ddl_event_sent))
        return out

    @classmethod
    def from_map(cls, m: dict[str, str]) -> "CompositeOffset":
        sent = m.get(DDL_EVENT_SENT_KEY, "")
        return cls(
            change_lsn=m.get(CHANGE_LSN_KEY),
            commit_lsn=m.get(COMMIT_LSN_KEY),
            snapshot=m.get(SNAPSHOT_KEY, "false").lower() == "true",
            snapshot_completed=m.get(
                SNAPSHOT_COMPLETED_KEY, "true").lower() == "true",
            ddl_event_sent=frozenset(
                t for t in sent.split(_DELIMITER) if t),
        )

    # -- int64 bridge (the engine's internal ordering) --

    def to_int(self) -> int:
        """Engine watermark for this position (change-lsn ordering — the
        same total order the comparator uses)."""
        return Lsn.parse(self.change_lsn).to_int()

    @classmethod
    def from_int(cls, v: int, *, commit: int | None = None,
                 snapshot: bool = False,
                 snapshot_completed: bool = True,
                 ddl_event_sent: frozenset[str] = frozenset()
                 ) -> "CompositeOffset":
        return cls(
            change_lsn=str(Lsn.from_int(v)),
            commit_lsn=(str(Lsn.from_int(commit))
                        if commit is not None else None),
            snapshot=snapshot,
            snapshot_completed=snapshot_completed,
            ddl_event_sent=ddl_event_sent,
        )


#: binlog file-name template the int64 bridge renders into; the parse
#: side accepts ANY "<base>.<digits>" name (Debezium/MySQL convention)
_BINLOG_FILE_FMT = "mysql-bin.{:06d}"


def binlog_file_seq(file: str | None) -> int:
    """Numeric suffix of a binlog file name (``mysql-bin.000042`` -> 42);
    -1 for a missing/suffix-less name so it sorts below every real file —
    binlog positions order by (file, pos) and file names within one
    server differ only in this suffix."""
    if not file:
        return -1
    _, _, suffix = file.rpartition(".")
    try:
        return int(suffix)
    except ValueError:
        return -1


@dataclass(frozen=True)
class MySqlOffset:
    """MySQL binlog offset map — the reference's six-field shape
    (MySqlConstantOffsetBackingStore.java:39-45: file, pos, snapshot,
    row, event, gtids) with the same string-map serialization the
    consumer produces (MySqlRecordConsumer.generateCdapOffsets:369-399:
    stringify present fields, omit absent ones).

    ``row`` / ``event`` are Debezium's intra-position skip counts (rows
    of the current event / events at the current position already
    processed), so the resume order is (file, pos, event, row).
    ``gtids`` is the executed-GTID-set string — carried verbatim for
    the connector restart config, never parsed here."""

    file: str | None = None
    pos: int | None = None
    snapshot: bool = False
    row: int | None = None
    event: int | None = None
    gtids: str | None = None

    # -- ordering ------------------------------------------------------

    def _key(self) -> tuple[int, int, int, int]:
        return (binlog_file_seq(self.file),
                -1 if self.pos is None else int(self.pos),
                0 if self.event is None else int(self.event),
                0 if self.row is None else int(self.row))

    def is_before_or_at(self, other: "MySqlOffset") -> bool:
        return self._key() <= other._key()

    def should_skip_on_resume(self, resume: "MySqlOffset") -> bool:
        """Same replay fence as the composite offset: replayed events
        at/below the resume position drop, snapshot events re-apply."""
        return (not self.snapshot) and self.is_before_or_at(resume)

    # -- string-map serialization (generateCdapOffsets:369-399) ---------

    def as_map(self) -> dict[str, str]:
        out: dict[str, str] = {}
        if self.file is not None:
            out[MYSQL_FILE_KEY] = self.file
        if self.pos is not None:
            out[MYSQL_POS_KEY] = str(int(self.pos))
        out[SNAPSHOT_KEY] = "true" if self.snapshot else "false"
        if self.row is not None:
            out[MYSQL_ROW_KEY] = str(int(self.row))
        if self.event is not None:
            out[MYSQL_EVENT_KEY] = str(int(self.event))
        if self.gtids is not None:
            out[MYSQL_GTID_SET_KEY] = self.gtids
        return out

    @classmethod
    def from_map(cls, m: dict[str, str]) -> "MySqlOffset":
        def _i(k):
            v = m.get(k)
            return None if v is None else int(v)

        return cls(
            file=m.get(MYSQL_FILE_KEY),
            pos=_i(MYSQL_POS_KEY),
            snapshot=m.get(SNAPSHOT_KEY, "false").lower() == "true",
            row=_i(MYSQL_ROW_KEY),
            event=_i(MYSQL_EVENT_KEY),
            gtids=m.get(MYSQL_GTID_SET_KEY),
        )

    # -- int64 bridge (the engine's internal ordering) -------------------

    def to_int(self) -> int:
        """(file seq, pos) packed so integer order == binlog resume
        order: file sequence in the high 31 bits, pos (< 2^32, the
        binlog size bound) in the low 32. Missing positions map to -1,
        below every real offset — mirroring the Lsn NULL rule."""
        seq = binlog_file_seq(self.file)
        if seq < 0 or self.pos is None:
            return -1
        pos = int(self.pos)
        if not 0 <= pos < (1 << 32):
            raise ValueError(f"binlog pos {pos} outside the u32 range")
        if seq >= (1 << 31):
            raise ValueError(f"binlog file seq {seq} exceeds 31 bits")
        return (seq << 32) | pos

    @classmethod
    def from_int(cls, v: int, *, snapshot: bool = False,
                 row: int | None = None, event: int | None = None,
                 gtids: str | None = None) -> "MySqlOffset":
        if v < 0:
            raise ValueError("engine lsns are non-negative")
        return cls(file=_BINLOG_FILE_FMT.format(v >> 32),
                   pos=v & 0xFFFFFFFF, snapshot=snapshot,
                   row=row, event=event, gtids=gtids)


def mysql_transaction_id(gtid: str | None, file: str | None,
                         pos: int | None) -> str:
    """GTID-preferred transaction-id synthesis
    (MySqlRecordConsumer.java:190-195): the event's gtid when the server
    runs with GTIDs, else ``file:pos`` — "not really a transaction id,
    but we don't get an event when a transaction started/ended"."""
    if gtid:
        return gtid
    return f"{file}{TRX_ID_SEP}{pos}"


@functools.total_ordering
class PgLsn:
    """PostgreSQL textual WAL position — the public ``pg_lsn`` type's
    ``XXXXXXXX/XXXXXXXX`` rendering (PostgreSQL docs, datatype-pg-lsn;
    Debezium's postgres connector carries it in the envelope's
    ``source.sequence`` JSON array as strings and orders by the 64-bit
    value). ``PgLsn.NULL`` (missing / unparseable) sorts below every
    valid position, matching the Lsn / MySqlOffset NULL rule."""

    __slots__ = ("_v",)

    def __init__(self, v: int | None) -> None:
        self._v = v if v is not None and v >= 0 else None

    @classmethod
    def parse(cls, text: str | None) -> "PgLsn":
        if not text:
            return cls(None)
        try:
            hi_s, lo_s = text.split("/")
            hi, lo = int(hi_s, 16), int(lo_s, 16)
            if not (0 <= hi < (1 << 32) and 0 <= lo < (1 << 32)):
                return cls(None)
            return cls((hi << 32) | lo)
        except ValueError:
            return cls(None)

    @classmethod
    def from_int(cls, v: int) -> "PgLsn":
        if v < 0:
            raise ValueError("engine lsns are non-negative")
        if v >= (1 << 64):
            raise ValueError("pg lsn exceeds 64 bits")
        return cls(v)

    def to_int(self) -> int:
        """The engine's int64 IS the pg WAL position (both are the same
        monotone 64-bit domain); NULL maps to -1, below every valid."""
        return -1 if self._v is None else self._v

    @property
    def is_available(self) -> bool:
        return self._v is not None

    def __str__(self) -> str:
        if self._v is None:
            return "NULL"
        return f"{self._v >> 32:X}/{self._v & 0xFFFFFFFF:X}"

    def __eq__(self, other) -> bool:
        return isinstance(other, PgLsn) and self.to_int() == other.to_int()

    def __lt__(self, other: "PgLsn") -> bool:
        return self.to_int() < other.to_int()

    def __hash__(self) -> int:
        return hash(self.to_int())


@functools.total_ordering
class MongoTs:
    """MongoDB oplog position — the BSON timestamp the public Debezium
    MongoDB connector records as the ``sec`` + ``ord`` offset fields
    (its SourceInfo contract; the BSON spec packs a timestamp as 32-bit
    epoch seconds and a 32-bit ordinal within that second, compared as
    the combined 64-bit value). ``MongoTs.NULL`` (missing / negative)
    sorts below every valid position, matching the other bridges'
    NULL rule. The engine's int64 lsn domain IS the packed 64-bit
    value: ``to_int() == (sec << 32) | ord``."""

    __slots__ = ("_sec", "_ord")

    def __init__(self, sec: int | None, ordinal: int | None) -> None:
        # sec is bounded at 2^31 (not BSON's 2^32) because the packed
        # value must live in the engine's SIGNED int64 lsn domain —
        # (sec << 32) | ord with sec >= 2^31 would overflow the Arrow
        # int64 lsn column downstream. Out-of-domain maps to NULL,
        # the same rule as every other malformed position.
        ok = (sec is not None and ordinal is not None
              and 0 <= sec < (1 << 31) and 0 <= ordinal < (1 << 32))
        self._sec = int(sec) if ok else None
        self._ord = int(ordinal) if ok else None

    @classmethod
    def from_int(cls, v: int) -> "MongoTs":
        if v < 0:
            raise ValueError("engine lsns are non-negative")
        if v >= (1 << 63):
            raise ValueError("mongo timestamp exceeds the int64 lsn domain")
        return cls(v >> 32, v & 0xFFFFFFFF)

    @classmethod
    def parse(cls, sec, ordinal) -> "MongoTs":
        try:
            return cls(int(sec), int(ordinal))
        except (TypeError, ValueError):
            return cls(None, None)

    def to_int(self) -> int:
        """Packed 64-bit BSON-timestamp value; NULL maps to -1, below
        every valid position."""
        if self._sec is None:
            return -1
        return (self._sec << 32) | self._ord

    @property
    def sec(self) -> int | None:
        return self._sec

    @property
    def ord(self) -> int | None:
        return self._ord

    @property
    def is_available(self) -> bool:
        return self._sec is not None

    def __str__(self) -> str:
        if self._sec is None:
            return "NULL"
        return f"{self._sec}:{self._ord}"

    def __eq__(self, other) -> bool:
        return isinstance(other, MongoTs) and self.to_int() == other.to_int()

    def __lt__(self, other: "MongoTs") -> bool:
        return self.to_int() < other.to_int()

    def __hash__(self) -> int:
        return hash(self.to_int())


@functools.total_ordering
class OracleScn:
    """Oracle system change number — the decimal-string position the
    public Debezium Oracle connector records as its ``scn`` /
    ``commit_scn`` offset fields (its SourceInfo contract; Oracle SCNs
    are unsigned monotone integers rendered as decimal strings on the
    wire). ``OracleScn.NULL`` (missing / malformed / negative) sorts
    below every valid position, matching the other bridges' NULL rule.
    The engine's int64 lsn domain IS the numeric SCN value — the bridge
    is the identity on non-negative int64."""

    __slots__ = ("_v",)

    def __init__(self, value: int | None) -> None:
        ok = value is not None and 0 <= value < (1 << 63)
        self._v = int(value) if ok else None

    @classmethod
    def from_int(cls, v: int) -> "OracleScn":
        if v < 0:
            raise ValueError("engine lsns are non-negative")
        return cls(v)

    @classmethod
    def parse(cls, s) -> "OracleScn":
        try:
            return cls(int(str(s).strip()))
        except (TypeError, ValueError):
            return cls(None)

    def to_int(self) -> int:
        """Numeric SCN; NULL maps to -1, below every valid position."""
        return -1 if self._v is None else self._v

    @property
    def is_available(self) -> bool:
        return self._v is not None

    def __str__(self) -> str:
        return "NULL" if self._v is None else str(self._v)

    def __eq__(self, other) -> bool:
        return isinstance(other, OracleScn) and self.to_int() == other.to_int()

    def __lt__(self, other: "OracleScn") -> bool:
        return self.to_int() < other.to_int()

    def __hash__(self) -> int:
        return hash(self.to_int())
