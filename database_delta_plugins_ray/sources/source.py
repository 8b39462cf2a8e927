"""Source SPI facade — the engine's analog of the reference's plugin
surface (DeltaSource SPI: configure / createReader / createTableRegistry /
createTableAssessor — MySqlDeltaSource.java:41-86, SqlServerDeltaSource.java:42-84),
plus the runtime-argument passthrough (RuntimeArguments.extractPrefixed,
delta-plugins-common/src/main/java/io/cdap/delta/plugin/common/RuntimeArguments.java:37-45).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from ..state.ddl import Registry, build_registry
from .gen import GenConfig, generate_log

#: runtime args with this prefix are forwarded verbatim to the source
#: connector (MySqlEventReader.java:135-138 applies them to Debezium)
CONNECTOR_PREFIX = "source.connector."


def extract_prefixed(prefix: str, args: dict[str, str]) -> dict[str, str]:
    """RuntimeArguments.extractPrefixed analog: keep keys with the prefix,
    stripped of it."""
    plen = len(prefix)
    return {k[plen:]: v for k, v in args.items() if k.startswith(prefix)}


@dataclass
class SourceConfig:
    """Config surface of the reference source plugin (MySqlConfig.java:30-64
    widgets), re-expressed for the simulated-log source. Unused JDBC fields
    are kept for drop-in config parity."""

    consumer_id: str = "cdc"
    instance_id: int = 0
    database: str = "inventory"
    replicate_existing_data: bool = True  # snapshot.mode initial vs schema_only
    host: str = ""  # n/a for the simulated log
    port: int = 0
    user: str = ""
    password: str = ""
    server_timezone: str = "UTC"
    runtime_args: dict[str, str] = field(default_factory=dict)
    #: simulated SHOW GRANTS result for the replication user (the analog of
    #: the reference's permission probe input, MySqlTableAssessor.java:164-206)
    grants: set[str] = field(default_factory=lambda: {"ALL PRIVILEGES"})

    def connector_args(self) -> dict[str, str]:
        return extract_prefixed(CONNECTOR_PREFIX, self.runtime_args)


#: privileges the reference requires of the replication user
#: (MySqlTableAssessor.java:169-176: SELECT for snapshot, REPLICATION
#: SLAVE + REPLICATION CLIENT for the binlog stream)
REQUIRED_PRIVILEGES = ("SELECT", "REPLICATION SLAVE", "REPLICATION CLIENT")


@dataclass
class Problem:
    """Assessment problem (io.cdap.delta.api.assessment.Problem analog —
    name / description / suggestion / impact, as built at
    MySqlTableAssessor.java:186-205)."""

    name: str
    description: str
    suggestion: str
    impact: str


def assess_replication_permissions(config: SourceConfig) -> list["Problem"]:
    """Permission probe (MySqlTableAssessor.java:164-206): check the
    replication user's grants cover snapshot + binlog access; one Problem
    per missing privilege. 'ALL PRIVILEGES' satisfies everything."""
    grants = {g.upper() for g in config.grants}
    if "ALL PRIVILEGES" in grants:
        return []
    out = []
    for priv in REQUIRED_PRIVILEGES:
        if priv not in grants:
            out.append(Problem(
                name="Missing Privilege",
                description=(f"user {config.user or '<replication user>'} "
                             f"lacks the {priv} privilege"),
                suggestion=f"GRANT {priv} ON *.* TO the replication user",
                impact=("table snapshot will fail" if priv == "SELECT"
                        else "change stream cannot be read"),
            ))
    return out


def apply_connector_args(registry, args: dict[str, str]) -> None:
    """Apply pass-through connector args to the built registry — the analog
    of Debezium consuming its connector properties
    (MySqlEventReader.java:135-138 forwards ANY ``source.connector.*``
    runtime arg; HEX mode exercised at
    MySqlEventReaderIntegrationTest.java:286). Knobs with semantics:

    * ``binary.handling.mode`` = bytes (default) | hex | base64 —
      binary columns become string columns whose converter chain ends
      in the matching encode, exactly like Debezium emitting STRING
      schemas for binary columns under those modes.
    * ``decimal.handling.mode`` = precise (default) | double | string —
      DECIMAL/NUMERIC columns keep exact decimal, or rewrite to
      float64 / string (the cast happens in the normalize stage's
      type-conform step, like Debezium's DecimalHandlingMode).
    * ``time.precision.mode`` = adaptive_time_microseconds (default) |
      connect — connect mode truncates microsecond temporal VALUES to
      Kafka-Connect millisecond precision (column types unchanged;
      io.debezium.time.Timestamp vs MicroTimestamp contract).

    Unknown keys pass through silently (the reference forwards them to
    Debezium verbatim; a knob the engine lacks semantics for behaves
    like a Debezium property no code path reads)."""
    mode = args.get("binary.handling.mode", "bytes").lower()
    if mode not in ("bytes", "hex", "base64"):
        raise ValueError(f"unknown binary.handling.mode {mode!r}")
    if mode != "bytes":
        suffix = "hex_string" if mode == "hex" else "base64_string"
        for ts in registry.tables.values():
            new_cols = []
            for c, t in ts.columns:
                tl = t.lower()
                if tl in ("bytes", "binary") or tl.startswith("binary("):
                    prev = ts.converters.get(c)
                    ts.converters[c] = (f"{prev}|{suffix}" if prev
                                        else suffix)
                    new_cols.append((c, "string"))
                else:
                    new_cols.append((c, t))
            ts.columns = new_cols

    dmode = args.get("decimal.handling.mode", "precise").lower()
    if dmode not in ("precise", "double", "string"):
        raise ValueError(f"unknown decimal.handling.mode {dmode!r}")
    if dmode != "precise":
        target = "float64" if dmode == "double" else "string"
        for ts in registry.tables.values():
            ts.columns = [
                (c, target if t.lower().startswith("decimal(") else t)
                for c, t in ts.columns]

    tmode = args.get("time.precision.mode",
                     "adaptive_time_microseconds").lower()
    if tmode not in ("adaptive_time_microseconds", "connect"):
        raise ValueError(f"unknown time.precision.mode {tmode!r}")
    if tmode == "connect":
        for ts in registry.tables.values():
            for c, t in ts.columns:
                if t.lower() in ("time_micros", "datetime",
                                 "timestamp_micros"):
                    prev = ts.converters.get(c)
                    ts.converters[c] = (f"{prev}|connect_ms" if prev
                                        else "connect_ms")


@dataclass
class SourceTableSpec:
    """Replication selection (SourceTable analog): table id + selected
    columns + per-table DML/DDL blacklists (MySqlRecordConsumer.java:185,352-356)."""

    table: str
    columns: set[str] | None = None
    dml_blacklist: set[str] = field(default_factory=set)  # {"I","U","D"}
    ddl_blacklist: set[str] = field(default_factory=set)


class SimulatedBinlogSource:
    """DeltaSource analog for the deterministic simulated binlog.

    ``create_reader`` materializes/locates the log segments; the actual
    tailing is the Ray Data read in pipelines/replicate.py (S1 mapping).
    """

    def __init__(self, config: SourceConfig, log_dir: str,
                 gen_config: GenConfig | None = None) -> None:
        self.config = config
        self.log_dir = log_dir
        self.gen_config = gen_config

    def create_reader(self) -> str:
        """Ensure the log exists (snapshot honoring replicate_existing_data)
        and return its path — the Ray pipeline's source handle."""
        if self.gen_config is not None:
            cfg = self.gen_config
            cfg.snapshot = self.config.replicate_existing_data
            generate_log(self.log_dir, cfg)
        return self.log_dir

    def create_table_registry(self) -> Registry:
        """Design-time schema discovery over the log (S4/S5; runtime lake
        catalog lives in sources/registry.py)."""
        return build_registry(self.log_dir)

    def create_table_assessor(self):
        from ..functions import types

        return types

    def tables(self, specs: list[SourceTableSpec]):
        """Convert SourceTableSpec selections into the normalize-stage
        filter arguments (table_filter / dml_blacklist / columns)."""
        table_filter = {s.table for s in specs} or None
        dml_blacklist = {
            (s.table, op) for s in specs for op in s.dml_blacklist
        }
        columns: set[str] | None = None
        col_sets = [s.columns for s in specs if s.columns is not None]
        if col_sets:
            columns = set().union(*col_sets)
        return table_filter, dml_blacklist, columns
