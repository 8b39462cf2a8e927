"""Design-time catalog: list/describe replicated tables.

Analog of the reference's TableRegistry SPI (MySqlTableRegistry.listTables /
describeTable / standardize — MySqlTableRegistry.java:57-100; SQL Server
variant with the CDC-enabled probe, SqlServerTableRegistry.java:69-148).
Here the 'catalog' is the lake: checkpoint manifests + the persisted schema
history. Plain driver-side Python — no distribution needed (SURVEY.md §3.2).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import pyarrow as pa

from ..functions.types import (
    SourceColumnSpec,
    TableAssessment,
    arrow_type,
    assess_table,
    standardize,
)
from ..state import checkpoint as ckpt
from ..state.ddl import Registry


@dataclass
class ColumnDetail:
    name: str
    type_name: str
    nullable: bool


@dataclass
class TableDetail:
    """Catalog description of one replicated table (TableDetail analog)."""

    table: str
    columns: list[ColumnDetail]
    primary_key: list[str]
    schema_version: int
    live_rows: int
    total_rows: int
    partitions: int

    def arrow_schema(self) -> pa.Schema:
        return pa.schema(
            [pa.field(c.name, arrow_type(c.type_name), nullable=c.nullable)
             for c in self.columns]
        )


class LakeCatalog:
    """Catalog over a replicated lake directory."""

    def __init__(self, lake_dir: str) -> None:
        self.lake_dir = lake_dir
        hist = os.path.join(lake_dir, ckpt.CHECKPOINT_DIR, "schema_history.jsonl")
        self.registry = Registry.load(hist) if os.path.exists(hist) else Registry()
        self.manifests = ckpt.all_manifests(lake_dir)

    def list_tables(self) -> list[str]:
        """Replicable tables (MySqlTableRegistry.listTables analog): tables
        with a known schema, excluding dropped ones."""
        return sorted(
            name for name, ts in self.registry.tables.items()
            if ts.columns and not ts.dropped
        )

    def describe_table(self, table: str) -> TableDetail:
        ts = self.registry.final_table(table)
        if not ts.columns:
            raise KeyError(f"unknown table {table!r}")
        live = total = 0
        parts = 0
        for m in self.manifests.values():
            if table in m.get("tables", []):
                live += m["live_rows"]
                total += m["rows"]
                parts += 1
        cols = [
            ColumnDetail(c, t, nullable=c not in ts.primary_key)
            for c, t in ts.columns
        ]
        return TableDetail(
            table=ts.name,
            columns=cols,
            primary_key=list(ts.primary_key),
            schema_version=ts.version,
            live_rows=live,
            total_rows=total,
            partitions=parts,
        )

    def probe_replicable(self, table: str) -> list[str]:
        """Problem report (SqlServerTableRegistry.java:116-143 CDC-probe
        analog): empty list = replicable."""
        problems = []
        ts = self.registry.tables.get(self.registry.resolve_table(table))
        if ts is None or not ts.columns:
            problems.append(f"table {table} has no schema in the registry")
            return problems
        if not ts.primary_key:
            problems.append(f"table {table} has no primary key")
        if ts.dropped:
            problems.append(f"table {table} was dropped")
        return problems

    def assess(self, table: str) -> TableAssessment:
        """Design-time column assessment of the table's declared source
        types (MySqlTableAssessor.assess analog)."""
        ts = self.registry.final_table(table)
        specs = []
        _REVERSE = {
            "string": "VARCHAR", "large_string": "TEXT", "int32": "INT",
            "int64": "BIGINT", "float32": "FLOAT", "float64": "DOUBLE",
            "bool": "BIT", "binary": "VARBINARY", "date32": "DATE",
            "time_micros": "TIME", "datetime": "DATETIME",
            "timestamp_micros": "TIMESTAMP",
        }
        for c, t in ts.columns:
            specs.append(SourceColumnSpec(name=c, sql_type=_REVERSE.get(t, t.upper())))
        return assess_table(ts.name, specs)

    def standardized_schema(self, table: str) -> pa.Schema:
        ts = self.registry.final_table(table)
        return standardize(self.assess(table), list(ts.primary_key))
