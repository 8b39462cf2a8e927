"""Catalog (S4/S5), first-seen DDL synthesis (M17), and TRUNCATE fencing
end-to-end."""

import pytest

from database_delta_plugins_ray.pipelines.oracle import replay
from database_delta_plugins_ray.pipelines.replicate import final_state, run_replication
from database_delta_plugins_ray.sources.gen import GenConfig, generate_log
from database_delta_plugins_ray.sources.registry import LakeCatalog
from database_delta_plugins_ray.state.ddl import build_registry


@pytest.mark.usefixtures("ray_session")
def test_first_seen_synthesis_no_ddl_log(tmp_path):
    """A log with NO DDL events at all (SQL Server mode: no DDL stream)
    still replicates — schema synthesized from the record (M17)."""
    log = str(tmp_path / "log")
    generate_log(log, GenConfig(n_keys=100, n_events=600, n_repos=4, seed=9,
                                snapshot=False, ddl_plan=False, n_segments=2))
    reg = build_registry(log)
    assert "inventory.code_files" in reg.tables
    assert reg.tables["inventory.code_files"].primary_key == ["repo", "path"]

    lake = str(tmp_path / "lake")
    run_replication(log, lake, num_partitions=4)
    rows = final_state(lake).take_all()
    oracle = replay(log)
    got = {(r["table"], r["repo"], r["path"]) for r in rows}
    assert got == set(oracle)
    for r in rows:
        k = (r["table"], r["repo"], r["path"])
        assert r["content_sha"] == oracle[k]["content_sha"]


@pytest.mark.usefixtures("ray_session")
def test_truncate_fences_rows(tmp_path):
    """TRUNCATE mid-stream kills every row whose winning event predates it
    (F5.6); Ray state matches oracle replay."""
    log = str(tmp_path / "log")
    generate_log(log, GenConfig(n_keys=80, n_base=40, n_events=400, n_repos=4,
                                seed=11, ddl_plan=False, truncate_frac=0.5,
                                n_segments=2))
    lake = str(tmp_path / "lake")
    run_replication(log, lake, num_partitions=4)
    oracle = replay(log)
    rows = final_state(lake).take_all()
    got = {(r["table"], r["repo"], r["path"]): r for r in rows}
    assert set(got) == set(oracle)
    for k, o in oracle.items():
        assert got[k]["content_sha"] == o["content_sha"]
    # some pre-truncate-only keys must actually be gone
    full_no_trunc = replay(log.replace("log", "log"))  # same log, fences applied in replay
    assert len(oracle) < 80 + 40


@pytest.mark.usefixtures("ray_session")
def test_lake_catalog(small_log, tmp_path):
    log_dir, cfg, meta = small_log
    lake = str(tmp_path / "lake")
    run_replication(log_dir, lake, num_partitions=8)

    cat = LakeCatalog(lake)
    assert cat.list_tables() == ["inventory.code_files"]
    d = cat.describe_table("inventory.code_files")
    assert d.primary_key == ["repo", "path"]
    names = [c.name for c in d.columns]
    # post-evolution schema: stars added, lang renamed to language
    assert "stars" in names and "language" in names and "lang" not in names
    assert d.schema_version == 3
    assert d.partitions == 8 and d.live_rows > 0 and d.total_rows >= d.live_rows
    assert not d.arrow_schema().field("stars").nullable is False  # nullable non-pk
    assert cat.probe_replicable("inventory.code_files") == []
    assert cat.probe_replicable("nope") != []
    # assessment + standardize round-trip keeps every column (all supported)
    schema = cat.standardized_schema("inventory.code_files")
    assert set(schema.names) == set(names)


def test_footer_distinct_excludes_pure_ddl_segments(tmp_path):
    """The footer-stats fast path must not feed DDL-row table values (e.g.
    database names from CREATE_DATABASE, which share the `table` column)
    into missing-table synthesis — a pure-DDL segment resolves to nothing."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from database_delta_plugins_ray.model import (
        DDL_CREATE_DATABASE,
        DDL_STRUCT,
        OP_DDL,
        OP_INSERT,
    )
    from database_delta_plugins_ray.model import event_log_schema
    from database_delta_plugins_ray.state.ddl import _distinct_dml_tables

    schema = event_log_schema()
    ps = schema.field("after").type

    def seg(rows):
        cols = {name: [] for name in schema.names}
        for lsn, op, table, ddl in rows:
            cols["lsn"].append(lsn)
            cols["tx_id"].append(f"t:{lsn}")
            cols["op"].append(op)
            cols["table"].append(table)
            cols["before"].append(None)
            cols["after"].append(
                None if op == OP_DDL else
                {"repo": "r1", "path": f"p{lsn}", "commit": "c", "lang": "py",
                 "content": "x", "stars": 1, "language": None})
            cols["ddl"].append(ddl)
            cols["is_snapshot"].append(False)
            cols["ingest_ts"].append(lsn)
            cols["schema_version"].append(0)
        arrays = []
        for f in schema:
            arrays.append(pa.array(cols[f.name], f.type))
        return pa.table(dict(zip(schema.names, arrays)), schema=schema)

    # seg-0: ONLY DDL rows, table column = database name (min==max!)
    ddl_row = {"op": DDL_CREATE_DATABASE, "table": "inventory",
               "prev_table": "", "payload": "{}"}
    pq.write_table(
        seg([(1, OP_DDL, "inventory", ddl_row),
             (2, OP_DDL, "inventory", ddl_row)]),
        str(tmp_path / "seg-00000.parquet"))
    # seg-1: pure DML on one table
    pq.write_table(
        seg([(3, OP_INSERT, "inventory.code_files", None),
             (4, OP_INSERT, "inventory.code_files", None)]),
        str(tmp_path / "seg-00001.parquet"))

    files = [str(tmp_path / "seg-00000.parquet"),
             str(tmp_path / "seg-00001.parquet")]
    assert _distinct_dml_tables(files) == {"inventory.code_files"}

    # ADVICE r2: a segment with ZERO row groups (writer opened+closed, e.g.
    # a crashed producer) must fall back to scan, not IndexError
    w = pq.ParquetWriter(str(tmp_path / "seg-00002.parquet"), schema)
    w.close()
    files.append(str(tmp_path / "seg-00002.parquet"))
    assert _distinct_dml_tables(files) == {"inventory.code_files"}

    from database_delta_plugins_ray.state.ddl import build_registry

    reg = build_registry(str(tmp_path))
    assert "inventory.code_files" in reg.tables
