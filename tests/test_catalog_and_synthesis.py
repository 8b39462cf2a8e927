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
