"""Multi-table replication: routing (M5/M8), per-table schema, shared-lake
union layout, table filters — end-to-end vs oracle."""

import pytest

from database_delta_plugins_ray.pipelines.oracle import replay
from database_delta_plugins_ray.pipelines.replicate import final_state, run_replication
from database_delta_plugins_ray.sources.gen import GenConfig, generate_log


@pytest.fixture(scope="module")
def multi_log(tmp_path_factory, ray_session):
    d = str(tmp_path_factory.mktemp("multi") / "log")
    generate_log(d, GenConfig(n_keys=240, n_events=1500, n_repos=6, seed=17,
                              n_tables=3, n_segments=3))
    return d


@pytest.mark.usefixtures("ray_session")
def test_multitable_parity(multi_log, tmp_path):
    lake = str(tmp_path / "lake")
    run_replication(multi_log, lake, num_partitions=6)
    oracle = replay(multi_log)
    rows = final_state(lake).take_all()
    got = {(r["table"], r["repo"], r["path"]): r for r in rows}
    assert set(got) == set(oracle)
    tables = {k[0] for k in got}
    assert tables == {"inventory.code_files", "inventory.code_files_1",
                      "inventory.code_files_2"}
    for k, o in oracle.items():
        assert got[k]["content_sha"] == o["content_sha"], k
        # ALTER plan targets table 0 only: other tables never see stars
        if k[0] != "inventory.code_files":
            assert got[k]["stars"] is None
    # table 0 rows written after the ADD-COLUMN alter carry stars
    assert any(r["stars"] is not None for r in rows
               if r["table"] == "inventory.code_files")


@pytest.mark.usefixtures("ray_session")
def test_table_filter_replicates_subset(multi_log, tmp_path):
    lake = str(tmp_path / "lake")
    run_replication(multi_log, lake, num_partitions=4,
                    table_filter={"inventory.code_files_1"})
    rows = final_state(lake).take_all()
    assert rows and all(r["table"] == "inventory.code_files_1" for r in rows)
    oracle = {k: v for k, v in replay(multi_log).items()
              if k[0] == "inventory.code_files_1"}
    assert {(r["table"], r["repo"], r["path"]) for r in rows} == set(oracle)
