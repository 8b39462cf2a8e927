"""Source SPI facade tests (config passthrough, table specs; mirrors
RuntimeArgumentsTest + DeltaSource SPI shape)."""

from database_delta_plugins_ray.sources.source import (
    CONNECTOR_PREFIX,
    SimulatedBinlogSource,
    SourceConfig,
    SourceTableSpec,
    extract_prefixed,
)


def test_extract_prefixed():
    args = {
        "source.connector.binary.handling.mode": "HEX",
        "source.connector.snapshot.mode": "initial",
        "other.key": "x",
    }
    got = extract_prefixed(CONNECTOR_PREFIX, args)
    assert got == {"binary.handling.mode": "HEX", "snapshot.mode": "initial"}
    assert SourceConfig(runtime_args=args).connector_args() == got


def test_source_spi_shape(tmp_path):
    from database_delta_plugins_ray.sources.gen import GenConfig

    cfg = SourceConfig(consumer_id="c1", replicate_existing_data=False)
    src = SimulatedBinlogSource(
        cfg, str(tmp_path / "log"),
        GenConfig(n_keys=20, n_events=50, n_repos=2, seed=2, ddl_plan=False,
                  n_segments=1),
    )
    log = src.create_reader()
    reg = src.create_table_registry()
    # replicate_existing_data=False -> schema_only: no snapshot inserts
    import glob

    import pyarrow.parquet as pq

    rows = pq.read_table(sorted(glob.glob(log + "/seg-*.parquet"))[0]).to_pylist()
    assert not any(r["is_snapshot"] for r in rows)
    assert "inventory.code_files" in reg.tables  # first-seen synthesis

    tf, bl, cols = src.tables([
        SourceTableSpec("inventory.code_files", columns={"repo", "path", "commit"},
                        dml_blacklist={"D"}),
    ])
    assert tf == {"inventory.code_files"}
    assert bl == {("inventory.code_files", "D")}
    assert cols == {"repo", "path", "commit"}
