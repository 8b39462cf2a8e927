"""Source SPI facade tests (config passthrough, table specs; mirrors
RuntimeArgumentsTest + DeltaSource SPI shape)."""

import os

import pyarrow as pa
import pytest

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


def test_permission_probe():
    """Permission assessment analog of MySqlTableAssessor.java:164-206:
    SHOW GRANTS -> one Problem per missing required privilege."""
    from database_delta_plugins_ray.sources.source import (
        Problem,
        SourceConfig,
        assess_replication_permissions,
    )

    ok = SourceConfig(user="repl", grants={"ALL PRIVILEGES"})
    assert assess_replication_permissions(ok) == []

    full = SourceConfig(user="repl", grants={"SELECT", "REPLICATION SLAVE",
                                             "REPLICATION CLIENT"})
    assert assess_replication_permissions(full) == []

    partial = SourceConfig(user="repl", grants={"SELECT"})
    probs = assess_replication_permissions(partial)
    assert [p.name for p in probs] == ["Missing Privilege"] * 2
    descs = " ".join(p.description for p in probs)
    assert "REPLICATION SLAVE" in descs and "REPLICATION CLIENT" in descs
    assert all(isinstance(p, Problem) and p.suggestion for p in probs)

    none = SourceConfig(user="repl", grants=set())
    assert len(assess_replication_permissions(none)) == 3
    assert any("snapshot" in p.impact for p in assess_replication_permissions(none))


@pytest.mark.usefixtures("ray_session")
def test_binary_handling_mode_hex(tmp_path):
    """binary.handling.mode=HEX pass-through (MySqlEventReader.java:135-138;
    MySqlEventReaderIntegrationTest.java:286): binary columns replicate as
    lowercase hex STRINGS; values must equal .hex() of the bytes-mode run."""
    from database_delta_plugins_ray.pipelines.replicate import (
        final_state,
        run_replication,
    )
    from database_delta_plugins_ray.sources.gen_typed import (
        TypedGenConfig,
        generate_typed_log,
    )
    from database_delta_plugins_ray.sources.source import (
        CONNECTOR_PREFIX,
        SourceConfig,
    )

    log = str(tmp_path / "log")
    generate_typed_log(log, TypedGenConfig(n_keys=80, n_events=400, n_segments=2))

    cfg = SourceConfig(runtime_args={CONNECTOR_PREFIX + "binary.handling.mode": "hex"})

    lake_b = str(tmp_path / "lake_bytes")
    run_replication(log, lake_b, num_partitions=2, primary_key=("id",),
                    compute_sha=False)
    lake_h = str(tmp_path / "lake_hex")
    run_replication(log, lake_h, num_partitions=2, primary_key=("id",),
                    compute_sha=False, connector_args=cfg.connector_args())

    cols = ["id", "c_binary8", "c_varbinary"]
    by = {r["id"]: r for r in final_state(lake_b, columns=cols).take_all()}
    hx = {r["id"]: r for r in final_state(lake_h, columns=cols).take_all()}
    assert set(by) == set(hx)
    import pyarrow.parquet as pq
    import glob as _glob

    sch = pq.read_schema(_glob.glob(os.path.join(lake_h, "part=*", "*.parquet"))[0])
    assert sch.field("c_binary8").type == pa.string()
    assert sch.field("c_varbinary").type == pa.string()
    for k, r in by.items():
        assert hx[k]["c_binary8"] == r["c_binary8"].hex()
        assert hx[k]["c_varbinary"] == r["c_varbinary"].hex()


def test_decimal_handling_mode_double_and_string(tmp_path):
    """decimal.handling.mode pass-through (Debezium DecimalHandlingMode):
    'double' replicates DECIMAL columns as float64, 'string' as their
    canonical decimal string; values must equal casts of the precise
    run."""
    from database_delta_plugins_ray.pipelines.replicate import (
        final_state,
        run_replication,
    )
    from database_delta_plugins_ray.sources.gen_typed import (
        TypedGenConfig,
        generate_typed_log,
    )
    from database_delta_plugins_ray.sources.source import (
        CONNECTOR_PREFIX,
        SourceConfig,
    )

    log = str(tmp_path / "log")
    generate_typed_log(log, TypedGenConfig(n_keys=60, n_events=300,
                                           n_segments=2))
    lake_p = str(tmp_path / "lake_precise")
    run_replication(log, lake_p, num_partitions=2, primary_key=("id",),
                    compute_sha=False)
    cols = ["id", "c_decimal", "c_numeric"]
    precise = {r["id"]: r
               for r in final_state(lake_p, columns=cols).take_all()}

    for mode, check in (
        ("double", lambda got, ref: got == pytest.approx(float(ref))),
        ("string", lambda got, ref: got == str(ref)),
    ):
        cfg = SourceConfig(runtime_args={
            CONNECTOR_PREFIX + "decimal.handling.mode": mode})
        lake = str(tmp_path / f"lake_{mode}")
        run_replication(log, lake, num_partitions=2, primary_key=("id",),
                        compute_sha=False,
                        connector_args=cfg.connector_args())
        got = {r["id"]: r
               for r in final_state(lake, columns=cols).take_all()}
        assert set(got) == set(precise)
        for k, r in precise.items():
            for c in ("c_decimal", "c_numeric"):
                if r[c] is None:
                    assert got[k][c] is None
                else:
                    assert check(got[k][c], r[c]), (mode, c, k)


def test_time_precision_mode_connect(tmp_path):
    """time.precision.mode=connect pass-through: microsecond temporal
    values truncate to Kafka-Connect millisecond precision; column
    types stay microsecond (io.debezium.time Timestamp/MicroTimestamp
    contract)."""
    from database_delta_plugins_ray.pipelines.replicate import (
        final_state,
        run_replication,
    )
    from database_delta_plugins_ray.sources.gen_typed import (
        TypedGenConfig,
        generate_typed_log,
    )
    from database_delta_plugins_ray.sources.source import (
        CONNECTOR_PREFIX,
        SourceConfig,
    )

    log = str(tmp_path / "log")
    generate_typed_log(log, TypedGenConfig(n_keys=60, n_events=300,
                                           n_segments=2))
    lake_a = str(tmp_path / "lake_adaptive")
    run_replication(log, lake_a, num_partitions=2, primary_key=("id",),
                    compute_sha=False)
    cfg = SourceConfig(runtime_args={
        CONNECTOR_PREFIX + "time.precision.mode": "connect"})
    lake_c = str(tmp_path / "lake_connect")
    run_replication(log, lake_c, num_partitions=2, primary_key=("id",),
                    compute_sha=False, connector_args=cfg.connector_args())

    tcols = [c for c in ("c_time", "c_datetime", "c_timestamp")]
    avail = [c for c in tcols
             if c in final_state(lake_a).schema().names]
    assert avail, "typed log should carry temporal columns"
    cols = ["id"] + avail
    ad = {r["id"]: r for r in final_state(lake_a, columns=cols).take_all()}
    cn = {r["id"]: r for r in final_state(lake_c, columns=cols).take_all()}
    assert set(ad) == set(cn)
    saw_truncation = False
    for k, r in ad.items():
        for c in avail:
            if r[c] is None:
                assert cn[k][c] is None
                continue
            us = (r[c].microsecond if hasattr(r[c], "microsecond")
                  else r[c].microsecond)
            want_us = (us // 1000) * 1000
            assert cn[k][c].microsecond == want_us, (c, k, r[c], cn[k][c])
            if us != want_us:
                saw_truncation = True
    assert saw_truncation, "fixture carried no sub-ms values to truncate"


def test_unknown_knob_passes_through_silently():
    """The reference forwards ANY source.connector.* arg verbatim; a knob
    with no engine semantics must not fail the pipeline."""
    from database_delta_plugins_ray.sources.source import (
        apply_connector_args)
    from database_delta_plugins_ray.state.ddl import Registry

    reg = Registry()
    apply_connector_args(reg, {"max.batch.size": "2048",
                               "heartbeat.interval.ms": "5000"})
    with pytest.raises(ValueError):
        apply_connector_args(reg, {"decimal.handling.mode": "bogus"})
    with pytest.raises(ValueError):
        apply_connector_args(reg, {"time.precision.mode": "bogus"})


def test_cli_source_arg_end_to_end(ray_session, tmp_path):
    """replicate --source-arg passes connector properties through the
    CLI: decimal.handling.mode=string replicates DECIMAL columns as
    strings; a bogus value for a known key fails before ray work."""
    from database_delta_plugins_ray.__main__ import main
    from database_delta_plugins_ray.pipelines.replicate import final_state
    from database_delta_plugins_ray.sources.gen_typed import (
        TypedGenConfig,
        generate_typed_log,
    )

    log = str(tmp_path / "log")
    generate_typed_log(log, TypedGenConfig(n_keys=40, n_events=200,
                                           n_segments=2))
    lake = str(tmp_path / "lake")
    rc = main(["replicate", "--log", log, "--lake", lake,
               "--partitions", "2", "--primary-key", "id",
               "--source-arg", "decimal.handling.mode=string",
               "--source-arg", "max.batch.size=2048"])
    assert rc in (0, None)
    rows = final_state(lake, columns=["id", "c_decimal"]).take_all()
    assert rows and all(r["c_decimal"] is None
                        or isinstance(r["c_decimal"], str) for r in rows)

    with pytest.raises(SystemExit):
        main(["replicate", "--log", log, "--lake", str(tmp_path / "l2"),
              "--source-arg", "decimal.handling.mode=bogus"])
    with pytest.raises(SystemExit):
        main(["replicate", "--log", log, "--lake", str(tmp_path / "l3"),
              "--source-arg", "novalue"])
