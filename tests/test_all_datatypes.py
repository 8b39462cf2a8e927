"""All-datatypes end-to-end replication — the reference's type-conformance
core (mysql-delta-plugins/src/e2e-test/resources/pluginParameters.
properties:28-58, column-by-column validation BQValidation.java:104-213).

The log carries RAW source encodings; normalize applies the V1-V13 value
kernels (declared per column in CREATE_TABLE DDL); the lake must hold the
real Arrow types; final state must match a DuckDB LWW replay applying the
same decodes in SQL.
"""

import glob
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

EXPECTED_LAKE_TYPES = {
    "id": pa.string(),
    "c_bit": pa.bool_(),
    "c_tinyint": pa.int32(),
    "c_smallint": pa.int32(),
    "c_int": pa.int32(),
    "c_bigint": pa.int64(),
    "c_tinyint_u": pa.int32(),
    "c_smallint_u": pa.int32(),
    "c_int_u": pa.int64(),
    "c_bigint_u": pa.decimal128(20, 0),
    "c_float": pa.float32(),
    "c_double": pa.float64(),
    "c_decimal": pa.decimal128(10, 2),
    "c_numeric": pa.decimal128(20, 5),
    "c_date": pa.date32(),
    "c_time": pa.time64("us"),
    "c_time7": pa.time64("us"),
    "c_datetime": pa.timestamp("us"),
    "c_timestamp": pa.timestamp("us", tz="UTC"),
    "c_zoned": pa.timestamp("us", tz="UTC"),
    "c_year": pa.int32(),
    "c_char": pa.string(),
    "c_varchar": pa.string(),
    "c_text": pa.large_string(),
    "c_binary8": pa.binary(8),
    "c_varbinary": pa.binary(),
    "c_enum": pa.string(),
    "c_set": pa.string(),
    "c_json": pa.string(),
    "c_zero_date": pa.string(),
    "c_time_dur": pa.int64(),
    "c_bool": pa.bool_(),
    "c_latin1": pa.string(),
}


def _value_hash(df):
    import hashlib

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        df[c] = df[c].astype(str)
    rows = sorted(df.apply("|".join, axis=1).tolist())
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode() + b"\n")
    return h.hexdigest()


@pytest.fixture(scope="module")
def typed_lake(tmp_path_factory, ray_session):
    from database_delta_plugins_ray.pipelines.replicate import run_replication
    from database_delta_plugins_ray.sources.gen_typed import (
        TypedGenConfig,
        generate_typed_log,
    )

    root = tmp_path_factory.mktemp("typed")
    log = str(root / "log")
    lake = str(root / "lake")
    meta = generate_typed_log(
        log, TypedGenConfig(n_keys=250, n_events=1200, n_segments=4, seed=77)
    )
    summary = run_replication(log, lake, num_partitions=4, primary_key=("id",),
                              compute_sha=False)
    return {"log": log, "lake": lake, "meta": meta, "summary": summary}


def test_lake_schema_has_real_types(typed_lake):
    f = glob.glob(os.path.join(typed_lake["lake"], "part=*", "data-*.parquet"))[0]
    sch = pq.read_schema(f)
    for name, typ in EXPECTED_LAKE_TYPES.items():
        assert sch.field(name).type == typ, (name, sch.field(name).type, typ)


def test_final_state_matches_duckdb_oracle(typed_lake):
    from database_delta_plugins_ray.pipelines.replicate import final_state
    from database_delta_plugins_ray.sources.gen_typed import (
        canonical_batch,
        typed_columns,
        typed_oracle_sql,
    )

    names = [c.name for c in typed_columns()] + ["_sequence_num"]
    ds = final_state(typed_lake["lake"], columns=names)
    got = ds.map_batches(canonical_batch, batch_format="pyarrow").to_pandas()
    want = duckdb.sql(
        typed_oracle_sql(os.path.join(typed_lake["log"], "seg-*.parquet"))
    ).fetchdf()
    assert len(got) == len(want)
    assert sorted(got.columns) == sorted(want.columns)
    assert _value_hash(got) == _value_hash(want)


def test_typed_resume_equivalence(typed_lake, tmp_path):
    """Half replay + resume over the typed table == one-shot (the delta
    commit path must preserve every exotic type byte-for-byte)."""
    from database_delta_plugins_ray.pipelines.replicate import (
        final_state,
        run_replication,
    )
    from database_delta_plugins_ray.sources.gen_typed import (
        canonical_batch,
        typed_columns,
    )

    lake2 = str(tmp_path / "lake2")
    half = typed_lake["meta"]["max_lsn"] // 2
    run_replication(typed_lake["log"], lake2, num_partitions=4,
                    primary_key=("id",), compute_sha=False, upto_lsn=half)
    run_replication(typed_lake["log"], lake2, num_partitions=4,
                    primary_key=("id",), compute_sha=False)

    names = [c.name for c in typed_columns()] + ["_sequence_num"]

    def canon(lake):
        ds = final_state(lake, columns=names)
        return ds.map_batches(canonical_batch, batch_format="pyarrow").to_pandas()

    assert _value_hash(canon(typed_lake["lake"])) == _value_hash(canon(lake2))


def test_reference_fixture_values():
    """Values ported from the reference's own unit fixtures."""
    import pyarrow.compute as pc

    from database_delta_plugins_ray.functions.values import (
        iso8601_to_timestamp,
        nanos_past_midnight_to_time,
    )

    # RecordsTest.java:56-71 — ZonedTimestamp with fractional seconds and a
    # non-UTC offset must land on the exact TIMESTAMP_MICROS instant
    out = iso8601_to_timestamp(["2011-12-03T10:15:30.030431+01:00"])
    assert pc.cast(out, pa.int64())[0].as_py() == 1322903730030431

    # Records.java:241-246 — SQL Server TIME(7) nanos truncate to micros
    t = nanos_past_midnight_to_time([3_723_123_456_789])  # 01:02:03.123456789
    assert t[0].as_py().isoformat() == "01:02:03.123456"


def test_projection_keeps_primary_key(typed_lake, tmp_path):
    """A columns= projection that omits the PK must still replicate (PK is
    force-included, mirroring the reference's projection semantics)."""
    from database_delta_plugins_ray.pipelines.replicate import (
        final_state,
        run_replication,
    )

    lake3 = str(tmp_path / "lake3")
    run_replication(typed_lake["log"], lake3, num_partitions=2,
                    primary_key=("id",), compute_sha=False,
                    columns={"c_int", "c_char"})
    rows = final_state(lake3, columns=["id", "c_int", "c_char"]).take_all()
    assert rows and all(r["id"] for r in rows)


def test_typed_fragment_exchange_parity(typed_lake, tmp_path):
    """The all-datatypes table through the FRAGMENT exchange (parquet
    fragment round-trip of decimals / fixed binary / tz timestamps) must
    equal the sort-exchange lake byte-for-byte."""
    from database_delta_plugins_ray.pipelines.replicate import (
        final_state,
        run_replication,
    )
    from database_delta_plugins_ray.sources.gen_typed import (
        canonical_batch,
        typed_columns,
    )

    lake_f = str(tmp_path / "lake_frag")
    run_replication(typed_lake["log"], lake_f, num_partitions=4,
                    primary_key=("id",), compute_sha=False,
                    exchange="fragment")
    names = [c.name for c in typed_columns()] + ["_sequence_num"]

    def canon(lake):
        ds = final_state(lake, columns=names)
        return ds.map_batches(canonical_batch, batch_format="pyarrow").to_pandas()

    assert _value_hash(canon(typed_lake["lake"])) == _value_hash(canon(lake_f))
