"""Incrementally-maintained lake export: only change-touched shards
rewrite, result equals a fresh full export, crash re-runs are
idempotent."""

import glob
import json
import os

import pyarrow.parquet as pq
import pytest

from database_delta_plugins_ray.pipelines.queries import (
    _time_travel_boundary,
)
from database_delta_plugins_ray.pipelines.replicate import run_replication
from database_delta_plugins_ray.stages.export import export_lake_incremental


def _rows(out_dir):
    files = glob.glob(os.path.join(out_dir, "shard=*", "*.parquet"))
    rows = []
    for f in files:
        rows.extend(pq.read_table(f).to_pylist())
    return {(r["table"], r["repo"], r["path"]):
            (r["content_sha"], r["_sequence_num"]) for r in rows}


@pytest.mark.usefixtures("ray_session")
def test_incremental_export_equals_full(small_log, tmp_path):
    log_dir, _, meta = small_log
    lake = str(tmp_path / "lake")
    out = str(tmp_path / "out")
    full = str(tmp_path / "full")
    boundary = _time_travel_boundary(log_dir)
    run_replication(log_dir, lake, num_partitions=8, history=True,
                    upto_lsn=boundary)
    m0 = export_lake_incremental(lake, out, nshards=16)
    assert m0["rewritten_shards"] == 16  # first export writes everything

    run_replication(log_dir, lake, num_partitions=8, history=True)
    m1 = export_lake_incremental(lake, out, nshards=16)
    assert 0 < m1["rewritten_shards"] <= 16
    # the change set at this scale doesn't blanket every shard... if it
    # does, the test still verifies content; pruning is checked below
    # against a tiny diff

    m_full = export_lake_incremental(lake, full, nshards=16)
    assert _rows(out) == _rows(full)

    # no-op on unchanged lake
    m2 = export_lake_incremental(lake, out, nshards=16)
    assert m2["skipped"] and m2["rewritten_shards"] == 0

    # crash simulation: shards rewritten but manifest rolled back ->
    # re-run must be idempotent (drop-then-re-add of the same keys)
    mp = os.path.join(out, "manifest.json")
    with open(mp) as fh:
        man = json.load(fh)
    man["watermark"] = m0["watermark"]
    with open(mp, "w") as fh:
        json.dump(man, fh)
    before = _rows(out)
    m3 = export_lake_incremental(lake, out, nshards=16)
    assert m3["rewritten_shards"] >= 1
    assert _rows(out) == before == _rows(full)


@pytest.mark.usefixtures("ray_session")
def test_incremental_export_three_increments_schema_stable(small_log,
                                                           tmp_path):
    """Three increments over a lake whose nullable int64 column (stars:
    null for pre-DDL schema versions) exercises the round-3 crash: a
    rewrite that type-drifted a shard file (int64 -> double via pandas)
    blew up on the NEXT increment's concat. The pinned manifest schema
    must keep every shard file's types identical across rewrites."""
    import base64

    import pyarrow as pa

    log_dir, _, meta = small_log
    lake = str(tmp_path / "lake3")
    out = str(tmp_path / "out3")
    full = str(tmp_path / "full3")
    b1 = _time_travel_boundary(log_dir)
    b2 = (b1 + int(meta["max_lsn"])) // 2

    run_replication(log_dir, lake, num_partitions=8, history=True,
                    upto_lsn=b1)
    m0 = export_lake_incremental(lake, out, nshards=16)
    pinned = m0["schema_ipc"]
    assert pinned

    for upto in (b2, None):
        run_replication(log_dir, lake, num_partitions=8, history=True,
                        upto_lsn=upto)
        m = export_lake_incremental(lake, out, nshards=16)
        assert m["rewritten_shards"] >= 1
        assert m["schema_ipc"] == pinned
        # every shard file matches the pinned schema exactly
        want = pa.ipc.read_schema(
            pa.BufferReader(base64.b64decode(pinned)))
        for f in glob.glob(os.path.join(out, "shard=*", "*.parquet")):
            got = pq.read_schema(f)
            assert pa.schema([got.field(c) for c in m["columns"]]) == want, f

    export_lake_incremental(lake, full, nshards=16)
    assert _rows(out) == _rows(full)


@pytest.mark.usefixtures("ray_session")
def test_incremental_export_repins_on_unexpressible_cast(small_log,
                                                         tmp_path):
    """When an increment can no longer cast into the pinned schema (a
    column outgrew its pinned type — the ALTER-widen-overflow case), the
    export must self-heal with ONE full re-pinning rebuild, not crash.
    Simulated by shrinking the pinned ``stars`` type to int8 (fixture
    values exceed it), exactly what a post-pin widen with big values
    produces."""
    import base64

    import pyarrow as pa

    log_dir, _, meta = small_log
    lake = str(tmp_path / "laker")
    out = str(tmp_path / "outr")
    full = str(tmp_path / "fullr")
    b1 = _time_travel_boundary(log_dir)
    run_replication(log_dir, lake, num_partitions=8, history=True,
                    upto_lsn=b1)
    m0 = export_lake_incremental(lake, out, nshards=16)

    mp = os.path.join(out, "manifest.json")
    with open(mp) as fh:
        man = json.load(fh)
    pinned = pa.ipc.read_schema(
        pa.BufferReader(base64.b64decode(man["schema_ipc"])))
    shrunk = pa.schema([f.with_type(pa.int8()) if f.name == "stars" else f
                        for f in pinned])
    man["schema_ipc"] = base64.b64encode(
        shrunk.serialize().to_pybytes()).decode()
    with open(mp, "w") as fh:
        json.dump(man, fh)

    run_replication(log_dir, lake, num_partitions=8, history=True)
    m1 = export_lake_incremental(lake, out, nshards=16)
    # self-healed: full rebuild, re-pinned at the current (int64) schema
    assert m1["rewritten_shards"] == 16
    got = pa.ipc.read_schema(
        pa.BufferReader(base64.b64decode(m1["schema_ipc"])))
    assert got.field("stars").type == pinned.field("stars").type
    export_lake_incremental(lake, full, nshards=16)
    assert _rows(out) == _rows(full)
    # and the export is incremental again afterwards
    m2 = export_lake_incremental(lake, out, nshards=16)
    assert m2["skipped"]


@pytest.mark.usefixtures("ray_session")
def test_export_sorted_global_order(tmp_path):
    """export_sorted: file ranges are disjoint and ascending in name
    order; concatenation equals the full ORDER BY; probe via manifest."""
    import numpy as np
    import pandas as pd
    import ray.data

    from database_delta_plugins_ray.stages.export import export_sorted

    rng = np.random.default_rng(5)
    n = 5000
    df = pd.DataFrame({
        "k": rng.integers(-10_000, 10_000, n).astype(np.int64),
        "payload": np.arange(n, dtype=np.int64),
    })
    out = str(tmp_path / "sorted")
    m = export_sorted(ray.data.from_pandas(df).repartition(9), out,
                      order_col="k", nbuckets=16)
    assert m["total_rows"] == n

    allk = []
    prev_max = None
    for f in m["files"]:
        t = pq.read_table(os.path.join(out, f["file"]))
        k = t["k"].to_numpy()
        assert (np.diff(k) >= 0).all()          # sorted within file
        assert int(k.min()) == int(f["min"])
        assert int(k.max()) == int(f["max"])
        if prev_max is not None:
            assert int(k.min()) >= prev_max      # disjoint + ascending
        prev_max = int(k.max())
        allk.append(k)
    got = np.concatenate(allk)
    assert np.array_equal(got, np.sort(df["k"].to_numpy(), kind="stable"))

    # manifest probe: a point query opens exactly one candidate file
    probe = int(df["k"].iloc[123])
    cands = [f for f in m["files"]
             if int(f["min"]) <= probe <= int(f["max"])]
    assert len(cands) >= 1
    hit = pq.read_table(os.path.join(out, cands[0]["file"]))
    assert probe in set(hit["k"].to_numpy().tolist())


@pytest.mark.usefixtures("ray_session")
def test_export_sorted_rejects_string_keys(tmp_path):
    """String order columns have no range layout here — the stage must
    fail fast with a clear message, not a deep astype ValueError (and
    the CLI default order column is numeric for the same reason)."""
    import pandas as pd
    import ray.data

    from database_delta_plugins_ray.stages.export import export_sorted

    ds = ray.data.from_pandas(pd.DataFrame({"k": ["b", "a"], "v": [1, 2]}))
    with pytest.raises(TypeError, match="unsupported order column"):
        export_sorted(ds, str(tmp_path / "s"), order_col="k")


@pytest.mark.usefixtures("ray_session")
def test_export_sorted_manifest_numeric_minmax(tmp_path):
    """Manifest min/max are native JSON numbers for numeric keys (string
    comparison misorders: '10' < '9'), and the order dtype is recorded."""
    import pandas as pd
    import ray.data

    from database_delta_plugins_ray.stages.export import export_sorted

    df = pd.DataFrame({"k": [2, 9, 10, 11, 100], "v": range(5)})
    out = str(tmp_path / "mm")
    m = export_sorted(ray.data.from_pandas(df), out, order_col="k",
                      nbuckets=2)
    assert "order_dtype" in m
    with open(os.path.join(out, "manifest.json")) as fh:
        raw = json.load(fh)
    for f in raw["files"]:
        assert isinstance(f["min"], int) and isinstance(f["max"], int)
    # numeric manifest probe finds 10 in the right file (str cmp fails)
    cands = [f for f in raw["files"] if f["min"] <= 10 <= f["max"]]
    assert len(cands) == 1


@pytest.mark.usefixtures("ray_session")
def test_export_sorted_null_keys_last(tmp_path):
    """Null order keys land in their own LAST bucket (nulls-last); the
    value buckets stay disjoint and the range stats ignore nulls."""
    import numpy as np
    import pandas as pd
    import ray.data

    from database_delta_plugins_ray.stages.export import export_sorted

    df = pd.DataFrame({
        "k": pd.array([5, None, 1, None, 9, 3, None], dtype="Int64"),
        "payload": np.arange(7, dtype=np.int64),
    })
    out = str(tmp_path / "sortednull")
    m = export_sorted(ray.data.from_pandas(df), out, order_col="k",
                      nbuckets=4)
    assert m["total_rows"] == 7
    last = m["files"][-1]
    assert last["min"] is None and last["max"] is None
    t = pq.read_table(os.path.join(out, last["file"]))
    assert len(t) == 3  # exactly the null-key rows
    # non-null files cover exactly the non-null values, in order
    vals = []
    for f in m["files"][:-1]:
        tt = pq.read_table(os.path.join(out, f["file"]))
        v = tt["k"].to_numpy(zero_copy_only=False).astype(float)
        assert not np.isnan(v).any()
        vals.extend(v.tolist())
    assert vals == sorted([1.0, 3.0, 5.0, 9.0])
