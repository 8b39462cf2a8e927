"""Apply-time column transform (Debezium-SMT analog) gates
(stages/normalize.py:_compile_transform + run_replication(transforms=)).

The driver gate (cdc_transformed_apply) is hash-exact vs a DuckDB
oracle whose LWW CTE applies the same expressions; these tests add the
pure-Python-oracle pipeline parity, the blocked-column contract, and
kernel unit checks."""
import hashlib

import pyarrow as pa
import pytest


def test_pipeline_parity_with_transformed_oracle(ray_session, tmp_path):
    from database_delta_plugins_ray.pipelines.oracle import replay
    from database_delta_plugins_ray.pipelines.replicate import (
        final_state, run_replication)
    from database_delta_plugins_ray.sources.gen import (
        GenConfig, generate_log)

    log = str(tmp_path / "log")
    lake = str(tmp_path / "lake")
    generate_log(log, GenConfig(n_keys=200, n_events=1500, seed=11))
    run_replication(log, lake, num_partitions=4,
                    transforms={"language": "upper",
                                "content": "truncate:50"})
    got = {(r["repo"], r["path"]): r
           for r in final_state(lake).take_all()}
    want = replay(log)
    assert len(got) == len(want)
    for k, o in want.items():
        key = (k[1], k[2]) if len(k) == 3 else k
        g = got[key]
        lang = o["language"]
        assert g["language"] == (lang.upper() if lang is not None else None)
        content = o.get("content")
        if content is not None:
            tc = content[:50]
            assert g["content_sha"] == hashlib.sha256(
                tc.encode()).hexdigest()
        assert g["_sequence_num"] == o["_sequence_num"]


def test_blocked_columns_raise(ray_session):
    from database_delta_plugins_ray.state.ddl import Registry
    from database_delta_plugins_ray.stages.normalize import Normalizer

    reg = Registry()
    for col in ("repo", "path", "lsn", "content_sha", "part"):
        with pytest.raises(ValueError):
            Normalizer(reg, 4, transforms={col: "upper"})
    # TOAST carry-forward columns must pass the sentinel through intact
    with pytest.raises(ValueError):
        Normalizer(reg, 4, transforms={"content": "upper"},
                   toast_fields=("content",))
    with pytest.raises(ValueError):
        Normalizer(reg, 4, transforms={"content": "rot13"})
    # a typo'd column must raise once the registry knows any schema
    from database_delta_plugins_ray.state.ddl import TableState

    reg2 = Registry()
    reg2.tables["t"] = TableState(
        name="t", columns=[("repo", "string"), ("path", "string"),
                           ("content", "string")])
    with pytest.raises(ValueError):
        Normalizer(reg2, 4, transforms={"contnet": "upper"})
    Normalizer(reg2, 4, transforms={"content": "upper"})  # known: fine


def test_transform_kernels():
    from database_delta_plugins_ray.stages.normalize import (
        _compile_transform)

    a = pa.array(["Reach me at bob.smith+x@corp.example.com today",
                  None, "no address here"])
    masked = _compile_transform("mask_email")(a).to_pylist()
    assert masked == ["Reach me at <email> today", None,
                      "no address here"]

    t = _compile_transform("truncate:3")(pa.array(["abcdef", "ab", None]))
    assert t.to_pylist() == ["abc", "ab", None]

    m = _compile_transform("mask")(pa.array(["secret", None]))
    assert m.to_pylist() == ["***", None]

    s = _compile_transform("sha256")(pa.array(["x", None]))
    assert s.to_pylist() == [hashlib.sha256(b"x").hexdigest(), None]


def test_cli_transform_flag_end_to_end(ray_session, tmp_path):
    import os
    import subprocess
    import sys

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    CLI = [sys.executable, "-m", "database_delta_plugins_ray",
           "--num-cpus", "4"]
    env = dict(os.environ, PYTHONPATH=REPO, RAY_ADDRESS="local")
    log = str(tmp_path / "log")
    lake = str(tmp_path / "lake")
    subprocess.run(
        CLI + ["gen", "--out", log, "--keys", "60", "--events", "300"],
        check=True, capture_output=True, env=env, cwd=REPO)
    subprocess.run(
        CLI + ["replicate", "--log", log, "--lake", lake,
               "--partitions", "4", "--transform", "language=upper"],
        check=True, capture_output=True, env=env, cwd=REPO)
    from database_delta_plugins_ray.pipelines.replicate import final_state

    langs = {r["language"]
             for r in final_state(lake, columns=["language"]).take_all()}
    langs.discard(None)
    assert langs and all(v == v.upper() for v in langs)
    # a typo'd transform column fails fast with a clear error
    r = subprocess.run(
        CLI + ["replicate", "--log", log,
               "--lake", str(tmp_path / "lake2"),
               "--partitions", "4", "--transform", "languag=upper"],
        capture_output=True, text=True, env=env, cwd=REPO)
    assert r.returncode != 0
    assert "exists in no known table schema" in (r.stderr + r.stdout)


def test_non_string_transform_target_raises(ray_session):
    """mask/sha256 on an int column would silently rewrite the lake
    column to string; upper/truncate would fail mid-replay — all must
    fail fast at Normalizer construction."""
    from database_delta_plugins_ray.stages.normalize import Normalizer
    from database_delta_plugins_ray.state.ddl import Registry, TableState

    reg = Registry()
    reg.tables["t"] = TableState(
        name="t", columns=[("repo", "string"), ("path", "string"),
                           ("stars", "int64"), ("content", "large_string")])
    for spec in ("mask", "sha256", "upper", "truncate:3"):
        with pytest.raises(ValueError, match="string kernels"):
            Normalizer(reg, 4, transforms={"stars": spec})
    # large_string targets are fine
    Normalizer(reg, 4, transforms={"content": "truncate:3"})
