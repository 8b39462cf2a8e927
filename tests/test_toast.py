"""Postgres TOAST carry-forward (public Debezium contract): an UPDATE
that doesn't modify a TOASTed column ships the reserved
``__debezium_unavailable_value`` placeholder; the sink keeps the
previous value (merge.py TOAST_SENTINEL / _resolve_toast, plus the
sentinel-aware normalize combiner that keeps each key's latest
provider row beside the winner)."""
import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def make_toast_log(tmp_path, *, n_keys=60, n_events=500, seed=9,
                   every=3):
    from database_delta_plugins_ray.sources.gen import (
        GenConfig, generate_log)
    from database_delta_plugins_ray.stages.merge import TOAST_SENTINEL

    log = str(tmp_path / "log")
    generate_log(log, GenConfig(n_keys=n_keys, n_events=n_events,
                                seed=seed, n_segments=2))
    n = 0
    for f in sorted(os.listdir(log)):
        if not (f.startswith("seg-") and f.endswith(".parquet")):
            continue
        t = pq.read_table(os.path.join(log, f))
        rows = t.to_pylist()
        for r in rows:
            if (r["op"] == "U" and r["lsn"] % every == 0
                    and r["after"] is not None):
                r["after"] = {**r["after"], "content": TOAST_SENTINEL}
                n += 1
        pq.write_table(pa.Table.from_pylist(rows, schema=t.schema),
                       os.path.join(log, f))
    assert n > 0
    return log


def reference_final(log_dir):
    """Pure-python replay with the carry-forward rule: content of a
    sentinel event = the key's most recent earlier non-null,
    non-sentinel content."""
    import glob as _glob

    from database_delta_plugins_ray.stages.merge import TOAST_SENTINEL

    state, last_content = {}, {}
    for f in sorted(_glob.glob(os.path.join(log_dir, "seg-*.parquet"))):
        for ev in pq.read_table(f).to_pylist():
            if ev["op"] == "DDL":
                continue
            img = ev["after"] or ev["before"]
            key = (img["repo"], img["path"])
            if ev["op"] == "D":
                state[key] = None
                continue
            content = (ev["after"] or {}).get("content")
            if content == TOAST_SENTINEL:
                content = last_content.get(key)
            else:
                last_content[key] = content
            state[key] = (ev["lsn"], content)
    return {k: v for k, v in state.items() if v is not None}


def assert_lake_matches(lake, log):
    from database_delta_plugins_ray.pipelines.replicate import final_state

    rows = final_state(lake).take_all()
    got = {(r["repo"], r["path"]): (r["_sequence_num"], r["content"])
           for r in rows if not r["_is_deleted"]}
    exp = reference_final(log)
    assert got == exp
    # derived sha carried forward consistently with content
    for r in rows:
        if not r["_is_deleted"]:
            assert r["content_sha"] == hashlib.sha256(
                (r["content"] or "").encode()).hexdigest()


def test_carry_forward_one_shot(ray_session, tmp_path):
    from database_delta_plugins_ray.pipelines.replicate import (
        run_replication)

    log = make_toast_log(tmp_path)
    lake = str(tmp_path / "lake")
    run_replication(log, lake, num_partitions=4,
                    toast_columns=("content",))
    assert_lake_matches(lake, log)


def test_carry_forward_resume_crosses_base(ray_session, tmp_path):
    """A sentinel arriving AFTER the checkpoint must resolve from the
    BASE rows (forces the full-merge path) — split replay == one-shot."""
    from database_delta_plugins_ray.pipelines.replicate import (
        log_max_lsn, run_replication)

    log = make_toast_log(tmp_path)
    half = log_max_lsn(log) // 2
    lake = str(tmp_path / "lake2")
    run_replication(log, lake, num_partitions=4, upto_lsn=half,
                    toast_columns=("content",))
    run_replication(log, lake, num_partitions=4,
                    toast_columns=("content",))
    assert_lake_matches(lake, log)


def test_without_opt_in_sentinel_passes_through(ray_session, tmp_path):
    """toast_columns is OPT-IN: without it the placeholder is ordinary
    data (non-postgres feeds can legitimately never see it)."""
    from database_delta_plugins_ray.pipelines.replicate import (
        final_state, run_replication)
    from database_delta_plugins_ray.stages.merge import TOAST_SENTINEL

    log = make_toast_log(tmp_path)
    lake = str(tmp_path / "lake3")
    run_replication(log, lake, num_partitions=4)
    rows = final_state(lake).take_all()
    assert any(r["content"] == TOAST_SENTINEL for r in rows
               if not r["_is_deleted"])


def test_genuine_null_update_not_resurrected(ray_session, tmp_path):
    """An UPDATE that legitimately sets a toast column to NULL is a
    real value: carry-forward applies ONLY at placeholder rows, so the
    NULL must survive (not inherit the stale previous value)."""
    from database_delta_plugins_ray.pipelines.replicate import (
        final_state, run_replication)
    from database_delta_plugins_ray.stages.merge import TOAST_SENTINEL

    log = make_toast_log(tmp_path)
    # rewrite: for keys whose LAST event is a non-sentinel UPDATE, set
    # content to a genuine NULL (a later sentinel for the same key
    # cannot occur in a real feed: the placeholder implies a stored
    # non-null TOASTed value)
    last = {}
    files = sorted(f for f in os.listdir(log)
                   if f.startswith("seg-") and f.endswith(".parquet"))
    for f in files:
        for ev in pq.read_table(os.path.join(log, f)).to_pylist():
            if ev["op"] == "DDL":
                continue
            img = ev["after"] or ev["before"]
            last[(img["repo"], img["path"])] = ev
    nulled = set()
    for key, ev in last.items():
        if (ev["op"] == "U" and ev["after"] is not None
                and ev["after"]["content"] != TOAST_SENTINEL):
            nulled.add(key)
    assert nulled, "fixture produced no candidate keys"
    target_lsns = {last[k]["lsn"] for k in nulled}

    def relax(schema):
        # the generator declares content NOT NULL; from_pylist would
        # silently coerce None to '' under that schema
        out = []
        for fld in schema:
            if pa.types.is_struct(fld.type):
                out.append(pa.field(fld.name, pa.struct(
                    [pa.field(c.name, c.type, nullable=True)
                     for c in fld.type])))
            else:
                out.append(fld)
        return pa.schema(out)

    for f in files:
        p = os.path.join(log, f)
        t = pq.read_table(p)
        rows = t.to_pylist()
        hit = False
        for r in rows:
            if r["lsn"] in target_lsns and r["op"] == "U":
                r["after"] = {**r["after"], "content": None}
                hit = True
        if hit:
            pq.write_table(
                pa.Table.from_pylist(rows, schema=relax(t.schema)), p)

    lake = str(tmp_path / "lake_null")
    run_replication(log, lake, num_partitions=4,
                    toast_columns=("content",))
    rows = final_state(lake).take_all()
    got = {(r["repo"], r["path"]): r for r in rows
           if not r["_is_deleted"]}
    checked = 0
    for key in nulled:
        if key in got:
            assert got[key]["content"] is None, key
            assert got[key]["content_sha"] is None, key
            checked += 1
    assert checked > 0
