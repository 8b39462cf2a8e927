"""Lake maintenance tests: vacuum (tombstone pruning), stats, and
RENAME_TABLE end-to-end (hand-built log)."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from database_delta_plugins_ray.model import (
    DDL_STRUCT,
    PAYLOAD_STRUCT,
    event_log_schema,
)
from database_delta_plugins_ray.pipelines.maintenance import lake_stats, vacuum_lake
from database_delta_plugins_ray.pipelines.oracle import replay
from database_delta_plugins_ray.pipelines.replicate import (
    final_state,
    read_lake,
    run_replication,
)
from database_delta_plugins_ray.sources.gen import GenConfig, generate_log


@pytest.mark.usefixtures("ray_session")
def test_vacuum_prunes_tombstones(small_log, tmp_path):
    log_dir, _, meta = small_log
    lake = str(tmp_path / "lake")
    run_replication(log_dir, lake, num_partitions=6)
    before = read_lake(lake).take_all()
    n_tomb = sum(1 for r in before if r["_is_deleted"])
    assert n_tomb > 0
    live_before = {(r["table"], r["repo"], r["path"]) for r in before
                   if not r["_is_deleted"]}

    s = vacuum_lake(lake)
    # only tombstones at/below the GLOBAL min watermark are prunable; a
    # tombstone newer than another partition's watermark must survive
    assert 0 < s["pruned"] <= n_tomb
    mid = read_lake(lake).take_all()
    for r in mid:
        if r["_is_deleted"]:
            assert r["_sequence_num"] > s["prune_below"]
    # explicit bound at the log head prunes the rest
    vacuum_lake(lake, prune_below=meta["max_lsn"])
    after = read_lake(lake).take_all()
    assert not any(r["_is_deleted"] for r in after)
    assert {(r["table"], r["repo"], r["path"]) for r in after} == live_before

    # replication after vacuum is still a no-op (watermarks intact)
    s2 = run_replication(log_dir, lake, num_partitions=6)
    assert s2["events_applied"] == 0

    stats = lake_stats(lake)
    assert stats["rows"] == stats["live_rows"] == len(live_before)
    assert stats["max_watermark"] == meta["max_lsn"]


def _event(lsn, op, table, after=None, before=None, ddl=None):
    def img(d):
        if d is None:
            return None
        return {"repo": d["repo"], "path": d["path"],
                "commit": d.get("commit", "c" * 40), "lang": d.get("lang", "py"),
                "content": d.get("content", f"content-{lsn}"),
                "stars": d.get("stars"), "language": None}

    return {
        "lsn": lsn, "tx_id": f"tx{lsn}", "op": op, "table": table,
        "before": img(before), "after": img(after),
        "ddl": ddl, "is_snapshot": False,
        "ingest_ts": 1_700_000_000_000 + lsn, "schema_version": 0,
    }


@pytest.mark.usefixtures("ray_session")
def test_rename_table_end_to_end(tmp_path):
    """RENAME_TABLE mid-stream: events before the rename land under the old
    name, the registry re-points them, final state lives under the new name
    (MySqlRecordConsumer.java:254-257 RENAME via prevTableName)."""
    log_dir = str(tmp_path / "log")
    os.makedirs(log_dir)
    create = {"op": "CREATE_TABLE", "table": "db.old", "prev_table": "",
              "payload": json.dumps({
                  "columns": [["repo", "string"], ["path", "string"],
                              ["commit", "string"], ["lang", "string"],
                              ["content", "large_string"]],
                  "primary_key": ["repo", "path"]})}
    rename = {"op": "RENAME_TABLE", "table": "db.new", "prev_table": "db.old",
              "payload": json.dumps({"new_name": "db.new"})}
    rows = [
        _event(1, "DDL", "db.old", ddl=create),
        _event(2, "I", "db.old", after={"repo": "r", "path": "a"}),
        _event(3, "I", "db.old", after={"repo": "r", "path": "b"}),
        _event(4, "DDL", "db.new", ddl=rename),
        # post-rename traffic arrives under the new table id
        _event(5, "U", "db.new", after={"repo": "r", "path": "a",
                                        "content": "v2"},
               before={"repo": "r", "path": "a"}),
        _event(6, "D", "db.new", before={"repo": "r", "path": "b"}),
        _event(7, "I", "db.new", after={"repo": "r", "path": "c"}),
    ]
    schema = event_log_schema()
    tbl = pa.Table.from_pylist(rows, schema=schema)
    pq.write_table(tbl, os.path.join(log_dir, "seg-00000.parquet"))

    lake = str(tmp_path / "lake")
    run_replication(log_dir, lake, num_partitions=2)
    got = {(r["table"], r["repo"], r["path"]): r
           for r in final_state(lake).take_all()}
    oracle = replay(log_dir)
    assert set(got) == set(oracle)
    assert all(k[0] == "db.new" for k in got)
    assert got[("db.new", "r", "a")]["content"] == "v2"
    assert ("db.new", "r", "b") not in got


@pytest.mark.usefixtures("ray_session")
def test_drop_table_end_to_end(tmp_path):
    """DROP_TABLE mid-stream fences every earlier row; later re-inserts
    revive the table; catalog marks it dropped only if never recreated."""
    log_dir = str(tmp_path / "log")
    os.makedirs(log_dir)
    create = {"op": "CREATE_TABLE", "table": "db.t", "prev_table": "",
              "payload": json.dumps({
                  "columns": [["repo", "string"], ["path", "string"],
                              ["commit", "string"], ["lang", "string"],
                              ["content", "large_string"]],
                  "primary_key": ["repo", "path"]})}
    drop = {"op": "DROP_TABLE", "table": "db.t", "prev_table": "",
            "payload": "{}"}
    rows = [
        _event(1, "DDL", "db.t", ddl=create),
        _event(2, "I", "db.t", after={"repo": "r", "path": "a"}),
        _event(3, "I", "db.t", after={"repo": "r", "path": "b"}),
        _event(4, "DDL", "db.t", ddl=drop),
        _event(5, "I", "db.t", after={"repo": "r", "path": "c"}),
    ]
    tbl = pa.Table.from_pylist(rows, schema=event_log_schema())
    pq.write_table(tbl, os.path.join(log_dir, "seg-00000.parquet"))

    lake = str(tmp_path / "lake")
    run_replication(log_dir, lake, num_partitions=2)
    got = {(r["repo"], r["path"]) for r in final_state(lake).take_all()}
    oracle = {(k[1], k[2]) for k in replay(log_dir)}
    assert got == oracle == {("r", "c")}


@pytest.mark.usefixtures("ray_session")
def test_rename_table_across_resume(tmp_path):
    """Resume ACROSS a RENAME_TABLE: lake state written under the old name
    must merge with post-rename events (root-stable partition hashing +
    state migration), never duplicate keys."""
    log_dir = str(tmp_path / "log")
    os.makedirs(log_dir)
    create = {"op": "CREATE_TABLE", "table": "db.old", "prev_table": "",
              "payload": json.dumps({
                  "columns": [["repo", "string"], ["path", "string"],
                              ["commit", "string"], ["lang", "string"],
                              ["content", "large_string"]],
                  "primary_key": ["repo", "path"]})}
    rename = {"op": "RENAME_TABLE", "table": "db.new", "prev_table": "db.old",
              "payload": json.dumps({"new_name": "db.new"})}
    rows = [
        _event(1, "DDL", "db.old", ddl=create),
        _event(2, "I", "db.old", after={"repo": "r", "path": "a"}),
        _event(3, "I", "db.old", after={"repo": "r", "path": "b"}),
        _event(4, "DDL", "db.new", ddl=rename),
        _event(5, "U", "db.new", after={"repo": "r", "path": "a",
                                        "content": "v2"},
               before={"repo": "r", "path": "a"}),
        _event(6, "D", "db.new", before={"repo": "r", "path": "b"}),
    ]
    tbl = pa.Table.from_pylist(rows, schema=event_log_schema())
    pq.write_table(tbl, os.path.join(log_dir, "seg-00000.parquet"))

    lake = str(tmp_path / "lake")
    # phase 1: stop BEFORE the rename -> state committed under db.old
    run_replication(log_dir, lake, num_partitions=4, upto_lsn=3)
    got1 = {(r["table"], r["repo"], r["path"])
            for r in final_state(lake).take_all()}
    assert got1 == {("db.old", "r", "a"), ("db.old", "r", "b")}
    # phase 2: resume across the rename
    run_replication(log_dir, lake, num_partitions=4)
    rows2 = final_state(lake).take_all()
    got2 = {(r["table"], r["repo"], r["path"]): r for r in rows2}
    oracle = replay(log_dir)
    assert set(got2) == set(oracle) == {("db.new", "r", "a")}
    assert got2[("db.new", "r", "a")]["content"] == "v2"
    assert len(rows2) == 1  # no duplicate/stale rows under db.old


@pytest.mark.usefixtures("ray_session")
def test_chained_rename_across_resume(tmp_path):
    """A -> B -> C rename chain with a resume between the renames: events
    under every historical name merge into one key space under the final
    name; the pure-Python oracle (transitive re-pointing) agrees."""
    log_dir = str(tmp_path / "log")
    os.makedirs(log_dir)
    create = {"op": "CREATE_TABLE", "table": "db.a", "prev_table": "",
              "payload": json.dumps({
                  "columns": [["repo", "string"], ["path", "string"],
                              ["commit", "string"], ["lang", "string"],
                              ["content", "large_string"]],
                  "primary_key": ["repo", "path"]})}
    ren_ab = {"op": "RENAME_TABLE", "table": "db.b", "prev_table": "db.a",
              "payload": json.dumps({"new_name": "db.b"})}
    ren_bc = {"op": "RENAME_TABLE", "table": "db.c", "prev_table": "db.b",
              "payload": json.dumps({"new_name": "db.c"})}
    rows = [
        _event(1, "DDL", "db.a", ddl=create),
        _event(2, "I", "db.a", after={"repo": "r", "path": "x", "content": "v1"}),
        _event(3, "DDL", "db.b", ddl=ren_ab),
        _event(4, "U", "db.b", after={"repo": "r", "path": "x", "content": "v2"},
               before={"repo": "r", "path": "x"}),
        _event(5, "I", "db.b", after={"repo": "r", "path": "y", "content": "w1"}),
        _event(6, "DDL", "db.c", ddl=ren_bc),
        _event(7, "U", "db.c", after={"repo": "r", "path": "x", "content": "v3"},
               before={"repo": "r", "path": "x"}),
        _event(8, "D", "db.c", before={"repo": "r", "path": "y"}),
    ]
    schema = event_log_schema()
    pq.write_table(pa.Table.from_pylist(rows, schema=schema),
                   os.path.join(log_dir, "seg-00000.parquet"))

    lake = str(tmp_path / "lake")
    # resume mid-chain: stop after the FIRST rename's traffic
    run_replication(log_dir, lake, num_partitions=2, upto_lsn=5)
    run_replication(log_dir, lake, num_partitions=2)

    got = {(r["table"], r["repo"], r["path"]): r
           for r in final_state(lake).take_all()}
    oracle = replay(log_dir)
    assert set(got) == set(oracle)
    assert set(got) == {("db.c", "r", "x")}
    assert got[("db.c", "r", "x")]["content"] == "v3"
    assert got[("db.c", "r", "x")]["_sequence_num"] == 7


@pytest.mark.usefixtures("ray_session")
def test_widen_migrates_committed_state(tmp_path):
    """ALTER widen (int32 -> int64) across a RESUME: the lake committed
    pre-widen stores the narrow type; the post-widen resume must CAST the
    old partition state to the widened schema before merging (north_star:
    'widens ... exactly as the reference's assessor tests dictate';
    SURVEY.md §1.3 migration contract)."""
    import glob as _glob

    log_dir = str(tmp_path / "log")
    os.makedirs(log_dir)
    create = {"op": "CREATE_TABLE", "table": "db.w", "prev_table": "",
              "payload": json.dumps({
                  "columns": [["repo", "string"], ["path", "string"],
                              ["commit", "string"], ["lang", "string"],
                              ["content", "large_string"],
                              ["stars", "int32"]],
                  "primary_key": ["repo", "path"]})}
    widen = {"op": "ALTER_TABLE", "table": "db.w", "prev_table": "",
             "payload": json.dumps({"action": "widen", "column": "stars",
                                    "type": "int64", "from_type": "int32"})}
    rows = [
        _event(1, "DDL", "db.w", ddl=create),
        _event(2, "I", "db.w", after={"repo": "r", "path": "a", "stars": 7}),
        _event(3, "I", "db.w", after={"repo": "r", "path": "b", "stars": 9}),
        _event(4, "DDL", "db.w", ddl=widen),
        # post-widen value outside int32 range
        _event(5, "U", "db.w", after={"repo": "r", "path": "a",
                                      "stars": 5_000_000_000},
               before={"repo": "r", "path": "a"}),
        _event(6, "I", "db.w", after={"repo": "r", "path": "c", "stars": 1}),
    ]
    pq.write_table(pa.Table.from_pylist(rows, schema=event_log_schema()),
                   os.path.join(log_dir, "seg-00000.parquet"))

    lake = str(tmp_path / "lake")
    # phase 1: commit pre-widen -> lake stores int32 stars
    run_replication(log_dir, lake, num_partitions=2, upto_lsn=3)
    f = _glob.glob(os.path.join(lake, "part=*", "data-*.parquet"))[0]
    assert pq.read_schema(f).field("stars").type == pa.int32()

    # phase 2: resume past the widen. Migration is LAZY (migrate-on-touch:
    # an untouched partition keeps its narrow file — rewriting every
    # partition on DDL would be full-lake write amplification); partitions
    # that received post-widen events must be rewritten as int64, and the
    # read path promotes across vintages so the logical schema and values
    # are uniformly widened.
    run_replication(log_dir, lake, num_partitions=2)
    types = {pq.read_schema(f).field("stars").type
             for f in _glob.glob(os.path.join(lake, "part=*", "data-*.parquet"))}
    assert pa.int64() in types  # touched partitions migrated
    got = {(r["repo"], r["path"]): r["stars"] for r in final_state(lake).take_all()}
    assert got == {("r", "a"): 5_000_000_000, ("r", "b"): 9, ("r", "c"): 1}
    assert all(isinstance(v, int) for v in got.values())


@pytest.mark.usefixtures("ray_session")
def test_optimize_compacts_preserves_state_and_resume(small_log, tmp_path):
    """OPTIMIZE folds delta files to one sorted file per partition,
    changes NO row of the state, and replication resumes on top of the
    optimized lake exactly-once."""
    import glob as _glob

    from database_delta_plugins_ray.pipelines.maintenance import optimize_lake

    # DDL-free log: a schema change forces a full rewrite, so deltas (the
    # multi-file layout OPTIMIZE folds) only accumulate without one
    log_dir = str(tmp_path / "log")
    meta = generate_log(log_dir, GenConfig(
        n_keys=300, n_events=2000, n_repos=10, seed=43, n_segments=4,
        ddl_plan=False))
    lake = str(tmp_path / "lake")
    half = meta["max_lsn"] // 2
    # two legs force delta commits (multi-file partitions) pre-OPTIMIZE
    run_replication(log_dir, lake, num_partitions=6, upto_lsn=half)
    run_replication(log_dir, lake, num_partitions=6,
                    upto_lsn=(half + meta["max_lsn"]) // 2)

    def snap(rows):
        return {(r["table"], r["repo"], r["path"]):
                (r["commit"], r["content_sha"], r["_sequence_num"],
                 r["_is_deleted"]) for r in rows}

    before = snap(read_lake(lake).take_all())
    s = optimize_lake(lake, cluster_by=["language", "stars"],
                      row_group_size=64)
    assert s["files_before"] > s["files_after"] == s["partitions"]
    files = _glob.glob(os.path.join(lake, "part=*", "data-*.parquet"))
    assert len(files) == s["partitions"]
    assert snap(read_lake(lake).take_all()) == before

    # resume continues from the preserved watermark; final parity
    run_replication(log_dir, lake, num_partitions=6)
    want = replay(log_dir)
    got = {k: r for k, r in
           ((r["table"], r["repo"], r["path"]) for r in []) or []}
    rows = final_state(lake).take_all()
    got = {(r["table"], r["repo"], r["path"]): r for r in rows}
    assert set(got) == set(want)
    for k, o in want.items():
        assert got[k]["content_sha"] == o["content_sha"]
        assert got[k]["_sequence_num"] == o["_sequence_num"]
    # idempotent rerun stays a no-op
    assert run_replication(log_dir, lake,
                           num_partitions=6)["events_applied"] == 0


@pytest.mark.usefixtures("ray_session")
def test_optimize_clusters_row_groups_for_pruning(tmp_path):
    """After OPTIMIZE(cluster_by=language) each file's row-group lang
    stats are sorted with at most (n_langs - 1) boundary-straddling
    groups, so a language-filtered read prunes to a contiguous group
    range via footer statistics alone."""
    import glob as _glob

    from database_delta_plugins_ray.pipelines.maintenance import optimize_lake

    log_dir = str(tmp_path / "log")
    generate_log(log_dir, GenConfig(n_keys=2000, n_events=4000, n_repos=10,
                                    seed=44, n_segments=4, ddl_plan=False))
    lake = str(tmp_path / "lake")
    run_replication(log_dir, lake, num_partitions=4)
    optimize_lake(lake, cluster_by=["lang"], row_group_size=32)

    all_stats, langs = [], set()
    for f in _glob.glob(os.path.join(lake, "part=*", "data-*.parquet")):
        md = pq.ParquetFile(f).metadata
        sch = md.schema.to_arrow_schema()
        li = sch.names.index("lang")
        stats = []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(li).statistics
            assert st is not None and st.has_min_max
            stats.append((st.min, st.max))
            langs.update((st.min, st.max))
        # sorted rewrite: group ranges are non-decreasing and non-overlapping
        for (lo1, hi1), (lo2, hi2) in zip(stats, stats[1:]):
            assert lo1 <= hi1 <= lo2 <= hi2
        all_stats.extend(stats)
    assert all_stats and len(langs) > 1
    # pruning selectivity: a single-language predicate matches only the
    # contiguous group range covering that language — a small fraction of
    # all groups (an unclustered layout matches ~100%)
    sel = [sum(1 for lo, hi in all_stats if lo <= lg <= hi) / len(all_stats)
           for lg in sorted(langs)]
    assert sum(sel) / len(sel) <= 0.45


@pytest.mark.usefixtures("ray_session")
def test_optimize_zorder_prunes_both_dims(tmp_path):
    """Z-ORDER (bit-interleaved multi-dim clustering): after
    optimize(zorder=True) on (lang, stars) BOTH columns' row-group stats
    are selective, while the lexicographic rewrite leaves the trailing
    column unprunable (~every group matches a stars predicate)."""
    import glob as _glob

    from database_delta_plugins_ray.pipelines.maintenance import optimize_lake

    log_dir = str(tmp_path / "log")
    # default DDL plan: the ALTERs add stars/language, giving two
    # independent cluster dims in the final schema
    generate_log(log_dir, GenConfig(n_keys=4000, n_events=8000, n_repos=10,
                                    seed=45, n_segments=4))

    def selectivity(lake, col, probes):
        """Mean fraction of row groups a point predicate must read."""
        stats = []
        for f in _glob.glob(os.path.join(lake, "part=*", "data-*.parquet")):
            md = pq.ParquetFile(f).metadata
            ci = md.schema.to_arrow_schema().names.index(col)
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                stats.append((st.min, st.max))
        # a group without min/max (all-null column) can never be pruned
        fr = [sum(1 for lo, hi in stats
                  if lo is None or (lo <= p <= hi)) / len(stats)
              for p in probes]
        return sum(fr) / len(fr)

    # cluster on a HIGH-cardinality leading column: that is where
    # lexicographic sort loses the trailing dim entirely (each path run
    # is ~1 row, so within-run stars order never materializes) and
    # Z-order earns its keep
    lex = str(tmp_path / "lex")
    run_replication(log_dir, lex, num_partitions=2)
    optimize_lake(lex, cluster_by=["path", "stars"], row_group_size=64)

    zo = str(tmp_path / "zo")
    run_replication(log_dir, zo, num_partitions=2)
    optimize_lake(zo, cluster_by=["path", "stars"], row_group_size=64,
                  zorder=True)

    import numpy as np
    rows = final_state(lex).take_all()
    stars = np.array([r["stars"] for r in rows if r["stars"] is not None])
    star_probes = [int(q) for q in np.quantile(stars, [0.1, 0.4, 0.6, 0.9])]
    path_probes = [rows[i]["path"] for i in (10, 500, 1500)]
    lex_path = selectivity(lex, "path", path_probes)
    lex_stars = selectivity(lex, "stars", star_probes)
    zo_path = selectivity(zo, "path", path_probes)
    zo_stars = selectivity(zo, "stars", star_probes)
    # lexicographic: leading column razor-sharp, trailing ~unprunable
    assert lex_path < 0.15
    assert lex_stars > 0.7
    # z-order: BOTH dims selective (measured 0.21 / 0.35 on this log)
    assert zo_path < 0.45
    assert zo_stars < 0.55
    assert zo_stars < lex_stars - 0.2

    # state identity regardless of layout
    a = sorted((r["repo"], r["path"], r["content_sha"])
               for r in final_state(lex).take_all())
    b = sorted((r["repo"], r["path"], r["content_sha"])
               for r in final_state(zo).take_all())
    assert a == b


@pytest.mark.usefixtures("ray_session")
def test_predicate_pushdown_never_resurrects_superseded_rows(tmp_path):
    """read_lake(predicate=...) on a DELTA-carrying partition must reduce
    BEFORE filtering: a key whose OLD version matches the predicate but
    whose current version does not must stay absent; on the single-file
    (optimized) layout the same predicate pushes straight into the scan."""
    import pyarrow.dataset as pads

    from database_delta_plugins_ray.pipelines.maintenance import optimize_lake

    log_dir = str(tmp_path / "log")
    os.makedirs(log_dir)
    create = {"op": "CREATE_TABLE", "table": "db.t", "prev_table": "",
              "payload": json.dumps({
                  "columns": [["repo", "string"], ["path", "string"],
                              ["commit", "string"], ["lang", "string"],
                              ["content", "large_string"]],
                  "primary_key": ["repo", "path"]})}
    seg0 = [
        _event(1, "DDL", "db.t", ddl=create),
        _event(2, "I", "db.t", after={"repo": "r", "path": "a",
                                      "lang": "py"}),
        _event(3, "I", "db.t", after={"repo": "r", "path": "b",
                                      "lang": "py"}),
    ]
    # leg 2: a flips to go (old py version superseded), c is new py
    seg1 = [
        _event(4, "U", "db.t", after={"repo": "r", "path": "a",
                                      "lang": "go"},
               before={"repo": "r", "path": "a", "lang": "py"}),
        _event(5, "I", "db.t", after={"repo": "r", "path": "c",
                                      "lang": "py"}),
    ]
    sch = event_log_schema()
    pq.write_table(pa.Table.from_pylist(seg0, schema=sch),
                   os.path.join(log_dir, "seg-00000.parquet"))
    pq.write_table(pa.Table.from_pylist(seg1, schema=sch),
                   os.path.join(log_dir, "seg-00001.parquet"))
    with open(os.path.join(log_dir, "meta.json"), "w") as fh:
        json.dump({"max_lsn": 5}, fh)

    lake = str(tmp_path / "lake")
    run_replication(log_dir, lake, num_partitions=1, upto_lsn=3)
    run_replication(log_dir, lake, num_partitions=1)
    # the single partition must actually carry a delta (multi-file)
    from database_delta_plugins_ray.state import checkpoint as ckpt
    m = ckpt.read_manifest(lake, 0)
    assert len(m.get("files") or []) > 1

    pred = pads.field("lang") == "py"
    got = {r["path"] for r in
           final_state(lake, predicate=pred).take_all()}
    assert got == {"b", "c"}          # 'a' must NOT resurrect

    optimize_lake(lake, cluster_by=["lang"], row_group_size=2)
    got2 = {r["path"] for r in
            final_state(lake, predicate=pred).take_all()}
    assert got2 == {"b", "c"}         # pushdown path agrees


@pytest.mark.usefixtures("ray_session")
def test_analyze_lake_stats(small_log, tmp_path):
    """ANALYZE: exact rows/nulls/min/max over live rows, HLL ndv within
    5%, stats file persisted with the watermark."""
    from database_delta_plugins_ray.pipelines.maintenance import analyze_lake
    from database_delta_plugins_ray.pipelines.replicate import final_state
    from database_delta_plugins_ray.state import checkpoint as ckpt

    log_dir, _, meta = small_log
    lake = str(tmp_path / "lake")
    run_replication(log_dir, lake, num_partitions=6)
    stats = analyze_lake(lake, ["commit", "stars", "language"])

    live = final_state(lake).take_all()
    assert stats["rows"] == len(live)
    assert stats["watermark"] == ckpt.read_global_watermark(lake)

    for col in ("commit", "stars", "language"):
        vals = [r[col] for r in live if r[col] is not None]
        s = stats["columns"][col]
        assert s["nulls"] == sum(1 for r in live if r[col] is None)
        assert s["min"] == min(vals) and s["max"] == max(vals)
        ndv = len(set(vals))
        assert abs(s["ndv_estimate"] - ndv) <= max(2, 0.05 * ndv), col

    # persisted atomically next to the manifests
    p = os.path.join(lake, "_checkpoints", "table_stats.json")
    with open(p) as fh:
        assert json.load(fh)["rows"] == len(live)


@pytest.mark.usefixtures("ray_session")
def test_check_lake_fsck(small_log, tmp_path):
    """check_lake passes on a healthy lake and pinpoints a deleted data
    file, a watermark overrun, and an in-place config edit."""
    from database_delta_plugins_ray.pipelines.maintenance import check_lake
    from database_delta_plugins_ray.state import checkpoint as ckpt

    log_dir, _, meta = small_log
    lake = str(tmp_path / "lake")
    run_replication(log_dir, lake, num_partitions=4)
    assert check_lake(lake)["ok"]

    # watermark overrun (interrupted-run shape)
    m = ckpt.read_manifest(lake, 1)
    good_lsn = m["last_lsn"]
    m["last_lsn"] = meta["max_lsn"] + 99
    ckpt.write_manifest(lake, 1, m)
    r = check_lake(lake)
    assert not r["ok"] and any("watermark" in e for e in r["errors"])
    m["last_lsn"] = good_lsn
    ckpt.write_manifest(lake, 1, m)
    assert check_lake(lake)["ok"]

    # in-place partition-count edit (the mis-fence reshard_lake prevents)
    cfgp = os.path.join(lake, ckpt.CHECKPOINT_DIR, "lake_config.json")
    with open(cfgp) as fh:
        cfg = json.load(fh)
    with open(cfgp, "w") as fh:
        json.dump(dict(cfg, num_partitions=16), fh)
    r = check_lake(lake)
    assert not r["ok"] and any("route" in e for e in r["errors"])
    with open(cfgp, "w") as fh:
        json.dump(cfg, fh)

    # deleted data file
    f = (ckpt.read_manifest(lake, 0).get("files")
         or [ckpt.read_manifest(lake, 0)["file"]])[0]
    os.rename(f, f + ".hidden")
    r = check_lake(lake)
    assert not r["ok"] and any("missing data file" in e for e in r["errors"])
    os.rename(f + ".hidden", f)
    assert check_lake(lake)["ok"]
