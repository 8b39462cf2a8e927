"""Incremental view maintenance (pipelines/ivm.py): signed-delta apply
must equal a full recompute, and the exactly-once fence must prevent
double-counting (deltas, unlike LWW upserts, are NOT idempotent)."""

import os

import pandas as pd
import pytest

from database_delta_plugins_ray.pipelines.ivm import maintain_view, read_view
from database_delta_plugins_ray.pipelines.replicate import log_max_lsn
from database_delta_plugins_ray.sources.gen import GenConfig, generate_log


@pytest.fixture(scope="module")
def ivm_log(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ivmlog") / "log")
    generate_log(d, GenConfig(n_keys=600, n_events=4_000, n_repos=12,
                              n_segments=4, seed=13))
    return d


def _recompute(log_dir):
    """Brute-force oracle: LWW over the raw events, then group."""
    import pyarrow.dataset as pads

    segs = [os.path.join(log_dir, f) for f in sorted(os.listdir(log_dir))
            if f.startswith("seg-")]
    t = pads.dataset(segs, format="parquet").to_table(
        columns=["lsn", "op", "before", "after"]).to_pandas()
    t = t[t["op"] != "DDL"].sort_values("lsn")
    state = {}
    for _, r in t.iterrows():
        img = r["after"] if r["op"] != "D" else None
        key_img = r["after"] if r["after"] is not None else r["before"]
        key = (key_img["repo"], key_img["path"])
        if r["op"] == "D":
            state.pop(key, None)
        else:
            state[key] = len(img["content"])
    rows = {}
    for (repo, _), n in state.items():
        c = rows.setdefault(repo, [0, 0])
        c[0] += 1
        c[1] += n
    return (pd.DataFrame(
        [(r, c[0], c[1]) for r, c in rows.items()],
        columns=["repo", "n_paths", "total_chars"])
        .sort_values("repo").reset_index(drop=True))


def _view_df(view_dir):
    return (read_view(view_dir).to_pandas()
            .sort_values("repo").reset_index(drop=True))


def test_full_maintain_equals_recompute(ray_session, ivm_log, tmp_path):
    view = str(tmp_path / "v")
    maintain_view(ivm_log, view, num_partitions=4)
    pd.testing.assert_frame_equal(_view_df(view), _recompute(ivm_log))


def test_incremental_equals_one_shot_and_rerun_is_noop(ray_session, ivm_log,
                                                       tmp_path):
    mx = log_max_lsn(ivm_log)
    view = str(tmp_path / "v3")
    for frac in (3, 2, 1):  # thirds: 1/3, 1/2... then full
        maintain_view(ivm_log, view, num_partitions=4, upto_lsn=mx // frac)
    maintain_view(ivm_log, view, num_partitions=4)
    want = _recompute(ivm_log)
    pd.testing.assert_frame_equal(_view_df(view), want)

    # re-running a finished increment must not double-count (THE fence)
    s = maintain_view(ivm_log, view, num_partitions=4)
    assert s["groups_touched"] == 0
    pd.testing.assert_frame_equal(_view_df(view), want)

    # nor re-running a PAST bound on a caught-up view
    s = maintain_view(ivm_log, view, num_partitions=4, upto_lsn=mx // 2)
    assert s["groups_touched"] == 0
    pd.testing.assert_frame_equal(_view_df(view), want)


def test_partial_commit_resume_no_double_count(ray_session, ivm_log, tmp_path):
    """Simulate a crash that committed SOME partitions of an increment:
    rewind one partition's manifest to the previous watermark, re-run, and
    the final view must still equal the recompute (the rewound partition
    replays, the committed ones are fenced)."""
    from database_delta_plugins_ray.state import checkpoint as ckpt

    mx = log_max_lsn(ivm_log)
    view = str(tmp_path / "vc")
    maintain_view(ivm_log, view, num_partitions=4, upto_lsn=mx // 2)
    half_manifest = ckpt.read_manifest(view, 2)
    half_file = half_manifest["file"]
    half_rows = pd.read_parquet(half_file)

    maintain_view(ivm_log, view, num_partitions=4)
    # "crash": partition 2's manifest (and data) revert to the half state,
    # the other three partitions keep their full-increment commits
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(half_file), exist_ok=True)
    pq.write_table(pa.Table.from_pandas(half_rows, preserve_index=False),
                   half_file)
    ckpt.write_manifest(view, 2, half_manifest)

    maintain_view(ivm_log, view, num_partitions=4)
    pd.testing.assert_frame_equal(_view_df(view), _recompute(ivm_log))


def test_changed_num_partitions_rejected(ray_session, ivm_log, tmp_path):
    """Deltas are non-idempotent: re-keying an existing view to a
    different partition count would re-apply fenced deltas under fresh
    watermarks — the config pin must refuse."""
    view = str(tmp_path / "vp")
    maintain_view(ivm_log, view, num_partitions=4,
                  upto_lsn=log_max_lsn(ivm_log) // 2)
    with pytest.raises(ValueError, match="num_partitions"):
        maintain_view(ivm_log, view, num_partitions=8)
    # the pinned value still works
    maintain_view(ivm_log, view, num_partitions=4)
    pd.testing.assert_frame_equal(_view_df(view), _recompute(ivm_log))


@pytest.fixture(scope="module")
def mt_log(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mtlog") / "log")
    generate_log(d, GenConfig(n_keys=600, n_events=4_000, n_repos=12,
                              n_segments=4, seed=14, n_tables=2,
                              ddl_plan=False))
    return d


def _recompute_join(log_dir, ta, tb):
    """Brute-force oracle: per-table LWW live sets, then per-repo counts,
    inner-joined."""
    import pyarrow.dataset as pads

    segs = [os.path.join(log_dir, f) for f in sorted(os.listdir(log_dir))
            if f.startswith("seg-")]
    t = pads.dataset(segs, format="parquet").to_table(
        columns=["lsn", "op", "table", "before", "after"]).to_pandas()
    t = t[t["op"] != "DDL"].sort_values("lsn")
    state = {}
    for _, r in t.iterrows():
        key_img = r["after"] if r["after"] is not None else r["before"]
        key = (r["table"], key_img["repo"], key_img["path"])
        if r["op"] == "D":
            state.pop(key, None)
        else:
            state[key] = True
    counts = {}
    for (tbl, repo, _), _v in state.items():
        counts.setdefault(repo, {ta: 0, tb: 0})
        if tbl in counts[repo]:
            counts[repo][tbl] += 1
    return {r: (c[ta], c[tb]) for r, c in counts.items()
            if c[ta] > 0 and c[tb] > 0}


TA, TB = "inventory.code_files", "inventory.code_files_1"


def test_join_view_incremental_equals_recompute(ray_session, mt_log,
                                                tmp_path):
    from database_delta_plugins_ray.pipelines.ivm import (
        maintain_join_view,
        read_join_view,
    )

    view = str(tmp_path / "jview")
    mx = log_max_lsn(mt_log)
    kw = dict(table_a=TA, table_b=TB, num_partitions=5)
    # three increments, then a rerun that must be a no-op
    maintain_join_view(mt_log, view, upto_lsn=mx // 3, **kw)
    maintain_join_view(mt_log, view, upto_lsn=2 * mx // 3, **kw)
    maintain_join_view(mt_log, view, **kw)
    s = maintain_join_view(mt_log, view, **kw)
    assert s["groups_touched"] == 0

    got = {r["repo"]: (r["n_paths_a"], r["n_paths_b"])
           for r in read_join_view(view).take_all()}
    assert got == _recompute_join(mt_log, TA, TB)

    # one-shot build agrees with the incremental one
    view2 = str(tmp_path / "jview2")
    maintain_join_view(mt_log, view2, **kw)
    got2 = {r["repo"]: (r["n_paths_a"], r["n_paths_b"])
            for r in read_join_view(view2).take_all()}
    assert got2 == got


def test_join_view_one_sided_repo_survives(ray_session, tmp_path):
    """A repo live on only one side must not surface in the join — but
    its state row must survive so a later event on the other side joins
    without a rebuild."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from database_delta_plugins_ray.model import event_log_schema
    from database_delta_plugins_ray.pipelines.ivm import (
        maintain_join_view,
        read_join_view,
    )

    def ev(lsn, op, table, repo, path):
        img = {"repo": repo, "path": path, "commit": "c" * 40,
               "lang": "py", "content": "x", "stars": None,
               "language": None}
        return {"lsn": lsn, "tx_id": f"t{lsn}", "op": op, "table": table,
                "before": img if op == "D" else None,
                "after": None if op == "D" else img,
                "ddl": None, "is_snapshot": False,
                "ingest_ts": 1, "schema_version": 0}

    log = str(tmp_path / "log")
    os.makedirs(log)
    pq.write_table(pa.Table.from_pylist(
        [ev(1, "I", TA, "r1", "a"), ev(2, "I", TA, "r2", "a")],
        schema=event_log_schema()), os.path.join(log, "seg-00000.parquet"))
    with open(os.path.join(log, "meta.json"), "w") as fh:
        json.dump({"max_lsn": 2}, fh)

    view = str(tmp_path / "v")
    kw = dict(table_a=TA, table_b=TB, num_partitions=3)
    maintain_join_view(log, view, **kw)
    assert read_join_view(view).count() == 0  # one-sided: joins empty

    # the other side arrives later: the join materializes incrementally
    pq.write_table(pa.Table.from_pylist(
        [ev(3, "I", TB, "r1", "z")],
        schema=event_log_schema()), os.path.join(log, "seg-00001.parquet"))
    with open(os.path.join(log, "meta.json"), "w") as fh:
        json.dump({"max_lsn": 3}, fh)
    maintain_join_view(log, view, **kw)
    got = {r["repo"]: (r["n_paths_a"], r["n_paths_b"])
           for r in read_join_view(view).take_all()}
    assert got == {"r1": (1, 1)}
