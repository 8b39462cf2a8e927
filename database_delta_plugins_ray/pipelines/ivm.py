"""Incremental view maintenance (IVM): keep a downstream aggregate table
in sync with the change stream WITHOUT recomputing it from the lake.

The classic CDC-consumer pattern (self-maintainable view over a
consistent change stream): every DML event contributes a signed DELTA to
the grouped aggregate —

    INSERT  ->  (+1 row,  +len(after.content) chars)
    UPDATE  ->  ( 0 rows, +len(after) - len(before))
    DELETE  ->  (-1 row,  -len(before))

so the maintained table ``repo -> (n_paths, total_chars)`` equals a full
recompute over the lake's LWW final state, at the cost of reading only
the NEW events. Correctness requires the stream invariant Debezium
provides and the generator upholds: each UPDATE/DELETE's before-image
equals the previous after-image for that key (full before-image mode).

Deltas are NOT idempotent (unlike the lake's LWW upserts), so the
exactly-once fence is load-bearing: per-partition manifests record the
last-applied lsn, every normalize task drops events at/below ITS target
partition's watermark (the per-part watermark array is tiny and ships
with the task), and commits reuse the lake's fenced atomic protocol
(state/checkpoint.py) — a crash between partition commits replays only
the unfenced partitions, and re-running a finished increment is a no-op.

Scale shape: one pruned read (columns lsn/op/before.content/after.content
+ keys, ``lsn > min watermark`` row-group pushdown) -> per-batch delta
partials aggregated to (part, repo) rows — bounded by groups-per-batch,
never events — -> ONE small shuffle of partial rows -> per-partition
merge into the partitioned view table. The view itself is hash-
partitioned Parquet, so a view with 10^9 groups never touches the
driver.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import ray
import ray.data

from ..state import checkpoint as ckpt
from .replicate import log_files, log_max_lsn

VIEW_COLS = ["repo", "n_paths", "total_chars"]


def _part_of(repo: pd.Series, num_partitions: int) -> np.ndarray:
    h = pd.util.hash_pandas_object(repo, index=False).to_numpy()
    return (h % np.uint64(num_partitions)).astype(np.int32)


def maintain_view(
    log_dir: str,
    view_dir: str,
    *,
    num_partitions: int = 16,
    upto_lsn: int | None = None,
    merge_concurrency: int | None = None,
) -> dict:
    """Apply the log's new events to the per-repo aggregate view.

    Returns a lineage summary. Idempotent: re-running on the same log is
    a no-op; resumable mid-increment via per-partition fences.
    """
    t0 = time.time()
    os.makedirs(os.path.join(view_dir, ckpt.CHECKPOINT_DIR), exist_ok=True)

    # pin the partitioning config per view (lake_config.json analog in
    # replicate.py): per-partition watermarks are only valid under the
    # SAME repo->partition mapping, and deltas are NON-idempotent — a
    # silently changed num_partitions would re-apply fenced deltas under
    # fresh watermarks and corrupt the aggregate
    import json as _json

    cfg_path = os.path.join(view_dir, ckpt.CHECKPOINT_DIR, "view_config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as fh:
            stored = _json.load(fh)
        if stored != {"num_partitions": num_partitions}:
            raise ValueError(
                f"view at {view_dir} was maintained with {stored}, got "
                f"num_partitions={num_partitions}; use the stored value or "
                "a new view directory (re-partitioning requires a rebuild)")
    else:
        tmp = cfg_path + f".tmp.{os.getpid()}"
        with open(tmp, "w") as fh:
            _json.dump({"num_partitions": num_partitions}, fh)
        os.replace(tmp, cfg_path)

    mx = log_max_lsn(log_dir)
    consumed = mx if upto_lsn is None else min(upto_lsn, mx)

    manifests = ckpt.all_manifests(view_dir)
    wm = np.zeros(num_partitions, np.int64)
    for p, m in manifests.items():
        wm[p] = m["last_lsn"]
    min_wm = int(wm.min()) if len(manifests) == num_partitions else 0
    if min_wm >= consumed:
        return {"groups_touched": 0, "wall_s": time.time() - t0,
                "watermark": min_wm}

    flt = pads.field("lsn") > min_wm
    if consumed < mx:
        flt = flt & (pads.field("lsn") <= consumed)

    _empty = pa.table({"part": pa.array([], pa.int32()),
                       "repo": pa.array([], pa.string()),
                       "rows_d": pa.array([], pa.int64()),
                       "chars_d": pa.array([], pa.int64())})

    def _deltas_of(t: pa.Table) -> pd.DataFrame | None:
        t = t.filter(pc.not_equal(t["op"], "DDL"))
        if t.num_rows == 0:
            return None
        repo = pc.coalesce(t["a_repo"], t["b_repo"])
        # char length of the row image; null image (insert's before,
        # delete's after) contributes 0
        a_len = pc.coalesce(pc.utf8_length(t["a_content"]),
                            pa.scalar(0, pa.int64())).cast(pa.int64())
        b_len = pc.coalesce(pc.utf8_length(t["b_content"]),
                            pa.scalar(0, pa.int64())).cast(pa.int64())
        op = t["op"].to_pandas()
        rows_d = (op == "I").to_numpy(np.int64) - (op == "D").to_numpy(np.int64)
        df = pd.DataFrame({
            "lsn": t["lsn"].to_numpy(),
            "repo": repo.to_pandas(),
            "rows_d": rows_d,
            "chars_d": a_len.to_numpy() - b_len.to_numpy(),
        })
        df["part"] = _part_of(df["repo"], num_partitions)
        # per-partition duplicate-replay fence: deltas are not idempotent,
        # so an event at/below its target partition's watermark must never
        # be re-counted (crash-resume replays only unfenced partitions)
        df = df[df["lsn"].to_numpy() > wm[df["part"].to_numpy()]]
        return df

    #: dotted nested projection: the aggregate needs SIX leaf columns
    #: (lsn, op, both repos, both content-lengths) — reading the full
    #: before/after structs would also decode path/commit/lang/stars/
    #: language for every event. ray.data.read_parquet can't express
    #: nested projection, so read tasks stream each file's row groups
    #: through a pyarrow scanner (lsn filter pushdown intact) and fold
    #: deltas as they go — task memory stays one scanner batch.
    _PROJ = {
        "lsn": pads.field("lsn"),
        "op": pads.field("op"),
        "a_repo": pads.field("after", "repo"),
        "b_repo": pads.field("before", "repo"),
        "a_content": pads.field("after", "content"),
        "b_content": pads.field("before", "content"),
    }

    def delta_partial(batch: pa.Table) -> pa.Table:
        frames = []
        for f in batch["file"].to_pylist():
            scanner = pads.dataset(f, format="parquet").scanner(
                columns=_PROJ, filter=flt, batch_size=65536)
            for rb in scanner.to_batches():
                d = _deltas_of(pa.Table.from_batches([rb]))
                if d is not None and len(d):
                    frames.append(d)
        if not frames:
            return _empty
        g = (pd.concat(frames, ignore_index=True)
             .groupby(["part", "repo"], sort=False, as_index=False)
             [["rows_d", "chars_d"]].sum())
        # cast to _empty's exact schema (order, types, NO pandas
        # metadata) so every block hashes identically — mixed schemas
        # force Ray's shuffle into its slow unify path and spam
        # "Failed to hash the schemas" warnings from every reduce task
        return pa.Table.from_pandas(  # metadata stripped via cast below
            g, preserve_index=False).select(
            _empty.column_names).cast(_empty.schema)

    ds = ray.data.from_items(
        [{"file": f} for f in log_files(log_dir)]
    ).map_batches(delta_partial, batch_format="pyarrow", batch_size=1)

    import pyarrow.parquet as pq

    view_dir_b = view_dir
    consumed_b = consumed

    def merge_part(g: pd.DataFrame) -> pd.DataFrame:
        part = int(g["part"].iloc[0])
        m = ckpt.read_manifest(view_dir_b, part)
        if m is not None and m["last_lsn"] >= consumed_b:
            return pa.table({"part": pa.array([part], pa.int64()),
                             "groups": pa.array([0], pa.int64()),
                             "rows": pa.array([int(m["rows"])],
                                              pa.int64())})
        agg = (g.groupby("repo", as_index=False)[["rows_d", "chars_d"]].sum())
        if m is not None:
            old = pq.read_table(m["file"]).to_pandas()
        else:
            old = pd.DataFrame({"repo": pd.Series([], dtype=str),
                                "n_paths": pd.Series([], dtype=np.int64),
                                "total_chars": pd.Series([], dtype=np.int64)})
        new = old.merge(agg, on="repo", how="outer")
        for c in ("n_paths", "total_chars", "rows_d", "chars_d"):
            new[c] = new[c].fillna(0).astype(np.int64)
        new["n_paths"] += new["rows_d"]
        new["total_chars"] += new["chars_d"]
        new = (new.loc[new["n_paths"] > 0, VIEW_COLS]
               .sort_values("repo").reset_index(drop=True))
        tbl = pa.Table.from_pandas(new, preserve_index=False)
        ckpt.commit_partition(
            view_dir_b, part, tbl, consumed_b,
            lambda t, p: pq.write_table(t, p),
            {"rows": len(new), "delta_rows": int(len(g))},
        )
        # clean Arrow schema (no pandas metadata): Ray's reduce-side
        # schema hash/unify then takes the fast path, warning-free
        return pa.table({"part": pa.array([part], pa.int64()),
                         "groups": pa.array([len(agg)], pa.int64()),
                         "rows": pa.array([len(new)], pa.int64())})

    kw = {}
    if merge_concurrency:
        kw["concurrency"] = merge_concurrency
    summary = (ds.groupby("part")
               .map_groups(merge_part, batch_format="pandas", **kw)
               .to_pandas())

    # partitions untouched by this increment still advance their fence so
    # the next run's min-watermark read prunes at the newest lsn
    for p in range(num_partitions):
        m = ckpt.read_manifest(view_dir_b, p)
        if m is None:
            d = ckpt.part_dir(view_dir_b, p)
            os.makedirs(d, exist_ok=True)
            empty = pa.table({"repo": pa.array([], pa.string()),
                              "n_paths": pa.array([], pa.int64()),
                              "total_chars": pa.array([], pa.int64())})
            ckpt.commit_partition(
                view_dir_b, p, empty, consumed_b,
                lambda t, pth: pq.write_table(t, pth),
                {"rows": 0, "events": 0})
        elif m["last_lsn"] < consumed_b:
            ckpt.write_manifest(view_dir_b, p,
                                dict(m, last_lsn=consumed_b))

    return {
        #: (part, repo) delta rows applied — the shuffle payload, which is
        #: what bounds this increment's cost (events never leave the read)
        "groups_touched": int(summary["groups"].sum()),
        "partitions": len(summary),
        "wall_s": time.time() - t0,
        "watermark": consumed,
    }


JOIN_VIEW_COLS = ["repo", "n_paths_a", "n_paths_b"]


def maintain_join_view(
    log_dir: str,
    view_dir: str,
    *,
    table_a: str,
    table_b: str,
    num_partitions: int = 16,
    upto_lsn: int | None = None,
) -> dict:
    """Incrementally-maintained JOIN view (Materialize-style streaming
    join of two self-maintainable aggregates): ``V(repo) = A(repo) ⋈
    B(repo)`` where each side is that table's live-key count per repo.

    Both sides' aggregate rows hash-partition by the JOIN key (repo), so
    maintenance is partition-local: each side's signed ±1 deltas (insert
    +1, delete -1, update 0 — the same stream invariant maintain_view
    relies on) land in the partition that owns the repo, the merge task
    updates both counters in ONE state table and the join row is simply
    the counters' conjunction (emit iff both sides > 0). No join is ever
    recomputed from base tables; an increment costs one pruned read +
    one (part, repo, side)-bounded shuffle. Exactly-once via the same
    per-partition watermark fences as maintain_view (deltas are not
    idempotent)."""
    t0 = time.time()
    os.makedirs(os.path.join(view_dir, ckpt.CHECKPOINT_DIR), exist_ok=True)

    import json as _json

    cfg = {"num_partitions": num_partitions, "table_a": table_a,
           "table_b": table_b}
    cfg_path = os.path.join(view_dir, ckpt.CHECKPOINT_DIR, "view_config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as fh:
            stored = _json.load(fh)
        if stored != cfg:
            raise ValueError(
                f"join view at {view_dir} was maintained with {stored}, "
                f"got {cfg}; deltas are not idempotent under a changed "
                "config — use a new view directory")
    else:
        tmp = cfg_path + f".tmp.{os.getpid()}"
        with open(tmp, "w") as fh:
            _json.dump(cfg, fh)
        os.replace(tmp, cfg_path)

    mx = log_max_lsn(log_dir)
    consumed = mx if upto_lsn is None else min(upto_lsn, mx)

    manifests = ckpt.all_manifests(view_dir)
    wm = np.zeros(num_partitions, np.int64)
    for p, m in manifests.items():
        wm[p] = m["last_lsn"]
    min_wm = int(wm.min()) if len(manifests) == num_partitions else 0
    if min_wm >= consumed:
        return {"groups_touched": 0, "wall_s": time.time() - t0,
                "watermark": min_wm}

    flt = pads.field("lsn") > min_wm
    if consumed < mx:
        flt = flt & (pads.field("lsn") <= consumed)

    _empty = pa.table({"part": pa.array([], pa.int32()),
                       "repo": pa.array([], pa.string()),
                       "a_d": pa.array([], pa.int64()),
                       "b_d": pa.array([], pa.int64())})

    _PROJ = {
        "lsn": pads.field("lsn"),
        "op": pads.field("op"),
        "table": pads.field("table"),
        "a_repo": pads.field("after", "repo"),
        "b_repo": pads.field("before", "repo"),
    }

    def delta_partial(batch: pa.Table) -> pa.Table:
        frames = []
        for f in batch["file"].to_pylist():
            scanner = pads.dataset(f, format="parquet").scanner(
                columns=_PROJ, filter=flt, batch_size=65536)
            for rb in scanner.to_batches():
                t = pa.Table.from_batches([rb])
                t = t.filter(pc.is_in(
                    t["table"], value_set=pa.array([table_a, table_b])))
                t = t.filter(pc.not_equal(t["op"], "DDL"))
                if t.num_rows == 0:
                    continue
                op = t["table"].to_pandas()
                side_a = (op == table_a).to_numpy()
                o = t["op"].to_pandas()
                d = ((o == "I").to_numpy(np.int64)
                     - (o == "D").to_numpy(np.int64))
                df = pd.DataFrame({
                    "lsn": t["lsn"].to_numpy(),
                    "repo": pc.coalesce(t["a_repo"],
                                        t["b_repo"]).to_pandas(),
                    "a_d": np.where(side_a, d, 0),
                    "b_d": np.where(side_a, 0, d),
                })
                df["part"] = _part_of(df["repo"], num_partitions)
                df = df[df["lsn"].to_numpy() > wm[df["part"].to_numpy()]]
                if len(df):
                    frames.append(df)
        if not frames:
            return _empty
        g = (pd.concat(frames, ignore_index=True)
             .groupby(["part", "repo"], sort=False, as_index=False)
             [["a_d", "b_d"]].sum())
        # cast to _empty's exact schema — see maintain_view's partial
        return pa.Table.from_pandas(  # metadata stripped via cast below
            g, preserve_index=False).select(
            _empty.column_names).cast(_empty.schema)

    ds = ray.data.from_items(
        [{"file": f} for f in log_files(log_dir)]
    ).map_batches(delta_partial, batch_format="pyarrow", batch_size=1)

    import pyarrow.parquet as pq

    view_dir_b, consumed_b = view_dir, consumed

    def merge_part(g: pd.DataFrame) -> pd.DataFrame:
        part = int(g["part"].iloc[0])
        m = ckpt.read_manifest(view_dir_b, part)
        if m is not None and m["last_lsn"] >= consumed_b:
            return pa.table({"part": pa.array([part], pa.int64()),
                             "groups": pa.array([0], pa.int64())})
        agg = g.groupby("repo", as_index=False)[["a_d", "b_d"]].sum()
        if m is not None:
            old = pq.read_table(m["file"]).to_pandas()
        else:
            old = pd.DataFrame({"repo": pd.Series([], dtype=str),
                                "n_paths_a": pd.Series([], dtype=np.int64),
                                "n_paths_b": pd.Series([], dtype=np.int64)})
        new = old.merge(agg, on="repo", how="outer")
        for c in ("n_paths_a", "n_paths_b", "a_d", "b_d"):
            new[c] = new[c].fillna(0).astype(np.int64)
        new["n_paths_a"] += new["a_d"]
        new["n_paths_b"] += new["b_d"]
        # the STATE keeps every repo either side has live keys for (a
        # one-sided repo must survive so a later match on the other side
        # joins correctly); the JOIN surfaces only two-sided rows
        new = (new.loc[(new["n_paths_a"] > 0) | (new["n_paths_b"] > 0),
                       JOIN_VIEW_COLS]
               .sort_values("repo").reset_index(drop=True))
        tbl = pa.Table.from_pandas(new, preserve_index=False)
        ckpt.commit_partition(
            view_dir_b, part, tbl, consumed_b,
            lambda t, p: pq.write_table(t, p),
            {"rows": len(new), "delta_rows": int(len(g))})
        return pa.table({"part": pa.array([part], pa.int64()),
                         "groups": pa.array([len(agg)], pa.int64())})

    summary = (ds.groupby("part")
               .map_groups(merge_part, batch_format="pandas")
               .to_pandas())

    for p in range(num_partitions):
        m = ckpt.read_manifest(view_dir_b, p)
        if m is None:
            d = ckpt.part_dir(view_dir_b, p)
            os.makedirs(d, exist_ok=True)
            empty = pa.table({"repo": pa.array([], pa.string()),
                              "n_paths_a": pa.array([], pa.int64()),
                              "n_paths_b": pa.array([], pa.int64())})
            ckpt.commit_partition(
                view_dir_b, p, empty, consumed_b,
                lambda t, pth: pq.write_table(t, pth),
                {"rows": 0})
        elif m["last_lsn"] < consumed_b:
            ckpt.write_manifest(view_dir_b, p,
                                dict(m, last_lsn=consumed_b))

    return {"groups_touched": int(summary["groups"].sum()),
            "partitions": len(summary),
            "wall_s": time.time() - t0, "watermark": consumed}


def read_join_view(view_dir: str) -> "ray.data.Dataset":
    """The join view: state rows where BOTH sides are live (the inner
    join's conjunction, evaluated at read from the co-located counters)."""
    manifests = ckpt.all_manifests(view_dir)
    if not manifests:
        raise FileNotFoundError(
            f"no committed view partitions under {view_dir}")
    files = [m["file"] for m in manifests.values()]
    ds = ray.data.read_parquet(files, columns=JOIN_VIEW_COLS)
    return ds.filter(expr="n_paths_a > 0 and n_paths_b > 0")


def read_view(view_dir: str) -> "ray.data.Dataset":
    """The maintained view as a Ray Dataset (live manifest files only)."""
    manifests = ckpt.all_manifests(view_dir)
    if not manifests:
        raise FileNotFoundError(f"no committed view partitions under {view_dir}")
    files = [m["file"] for m in manifests.values()]
    # explicit columns: read_parquet would otherwise hive-infer a "part"
    # column from the part=NNNNN directory names
    return ray.data.read_parquet(files, columns=VIEW_COLS)
