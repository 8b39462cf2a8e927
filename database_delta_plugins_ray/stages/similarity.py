"""Similarity search over an embedding column (``list<float>``).

* ``ann_topk_bruteforce`` — the correctness baseline: per-batch numpy
  matmul against a broadcast query matrix (``ray.put`` once, read per
  actor/task), per-batch partial top-k, tiny final reduce. The dataset
  streams; only k rows per batch reach the driver.
* ``ann_topk_ivf`` / ``IVFDiskIndex`` — the scale path: a PERSISTED IVF
  index. One bucketing pass writes vectors partitioned by nearest centroid
  (``cluster=`` Parquet directories); every query then reads only the
  ``nprobe`` bucket directories — pruned IO, not scan-and-mask. Centroids
  from seeded k-means on a driver-side sample. Same output contract.
* ``ann_topk_lsh`` / ``LSHDiskIndex`` — the LSH-bucketed alternative: L
  random-hyperplane signatures (Charikar 2002, SimHash-for-cosine) bucket
  each vector L times into ``tbl=/bucket=`` Parquet directories; queries
  read only the multiprobe bucket set per table (base bucket + the
  lowest-|margin| bit flips, Lv et al. 2007). Data-independent — no
  training pass, so the index build is a single streaming scatter and
  works on adversarial/drifting corpora where k-means centroids go stale.
  Storage trade-off: vectors are written once per table (L x).
"""

from __future__ import annotations

import heapq
import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def _as_matrix(col) -> np.ndarray:
    return np.stack(col.to_numpy()) if hasattr(col, "to_numpy") else np.stack(col)


def _unit(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def ann_topk_bruteforce(
    ds: "ray.data.Dataset",
    query: np.ndarray,
    k: int = 10,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Exact top-k cosine neighbours of ``query``; returns a small DataFrame
    (id, score) sorted by (-score, id)."""
    q = _unit(query.reshape(1, -1).astype(np.float32))[0]
    q_ref = ray.put(q)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        qq = ray.get(q_ref)
        m = _unit(_as_matrix(df[vec_col]).astype(np.float32))
        scores = m @ qq
        if len(scores) > k:
            idx = np.argpartition(-scores, k)[:k]
        else:
            idx = np.arange(len(scores))
        return pd.DataFrame(
            {id_col: df[id_col].to_numpy()[idx], "score": scores[idx].astype(np.float64)}
        )

    partials = ds.map_batches(partial, batch_format="pandas").take_all()
    rows = [(r[id_col], r["score"]) for r in partials]
    top = heapq.nsmallest(k, rows, key=lambda t: (-t[1], t[0]))
    return pd.DataFrame(top, columns=[id_col, "score"])


def ann_topk_bruteforce_multi(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    k: int = 10,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Exact top-k cosine neighbours for a BATCH of queries — the
    batched-inference shape the charter names (one (n x d) @ (d x Q)
    matmul per data batch against the broadcast query matrix). Returns
    (query_idx, id, score, rank) rows, k per query, sorted by
    (query_idx, -score, id).

    Scale: the query matrix is ``ray.put`` once; each batch forwards at
    most k x Q candidate rows, so the driver-side finish handles
    O(k x Q x batches) tiny rows, never the corpus."""
    qm = _unit(np.atleast_2d(queries).astype(np.float32))  # (Q, d)
    nq = len(qm)
    q_ref = ray.put(qm.T.copy())  # (d, Q), broadcast once

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        qt = ray.get(q_ref)
        m = _unit(_as_matrix(df[vec_col]).astype(np.float32))
        scores = m @ qt  # (n, Q)
        n = len(m)
        take = min(k, n)
        # per-query partial top-k without sorting the whole column
        idx = (np.argpartition(-scores, take - 1, axis=0)[:take]
               if n > take else np.tile(np.arange(n)[:, None], (1, nq)))
        ids = df[id_col].to_numpy()
        rows_q = np.repeat(np.arange(nq), take)
        rows_i = idx.T.reshape(-1)
        return pd.DataFrame(
            {
                "query_idx": rows_q,
                id_col: ids[rows_i],
                "score": scores[rows_i, rows_q].astype(np.float64),
            }
        )

    partials = ds.map_batches(partial, batch_format="pandas").take_all()
    by_q: dict[int, list] = {i: [] for i in range(nq)}
    for r in partials:
        by_q[r["query_idx"]].append((r[id_col], r["score"]))
    out = []
    for qi in range(nq):
        top = heapq.nsmallest(k, by_q[qi], key=lambda t: (-t[1], t[0]))
        for rank, (vid, sc) in enumerate(top, 1):
            out.append((qi, vid, sc, rank))
    return pd.DataFrame(out, columns=["query_idx", id_col, "score", "rank"])


def ann_topk_int8(
    ds: "ray.data.Dataset",
    query: np.ndarray,
    k: int = 10,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Quantized brute-force top-k: unit vectors round to int8 (x127)
    and scores come from an integer matmul rescaled by 1/127^2 — the
    4x-bandwidth-reduction scale path for exhaustive scans (the shuffle
    /object-store payload of an int8 corpus is a quarter of float32's;
    per-dim quantization error <= 1/254 keeps top-k overlap ~exact on
    real embeddings). Same output contract as ann_topk_bruteforce."""
    q = _unit(query.reshape(1, -1).astype(np.float32))[0]
    q8 = np.clip(np.rint(q * 127), -127, 127).astype(np.int8)
    q_ref = ray.put(q8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        qq = ray.get(q_ref).astype(np.int32)
        m = _unit(_as_matrix(df[vec_col]).astype(np.float32))
        m8 = np.clip(np.rint(m * 127), -127, 127).astype(np.int8)
        scores = (m8.astype(np.int32) @ qq).astype(np.float64) / (127.0 * 127.0)
        if len(scores) > k:
            idx = np.argpartition(-scores, k)[:k]
        else:
            idx = np.arange(len(scores))
        return pd.DataFrame({id_col: df[id_col].to_numpy()[idx],
                             "score": scores[idx]})

    partials = ds.map_batches(partial, batch_format="pandas").take_all()
    rows = [(r[id_col], r["score"]) for r in partials]
    top = heapq.nsmallest(k, rows, key=lambda t: (-t[1], t[0]))
    return pd.DataFrame(top, columns=[id_col, "score"])


class IVFIndex:
    """Tiny deterministic IVF: seeded k-means (few Lloyd iterations) on a
    driver-side sample; centroids broadcast to assignment/search stages."""

    def __init__(self, centroids: np.ndarray):
        self.centroids = centroids  # (C, d), unit-normalized

    @classmethod
    def train(cls, sample: np.ndarray, n_clusters: int = 16, iters: int = 8,
              seed: int = 1) -> "IVFIndex":
        rng = np.random.default_rng(seed)
        x = _unit(sample.astype(np.float32))
        idx = rng.choice(len(x), size=min(n_clusters, len(x)), replace=False)
        c = x[idx]
        for _ in range(iters):
            assign = np.argmax(x @ c.T, axis=1)
            for j in range(len(c)):
                mask = assign == j
                if mask.any():
                    c[j] = x[mask].mean(axis=0)
            c = _unit(c)
        return cls(c)

    def probe_clusters(self, q: np.ndarray, nprobe: int) -> np.ndarray:
        scores = self.centroids @ _unit(q.reshape(1, -1))[0]
        return np.argsort(-scores)[:nprobe]


def _idx_meta(index_dir: str) -> dict:
    import json

    p = os.path.join(index_dir, "meta.json")
    if os.path.exists(p):
        with open(p) as fh:
            return json.load(fh)
    return {"gen": 0}


def _idx_committed_deltas(index_dir: str) -> list:
    """Delta dirs whose generation is <= the COMMITTED meta gen,
    sorted. A refresh that crashes after the ``delta-g<g>`` rename but
    before ``_idx_commit_refresh`` leaves that dir on disk with meta
    still at g-1; serving it would expose half-applied state (new rows
    without their upsert tombstones, so both versions of an id rank).
    The re-run replaces the dir at the same gen and THEN commits meta,
    at which point it becomes visible."""
    import glob as _glob

    g = int(_idx_meta(index_dir).get("gen", 0))
    out = []
    for d in sorted(_glob.glob(os.path.join(index_dir, "delta-g*"))):
        try:
            dg = int(os.path.basename(d)[len("delta-g"):])
        except ValueError:
            continue
        if dg <= g:
            out.append(d)
    return out


def _idx_tombstones(index_dir: str) -> dict:
    """id -> tombstone generation; a row is live iff its gen >= the
    tombstone's (adds auto-tombstone their own ids, so refresh() is an
    UPSERT)."""
    import pyarrow.parquet as pq_mod

    p = os.path.join(index_dir, "tombstones.parquet")
    if not os.path.exists(p):
        return {}
    t = pq_mod.read_table(p)
    return dict(zip(t["id"].to_pylist(), t["gen"].to_pylist()))


def _idx_sweep_tmp(index_dir: str) -> None:
    """Remove staging leftovers from crashed writers (single-writer
    contract): .delta.tmp.*, .tomb.tmp.*, .meta.tmp.*, *.compact.* are
    all pre-publish artifacts — deleting them never loses committed
    state."""
    import glob as _glob
    import shutil

    for pat in (".delta.tmp.*", ".tomb.tmp.*", ".meta.tmp.*"):
        for p_ in _glob.glob(os.path.join(index_dir, pat)):
            shutil.rmtree(p_, ignore_errors=True)
            if os.path.isfile(p_):
                os.unlink(p_)
    for p_ in _glob.glob(index_dir + ".compact.*"):
        shutil.rmtree(p_, ignore_errors=True)


def _idx_stage_delta(index_dir: str, g: int, staged,
                     partition_cols: list, id_col: str) -> list:
    """Write a materialized delta dataset into ``delta-g<g>`` via a
    staged dir + ONE atomic rename (idempotent at a fixed gen: a re-run
    replaces the dir). Returns the delta's ids (payload-light fold)."""
    import shutil

    tmp = os.path.join(index_dir, f".delta.tmp.{os.getpid()}")
    shutil.rmtree(tmp, ignore_errors=True)
    if partition_cols:
        staged.write_parquet(tmp, partition_cols=partition_cols)
    else:
        staged.write_parquet(tmp)
    add_ids = [r[id_col] for r in staged.select_columns([id_col]).take_all()]
    dst = os.path.join(index_dir, f"delta-g{g}")
    shutil.rmtree(dst, ignore_errors=True)
    os.rename(tmp, dst)
    return add_ids


def _idx_commit_refresh(index_dir: str, g: int, tomb_new: list) -> None:
    """Tombstone rewrite (dedup by id, max gen) then meta LAST — the
    crash-recovery order every refresh relies on. Sweeps stale staging
    leftovers on the way out."""
    import json

    import pyarrow.parquet as pq_mod

    if tomb_new:
        old = _idx_tombstones(index_dir)
        for i in tomb_new:
            old[i] = max(int(old.get(i, 0)), g)
        t = pa.table({"id": pa.array(list(old.keys())),
                      "gen": pa.array([int(v) for v in old.values()],
                                      pa.int64())})
        tmp_t = os.path.join(index_dir, f".tomb.tmp.{os.getpid()}")
        pq_mod.write_table(t, tmp_t)
        os.replace(tmp_t, os.path.join(index_dir, "tombstones.parquet"))
    meta = _idx_meta(index_dir)
    meta["gen"] = g
    tmp_m = os.path.join(index_dir, f".meta.tmp.{os.getpid()}")
    with open(tmp_m, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp_m, os.path.join(index_dir, "meta.json"))


def _idx_live_rows(index_dir: str, id_col: str, vec_col: str,
                   data_sub: str = "data", delta_sub: str = ""):
    """The index's CURRENT logical rows as (id, vec) datasets — base and
    delta branches separately (their parquet layouts don't union),
    each tombstone-filtered and gen-stripped. Input to ``compact``.
    ``delta_sub`` narrows each delta dir (e.g. one LSH table, so a
    vector stored L times reads once)."""
    import glob as _glob

    tomb = _idx_tombstones(index_dir)
    t_ref = ray.put(tomb) if tomb else None
    live = _idx_live_filter(t_ref, id_col)

    def strip(df: pd.DataFrame) -> pd.DataFrame:
        df = live(df)
        return df[[id_col, vec_col]]

    out = []
    base = os.path.join(index_dir, data_sub)
    if _glob.glob(os.path.join(base, "**", "*.parquet"), recursive=True):
        out.append(ray.data.read_parquet(base, columns=[id_col, vec_col])
                   .map_batches(strip, batch_format="pandas"))
    deltas = [f for d in _idx_committed_deltas(index_dir)
              for f in _glob.glob(
                  os.path.join(d, delta_sub, "**", "*.parquet"),
                  recursive=True)]
    if deltas:
        out.append(ray.data.read_parquet(
            deltas, columns=[id_col, vec_col, "gen"])
            .map_batches(strip, batch_format="pandas"))
    return out


def _idx_swap_in(index_dir: str, tmp_dir: str) -> None:
    """Replace the live index dir with the compacted one (same
    non-atomicity window as ``build``: rmtree then rename — single
    writer assumed, crash leaves the staged dir for a re-run).

    Sidecar files that OTHER components store in the index dir (e.g.
    the CDC lake watermark stamp ``lake_watermark.json`` written by
    ``lake_vector_index_build``) are carried into the staged dir
    first: compact stages only the structures the index owns, and a
    swap must not silently drop a stranger's state — ``tombstones
    .parquet`` is the one exception (compact folds it into the new
    base), and anything the compactor already staged wins."""
    import shutil

    for f in os.listdir(index_dir):
        src = os.path.join(index_dir, f)
        dst = os.path.join(tmp_dir, f)
        if (os.path.isfile(src) and not os.path.exists(dst)
                and f != "tombstones.parquet" and not f.startswith(".")):
            shutil.copy2(src, dst)
    shutil.rmtree(index_dir, ignore_errors=True)
    os.rename(tmp_dir, index_dir)


def _idx_live_filter(t_ref, id_col: str):
    """Row-level liveness: keep iff gen >= its id's tombstone gen (base
    rows, written before any refresh, default to gen 0)."""

    def live(df: pd.DataFrame) -> pd.DataFrame:
        if t_ref is None:
            return df
        tm = ray.get(t_ref)
        gen = (df["gen"].to_numpy() if "gen" in df.columns
               else np.zeros(len(df), np.int64))
        tg = df[id_col].map(tm).fillna(0).to_numpy(dtype=np.int64)
        return df[gen >= tg]

    return live


class IVFDiskIndex:
    """Persisted IVF index — the scale path for repeated ANN queries.

    ``build`` runs ONE bucketing pass: assign every vector to its nearest
    centroid inside ``map_batches`` and write Parquet partitioned by
    ``cluster=`` directory (one shuffle-free partitioned write). ``search``
    reads ONLY the ``nprobe`` bucket directories closest to the query — a
    pruned ``read_parquet`` over a strict subset of the data, unlike a
    scan-and-mask pseudo-index. Recall is governed by nprobe/n_clusters."""

    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        self.centroids = np.load(os.path.join(index_dir, "centroids.npy"))

    @classmethod
    def build(
        cls,
        ds: "ray.data.Dataset",
        index_dir: str,
        *,
        n_clusters: int = 16,
        sample_size: int = 2048,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        seed: int = 1,
        source_tag: str = "",
    ) -> "IVFDiskIndex":
        """Build into a tmp dir and atomically rename: a crash mid-build
        leaves no half-index (nor can a rebuild APPEND into surviving
        cluster dirs). ``source_tag`` is stamped inside the index before
        the rename so callers can invalidate on source change."""
        import shutil

        sample = _as_matrix(pd.DataFrame(ds.limit(sample_size).take_all())[vec_col])
        trained = IVFIndex.train(sample, n_clusters=n_clusters, seed=seed)
        c_ref = ray.put(trained.centroids)

        def assign(df: pd.DataFrame) -> pd.DataFrame:
            c = ray.get(c_ref)
            m = _unit(_as_matrix(df[vec_col]).astype(np.float32))
            out = pd.DataFrame(
                {
                    id_col: df[id_col].to_numpy(),
                    vec_col: list(m.astype(np.float32)),
                    "cluster": np.argmax(m @ c.T, axis=1).astype(np.int32),
                }
            )
            return out

        tmp_dir = index_dir + f".tmp.{os.getpid()}"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        os.makedirs(tmp_dir, exist_ok=True)
        ds.map_batches(assign, batch_format="pandas").write_parquet(
            os.path.join(tmp_dir, "data"), partition_cols=["cluster"]
        )
        if source_tag:
            with open(os.path.join(tmp_dir, "source.txt"), "w") as fh:
                fh.write(source_tag)
        np.save(os.path.join(tmp_dir, "centroids.npy"), trained.centroids)
        shutil.rmtree(index_dir, ignore_errors=True)
        os.rename(tmp_dir, index_dir)
        return cls(index_dir)

    # -- incremental maintenance (CDC-style refresh) ----------------------

    def _meta(self) -> dict:
        return _idx_meta(self.index_dir)

    def _tombstones(self) -> dict:
        return _idx_tombstones(self.index_dir)

    def refresh(
        self,
        add_ds: "ray.data.Dataset | None" = None,
        delete_ids=None,
        *,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
    ) -> dict:
        """Advance the index by one generation WITHOUT a rebuild: new /
        changed vectors assign to the EXISTING centroids and land in a
        ``delta-g<gen>/cluster=`` directory (staged, one atomic rename);
        added ids auto-tombstone older versions (upsert), ``delete_ids``
        tombstone outright. Search unions base + delta buckets and drops
        rows older than their tombstone. Crash-idempotent: a re-run at
        the same gen replaces the delta dir and the tombstone rewrite
        dedups by (id, max gen); meta commits LAST.

        Scale notes: assignment is one map_batches over the delta (the
        increment, not the corpus); centroids are NOT retrained — after
        heavy drift rebuild (same ``build`` path; compare n_deltas to
        corpus size). The tombstone file is a single read-modify-write
        here; at 10^9-delete scale shard it per bucket like the lake
        sidecars."""
        _idx_sweep_tmp(self.index_dir)
        g = int(self._meta()["gen"]) + 1
        tomb_new: list = list(delete_ids or [])
        added = 0
        if add_ds is not None:
            c_ref = ray.put(self.centroids)

            def assign(df: pd.DataFrame) -> pd.DataFrame:
                c = ray.get(c_ref)
                m = _unit(_as_matrix(df[vec_col]).astype(np.float32))
                return pd.DataFrame({
                    id_col: df[id_col].to_numpy(),
                    vec_col: list(m.astype(np.float32)),
                    "gen": np.int64(g),
                    "cluster": np.argmax(m @ c.T, axis=1).astype(np.int32),
                })

            staged = add_ds.map_batches(
                assign, batch_format="pandas").materialize()
            add_ids = _idx_stage_delta(
                self.index_dir, g, staged, ["cluster"], id_col)
            added = len(add_ids)
            tomb_new.extend(add_ids)
        _idx_commit_refresh(self.index_dir, g, tomb_new)
        return {"gen": g, "added": added,
                "tombstoned": len(set(tomb_new))}

    def compact(
        self,
        *,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
    ) -> dict:
        """Fold every delta generation and the tombstones back into a
        fresh base — the index's OPTIMIZE. One pass over the LIVE rows
        (re-assigned with the existing centroids, no retrain), staged
        into a full new index dir and swapped in; delta dirs and the
        tombstone file disappear, the generation counter carries on so
        later refreshes keep ordering. Run when len(delta dirs) or the
        tombstone map grows past the read-amplification you can pay at
        search time."""
        import shutil

        tmp = self.index_dir + f".compact.{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        c_ref = ray.put(self.centroids)

        def assign(df: pd.DataFrame) -> pd.DataFrame:
            c = ray.get(c_ref)
            m = _unit(_as_matrix(df[vec_col]).astype(np.float32))
            return pd.DataFrame({
                id_col: df[id_col].to_numpy(),
                vec_col: list(m.astype(np.float32)),
                "cluster": np.argmax(m @ c.T, axis=1).astype(np.int32),
            })

        total = 0
        for b in _idx_live_rows(self.index_dir, id_col, vec_col):
            st = b.map_batches(assign, batch_format="pandas").materialize()
            total += st.count()
            st.write_parquet(os.path.join(tmp, "data"),
                             partition_cols=["cluster"])
        np.save(os.path.join(tmp, "centroids.npy"), self.centroids)
        src = os.path.join(self.index_dir, "source.txt")
        if os.path.exists(src):
            shutil.copy(src, os.path.join(tmp, "source.txt"))
        import json

        with open(os.path.join(tmp, "meta.json"), "w") as fh:
            json.dump({"gen": int(self._meta()["gen"])}, fh)
        _idx_swap_in(self.index_dir, tmp)
        return {"rows": total, "gen": int(self._meta()["gen"])}

    def search(
        self,
        query: np.ndarray,
        k: int = 10,
        *,
        nprobe: int = 4,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
    ) -> pd.DataFrame:
        import glob as _glob

        q = _unit(query.reshape(1, -1).astype(np.float32))[0]
        probe = IVFIndex(self.centroids).probe_clusters(query, nprobe)

        def bucket_files(root: str) -> list:
            return [f for c in probe for f in _glob.glob(
                os.path.join(root, f"cluster={int(c)}", "*.parquet"))]

        base = bucket_files(os.path.join(self.index_dir, "data"))
        delta_dirs = _idx_committed_deltas(self.index_dir)
        deltas = [f for d in delta_dirs for f in bucket_files(d)]
        tomb = self._tombstones()
        t_ref = ray.put(tomb) if tomb else None
        live = _idx_live_filter(t_ref, id_col)

        # base and delta branches keep their OWN block layouts (no union
        # — parquet list columns vs pandas-written tensor columns don't
        # unify); top-k is monotone under union, so merging the two
        # branch top-ks on the driver is exact
        tops: list[pd.DataFrame] = []
        if base:
            b = (ray.data.read_parquet(base, columns=[id_col, vec_col])
                 .map_batches(live, batch_format="pandas"))
            tops.append(ann_topk_bruteforce(
                b, q, k, vec_col=vec_col, id_col=id_col))
        if deltas:
            d = (ray.data.read_parquet(
                deltas, columns=[id_col, vec_col, "gen"])
                .map_batches(live, batch_format="pandas"))
            tops.append(ann_topk_bruteforce(
                d, q, k, vec_col=vec_col, id_col=id_col))
        if not tops:
            return pd.DataFrame({id_col: [], "score": []})
        allrows = pd.concat(tops, ignore_index=True)
        # per-id best score: committed state has one live row per id,
        # but an id must never fill two of the k slots regardless
        best: dict = {}
        for i, s in zip(allrows[id_col], allrows["score"]):
            if i not in best or s > best[i]:
                best[i] = s
        top = heapq.nsmallest(k, best.items(), key=lambda t: (-t[1], t[0]))
        return pd.DataFrame(top, columns=[id_col, "score"])


def _lsh_buckets(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Pack per-table sign bits into int bucket ids.

    ``m`` is (n, d) unit vectors, ``planes`` is (L, b, d); returns
    (n, L) int32 bucket ids where bit j of table t is
    ``sign(m @ planes[t, j]) > 0``."""
    L, b, d = planes.shape
    proj = m @ planes.reshape(L * b, d).T  # (n, L*b)
    bits = (proj > 0).astype(np.int32).reshape(len(m), L, b)
    weights = (1 << np.arange(b, dtype=np.int32))
    return (bits * weights).sum(axis=2, dtype=np.int32)  # (n, L)


class LSHDiskIndex:
    """Persisted random-hyperplane LSH index over a cosine embedding
    column — the data-independent scale path beside ``IVFDiskIndex``.

    ``build`` runs ONE streaming scatter: each vector's L per-table
    bucket ids come from a single (n, d) @ (d, L*b) matmul inside
    ``map_batches``; the batch is emitted L times tagged (tbl, bucket)
    and written Parquet-partitioned by ``tbl=/bucket=`` (shuffle-free
    partitioned write, same pattern as the IVF build). Atomic
    tmp+rename build; ``source_tag`` invalidation.

    ``search`` reads ONLY the multiprobe bucket directories: per table
    the query's base bucket plus the ``multiprobe - 1`` buckets reached
    by flipping the lowest-|projection-margin| bits (the bits most
    likely to disagree for true neighbours). Candidates are deduped by
    id across tables before the exact-cosine finish. Recall is governed
    by (n_planes, n_tables, multiprobe); on isotropic synthetic vectors
    (no cluster structure) wide probing is needed, like IVF's high
    nprobe — real embedding corpora concentrate."""

    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        self.planes = np.load(os.path.join(index_dir, "planes.npy"))

    @classmethod
    def build(
        cls,
        ds: "ray.data.Dataset",
        index_dir: str,
        *,
        n_planes: int = 6,
        n_tables: int = 12,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        seed: int = 1,
        source_tag: str = "",
    ) -> "LSHDiskIndex":
        import shutil

        dim = len(ds.limit(1).take_all()[0][vec_col])
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal(
            (n_tables, n_planes, dim)).astype(np.float32)
        p_ref = ray.put(planes)

        def scatter(df: pd.DataFrame) -> pd.DataFrame:
            p = ray.get(p_ref)
            m = _unit(_as_matrix(df[vec_col]).astype(np.float32))
            buckets = _lsh_buckets(m, p)  # (n, L)
            n, L = buckets.shape
            ids = df[id_col].to_numpy()
            return pd.DataFrame(
                {
                    id_col: np.tile(ids, L),
                    vec_col: list(np.tile(m, (L, 1)).astype(np.float32)),
                    "tbl": np.repeat(np.arange(L, dtype=np.int32), n),
                    "bucket": buckets.T.reshape(-1),
                }
            )

        tmp_dir = index_dir + f".tmp.{os.getpid()}"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        os.makedirs(tmp_dir, exist_ok=True)
        ds.map_batches(scatter, batch_format="pandas").write_parquet(
            os.path.join(tmp_dir, "data"), partition_cols=["tbl", "bucket"]
        )
        if source_tag:
            with open(os.path.join(tmp_dir, "source.txt"), "w") as fh:
                fh.write(source_tag)
        np.save(os.path.join(tmp_dir, "planes.npy"), planes)
        shutil.rmtree(index_dir, ignore_errors=True)
        os.rename(tmp_dir, index_dir)
        return cls(index_dir)

    def probe_buckets(self, query: np.ndarray, multiprobe: int) -> list:
        """(tbl, bucket) list: base bucket per table + the multiprobe-1
        single-bit flips with the smallest |projection| (the hyperplanes
        the query sits closest to)."""
        q = _unit(query.reshape(1, -1).astype(np.float32))
        L, b, d = self.planes.shape
        proj = (q @ self.planes.reshape(L * b, d).T).reshape(L, b)
        base = _lsh_buckets(q, self.planes)[0]  # (L,)
        out = []
        for t in range(L):
            out.append((t, int(base[t])))
            flips = np.argsort(np.abs(proj[t]))[: max(0, multiprobe - 1)]
            for j in flips:
                out.append((t, int(base[t]) ^ (1 << int(j))))
        return out

    def refresh(
        self,
        add_ds: "ray.data.Dataset | None" = None,
        delete_ids=None,
        *,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
    ) -> dict:
        """Advance the index one generation WITHOUT a rebuild — the LSH
        analog of ``IVFDiskIndex.refresh``, and the stronger fit for
        incremental corpora: hyperplanes are data-independent, so a
        delta scatter never drifts the way stale k-means centroids do.
        Adds scatter L times with the EXISTING planes into a staged
        ``delta-g<gen>/tbl=/bucket=`` dir (one atomic rename); added ids
        auto-tombstone older versions (upsert), ``delete_ids`` tombstone
        outright; meta commits last. Crash-idempotent at a fixed gen."""
        _idx_sweep_tmp(self.index_dir)
        g = int(_idx_meta(self.index_dir)["gen"]) + 1
        tomb_new: list = list(delete_ids or [])
        added = 0
        if add_ds is not None:
            p_ref = ray.put(self.planes)

            def scatter(df: pd.DataFrame) -> pd.DataFrame:
                p = ray.get(p_ref)
                m = _unit(_as_matrix(df[vec_col]).astype(np.float32))
                buckets = _lsh_buckets(m, p)
                n, L = buckets.shape
                ids = df[id_col].to_numpy()
                return pd.DataFrame({
                    id_col: np.tile(ids, L),
                    vec_col: list(np.tile(m, (L, 1)).astype(np.float32)),
                    "gen": np.int64(g),
                    "tbl": np.repeat(np.arange(L, dtype=np.int32), n),
                    "bucket": buckets.T.reshape(-1),
                })

            staged = add_ds.map_batches(
                scatter, batch_format="pandas").materialize()
            rep_ids = _idx_stage_delta(self.index_dir, g, staged,
                                       ["tbl", "bucket"], id_col)
            add_ids = sorted(set(rep_ids))  # each id appears L times
            added = len(add_ids)
            tomb_new.extend(add_ids)
        _idx_commit_refresh(self.index_dir, g, tomb_new)
        return {"gen": g, "added": added,
                "tombstoned": len(set(tomb_new))}

    def compact(
        self,
        *,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
    ) -> dict:
        """Fold deltas + tombstones into a fresh base (see
        ``IVFDiskIndex.compact``). Live rows read from table 0 only —
        every vector lives in every table, so one table is the deduped
        row set — then re-scattered L times with the existing planes."""
        import shutil

        tmp = self.index_dir + f".compact.{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        p_ref = ray.put(self.planes)

        def scatter(df: pd.DataFrame) -> pd.DataFrame:
            p = ray.get(p_ref)
            m = _unit(_as_matrix(df[vec_col]).astype(np.float32))
            buckets = _lsh_buckets(m, p)
            n, L = buckets.shape
            ids = df[id_col].to_numpy()
            return pd.DataFrame({
                id_col: np.tile(ids, L),
                vec_col: list(np.tile(m, (L, 1)).astype(np.float32)),
                "tbl": np.repeat(np.arange(L, dtype=np.int32), n),
                "bucket": buckets.T.reshape(-1),
            })

        total = 0
        for b in _idx_live_rows(self.index_dir, id_col, vec_col,
                                data_sub=os.path.join("data", "tbl=0"),
                                delta_sub="tbl=0"):
            st = b.map_batches(scatter, batch_format="pandas").materialize()
            total += st.count()
            st.write_parquet(os.path.join(tmp, "data"),
                             partition_cols=["tbl", "bucket"])
        np.save(os.path.join(tmp, "planes.npy"), self.planes)
        src = os.path.join(self.index_dir, "source.txt")
        if os.path.exists(src):
            shutil.copy(src, os.path.join(tmp, "source.txt"))
        import json

        with open(os.path.join(tmp, "meta.json"), "w") as fh:
            json.dump({"gen": int(_idx_meta(self.index_dir)["gen"])}, fh)
        _idx_swap_in(self.index_dir, tmp)
        L = self.planes.shape[0]
        return {"rows": total // max(L, 1),
                "gen": int(_idx_meta(self.index_dir)["gen"])}

    def search(
        self,
        query: np.ndarray,
        k: int = 10,
        *,
        multiprobe: int = 3,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
    ) -> pd.DataFrame:
        import glob as _glob

        q = _unit(query.reshape(1, -1).astype(np.float32))[0]
        probes = self.probe_buckets(query, multiprobe)

        def bucket_files(root: str) -> list:
            return [f for t, bkt in probes for f in _glob.glob(
                os.path.join(root, f"tbl={t}", f"bucket={bkt}",
                             "*.parquet"))]

        base = bucket_files(os.path.join(self.index_dir, "data"))
        delta_dirs = _idx_committed_deltas(self.index_dir)
        deltas = [f for d in delta_dirs for f in bucket_files(d)]
        tomb = _idx_tombstones(self.index_dir)
        t_ref = ray.put(tomb) if tomb else None
        live = _idx_live_filter(t_ref, id_col)
        q_ref = ray.put(q)

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            df = live(df)
            qq = ray.get(q_ref)
            if df.empty:
                return pd.DataFrame({id_col: [], "score": []})
            m = _unit(_as_matrix(df[vec_col]).astype(np.float32))
            scores = m @ qq
            if len(scores) > k:
                idx = np.argpartition(-scores, k)[:k]
            else:
                idx = np.arange(len(scores))
            return pd.DataFrame({id_col: df[id_col].to_numpy()[idx],
                                 "score": scores[idx].astype(np.float64)})

        partials = []
        # base and delta branches keep their OWN block layouts (parquet
        # list columns vs pandas-written tensor columns don't unify)
        if base:
            partials += (ray.data.read_parquet(
                base, columns=[id_col, vec_col])
                .map_batches(partial, batch_format="pandas").take_all())
        if deltas:
            partials += (ray.data.read_parquet(
                deltas, columns=[id_col, vec_col, "gen"])
                .map_batches(partial, batch_format="pandas").take_all())
        if not partials:
            return pd.DataFrame({id_col: [], "score": []})
        # a vector appears once per table it collided in — dedup by id
        # before the exact finish or the same id could fill two top-k slots
        best: dict = {}
        for r in partials:
            vid = r[id_col]
            if vid not in best or r["score"] > best[vid]:
                best[vid] = r["score"]
        top = heapq.nsmallest(k, best.items(), key=lambda t: (-t[1], t[0]))
        return pd.DataFrame(top, columns=[id_col, "score"])


def ann_topk_lsh(
    ds: "ray.data.Dataset",
    query: np.ndarray,
    k: int = 10,
    *,
    index_dir: str,
    n_planes: int = 6,
    n_tables: int = 12,
    multiprobe: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 1,
    source_tag: str = "",
) -> pd.DataFrame:
    """LSH top-k over a persisted bucketed index (built once per
    ``index_dir``, reused across queries); reads only the multiprobe
    bucket set. A ``source_tag`` mismatch forces a rebuild."""
    stamp = os.path.join(index_dir, "source.txt")
    valid = os.path.exists(os.path.join(index_dir, "planes.npy"))
    if valid and source_tag:
        stored = open(stamp).read() if os.path.exists(stamp) else None
        valid = stored == source_tag
    if valid:
        index = LSHDiskIndex(index_dir)
    else:
        index = LSHDiskIndex.build(
            ds, index_dir, n_planes=n_planes, n_tables=n_tables,
            vec_col=vec_col, id_col=id_col, seed=seed, source_tag=source_tag,
        )
    return index.search(query, k, multiprobe=multiprobe,
                        vec_col=vec_col, id_col=id_col)


def ann_topk_ivf(
    ds: "ray.data.Dataset",
    query: np.ndarray,
    k: int = 10,
    *,
    index_dir: str,
    n_clusters: int = 16,
    nprobe: int = 4,
    sample_size: int = 2048,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 1,
    source_tag: str = "",
) -> pd.DataFrame:
    """IVF top-k over a persisted bucketed index (built once per
    ``index_dir``, reused across queries); reads only ``nprobe`` buckets.
    A ``source_tag`` mismatch with the stamped index forces a rebuild."""
    stamp = os.path.join(index_dir, "source.txt")
    valid = os.path.exists(os.path.join(index_dir, "centroids.npy"))
    if valid and source_tag:
        stored = open(stamp).read() if os.path.exists(stamp) else None
        valid = stored == source_tag
    if valid:
        index = IVFDiskIndex(index_dir)
    else:
        index = IVFDiskIndex.build(
            ds, index_dir, n_clusters=n_clusters, sample_size=sample_size,
            vec_col=vec_col, id_col=id_col, seed=seed, source_tag=source_tag,
        )
    return index.search(query, k, nprobe=nprobe, vec_col=vec_col, id_col=id_col)


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the BANDWIDTH scale path
# ---------------------------------------------------------------------------


class PQCodebooks:
    """Per-subspace k-means codebooks for product quantization: d dims
    split into ``m`` subspaces, each quantized to one of ``k`` centroids,
    so a vector stores as ``m`` uint8 codes (8 bytes at m=8) instead of
    d float32s (256 bytes at d=64) — a 32x smaller exhaustive scan.
    Scores come from asymmetric distance computation (ADC): the query
    stays exact; score = sum over subspaces of (q_sub . centroid[code]),
    one (m, k) lookup table per query (Jegou et al., "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011)."""

    def __init__(self, books: np.ndarray):
        self.books = books.astype(np.float32)  # (m, k, dsub)

    @classmethod
    def train(cls, sample: np.ndarray, m: int = 8, k: int = 256,
              iters: int = 8, seed: int = 1) -> "PQCodebooks":
        x = _unit(sample.astype(np.float32))
        d = x.shape[1]
        if d % m:
            raise ValueError(f"dim {d} not divisible by m={m}")
        dsub = d // m
        rng = np.random.default_rng(seed)
        books = np.zeros((m, k, dsub), np.float32)
        for mi in range(m):
            xs = x[:, mi * dsub:(mi + 1) * dsub]
            kk = min(k, len(xs))
            c = xs[rng.choice(len(xs), size=kk, replace=False)].copy()
            for _ in range(iters):
                d2 = ((xs[:, None, :] - c[None, :, :]) ** 2).sum(-1)
                assign = d2.argmin(axis=1)
                for j in range(kk):
                    mask = assign == j
                    if mask.any():
                        c[j] = xs[mask].mean(axis=0)
            books[mi, :kk] = c
            if kk < k:
                # fill unused rows with copies of a REAL centroid: a
                # zero row would act as a phantom centroid (distance
                # ||x_sub||^2 can beat every trained one for small
                # samples) whose ADC contribution is always 0; with a
                # duplicate, argmin ties resolve to the lower index so
                # these rows are never emitted and their LUT entries
                # are correct either way
                books[mi, kk:] = c[0]
        return cls(books)

    def encode(self, x: np.ndarray) -> np.ndarray:
        """Unit-normalized (n, d) -> (n, m) uint8 codes."""
        x = _unit(x.astype(np.float32))
        m, _k, dsub = self.books.shape
        codes = np.empty((len(x), m), np.uint8)
        for mi in range(m):
            xs = x[:, mi * dsub:(mi + 1) * dsub]
            d2 = ((xs[:, None, :] - self.books[mi][None, :, :]) ** 2).sum(-1)
            codes[:, mi] = d2.argmin(axis=1).astype(np.uint8)
        return codes

    def lut(self, q: np.ndarray) -> np.ndarray:
        """Query (d,) -> ADC lookup table (m, k) of inner products."""
        q = _unit(q.reshape(1, -1).astype(np.float32))[0]
        m, k, dsub = self.books.shape
        return np.einsum(
            "mkd,md->mk", self.books, q.reshape(m, dsub)).astype(np.float32)


class PQDiskIndex:
    """Persisted flat-PQ index: ONE encode pass writes (id, m uint8
    codes) Parquet; every search is an exhaustive but 32x-lighter ADC
    scan (map_batches over the codes table with a broadcast LUT,
    per-batch partial top-c) followed by an exact RERANK of the top
    ``rerank_mult * k`` candidates against the original vectors — the
    standard PQ + rerank shape. Unlike IVF/LSH (pruned IO, recall set
    by nprobe), PQ reads everything but ships almost nothing: the scan
    payload at 10^9 x 64-dim drops from 256 GB to 8 GB, and no bucket
    skew / no training drift (codebooks are per-subspace, not global
    clusters). Atomic tmp-dir + rename build, source_tag invalidation —
    same contract as IVFDiskIndex."""

    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        self.books = PQCodebooks(
            np.load(os.path.join(index_dir, "codebooks.npy")))

    @classmethod
    def build(
        cls,
        ds: "ray.data.Dataset",
        index_dir: str,
        *,
        m: int = 8,
        k: int = 256,
        sample_size: int = 2048,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        seed: int = 1,
        source_tag: str = "",
    ) -> "PQDiskIndex":
        import shutil

        sample = _as_matrix(
            pd.DataFrame(ds.limit(sample_size).take_all())[vec_col])
        books = PQCodebooks.train(sample, m=m, k=k, seed=seed)
        b_ref = ray.put(books.books)

        def enc(df: pd.DataFrame) -> pd.DataFrame:
            bk = PQCodebooks(ray.get(b_ref))
            codes = bk.encode(_as_matrix(df[vec_col]))
            return pd.DataFrame({
                id_col: df[id_col].to_numpy(),
                "codes": list(codes),  # list<uint8> column, m bytes/row
            })

        tmp_dir = index_dir + f".tmp.{os.getpid()}"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        os.makedirs(tmp_dir, exist_ok=True)
        ds.map_batches(enc, batch_format="pandas").write_parquet(
            os.path.join(tmp_dir, "codes"))
        np.save(os.path.join(tmp_dir, "codebooks.npy"), books.books)
        if source_tag:
            with open(os.path.join(tmp_dir, "source.txt"), "w") as fh:
                fh.write(source_tag)
        shutil.rmtree(index_dir, ignore_errors=True)
        os.rename(tmp_dir, index_dir)
        return cls(index_dir)

    def refresh(
        self,
        add_ds: "ray.data.Dataset | None" = None,
        delete_ids=None,
        *,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
    ) -> dict:
        """Advance the codes index one generation WITHOUT re-encoding
        the corpus: the delta encodes with the EXISTING codebooks into a
        staged ``delta-g<gen>`` dir (one atomic rename); added ids
        auto-tombstone older versions (upsert), ``delete_ids`` tombstone
        outright; meta commits last. Codebooks are NOT retrained —
        rebuild on heavy distribution drift (same trade as IVF
        centroids, weaker in practice: per-subspace codebooks track
        marginals, not global clusters)."""
        _idx_sweep_tmp(self.index_dir)
        g = int(_idx_meta(self.index_dir)["gen"]) + 1
        tomb_new: list = list(delete_ids or [])
        added = 0
        if add_ds is not None:
            b_ref = ray.put(self.books.books)

            def enc(df: pd.DataFrame) -> pd.DataFrame:
                bk = PQCodebooks(ray.get(b_ref))
                codes = bk.encode(_as_matrix(df[vec_col]))
                return pd.DataFrame({
                    id_col: df[id_col].to_numpy(),
                    "codes": list(codes),
                    "gen": np.int64(g),
                })

            staged = add_ds.map_batches(
                enc, batch_format="pandas").materialize()
            add_ids = _idx_stage_delta(self.index_dir, g, staged, [],
                                       id_col)
            added = len(add_ids)
            tomb_new.extend(add_ids)
        _idx_commit_refresh(self.index_dir, g, tomb_new)
        return {"gen": g, "added": added,
                "tombstoned": len(set(tomb_new))}

    def compact(self, *, id_col: str = "vec_id") -> dict:
        """Fold deltas + tombstones into a fresh codes base (see
        ``IVFDiskIndex.compact``). Codes are already the stored
        representation, so compaction is a live-row concat — no
        re-encode pass."""
        import shutil

        tmp = self.index_dir + f".compact.{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        total = 0
        for b in _idx_live_rows(self.index_dir, id_col, "codes",
                                data_sub="codes"):
            st = b.materialize()
            total += st.count()
            st.write_parquet(os.path.join(tmp, "codes"))
        np.save(os.path.join(tmp, "codebooks.npy"), self.books.books)
        src = os.path.join(self.index_dir, "source.txt")
        if os.path.exists(src):
            shutil.copy(src, os.path.join(tmp, "source.txt"))
        import json

        with open(os.path.join(tmp, "meta.json"), "w") as fh:
            json.dump({"gen": int(_idx_meta(self.index_dir)["gen"])}, fh)
        _idx_swap_in(self.index_dir, tmp)
        return {"rows": total,
                "gen": int(_idx_meta(self.index_dir)["gen"])}

    def search(
        self,
        query: np.ndarray,
        k: int = 10,
        *,
        rerank_mult: int = 8,
        rerank_ds: "ray.data.Dataset | None" = None,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
    ) -> pd.DataFrame:
        import glob as _glob

        lut = self.books.lut(query)
        lut_ref = ray.put(lut)
        c = max(k, k * rerank_mult)
        marange = np.arange(lut.shape[0])
        tomb = _idx_tombstones(self.index_dir)
        t_ref = ray.put(tomb) if tomb else None
        live = _idx_live_filter(t_ref, id_col)

        def adc_partial(df: pd.DataFrame) -> pd.DataFrame:
            df = live(df)
            if df.empty:
                return pd.DataFrame({id_col: [], "score": []})
            tbl = ray.get(lut_ref)
            codes = np.stack(df["codes"].to_numpy()).astype(np.int64)
            scores = tbl[marange, codes].sum(axis=1).astype(np.float64)
            top = min(c, len(scores))
            idx = (np.argpartition(-scores, top - 1)[:top]
                   if len(scores) > top else np.arange(len(scores)))
            return pd.DataFrame({id_col: df[id_col].to_numpy()[idx],
                                 "score": scores[idx]})

        partials = (ray.data.read_parquet(
            os.path.join(self.index_dir, "codes"))
            .map_batches(adc_partial, batch_format="pandas").take_all())
        delta_files = [f for d in _idx_committed_deltas(self.index_dir)
                       for f in _glob.glob(os.path.join(d, "*.parquet"))]
        if delta_files:
            partials += (ray.data.read_parquet(delta_files)
                         .map_batches(adc_partial,
                                      batch_format="pandas").take_all())
        best: dict = {}
        for r in partials:
            i, s = r[id_col], r["score"]
            if i not in best or s > best[i]:
                best[i] = s
        cand = heapq.nsmallest(c, best.items(), key=lambda t: (-t[1], t[0]))
        if rerank_ds is None:
            return pd.DataFrame(cand[:k], columns=[id_col, "score"])
        # exact rerank: the candidate id set broadcasts once; only the
        # candidates' exact vectors are scored (a brute top-k over a
        # dataset pre-filtered to c rows)
        ids = pa.array([t[0] for t in cand])
        id_ref = ray.put(ids)

        def keep_cand(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return t.filter(pc.is_in(t[id_col], value_set=ray.get(id_ref)))

        sub = rerank_ds.map_batches(keep_cand, batch_format="pyarrow")
        return ann_topk_bruteforce(sub, query, k,
                                   vec_col=vec_col, id_col=id_col)


def pq_search_multi(
    index: "PQDiskIndex",
    queries: np.ndarray,
    k: int = 10,
    *,
    rerank_mult: int = 8,
    rerank_ds: "ray.data.Dataset | None" = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Batched PQ search: ONE ADC pass over the codes table scores ALL
    queries (a stacked (Q, m, k) LUT broadcast once; per-batch scores
    come from one fancy-index + sum per query), then one shared exact
    rerank over the union of candidate ids. Same output contract as
    ``ann_topk_bruteforce_multi``: (query_idx, id, score, rank)."""
    qm = np.atleast_2d(queries)
    nq = len(qm)
    luts = np.stack([index.books.lut(q) for q in qm])  # (Q, m, k)
    lut_ref = ray.put(luts)
    c = max(k, k * rerank_mult)
    marange = np.arange(luts.shape[1])

    tomb = _idx_tombstones(index.index_dir)
    t_ref = ray.put(tomb) if tomb else None
    live = _idx_live_filter(t_ref, id_col)

    def adc_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = live(df)
        if df.empty:
            return pd.DataFrame({"query_idx": [], id_col: [], "score": []})
        tbl = ray.get(lut_ref)
        codes = np.stack(df["codes"].to_numpy()).astype(np.int64)  # (n, m)
        n = len(codes)
        take = min(c, n)
        ids = df[id_col].to_numpy()
        outs = []
        for qi in range(nq):
            scores = tbl[qi][marange, codes].sum(axis=1).astype(np.float64)
            idx = (np.argpartition(-scores, take - 1)[:take]
                   if n > take else np.arange(n))
            outs.append(pd.DataFrame({"query_idx": qi, id_col: ids[idx],
                                      "score": scores[idx]}))
        return pd.concat(outs, ignore_index=True)

    import glob as _glob

    codes_ds = ray.data.read_parquet(os.path.join(index.index_dir, "codes"))
    partials = codes_ds.map_batches(
        adc_partial, batch_format="pandas").take_all()
    delta_files = [f for d in _idx_committed_deltas(index.index_dir)
                   for f in _glob.glob(os.path.join(d, "*.parquet"))]
    if delta_files:
        partials += (ray.data.read_parquet(delta_files)
                     .map_batches(adc_partial,
                                  batch_format="pandas").take_all())
    by_q: dict[int, dict] = {i: {} for i in range(nq)}
    for r in partials:
        b = by_q[r["query_idx"]]
        i, s = r[id_col], r["score"]
        if i not in b or s > b[i]:
            b[i] = s
    cand_by_q = {qi: heapq.nsmallest(c, best.items(),
                                     key=lambda t: (-t[1], t[0]))
                 for qi, best in by_q.items()}
    if rerank_ds is None:
        out = []
        for qi in range(nq):
            for rank, (vid, sc) in enumerate(cand_by_q[qi][:k], 1):
                out.append((qi, vid, sc, rank))
        return pd.DataFrame(out,
                            columns=["query_idx", id_col, "score", "rank"])
    # shared exact rerank: one filtered pass over the union candidate set
    union_ids = sorted({t[0] for rows in cand_by_q.values() for t in rows})
    id_ref = ray.put(pa.array(union_ids))

    def keep_cand(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.is_in(t[id_col], value_set=ray.get(id_ref)))

    sub = rerank_ds.map_batches(keep_cand, batch_format="pyarrow")
    exact = ann_topk_bruteforce_multi(sub, qm, k=len(union_ids),
                                      vec_col=vec_col, id_col=id_col)
    out = []
    for qi in range(nq):
        mine = {t[0] for t in cand_by_q[qi]}
        rows = exact[(exact["query_idx"] == qi)
                     & exact[id_col].isin(mine)]
        rows = rows.sort_values(["score", id_col],
                                ascending=[False, True]).head(k)
        for rank, (_i, r) in enumerate(rows.iterrows(), 1):
            out.append((qi, r[id_col], r["score"], rank))
    return pd.DataFrame(out, columns=["query_idx", id_col, "score", "rank"])


def ann_topk_pq(
    ds: "ray.data.Dataset",
    query: np.ndarray,
    k: int = 10,
    *,
    index_dir: str,
    m: int = 8,
    n_codes: int = 256,
    rerank_mult: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 1,
    source_tag: str = "",
) -> pd.DataFrame:
    """PQ + exact-rerank top-k over a persisted codes index (built once
    per ``index_dir``, reused across queries). A ``source_tag`` mismatch
    forces a rebuild. ``ds`` is also the rerank source."""
    stamp = os.path.join(index_dir, "source.txt")
    valid = os.path.exists(os.path.join(index_dir, "codebooks.npy"))
    if valid and source_tag:
        stored = open(stamp).read() if os.path.exists(stamp) else None
        valid = stored == source_tag
    if valid:
        index = PQDiskIndex(index_dir)
    else:
        index = PQDiskIndex.build(
            ds, index_dir, m=m, k=n_codes, vec_col=vec_col, id_col=id_col,
            seed=seed, source_tag=source_tag)
    return index.search(query, k, rerank_mult=rerank_mult, rerank_ds=ds,
                        vec_col=vec_col, id_col=id_col)
