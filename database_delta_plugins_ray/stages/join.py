"""Generic large x large shuffle hash join for Ray Data datasets.

The reference has no relational joins (SURVEY §2.5) — its only lookups are
hash-map membership — but the build charter requires join breadth as a
first-class capability.  The repo already has the two *small-side* shapes
(broadcast hash join in ``pipelines/analytics.py:revenue_by_segment``) and
the two *custom* shapes (as-of join, range join).  This module adds the
remaining general shape: an equi-join of two datasets that are BOTH too
large to broadcast.

Design (one shuffle total, no driver materialization):

1. Tag each side, stamp every row with a COARSE partition id
   ``hash(key columns) % nparts``, and union the two sides.  A union is
   free in Ray Data — no data movement, the streaming executor just
   interleaves blocks.
2. ``groupby(__jpart).map_groups``: ONE hash shuffle co-locates both
   sides of every key; inside each partition a single vectorized
   ``pandas.merge`` joins ALL keys of the partition at once.  Grouping
   by the coarse partition — not the raw key — keeps the number of
   map_groups invocations at ``nparts``, not ``n_keys`` (per-key UDF
   dispatch is 10-100x slower at millions of keys; same co-location
   trick the LSH dedup verifies use).  Inner and left joins supported.

Partitioning assumption (documented per the charter): one partition's
rows (|L|/nparts + |R|/nparts, plus any single hot key's full row set)
fit in a task's heap — size ``nparts`` to the data, and for skewed keys
pass ``salt=k``: the left side is salted round-robin into k sub-keys and
the right side is replicated once per salt value, so a hot key's left
rows spread over k partitions (classic skew join; costs k copies of the
right side, so keep the right side the smaller/pre-aggregated one) — or
pre-aggregate before the join, which is what the call sites here do.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["shuffle_hash_join", "bloom_of_keys"]

_SIDE = "__jside"
_SALT = "__jsalt"
_PART = "__jpart"


def _tagged(
    t: pa.Table,
    side: str,
    out_fields: list[pa.Field],
    keys: list[str],
    salt: int,
    nparts: int,
) -> pa.Table:
    cols = []
    for f in out_fields:
        if f.name in t.column_names:
            cols.append(t[f.name].cast(f.type))
        else:
            cols.append(pa.nulls(t.num_rows, f.type))
    names = [f.name for f in out_fields]
    out = pa.table(cols, names=names)
    out = out.append_column(
        _SIDE, pa.array(np.full(out.num_rows, side == "l"), pa.bool_()))
    if salt > 1:
        if side == "l":  # left rows scatter round-robin over the salts
            out = out.append_column(_SALT, pa.array(
                np.arange(out.num_rows, dtype=np.int32) % salt))
        else:  # right rows replicate once per salt value
            out = pa.concat_tables([
                out.append_column(_SALT, pa.array(
                    np.full(out.num_rows, s, dtype=np.int32)))
                for s in range(salt)
            ])
    # coarse partition id from the key columns (+ salt): deterministic,
    # vectorized, and identical on both sides
    kdf = out.select(keys + ([_SALT] if salt > 1 else [])).to_pandas()
    h = pd.util.hash_pandas_object(kdf, index=False).to_numpy()
    return out.append_column(
        _PART, pa.array((h % np.uint64(nparts)).astype(np.int32)))


def bloom_of_keys(ds, keys: Sequence[str], nbits: int = 1 << 22,
                  nhash: int = 4) -> np.ndarray:
    """Build a Bloom filter over a dataset's key column(s).

    Fixed-size OR-mergeable partials: each batch contributes one
    ``nbits/8``-byte array; one map_batches fold pass ORs 64 partials at a
    time so the driver only folds ``ceil(n_blocks / 64)`` arrays — the
    reduction payload is O(nbits), independent of row count. Key hashing
    is ``pd.util.hash_pandas_object`` over the key frame, the same
    function the probe side uses, so build/probe agree bit-for-bit."""
    nbytes = nbits // 8

    def partial(t: pa.Table) -> pa.Table:
        from ..functions.sketch import bloom_set

        kdf = t.select(list(keys)).to_pandas()
        h = pd.util.hash_pandas_object(kdf, index=False).to_numpy()
        b = np.zeros(nbytes, np.uint8)
        bloom_set(b, h, nhash)
        return pa.table({"b": pa.array([b.tobytes()], pa.large_binary())})

    def orfold(t: pa.Table) -> pa.Table:
        acc = np.zeros(nbytes, np.uint8)
        for buf in t["b"].to_pylist():
            acc |= np.frombuffer(buf, np.uint8)
        return pa.table({"b": pa.array([acc.tobytes()], pa.large_binary())})

    folded = (ds.map_batches(partial, batch_format="pyarrow")
              .map_batches(orfold, batch_format="pyarrow", batch_size=64))
    acc = np.zeros(nbytes, np.uint8)
    for row in folded.take_all():
        acc |= np.frombuffer(row["b"], np.uint8)
    return acc


def shuffle_hash_join(
    left,
    right,
    on: Sequence[str] | str,
    how: str = "inner",
    salt: int = 1,
    nparts: int = 64,
    post=None,
    prefilter: bool = False,
    prefilter_bits: int = 1 << 22,
    prefilter_hashes: int = 4,
):
    """Equi-join two Ray Data datasets on column(s) ``on``.

    Non-key column names must be disjoint between the two sides (rename
    before joining); key columns must share names and types. ``how`` is
    ``inner``, ``left``, ``right``, ``outer`` (full outer), ``semi``
    (left rows with a right match, left payload only) or ``anti`` (left
    rows with NO right match). Existence joins ship only the right
    side's key columns through the shuffle. Returns a dataset with key
    columns + left payload (+ right payload for inner/left/right/outer).

    ``post`` (optional, ``DataFrame -> DataFrame``) runs on each
    partition's joined frame INSIDE the join task.  Because partitions
    are hash-of-key, every row of a join key is present in exactly one
    such frame — so a per-key aggregation passed as ``post`` is exact
    and avoids a second all-to-all (the classic "aggregate on the join
    key reuses the join's partitioning" plan).  Not available with
    ``salt > 1`` (a salted hot key spans partitions).
    """
    if how not in ("inner", "left", "right", "outer", "semi", "anti"):
        raise ValueError(f"unsupported join type: {how}")
    if prefilter and how == "outer":
        raise ValueError("prefilter is unavailable for outer joins "
                         "(neither side's rows may be dropped)")
    if salt > 1 and how in ("right", "outer"):
        # salting replicates the right side once per salt value; an
        # unmatched right row would then surface ``salt`` times
        raise ValueError(f"salt > 1 is unavailable for {how} joins")
    if post is not None and salt > 1:
        raise ValueError("post= requires salt=1 (salted keys span partitions)")
    keys = [on] if isinstance(on, str) else list(on)
    if how in ("semi", "anti"):
        # existence joins never read right payload: ship right KEYS only
        # through the shuffle (the right side collapses to its key set)
        right = right.select_columns(keys)

    if prefilter:
        # Bloom semi-join prune ahead of the all-to-all: build the filter
        # on the side whose rows MUST all survive, probe-and-drop on the
        # other (no false negatives -> result exact; false positives just
        # ride the shuffle). inner: right keys filter left rows; left
        # join: left keys filter right rows (left rows can never be
        # dropped — unmatched ones surface with null right payload).
        import ray

        # semi behaves like inner (a left row the bloom rejects is a
        # definite non-member — semi excludes it anyway); right joins
        # too (right rows must all survive, unmatched LEFT rows may be
        # dropped); anti behaves like left (left rows must all survive;
        # right keys absent from the left are irrelevant)
        probe_is_left = how in ("inner", "semi", "right")
        build, probe_left = (right, True) if probe_is_left else (left, False)
        bloom_ref = ray.put(bloom_of_keys(
            build, keys, nbits=prefilter_bits, nhash=prefilter_hashes))

        def probe(t: pa.Table) -> pa.Table:
            from ..functions.sketch import bloom_contains

            bits = ray.get(bloom_ref)
            kdf = t.select(keys).to_pandas()
            h = pd.util.hash_pandas_object(kdf, index=False).to_numpy()
            return t.filter(pa.array(bloom_contains(bits, h, prefilter_hashes)))

        if probe_left:
            left = left.map_batches(probe, batch_format="pyarrow")
        else:
            right = right.map_batches(probe, batch_format="pyarrow")

    lsch, rsch = left.schema(), right.schema()
    lpay = [n for n in lsch.names if n not in keys]
    rpay = [n for n in rsch.names if n not in keys]
    overlap = set(lpay) & set(rpay)
    if overlap:
        raise ValueError(f"non-key columns overlap: {sorted(overlap)}")

    def _field(sch, name):
        i = sch.names.index(name)
        return pa.field(name, sch.types[i])

    out_fields = (
        [_field(lsch, k) for k in keys]
        + [_field(lsch, n) for n in lpay]
        + [_field(rsch, n) for n in rpay]
    )
    out_names = [f.name for f in out_fields]
    merge_keys = keys + ([_SALT] if salt > 1 else [])
    # empty-result prototype (map_groups needs stable dtypes)
    proto = pa.table(
        {f.name: pa.nulls(0, f.type) for f in out_fields}
    ).to_pandas()

    def tag(side):
        return lambda t: _tagged(t, side, out_fields, keys, salt, nparts)

    both = left.map_batches(tag("l"), batch_format="pyarrow").union(
        right.map_batches(tag("r"), batch_format="pyarrow"))

    def join_part(g: pd.DataFrame) -> pd.DataFrame:
        lmask = g[_SIDE].to_numpy()
        l = g.loc[lmask, merge_keys + lpay]
        r = g.loc[~lmask, merge_keys + rpay]
        if how == "outer":
            if l.empty and r.empty:
                return post(proto) if post is not None else proto
            out = l.merge(r, on=merge_keys, how="outer")[out_names]
            return post(out) if post is not None else out
        if how == "right":
            # mirror of the left join: every right row survives (null
            # left payload when unmatched); an empty right side yields
            # nothing even when left rows are present
            if r.empty:
                return post(proto) if post is not None else proto
            out = l.merge(r, on=merge_keys, how="right")[out_names]
            return post(out) if post is not None else out
        if l.empty or (r.empty and how in ("inner", "semi")):
            return post(proto) if post is not None else proto
        if how in ("semi", "anti"):
            # existence test: dedup right keys so each left row appears
            # at most once, then keep matches (semi) / non-matches (anti)
            rk = r[merge_keys].drop_duplicates()
            m = l.merge(rk, on=merge_keys, how="left", indicator=True)
            keep = m["_merge"] == ("both" if how == "semi" else "left_only")
            out = m.loc[keep, out_names]
        else:
            out = l.merge(r, on=merge_keys, how=how)[out_names]
        return post(out) if post is not None else out

    return both.groupby(_PART).map_groups(join_part, batch_format="pandas")
