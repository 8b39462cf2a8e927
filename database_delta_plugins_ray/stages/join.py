"""Generic large x large shuffle hash join for Ray Data datasets.

The reference has no relational joins (SURVEY §2.5) — its only lookups are
hash-map membership — but the build charter requires join breadth as a
first-class capability.  The repo already has the two *small-side* shapes
(broadcast hash join in ``pipelines/analytics.py:revenue_by_segment``) and
the two *custom* shapes (as-of join, range join).  This module adds the
remaining general shape: an equi-join of two datasets that are BOTH too
large to broadcast.

Design (one shuffle total, no driver materialization):

1. Tag each side and union them into one dataset whose schema is the
   key column(s) + both sides' payload columns (each side carries nulls
   for the other side's columns).  A union is free in Ray Data — no
   data movement, the streaming executor just interleaves blocks.
2. ``groupby(keys).map_groups``: ONE hash shuffle co-locates every row
   of both sides for a key; inside the group a vectorized pandas merge
   emits the joined rows.  Inner and left joins supported.

Partitioning assumption (documented per the charter): all rows of one
join key fit in a single task's heap.  For skewed keys pass ``salt=k``:
the left side is salted round-robin into k sub-keys and the right side
is replicated once per salt value, so a hot key's left rows spread over
k tasks (classic skew join; costs k copies of the right side, so keep
the right side the smaller/pre-aggregated one) — or pre-aggregate
before the join, which is what the call sites here do.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["shuffle_hash_join"]

_SIDE = "__jside"
_SALT = "__jsalt"


def _tagged(
    t: pa.Table, side: str, out_fields: list[pa.Field], salt: int
) -> pa.Table:
    cols = []
    for f in out_fields:
        if f.name in t.column_names:
            cols.append(t[f.name].cast(f.type))
        else:
            cols.append(pa.nulls(t.num_rows, f.type))
    cols.append(pa.array([side] * t.num_rows, pa.string()))
    names = [f.name for f in out_fields] + [_SIDE]
    out = pa.table(cols, names=names)
    if salt <= 1:
        return out
    if side == "l":  # left rows scatter round-robin over the salts
        return out.append_column(
            _SALT, pa.array(np.arange(out.num_rows, dtype=np.int32) % salt))
    # right rows replicate once per salt value
    return pa.concat_tables([
        out.append_column(_SALT, pa.array(
            np.full(out.num_rows, s, dtype=np.int32)))
        for s in range(salt)
    ])


def shuffle_hash_join(
    left,
    right,
    on: Sequence[str] | str,
    how: str = "inner",
    salt: int = 1,
):
    """Equi-join two Ray Data datasets on column(s) ``on``.

    Non-key column names must be disjoint between the two sides (rename
    before joining); key columns must share names and types. ``how`` is
    ``inner`` or ``left``.  Returns a dataset with key columns + left
    payload + right payload.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported join type: {how}")
    keys = [on] if isinstance(on, str) else list(on)

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
    # build the empty-result prototype once (map_groups needs stable dtypes)
    proto = pa.table(
        {f.name: pa.nulls(0, f.type) for f in out_fields}
    ).to_pandas()

    both = left.map_batches(
        lambda t, of=out_fields: _tagged(t, "l", of, salt),
        batch_format="pyarrow",
    ).union(
        right.map_batches(
            lambda t, of=out_fields: _tagged(t, "r", of, salt),
            batch_format="pyarrow",
        )
    )
    group_keys = keys + ([_SALT] if salt > 1 else [])

    def join_group(g: pd.DataFrame) -> pd.DataFrame:
        side = g[_SIDE].to_numpy()
        lmask = side == "l"
        l = g.loc[lmask, keys + lpay]
        r = g.loc[~lmask, rpay]
        if l.empty or (r.empty and how == "inner"):
            return proto
        if r.empty:  # left join, no right rows: nulls for right payload
            out = l.copy()
            for n in rpay:
                out[n] = pd.NA
            return out[out_names]
        # one key per group -> the merge is a cross of l x r for this key
        nl, nr = len(l), len(r)
        li = np.repeat(np.arange(nl), nr)
        ri = np.tile(np.arange(nr), nl)
        out = l.iloc[li].reset_index(drop=True)
        rrep = r.iloc[ri].reset_index(drop=True)
        for n in rpay:
            out[n] = rrep[n]
        return out[out_names]

    return both.groupby(group_keys).map_groups(
        join_group, batch_format="pandas")
