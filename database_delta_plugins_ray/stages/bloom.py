"""Cross-corpus Bloom-filter deduplication — drop every document in a
NEW corpus whose content already exists in a KEPT corpus, without
shuffling either corpus (the public CCNet / RefinedWeb pattern: Wenzek
et al. 2020, arXiv:1911.00359; Penedo et al. 2023, arXiv:2306.01116 —
dedupe each crawl snapshot against everything previously retained).

This complements ``stages/join.py``'s ``shuffle_hash_join(how="anti",
prefilter=True)``: the join's Bloom prefilter prunes the BUILD side but
still ships every left row through the all-to-all; here NEITHER corpus
rides a shuffle — only Bloom-positive candidates do:

- **Build** (one stream over the kept corpus A): each block folds its
  rows' content-hash probe bits into ONE fixed-size partial
  (``functions.sketch.bloom_set``); Ray's ``AggregateFn`` tree-merges
  partials (OR is associative + commutative), so the driver receives
  exactly one ``m/8``-byte array no matter how many blocks streamed.
  At ~10 bits/key the filter for 10⁹ kept docs is ~1.2 GB — broadcast
  ONCE via ``ray.put`` vs an all-to-all of corpus-sized hashes.
- **Probe** (one stream over the new corpus B): any unset probe bit
  PROVES the row is not in A (Bloom filters have no false negatives) —
  those rows pass without ever leaving their scan task.
- **Exact verify of the candidates** (``verify=True``, default): Bloom
  hits are true duplicates plus ~``(1-e^{-kn/m})^k`` false positives.
  A second Bloom built over the CANDIDATE hashes prunes a single scan
  of A down to rows that could match a candidate, and one
  coarse-partition md5 groupby resolves the two sides exactly — the
  only exchange in the whole operator is bounded by |candidates|
  (+ FP), never |A| or |B|. The result is then EXACT (content-md5
  identity, SQL-oracle-able). ``verify=False`` keeps the classic
  probabilistic filter (drops false positives too) for pipelines that
  accept the FP rate.

No counterpart in the reference (row replication, not corpus curation);
cited to the public papers only.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

__all__ = ["build_content_bloom", "cross_corpus_dedup"]

#: salt so the filter is a pure, versioned function of the content
_SALT = b"bloomdedup-v1:"
_NPARTS = 64


def _md5_hex(values) -> np.ndarray:
    """Content md5 hex per value, ``None`` for nulls — SQL semantics:
    ``md5(NULL) IS NULL`` and never matches anything, so a null-content
    row is never a duplicate (and never collides with the literal
    string ``'None'``)."""
    return np.array(
        [None if v is None else
         hashlib.md5(str(v).encode("utf-8", "surrogatepass")).hexdigest()
         for v in values], dtype=object)


def _valid_md5(values) -> tuple[np.ndarray, np.ndarray]:
    """(md5 hex of the non-null values, boolean validity mask)."""
    md5s = _md5_hex(values)
    mask = np.array([v is not None for v in md5s], dtype=bool)
    return md5s[mask].astype(object), mask


def _probe_hash(md5_hex: np.ndarray) -> np.ndarray:
    """uint64 Bloom probe hash per row (salted re-hash of the md5 hex so
    the filter's bit positions are independent of the verify identity)."""
    n = len(md5_hex)
    out = np.empty(n, dtype=np.uint64)
    for i, v in enumerate(md5_hex):
        d = hashlib.md5(_SALT + v.encode()).digest()
        out[i] = int.from_bytes(d[:8], "little")
    return out


def build_content_bloom(ds, *, col: str = "text", m_bits: int = 1 << 22,
                        k: int = 7) -> np.ndarray:
    """One-pass distributed Bloom build over md5(``ds[col]``) — returns
    the ``m_bits``-bit filter as a uint8 byte array. OR is associative
    and commutative, so Ray's aggregate tree-merges block partials and
    the result is independent of block count and order."""
    from ray.data.aggregate import AggregateFn

    from ..functions.sketch import bloom_set

    if m_bits % 8:
        raise ValueError("m_bits must be a multiple of 8")
    nbytes = m_bits // 8

    def acc_block(state: np.ndarray, block) -> np.ndarray:
        vals = (block[col].to_pylist() if hasattr(block, "to_pylist")
                else list(block[col]))
        md5s, mask = _valid_md5(vals)
        if not len(md5s):
            return state
        # the accumulator is partition-private: mutate in place (a
        # per-block copy of a GB-scale filter would dominate the build)
        bloom_set(state, _probe_hash(md5s), k)
        return state

    fn = AggregateFn(
        init=lambda _key: np.zeros(nbytes, dtype=np.uint8),
        merge=lambda a, b: np.bitwise_or(a, b),
        accumulate_block=acc_block,
        name="bloom",
    )
    out = ds.aggregate(fn)
    bits = out["bloom"] if isinstance(out, dict) else out
    return np.asarray(bits, dtype=np.uint8)


def cross_corpus_dedup(ds_b, ds_a, *, col: str = "text",
                       m_bits: int = 1 << 22, k: int = 7,
                       verify: bool = True):
    """Rows of corpus ``ds_b`` whose ``col`` content does NOT appear in
    corpus ``ds_a`` (B's internal duplicates are kept — this operator is
    cross-corpus only). Returns a Dataset with ``ds_b``'s columns.

    ``verify=True`` (default) makes the result exact — see the module
    docstring for the candidate-bounded verify plan. ``verify=False``
    drops every Bloom positive, false positives included (bounded by
    the standard ``(1-e^{-kn/m})^k`` rate for the chosen sizing)."""
    import pyarrow as pa
    import ray

    from ..functions.sketch import bloom_contains

    bloom_a = build_content_bloom(ds_a, col=col, m_bits=m_bits, k=k)
    ref_a = ray.put(bloom_a)

    def probe(t: pa.Table) -> pa.Table:
        bits = ray.get(ref_a)
        if t.num_rows == 0:
            return t.append_column("_bloom_hit", pa.array([], pa.bool_()))
        md5s, mask = _valid_md5(t[col].to_pylist())
        hit = np.zeros(t.num_rows, dtype=bool)  # null content: never a dup
        if len(md5s):
            hit[mask] = bloom_contains(bits, _probe_hash(md5s), k)
        return t.append_column("_bloom_hit", pa.array(hit))

    tagged = ds_b.map_batches(probe, batch_format="pyarrow")
    if verify:
        # both branches (clean + candidates) consume the probe output:
        # materialize it once or corpus B pays the md5 pass twice
        tagged = tagged.materialize()
    clean = (tagged.filter(expr="_bloom_hit == False")
             .drop_columns(["_bloom_hit"]))
    if not verify:
        return clean

    cands = (tagged.filter(expr="_bloom_hit == True")
             .drop_columns(["_bloom_hit"]).materialize())
    if cands.count() == 0:
        return clean

    # 2nd bloom over the candidates prunes the single verify scan of A
    bloom_c = build_content_bloom(cands, col=col, m_bits=m_bits, k=k)
    ref_c = ray.put(bloom_c)

    b_fields = [cands.schema().base_schema.field(n)
                for n in cands.schema().names]
    b_names = [f.name for f in b_fields]
    union_schema = pa.schema(
        b_fields + [pa.field("_md5", pa.string()),
                    pa.field("_part", pa.int32()),
                    pa.field("_is_b", pa.bool_())])

    def _parts(md5s: np.ndarray) -> np.ndarray:
        return (pd.util.hash_array(md5s) % np.uint64(_NPARTS)).astype(np.int32)

    def a_keys(t: pa.Table) -> pa.Table:
        bits = ray.get(ref_c)
        if t.num_rows == 0:
            return union_schema.empty_table()
        md5s, _ = _valid_md5(t[col].to_pylist())  # null A rows match nothing
        if not len(md5s):
            return union_schema.empty_table()
        m = bloom_contains(bits, _probe_hash(md5s), k)
        md5s = pd.Series(md5s[m]).drop_duplicates().to_numpy(dtype=object)
        n = len(md5s)
        cols = [pa.nulls(n, f.type) for f in b_fields]
        cols += [pa.array(md5s, pa.string()),
                 pa.array(_parts(md5s)),
                 pa.array(np.zeros(n, dtype=bool))]
        return pa.table(cols, schema=union_schema)

    def b_keyed(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return union_schema.empty_table()
        md5s = _md5_hex(t[col].to_pylist())
        cols = [t[n].cast(f.type) for n, f in zip(b_names, b_fields)]
        cols += [pa.array(md5s, pa.string()),
                 pa.array(_parts(md5s)),
                 pa.array(np.ones(t.num_rows, dtype=bool))]
        return pa.table(cols, schema=union_schema)

    a_side = ds_a.map_batches(a_keys, batch_format="pyarrow")
    b_side = cands.map_batches(b_keyed, batch_format="pyarrow")

    # within a partition a candidate survives iff its md5 never appears
    # on the A side (exact anti-semantics; every md5 lands in one part).
    # The fold stays in Arrow end-to-end: a pandas group frame would
    # float64-ify B's int64 columns under the A side's null padding and
    # silently corrupt values above 2^53 (snowflake-style ids).
    import pyarrow.compute as pc

    b_schema = pa.schema(b_fields)

    def fold(g: pa.Table) -> pa.Table:
        is_b = pc.fill_null(g["_is_b"], False)
        a_md5 = pc.filter(g["_md5"], pc.invert(is_b)).combine_chunks()
        b = g.filter(is_b)
        keep = b.filter(pc.invert(
            pc.is_in(b["_md5"], value_set=a_md5)))
        return keep.select(b_names).cast(b_schema)

    survivors = (a_side.union(b_side)
                 .groupby("_part")
                 .map_groups(fold, batch_format="pyarrow"))
    return clean.union(survivors)
