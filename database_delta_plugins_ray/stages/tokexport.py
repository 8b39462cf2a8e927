"""Packed token-id binary export — the training-ready artifact an LLM
data pipeline actually feeds to a trainer: the corpus tokenized under a
trained BPE merge table, laid out as fixed-stride sequences of uint32
token ids in flat ``.bin`` shards plus a JSON manifest (the public
Megatron-LM ``indexed_dataset`` .bin/.idx idea, re-expressed with an
arithmetic index: fixed ``seq_tokens`` makes every sequence boundary a
pure offset computation, so no per-sequence index file is needed).

Scale shape (the whole point):

1. **Deterministic global order without a sort** — documents order by
   ``(md5_u64(key), key)``; md5 is uniform, so equal-width uint64 hash
   ranges give ~balanced buckets with ZERO driver passes (no min/max
   aggregate — the key domain is known). Bucket order == global order.
2. **Count pass** — one ``map_batches`` pass folds per-bucket
   ``(docs, tokens)`` partials (``nbuckets`` rows leave each batch; the
   exchange is a tiny groupby). The driver prefix-sums ``nbuckets``
   integers into each bucket's global token offset.
3. **Write pass** — ONE bucket shuffle; each task sorts only its own
   bucket, encodes it (merge ranks + token→id vocab broadcast once via
   ``ray.put``), and writes its contiguous token range to its own
   ``shard-<b>.bin`` via tmp+rename. Sequences are never materialized:
   shard ``b`` covers global tokens ``[start_b, start_b + n_b)`` and a
   reader slices any sequence by byte arithmetic across shards.
4. **Resumable** — a re-run skips every shard whose file already has
   exactly the expected byte size for the same run identity
   (``run.json`` stamps source_tag + params up front; a mismatch
   sweeps all existing shards AND the stale manifest before the write
   pass, so same-size shards from a different corpus can never be
   republished); the manifest commits last (tmp+rename), so a crashed
   export re-runs only the missing shards.

Every document contributes its subword ids followed by ONE ``<eod>``
(id 1); subwords outside the vocabulary map to ``<unk>`` (id 0). The
layout is bit-identical at any parallelism (integer-only math, total
orders everywhere).

No counterpart in the reference (it replicates source rows, never
tokenizes); the format is cited to the public Megatron-LM repo and the
BPE training to Sennrich et al. 2016 (arXiv:1508.07909) only.
"""
from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

__all__ = ["build_token_vocab", "export_packed_tokens",
           "read_sequences", "read_packed_dataset", "num_sequences",
           "UNK_ID", "EOD_ID"]

UNK_ID = 0
EOD_ID = 1
_SPECIALS = ["<unk>", "<eod>"]
_DTYPE = np.dtype("<u4")  # little-endian uint32: vocab up to 2^32


def _make_segmenter(spec):
    """``(kind, model)`` → a ``word -> tuple[str, ...]`` callable.
    ``kind='bpe'``: model is the BPE merge table; ``kind='unigram'``:
    the trained unigram vocabulary (``stages/unigram.py``). Built once
    per batch from the broadcast model frame (dict build over a
    vocabulary-bounded table — microseconds, the stateless-task-pool
    convention)."""
    kind, model = spec
    if kind == "bpe":
        from .bpe import _encode_word, _merge_ranks

        ranks = _merge_ranks(model)
        return lambda w: _encode_word(w, ranks)
    if kind == "unigram":
        from .unigram import _viterbi_word

        pieces = model["piece"].tolist()
        logp = model["logprob"].tolist()
        vb = {p: i for i, p in enumerate(pieces)}
        max_len = max((len(p) for p in pieces), default=1)
        return lambda w: _viterbi_word(w, vb, logp, pieces, max_len)
    raise ValueError(f"unknown tokenizer kind {kind!r} (bpe, unigram)")


def build_token_vocab(hist: pd.DataFrame, merges: pd.DataFrame
                      ) -> pd.DataFrame:
    """Deterministic ``(token, id)`` table from a word histogram and a
    trained merge table: every subword the encoder can emit on the
    training corpus, lexicographic order, ids from 2 (after the
    specials). The histogram is vocabulary-bounded (Zipf), so this is
    a driver-side pass over distinct words, never the corpus."""
    return build_token_vocab_spec(hist, ("bpe", merges))


def build_token_vocab_spec(hist: pd.DataFrame, tokenizer) -> pd.DataFrame:
    """``build_token_vocab`` for either tokenizer family: segment the
    distinct histogram words with the spec'd segmenter and collect
    every emitted subword."""
    seg = _make_segmenter(tokenizer)
    seen: set[str] = set()
    for w in hist["word"]:
        seen.update(seg(w))
    # a segmenter may emit its own '<unk>' (unigram Viterbi on a char
    # outside the trained pieces): that's the special at id 0, never a
    # learned token — a duplicate row would shadow UNK_ID in tok2id
    seen.difference_update(_SPECIALS)
    toks = _SPECIALS + sorted(seen)
    return pd.DataFrame({
        "token": pd.Series(toks, dtype=object),
        "id": pd.Series(range(len(toks)), dtype="int64"),
    })


def _encode_ids(texts: pd.Series, seg, tok2id: dict
                ) -> tuple[np.ndarray, np.ndarray]:
    """Token-id stream of a batch: ``(ids uint32 — each doc's subwords
    followed by one EOD, per_doc_counts int64 incl. the EOD)``. One
    encode per DISTINCT word via the ``seg`` segmenter callable
    (either tokenizer family), then a vectorized ragged gather."""
    from ..functions.text import _flat_lower_tokens

    flat, doc_idx, lens = _flat_lower_tokens(texts.reset_index(drop=True))
    n_docs = len(texts)
    if len(flat) == 0:
        ids = np.full(n_docs, EOD_ID, dtype=_DTYPE)
        return ids, np.ones(n_docs, dtype=np.int64)
    uniq, inv = np.unique(flat.astype(str), return_inverse=True)
    enc = [np.array([tok2id.get(s, UNK_ID) for s in seg(w)],
                    dtype=_DTYPE) for w in uniq]
    ulen = np.array([len(e) for e in enc], dtype=np.int64)
    uenc = np.concatenate(enc) if enc else np.empty(0, dtype=_DTYPE)
    ustart = np.zeros(len(enc), dtype=np.int64)
    np.cumsum(ulen[:-1], out=ustart[1:])
    # ragged gather: word j expands to uenc[ustart[inv_j] : +ulen[inv_j]]
    wl = ulen[inv]
    out_len = int(wl.sum())
    ends = np.cumsum(wl)
    idx = (np.arange(out_len, dtype=np.int64)
           - np.repeat(ends - wl, wl) + np.repeat(ustart[inv], wl))
    word_ids = uenc[idx]
    # per-doc subword totals, then one EOD after each doc
    per_doc = np.zeros(n_docs, dtype=np.int64)
    np.add.at(per_doc, doc_idx, wl)
    doc_ends = np.cumsum(per_doc)
    ids = np.insert(word_ids, doc_ends, _DTYPE.type(EOD_ID))
    return ids.astype(_DTYPE, copy=False), per_doc + 1


def _keys_of(df: pd.DataFrame, key_cols) -> np.ndarray:
    k = df[key_cols[0]].astype(str)
    for c in key_cols[1:]:
        k = k + "|" + df[c].astype(str)
    return k.to_numpy(dtype=object)


def _buckets_of(keys: np.ndarray, nbuckets: int) -> np.ndarray:
    from .sample import md5_u64

    width = (1 << 64) // nbuckets + 1  # ceil so b < nbuckets always
    return (md5_u64(keys) // np.uint64(width)).astype(np.int64)


# ---------------------------------------------------------------------------
# shared count/encode/write machinery — export_packed_tokens AND
# refresh_packed_tokens build from THESE helpers, so the refresh's
# byte-parity contract ("refresh == full re-pack") can't drift out of
# lockstep with the export's counting or sort-and-encode rules
# ---------------------------------------------------------------------------


def _seg_doc_token_counts(texts: pd.Series, seg) -> np.ndarray:
    """Per-document subword counts under ``seg`` (EOD not included)."""
    from ..functions.text import _flat_lower_tokens

    flat, di, _ = _flat_lower_tokens(texts.reset_index(drop=True))
    out = np.zeros(len(texts), dtype=np.int64)
    if len(flat):
        uniq, inv = np.unique(flat.astype(str), return_inverse=True)
        per = np.fromiter((len(seg(w)) for w in uniq),
                          dtype=np.int64, count=len(uniq))
        np.add.at(out, di, per[inv])
    return out


def _bucket_count_partial(df: pd.DataFrame, key_cols, text_col: str,
                          nbuckets: int, spec_ref) -> pd.DataFrame:
    """Per-batch (bucket, tokens-incl-EOD, docs) partial."""
    import ray

    if df.empty:
        return pd.DataFrame({"__b": pd.Series([], dtype=np.int64),
                             "nt": pd.Series([], dtype=np.int64),
                             "nd": pd.Series([], dtype=np.int64)})
    b = _buckets_of(_keys_of(df, key_cols), nbuckets)
    seg = _make_segmenter(ray.get(spec_ref))
    tok = _seg_doc_token_counts(
        df[text_col].reset_index(drop=True), seg) + 1  # + EOD
    nt = np.zeros(nbuckets, dtype=np.int64)
    nd = np.zeros(nbuckets, dtype=np.int64)
    np.add.at(nt, b, tok)
    np.add.at(nd, b, 1)
    present = np.flatnonzero(nd != 0)
    return pd.DataFrame({"__b": present, "nt": nt[present],
                         "nd": nd[present]})


def _attach_buckets(df: pd.DataFrame, key_cols, nbuckets: int
                    ) -> pd.DataFrame:
    out = df.copy()
    out["__b"] = _buckets_of(_keys_of(df, key_cols), nbuckets)
    return out


def _wrote_schema():
    import pyarrow as pa

    return pa.schema([("bucket", pa.int64()), ("skipped", pa.bool_())])


def _write_bucket_shard(g: pd.DataFrame, out_dir: str, key_cols,
                        text_col: str, n_tok: np.ndarray, spec_ref,
                        tok2id_ref, skip_if_sized: bool) -> "pa.Table":
    """Sort one bucket's rows into md5 document order, encode, write
    tmp+rename. ``skip_if_sized`` enables the export's size-based
    resume skip (the refresh must always rewrite its dirty buckets —
    the old file can coincide in size with different content)."""
    import pyarrow as pa
    import ray

    from .sample import md5_u64

    schema = _wrote_schema()
    if g.empty:  # pinned schema for Ray's empty group blocks
        return schema.empty_table()
    b = int(g["__b"].iloc[0])
    path = os.path.join(out_dir, f"shard-{b:05d}.bin")
    expect = int(n_tok[b]) * _DTYPE.itemsize
    if (skip_if_sized and os.path.exists(path)
            and os.path.getsize(path) == expect):
        return pa.table({"bucket": [b], "skipped": [True]},
                        schema=schema)
    keys = _keys_of(g, key_cols)
    o = np.lexsort((keys, md5_u64(keys)))
    ids, _ = _encode_ids(
        g[text_col].iloc[o].reset_index(drop=True),
        _make_segmenter(ray.get(spec_ref)), ray.get(tok2id_ref))
    assert ids.nbytes == expect, (b, ids.nbytes, expect)
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(ids.tobytes())
    os.replace(tmp, path)
    return pa.table({"bucket": [b], "skipped": [False]}, schema=schema)


def export_packed_tokens(ds, out_dir: str, merges: pd.DataFrame | None,
                         vocab: pd.DataFrame, *, seq_tokens: int = 2048,
                         nbuckets: int = 64,
                         key_cols=("doc_id",), text_col: str = "text",
                         source_tag: str = "",
                         tokenizer=None) -> dict:
    """Tokenize + pack a documents Dataset into ``shard-<b>.bin`` files
    under ``out_dir``; returns (and persists) the manifest. See the
    module docstring for the layout and scale contract.

    ``tokenizer`` selects the subword family: ``None`` / omitted keeps
    the BPE default (``merges`` is the model); pass
    ``("unigram", vocab_df)`` (from ``stages.unigram.train_unigram``)
    to pack with the unigram-LM Viterbi segmentation instead — same
    layout, manifest and read paths."""
    import ray
    from ray.data.aggregate import Sum

    from .bpe import save_merges

    spec = tokenizer if tokenizer is not None else ("bpe", merges)
    tok_kind = spec[0]
    # the trained MODEL is part of the run identity: re-exporting with a
    # different vocab size / merge count at the same source watermark
    # must re-pack, not serve the previous model's shards
    import hashlib

    if tok_kind == "bpe":
        model_rows = [(l, r) for l, r in zip(spec[1]["left"],
                                             spec[1]["right"])]
    else:
        model_rows = [(p, int(c)) for p, c in zip(spec[1]["piece"],
                                                  spec[1]["q_count"])]
    model_tag = hashlib.md5(
        repr((tok_kind, model_rows)).encode()).hexdigest()

    os.makedirs(out_dir, exist_ok=True)
    man_p = os.path.join(out_dir, "manifest.json")
    if os.path.exists(man_p):
        with open(man_p) as fh:
            m = json.load(fh)
        # key_cols/text_col are part of the run identity too: the same
        # source and model re-bucketed by different keys is a DIFFERENT
        # pack (refresh_packed_tokens routes dirty docs by key), so the
        # fast path must not serve the stale layout
        if (m.get("source_tag") == source_tag
                and m.get("seq_tokens") == seq_tokens
                and m.get("nbuckets") == nbuckets
                and m.get("tokenizer", "bpe") == tok_kind
                and m.get("model_tag") == model_tag
                and m.get("key_cols") == list(key_cols)
                and m.get("text_col") == text_col):
            return m

    # the size-based shard skip below is valid ONLY within one run
    # identity: a different source_tag/params means every existing
    # shard is stale, even when its byte size coincides with the new
    # expected size. Stamp the identity first and sweep on mismatch
    # (the stale manifest goes too, so a crash mid-sweep can never
    # advertise shards that were just deleted).
    run_p = os.path.join(out_dir, "run.json")
    run_id = {"source_tag": source_tag, "seq_tokens": int(seq_tokens),
              "nbuckets": int(nbuckets), "key_cols": list(key_cols),
              "text_col": text_col, "tokenizer": tok_kind,
              "model_tag": model_tag}
    prev = None
    if os.path.exists(run_p):
        try:
            with open(run_p) as fh:
                prev = json.load(fh)
        except (ValueError, OSError):
            prev = None
    if prev != run_id:
        if os.path.exists(man_p):
            os.remove(man_p)
        for f in os.listdir(out_dir):
            if f.startswith("shard-") and f.endswith(".bin"):
                os.remove(os.path.join(out_dir, f))
        with open(run_p + ".tmp", "w") as fh:
            json.dump(run_id, fh)
        os.replace(run_p + ".tmp", run_p)

    key_cols = list(key_cols)
    tok2id = dict(zip(vocab["token"], vocab["id"].astype(int)))
    spec_ref = ray.put(spec)
    tok2id_ref = ray.put(tok2id)

    # ---- pass 1: per-bucket (docs, tokens-incl-EOD) partials --------
    def bucket_counts(df: pd.DataFrame) -> pd.DataFrame:
        return _bucket_count_partial(df, key_cols, text_col, nbuckets,
                                     spec_ref)

    parts = (ds.map_batches(bucket_counts, batch_format="pandas")
             .groupby("__b")
             .aggregate(Sum("nt", alias_name="nt"),
                        Sum("nd", alias_name="nd"))
             .to_pandas())
    n_tok = np.zeros(nbuckets, dtype=np.int64)
    n_doc = np.zeros(nbuckets, dtype=np.int64)
    if len(parts):
        n_tok[parts["__b"].to_numpy()] = parts["nt"].to_numpy()
        n_doc[parts["__b"].to_numpy()] = parts["nd"].to_numpy()
    starts = np.cumsum(n_tok) - n_tok  # exclusive prefix: token offsets
    total_tokens = int(n_tok.sum())

    # ---- pass 2: bucket shuffle, sort + encode + write each shard ---
    def attach(df: pd.DataFrame) -> pd.DataFrame:
        return _attach_buckets(df, key_cols, nbuckets)

    def write_bucket(g: pd.DataFrame) -> "pa.Table":
        return _write_bucket_shard(g, out_dir, key_cols, text_col,
                                   n_tok, spec_ref, tok2id_ref,
                                   skip_if_sized=True)

    wrote = (ds.map_batches(attach, batch_format="pandas")
             .groupby("__b")
             .map_groups(write_bucket, batch_format="pandas")
             .to_pandas())  # <= nbuckets single-int rows
    written = set(wrote["bucket"].tolist()) if len(wrote) else set()
    # empty buckets never reach write_bucket: publish their 0-byte shard
    for b in np.flatnonzero(n_tok == 0):
        p = os.path.join(out_dir, f"shard-{int(b):05d}.bin")
        if not os.path.exists(p):
            open(p + ".tmp", "wb").close()
            os.replace(p + ".tmp", p)
    missing = [int(b) for b in range(nbuckets)
               if n_tok[b] > 0 and b not in written]
    if missing:
        raise RuntimeError(f"buckets never materialized: {missing}")

    if tok_kind == "bpe":
        save_merges(merges, os.path.join(out_dir, "tokenizer.json"))
    else:
        from .unigram import save_vocab

        save_vocab(spec[1], os.path.join(out_dir, "tokenizer.json"))
    vp = os.path.join(out_dir, "vocab.json")
    with open(vp + ".tmp", "w") as fh:
        json.dump({"format": "tok-vocab-v1",
                   "tokens": vocab["token"].tolist()}, fh)
    os.replace(vp + ".tmp", vp)
    manifest = {
        "format": "packed-tokens-v1", "source_tag": source_tag,
        "tokenizer": tok_kind, "model_tag": model_tag,
        "key_cols": list(key_cols), "text_col": text_col,
        "dtype": "uint32", "seq_tokens": int(seq_tokens),
        "nbuckets": int(nbuckets), "total_tokens": total_tokens,
        "total_docs": int(n_doc.sum()),
        "n_sequences": total_tokens // int(seq_tokens),
        "shards": [{"bucket": int(b), "start_token": int(starts[b]),
                    "n_tokens": int(n_tok[b]), "n_docs": int(n_doc[b])}
                   for b in range(nbuckets)],
    }
    with open(man_p + ".tmp", "w") as fh:
        json.dump(manifest, fh)
    os.replace(man_p + ".tmp", man_p)
    return manifest


def num_sequences(out_dir: str) -> int:
    with open(os.path.join(out_dir, "manifest.json")) as fh:
        return int(json.load(fh)["n_sequences"])


def read_sequences(out_dir: str, seq_ids) -> np.ndarray:
    """Fetch training sequences by id: ``(len(seq_ids), seq_tokens)``
    uint32. Pure byte arithmetic over the manifest — reads ONLY the
    shards (and byte ranges) each sequence touches; a trainer's data
    loader does exactly this per rank."""
    with open(os.path.join(out_dir, "manifest.json")) as fh:
        m = json.load(fh)
    s = int(m["seq_tokens"])
    starts = np.array([sh["start_token"] for sh in m["shards"]],
                      dtype=np.int64)
    lens = np.array([sh["n_tokens"] for sh in m["shards"]],
                    dtype=np.int64)
    out = np.empty((len(seq_ids), s), dtype=_DTYPE)
    for row, sid in enumerate(seq_ids):
        if not 0 <= sid < m["n_sequences"]:
            raise IndexError(f"sequence {sid} of {m['n_sequences']}")
        t0, need, filled = sid * s, s, 0
        while need:
            b = int(np.searchsorted(starts, t0, side="right") - 1)
            while lens[b] == 0 or t0 >= starts[b] + lens[b]:
                b += 1  # skip empty buckets at the boundary
            off = t0 - int(starts[b])
            take = min(need, int(lens[b]) - off)
            with open(os.path.join(out_dir, f"shard-{b:05d}.bin"),
                      "rb") as fh:
                fh.seek(off * _DTYPE.itemsize)
                chunk = np.frombuffer(fh.read(take * _DTYPE.itemsize),
                                      dtype=_DTYPE)
            out[row, filled:filled + take] = chunk
            filled += take
            t0 += take
            need -= take
    return out


def read_packed_dataset(out_dir: str, *,
                        sequences_per_block: int = 4096):
    """The packed corpus as a Ray Dataset of training sequences —
    ``(seq_id: int64, tokens: fixed_size_list<uint32>[seq_tokens])`` —
    the distributed counterpart of :func:`read_sequences` (which a
    single trainer rank calls). Each block materializes ONE contiguous
    sequence range via byte arithmetic over the manifest: a task reads
    exactly its own token span (plus at most one shard-boundary seek),
    so a full-corpus scan streams every shard once with no overlap, and
    a downstream ``random_shuffle``/``limit`` behaves like any Dataset.
    Block size is ``sequences_per_block`` sequences (tune to worker
    heap: block bytes = sequences_per_block × seq_tokens × 4)."""
    import pyarrow as pa
    import ray.data

    with open(os.path.join(out_dir, "manifest.json")) as fh:
        m = json.load(fh)
    n, s = int(m["n_sequences"]), int(m["seq_tokens"])
    starts = [int(sh["start_token"]) for sh in m["shards"]]
    lens = [int(sh["n_tokens"]) for sh in m["shards"]]

    items = [{"lo": lo, "hi": min(lo + sequences_per_block, n)}
             for lo in range(0, n, sequences_per_block)]

    def load(batch: pa.Table) -> pa.Table:
        st = np.asarray(starts, dtype=np.int64)
        ln = np.asarray(lens, dtype=np.int64)
        out_tables = []
        for lo, hi in zip(batch["lo"].to_pylist(), batch["hi"].to_pylist()):
            t0, t1 = lo * s, hi * s
            flat = np.empty(t1 - t0, dtype=_DTYPE)
            filled, pos = 0, t0
            while pos < t1:
                b = int(np.searchsorted(st, pos, side="right") - 1)
                while ln[b] == 0 or pos >= st[b] + ln[b]:
                    b += 1  # skip empty buckets at the boundary
                off = pos - int(st[b])
                take = min(t1 - pos, int(ln[b]) - off)
                # a partial corpus-tail sequence is DROPPED, not padded:
                # the manifest floors n_sequences = total_tokens //
                # seq_tokens, so t1 <= total_tokens always and every
                # read here is fully inside some shard
                with open(os.path.join(out_dir, f"shard-{b:05d}.bin"),
                          "rb") as fh:
                    fh.seek(off * _DTYPE.itemsize)
                    chunk = np.frombuffer(
                        fh.read(take * _DTYPE.itemsize), dtype=_DTYPE)
                if len(chunk) != take:  # truncated/corrupt shard file
                    raise IOError(
                        f"shard-{b:05d}.bin ended {take - len(chunk)} "
                        f"tokens early vs manifest (offset {off})")
                flat[filled:filled + take] = chunk
                filled += take
                pos += take
            out_tables.append(pa.table({
                "seq_id": pa.array(range(lo, hi), pa.int64()),
                "tokens": pa.FixedSizeListArray.from_arrays(
                    pa.array(flat, pa.uint32()), s),
            }))
        return pa.concat_tables(out_tables) if out_tables else pa.table({
            "seq_id": pa.array([], pa.int64()),
            "tokens": pa.array([], pa.list_(pa.uint32(), s))})

    return (ray.data.from_items(items)
            .map_batches(load, batch_format="pyarrow", batch_size=1))


def load_tokenizer(out_dir: str):
    """(kind, model) spec from a pack's persisted ``tokenizer.json`` —
    one read, dispatched on the artifact format tag."""
    p = os.path.join(out_dir, "tokenizer.json")
    with open(p) as fh:
        obj = json.load(fh)
    fmt = obj.get("format")
    if fmt == "bpe-merges-v1":
        from .bpe import load_merges

        return ("bpe", load_merges(p, obj=obj))
    if fmt == "unigram-vocab-v1":
        from .unigram import load_vocab

        return ("unigram", load_vocab(p, obj=obj))
    raise ValueError(f"unknown tokenizer artifact format {fmt!r}")


def refresh_packed_tokens(lake_dir: str, out_dir: str, *,
                          key_cols=("repo", "path"),
                          text_col: str = "content") -> dict:
    """Bring a lake's packed-token export current off the change data
    feed — the token-level counterpart of ``export_lake_incremental``:
    only the buckets TOUCHED by changed keys re-encode and rewrite.

    The tokenizer is FROZEN at its original training (loaded back from
    the pack's own ``tokenizer.json``): token ids stay stable across
    increments — the standard corpus-maintenance contract (retraining
    is a deliberate full re-export, which the model-tag identity then
    forces through cleanly).

    Cost model: ``lake_diff(g0)`` is partition-local (history lakes);
    dirty buckets fold to the driver as a ≤ ``nbuckets`` id set; ONE
    filtered pass over the lake's live rows recounts and re-encodes
    only those buckets (each bucket's byte stream is independent — md5
    document order is per-bucket, so untouched shard FILES are reused
    byte-identically and only the manifest's start offsets shift).
    Crash-safe: shard writes are tmp+rename and the manifest commits
    last, so a partial refresh re-runs idempotently off the OLD
    watermark."""
    import ray
    from ray.data.aggregate import Sum

    from ..pipelines.replicate import final_state, lake_diff
    from ..state import checkpoint as ckpt

    man_p = os.path.join(out_dir, "manifest.json")
    with open(man_p) as fh:
        manifest = json.load(fh)
    tag = manifest.get("source_tag", "")
    if not tag.startswith("lake@"):
        raise ValueError(
            f"not a lake-tagged pack (source_tag={tag!r}); only packs "
            f"built from a lake can refresh")
    # the pack's recorded identity is authoritative for key/text
    # columns: a caller-supplied mismatch would re-bucket dirty shards
    # under a DIFFERENT rule than the untouched ones — a silently
    # inconsistent corpus, so it's rejected loudly
    run_p = os.path.join(out_dir, "run.json")
    run_id = None
    try:
        with open(run_p) as fh:
            run_id = json.load(fh)
    except (OSError, ValueError):
        pass
    if run_id is not None:
        rec_keys = tuple(run_id.get("key_cols", ()))
        rec_text = run_id.get("text_col")
        if rec_keys and tuple(key_cols) != rec_keys:
            raise ValueError(
                f"key_cols {tuple(key_cols)!r} do not match the pack's "
                f"recorded identity {rec_keys!r}")
        if rec_text and text_col != rec_text:
            raise ValueError(
                f"text_col {text_col!r} does not match the pack's "
                f"recorded identity {rec_text!r}")

    def _sync_run_tag(new_tag: str) -> None:
        if run_id is None:
            return
        run_id["source_tag"] = new_tag
        with open(run_p + ".tmp", "w") as fh:
            json.dump(run_id, fh)
        os.replace(run_p + ".tmp", run_p)

    g0 = int(tag.split("@", 1)[1])
    g1 = int(ckpt.read_global_watermark(lake_dir))
    if g1 <= g0:
        return dict(manifest, skipped=True, rewritten_buckets=0)

    nbuckets = int(manifest["nbuckets"])
    seq_tokens = int(manifest["seq_tokens"])
    key_cols = list(key_cols)
    spec = load_tokenizer(out_dir)
    with open(os.path.join(out_dir, "vocab.json")) as fh:
        vocab_tokens = json.load(fh)["tokens"]
    tok2id = {t: i for i, t in enumerate(vocab_tokens)}
    spec_ref = ray.put(spec)
    tok2id_ref = ray.put(tok2id)

    # ---- dirty buckets from the change feed (driver: ≤ nbuckets ints)
    def diff_buckets(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"b": pd.Series([], dtype=np.int64)})
        b = np.unique(_buckets_of(_keys_of(df, key_cols), nbuckets))
        return pd.DataFrame({"b": b})

    dirty = sorted({int(r["b"]) for r in
                    lake_diff(lake_dir, g0)
                    .map_batches(diff_buckets, batch_format="pandas")
                    .take_all()})
    if not dirty:
        new_tag = f"lake@{g1}"
        _sync_run_tag(new_tag)  # keep both identities coherent
        manifest = dict(manifest, source_tag=new_tag, skipped=False,
                        rewritten_buckets=0)
        with open(man_p + ".tmp", "w") as fh:
            json.dump(manifest, fh)
        os.replace(man_p + ".tmp", man_p)
        return manifest

    # one streaming pass over the live rows; only the (small) dirty
    # subset materializes for its two consumers (count + write)
    ds = final_state(lake_dir, columns=[*key_cols, text_col])

    def only_dirty(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df
        b = _buckets_of(_keys_of(df, key_cols), nbuckets)
        return df[np.isin(b, dirty)]

    dirty_rows = ds.map_batches(only_dirty,
                                batch_format="pandas").materialize()

    # ---- recount the dirty buckets (the export's own count partial) --
    def bucket_counts(df: pd.DataFrame) -> pd.DataFrame:
        return _bucket_count_partial(df, key_cols, text_col, nbuckets,
                                     spec_ref)

    parts = (dirty_rows.map_batches(bucket_counts, batch_format="pandas")
             .groupby("__b")
             .aggregate(Sum("nt", alias_name="nt"),
                        Sum("nd", alias_name="nd"))
             .to_pandas())
    n_tok = np.zeros(nbuckets, dtype=np.int64)
    n_doc = np.zeros(nbuckets, dtype=np.int64)
    for s in manifest["shards"]:
        n_tok[int(s["bucket"])] = int(s["n_tokens"])
        n_doc[int(s["bucket"])] = int(s["n_docs"])
    n_tok[dirty] = 0
    n_doc[dirty] = 0
    if len(parts):
        n_tok[parts["__b"].to_numpy(np.int64)] = parts["nt"].to_numpy()
        n_doc[parts["__b"].to_numpy(np.int64)] = parts["nd"].to_numpy()
    starts = np.cumsum(n_tok) - n_tok
    total_tokens = int(n_tok.sum())

    # ---- rewrite ONLY the dirty shard files (same machinery as the
    # export; skip_if_sized=False — a dirty bucket must rewrite even if
    # the old file coincides in size with different content) ----------
    def attach(df: pd.DataFrame) -> pd.DataFrame:
        return _attach_buckets(df, key_cols, nbuckets)

    def write_bucket(g: pd.DataFrame) -> "pa.Table":
        return _write_bucket_shard(g, out_dir, key_cols, text_col,
                                   n_tok, spec_ref, tok2id_ref,
                                   skip_if_sized=False)

    wrote = (dirty_rows.map_batches(attach, batch_format="pandas")
             .groupby("__b")
             .map_groups(write_bucket, batch_format="pandas")
             .to_pandas())
    written = set(wrote["bucket"].tolist()) if len(wrote) else set()
    # a dirty bucket with NO remaining live rows (all its keys deleted)
    # never reaches write_bucket: publish its empty shard — but ONLY
    # when the recount agrees it is empty; a non-empty dirty bucket
    # missing from the write pass is a fault, never a truncation
    missing = [b for b in dirty if b not in written]
    bad = [b for b in missing if n_tok[b] > 0]
    if bad:
        raise RuntimeError(f"dirty buckets never materialized: {bad}")
    for b in missing:
        p = os.path.join(out_dir, f"shard-{b:05d}.bin")
        open(p + ".tmp", "wb").close()
        os.replace(p + ".tmp", p)

    new_tag = f"lake@{g1}"
    _sync_run_tag(new_tag)  # keep the run identity coherent
    manifest = dict(
        manifest, source_tag=new_tag, total_tokens=total_tokens,
        total_docs=int(n_doc.sum()),
        n_sequences=total_tokens // seq_tokens,
        rewritten_buckets=len(dirty), skipped=False,
        shards=[{"bucket": int(b), "start_token": int(starts[b]),
                 "n_tokens": int(n_tok[b]), "n_docs": int(n_doc[b])}
                for b in range(nbuckets)])
    with open(man_p + ".tmp", "w") as fh:
        json.dump(manifest, fh)
    os.replace(man_p + ".tmp", man_p)
    return manifest
