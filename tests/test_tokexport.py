"""Packed token-id export gates: byte parity vs a single-process
reference, arithmetic sequence reads, parallelism invariance, and
shard-level resume."""
import json
import os
import shutil

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
OUT = "/tmp/ddpr_test/tokexport"


def _docs():
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(SF_DIR, "documents.parquet"),
                      columns=["doc_id", "text"])
    return t.to_pandas()


def _trained(df):
    import collections
    import re

    from database_delta_plugins_ray.stages.bpe import train_bpe
    from database_delta_plugins_ray.stages.tokexport import (
        build_token_vocab)

    tok = re.compile(r"[A-Za-z0-9_]+")
    wc = collections.Counter()
    for t in df["text"]:
        wc.update(tok.findall((t or "").lower()))
    hist = pd.DataFrame(sorted(wc.items(), key=lambda kv: (-kv[1], kv[0])),
                        columns=["word", "cnt"])
    merges = train_bpe(dict(wc), 40)
    return hist, merges, build_token_vocab(hist, merges)


def reference_stream(df, merges, vocab):
    """Single-process token stream in the export's global order."""
    from database_delta_plugins_ray.stages.bpe import (
        _encode_word, _merge_ranks)
    from database_delta_plugins_ray.stages.sample import md5_u64
    from database_delta_plugins_ray.stages.tokexport import EOD_ID, UNK_ID

    ranks = _merge_ranks(merges)
    tok2id = dict(zip(vocab["token"], vocab["id"].astype(int)))
    keys = df["doc_id"].astype(str).to_numpy(dtype=object)
    order = np.lexsort((keys, md5_u64(keys)))
    import re

    tok = re.compile(r"[A-Za-z0-9_]+")
    out = []
    for i in order:
        for w in tok.findall((df["text"].iloc[i] or "").lower()):
            out.extend(tok2id.get(s, UNK_ID)
                       for s in _encode_word(w, ranks))
        out.append(EOD_ID)
    return np.array(out, dtype="<u4")


def _export(ds, merges, vocab, out_dir, tag="t1", **kw):
    from database_delta_plugins_ray.stages.tokexport import (
        export_packed_tokens)

    return export_packed_tokens(ds, out_dir, merges, vocab,
                                seq_tokens=64, nbuckets=8,
                                key_cols=("doc_id",), text_col="text",
                                source_tag=tag, **kw)


def _shard_stream(out_dir, manifest):
    chunks = []
    for sh in manifest["shards"]:
        p = os.path.join(out_dir, f"shard-{sh['bucket']:05d}.bin")
        chunks.append(np.fromfile(p, dtype="<u4"))
        assert len(chunks[-1]) == sh["n_tokens"]
    return np.concatenate(chunks)


@pytest.fixture(scope="module")
def exported(ray_session):
    import ray.data

    shutil.rmtree(OUT, ignore_errors=True)
    df = _docs()
    hist, merges, vocab = _trained(df)
    ds = ray.data.from_pandas(df).repartition(6)
    m = _export(ds, merges, vocab, OUT)
    return df, merges, vocab, m


def test_byte_parity_vs_reference(exported):
    df, merges, vocab, m = exported
    ref = reference_stream(df, merges, vocab)
    got = _shard_stream(OUT, m)
    assert m["total_tokens"] == len(ref)
    assert m["total_docs"] == len(df)
    np.testing.assert_array_equal(got, ref)


def test_read_sequences_arithmetic(exported):
    from database_delta_plugins_ray.stages.tokexport import (
        num_sequences, read_sequences)

    df, merges, vocab, m = exported
    ref = reference_stream(df, merges, vocab)
    n = num_sequences(OUT)
    assert n == len(ref) // 64 and n > 3
    probe = [0, 1, n // 2, n - 1]
    got = read_sequences(OUT, probe)
    for row, sid in enumerate(probe):
        np.testing.assert_array_equal(got[row],
                                      ref[sid * 64:(sid + 1) * 64])
    with pytest.raises(IndexError):
        read_sequences(OUT, [n])


def test_parallelism_invariance(exported, ray_session):
    import ray.data

    df, merges, vocab, m = exported
    out2 = OUT + "_p2"
    shutil.rmtree(out2, ignore_errors=True)
    m2 = _export(ray.data.from_pandas(df).repartition(2),
                 merges, vocab, out2)
    np.testing.assert_array_equal(_shard_stream(OUT, m),
                                  _shard_stream(out2, m2))
    assert m2["shards"] == m["shards"]


def test_resume_skips_finished_shards(exported, ray_session):
    import ray.data

    df, merges, vocab, m = exported
    out3 = OUT + "_resume"
    shutil.rmtree(out3, ignore_errors=True)
    m3 = _export(ray.data.from_pandas(df).repartition(4),
                 merges, vocab, out3)
    # crash simulation: drop the manifest and ONE shard, keep the rest
    os.remove(os.path.join(out3, "manifest.json"))
    victim = next(sh["bucket"] for sh in m3["shards"]
                  if sh["n_tokens"] > 0)
    os.remove(os.path.join(out3, f"shard-{victim:05d}.bin"))
    kept = {f: os.path.getmtime(os.path.join(out3, f))
            for f in os.listdir(out3) if f.endswith(".bin")}
    m4 = _export(ray.data.from_pandas(df).repartition(4),
                 merges, vocab, out3)
    assert m4["shards"] == m3["shards"]
    for f, t in kept.items():
        assert os.path.getmtime(os.path.join(out3, f)) == t  # untouched
    np.testing.assert_array_equal(_shard_stream(out3, m4),
                                  _shard_stream(OUT, m))
    # same tag + intact manifest: the whole export is a no-op read
    m5 = _export(ray.data.from_pandas(df), merges, vocab, out3)
    assert m5 == m4


def test_eod_and_unk_semantics(ray_session):
    import ray.data

    from database_delta_plugins_ray.stages.tokexport import (
        EOD_ID, UNK_ID, build_token_vocab, export_packed_tokens)
    from database_delta_plugins_ray.stages.bpe import train_bpe

    # vocab trained WITHOUT 'z': unseen chars at export map to <unk>
    hist = pd.DataFrame({"word": ["ab", "cd"], "cnt": [5, 4]})
    merges = train_bpe({"ab": 5, "cd": 4}, 10)
    vocab = build_token_vocab(hist, merges)
    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": ["ab ab", "zz", None]})
    out = "/tmp/ddpr_test/tokexport_unk"
    shutil.rmtree(out, ignore_errors=True)
    m = export_packed_tokens(
        ray.data.from_pandas(df), out, merges, vocab, seq_tokens=4,
        nbuckets=4, key_cols=("doc_id",), text_col="text",
        source_tag="unk")
    stream = _shard_stream(out, m)
    assert m["total_docs"] == 3
    assert (stream == EOD_ID).sum() == 3  # one EOD per doc, null incl.
    assert (stream == UNK_ID).sum() > 0  # 'zz' has no vocab entry
    # every id is in-vocab
    assert stream.max() < len(vocab)


def test_query_entry_runs(ray_session):
    from database_delta_plugins_ray.pipelines.analytics import (
        export_documents_tokens)

    out = export_documents_tokens(SF_DIR)
    assert (out["n_tokens"] >= out["n_docs"]).all()
    assert out["n_docs"].sum() > 0
    # start_token is the exclusive prefix of n_tokens in bucket order
    np.testing.assert_array_equal(
        out["start_token"].to_numpy(),
        np.cumsum(out["n_tokens"].to_numpy())
        - out["n_tokens"].to_numpy())


def test_read_packed_dataset_full_scan_parity(exported, ray_session):
    """The Ray Dataset reader streams every sequence exactly once and
    each block's rows equal the rank-loader's byte arithmetic."""
    from database_delta_plugins_ray.stages.tokexport import (
        num_sequences, read_packed_dataset, read_sequences)

    df, merges, vocab, m = exported
    n = num_sequences(OUT)
    ds = read_packed_dataset(OUT, sequences_per_block=3)
    rows = ds.take_all()
    assert len(rows) == n
    assert sorted(r["seq_id"] for r in rows) == list(range(n))
    got = {r["seq_id"]: np.asarray(r["tokens"], dtype=np.uint32)
           for r in rows}
    want = read_sequences(OUT, list(range(n)))
    for sid in range(n):
        np.testing.assert_array_equal(got[sid], want[sid])


def test_changed_tag_sweeps_same_size_shards(exported, ray_session):
    """A re-export under a DIFFERENT source_tag must not honor the
    size-based shard skip: a stale shard with a coincidentally equal
    byte size would otherwise be republished under the new manifest."""
    import ray.data

    df, merges, vocab, m = exported
    out = OUT + "_retag"
    shutil.rmtree(out, ignore_errors=True)
    m1 = _export(ray.data.from_pandas(df).repartition(4),
                 merges, vocab, out, tag="tagA")
    victim = next(sh["bucket"] for sh in m1["shards"]
                  if sh["n_tokens"] > 0)
    vp = os.path.join(out, f"shard-{victim:05d}.bin")
    size = os.path.getsize(vp)
    with open(vp, "wb") as fh:  # same-size garbage = stale corpus relic
        fh.write(b"\xff" * size)
    m2 = _export(ray.data.from_pandas(df).repartition(4),
                 merges, vocab, out, tag="tagB")
    assert m2["source_tag"] == "tagB"
    got = np.fromfile(vp, dtype="<u4")
    assert not np.all(got == np.frombuffer(b"\xff" * 4, dtype="<u4")[0])
    np.testing.assert_array_equal(_shard_stream(out, m2),
                                  _shard_stream(OUT, m))
    with open(os.path.join(out, "run.json")) as fh:
        assert json.load(fh)["source_tag"] == "tagB"


def test_key_identity_busts_manifest_fast_path(ray_session):
    """Re-invoking with the same source/model but different bucketing
    keys or text column must re-pack, not serve the stale manifest —
    key identity is load-bearing for refresh_packed_tokens."""
    import ray.data

    from database_delta_plugins_ray.stages.tokexport import (
        export_packed_tokens)

    out = "/tmp/ddpr_test/tokexport_keyid"
    shutil.rmtree(out, ignore_errors=True)
    df = _docs().assign(alt_id=lambda d: d["doc_id"] + 1_000_000,
                        alt_text=lambda d: d["text"])
    hist, merges, vocab = _trained(df)
    ds = ray.data.from_pandas(df).repartition(4)
    m1 = export_packed_tokens(ds, out, merges, vocab, seq_tokens=64,
                              nbuckets=8, key_cols=("doc_id",),
                              text_col="text", source_tag="t1")
    assert m1["key_cols"] == ["doc_id"] and m1["text_col"] == "text"
    # same identity -> fast path (manifest file untouched)
    mt0 = os.path.getmtime(os.path.join(out, "manifest.json"))
    m2 = export_packed_tokens(ds, out, merges, vocab, seq_tokens=64,
                              nbuckets=8, key_cols=("doc_id",),
                              text_col="text", source_tag="t1")
    assert os.path.getmtime(os.path.join(out, "manifest.json")) == mt0
    assert m2["shards"] == m1["shards"]
    # different key_cols -> miss + re-pack under the new identity
    m3 = export_packed_tokens(ds, out, merges, vocab, seq_tokens=64,
                              nbuckets=8, key_cols=("alt_id",),
                              text_col="text", source_tag="t1")
    assert m3["key_cols"] == ["alt_id"]
    assert os.path.getmtime(os.path.join(out, "manifest.json")) > mt0
    # same doc set bucketed by shifted ids: totals equal, layout differs
    assert m3["total_tokens"] == m1["total_tokens"]
    # different text_col -> also a miss (recorded in the new manifest)
    m4 = export_packed_tokens(ds, out, merges, vocab, seq_tokens=64,
                              nbuckets=8, key_cols=("alt_id",),
                              text_col="alt_text", source_tag="t1")
    assert m4["text_col"] == "alt_text"
