"""Incremental packed-token refresh gates
(stages/tokexport.py:refresh_packed_tokens): bring a lake's token pack
current off the change data feed, rewriting only touched buckets with
the pack's own FROZEN tokenizer.

Gate: refresh == a full re-pack of the final lake under the same
frozen tokenizer, byte-identical per shard; plus no-op at the same
watermark, untouched-shard mtime stability, and delete handling."""
import json
import os

import numpy as np
import pandas as pd
import pytest


@pytest.fixture()
def lake_and_pack(ray_session, tmp_path):
    from database_delta_plugins_ray.pipelines.replicate import (
        final_state, run_replication)
    from database_delta_plugins_ray.sources.gen import (
        GenConfig, generate_log)
    from database_delta_plugins_ray.stages.bpe import (
        train_bpe, word_histogram)
    from database_delta_plugins_ray.stages.tokexport import (
        build_token_vocab, export_packed_tokens)
    from database_delta_plugins_ray.state import checkpoint as ckpt

    log = str(tmp_path / "log")
    lake = str(tmp_path / "lake")
    pack = str(tmp_path / "pack")
    meta = generate_log(log, GenConfig(n_keys=250, n_events=1800, seed=23))
    half = meta["max_lsn"] // 2
    run_replication(log, lake, num_partitions=4, upto_lsn=half,
                    history=True)
    ds = final_state(lake, columns=["repo", "path", "content"]).materialize()
    hist = word_histogram(ds, text_col="content")
    merges = train_bpe(hist, 40)
    vocab = build_token_vocab(hist, merges)
    g0 = ckpt.read_global_watermark(lake)
    export_packed_tokens(ds, pack, merges, vocab, seq_tokens=32,
                         nbuckets=8, key_cols=("repo", "path"),
                         text_col="content", source_tag=f"lake@{g0}")
    return log, lake, pack, merges, vocab


def _shard_bytes(d):
    out = {}
    for f in sorted(os.listdir(d)):
        if f.startswith("shard-") and f.endswith(".bin"):
            with open(os.path.join(d, f), "rb") as fh:
                out[f] = fh.read()
    return out


def test_refresh_equals_frozen_full_repack(ray_session, lake_and_pack,
                                           tmp_path):
    from database_delta_plugins_ray.pipelines.replicate import (
        final_state, run_replication)
    from database_delta_plugins_ray.stages.tokexport import (
        export_packed_tokens, refresh_packed_tokens)
    from database_delta_plugins_ray.state import checkpoint as ckpt

    log, lake, pack, merges, vocab = lake_and_pack
    # advance the lake (updates + deletes in the tail of the log)
    run_replication(log, lake, num_partitions=4, history=True)
    before = _shard_bytes(pack)
    m = refresh_packed_tokens(lake, pack, key_cols=("repo", "path"),
                              text_col="content")
    g1 = ckpt.read_global_watermark(lake)
    assert m["source_tag"] == f"lake@{g1}"
    assert 0 < m["rewritten_buckets"] <= 8
    # reference: a FULL pack of the final lake under the SAME tokenizer
    ref = str(tmp_path / "pack_ref")
    ds = final_state(lake, columns=["repo", "path", "content"]).materialize()
    m_ref = export_packed_tokens(ds, ref, merges, vocab, seq_tokens=32,
                                 nbuckets=8, key_cols=("repo", "path"),
                                 text_col="content",
                                 source_tag=f"lake@{g1}")
    assert _shard_bytes(pack) == _shard_bytes(ref)
    assert m["total_tokens"] == m_ref["total_tokens"]
    assert m["total_docs"] == m_ref["total_docs"]
    assert [s["start_token"] for s in m["shards"]] == \
        [s["start_token"] for s in m_ref["shards"]]
    # untouched buckets were NOT rewritten (byte-identity with before)
    dirty = {s["bucket"] for s in m["shards"]
             if before[f"shard-{s['bucket']:05d}.bin"]
             != _shard_bytes(pack)[f"shard-{s['bucket']:05d}.bin"]}
    assert len(dirty) <= m["rewritten_buckets"]


def test_refresh_noop_and_rerun_idempotent(ray_session, lake_and_pack):
    from database_delta_plugins_ray.pipelines.replicate import (
        run_replication)
    from database_delta_plugins_ray.stages.tokexport import (
        refresh_packed_tokens)

    log, lake, pack, merges, vocab = lake_and_pack
    # no lake movement: skip
    m0 = refresh_packed_tokens(lake, pack, key_cols=("repo", "path"),
                               text_col="content")
    assert m0.get("skipped") is True
    run_replication(log, lake, num_partitions=4, history=True)
    m1 = refresh_packed_tokens(lake, pack, key_cols=("repo", "path"),
                               text_col="content")
    m2 = refresh_packed_tokens(lake, pack, key_cols=("repo", "path"),
                               text_col="content")
    assert m2.get("skipped") is True
    assert m2["total_tokens"] == m1["total_tokens"]


def test_refresh_rejects_non_lake_pack(ray_session, tmp_path):
    import ray

    from database_delta_plugins_ray.stages.bpe import (
        train_bpe, word_histogram)
    from database_delta_plugins_ray.stages.tokexport import (
        build_token_vocab, export_packed_tokens, refresh_packed_tokens)

    df = pd.DataFrame({"doc_id": range(20),
                       "text": ["alpha beta gamma"] * 20})
    ds = ray.data.from_pandas(df)
    hist = word_histogram(ds)
    merges = train_bpe(hist, 5)
    vocab = build_token_vocab(hist, merges)
    pack = str(tmp_path / "plainpack")
    export_packed_tokens(ds, pack, merges, vocab, seq_tokens=8,
                         nbuckets=2, source_tag="fixture-v1")
    with pytest.raises(ValueError, match="lake-tagged"):
        refresh_packed_tokens(str(tmp_path / "nolake"), pack)


def test_follow_refresh_tokens_keeps_pack_current(ray_session, tmp_path):
    """post_commit token hook (the CLI's --refresh-tokens): the packed
    corpus follows the lake — after the loop stops it byte-equals a
    full re-pack under the same frozen tokenizer."""
    from database_delta_plugins_ray.pipelines.replicate import (
        final_state, follow_replication, run_replication)
    from database_delta_plugins_ray.sources.gen import (
        GenConfig, generate_log)
    from database_delta_plugins_ray.stages.bpe import (
        train_bpe, word_histogram)
    from database_delta_plugins_ray.stages.tokexport import (
        build_token_vocab, export_packed_tokens, refresh_packed_tokens)
    from database_delta_plugins_ray.state import checkpoint as ckpt

    log = str(tmp_path / "log")
    lake = str(tmp_path / "lake")
    pack = str(tmp_path / "pack")
    meta = generate_log(log, GenConfig(n_keys=150, n_events=1200, seed=9,
                                       n_segments=3))
    half = meta["max_lsn"] // 2
    run_replication(log, lake, num_partitions=4, history=True,
                    upto_lsn=half)
    ds = final_state(lake, columns=["repo", "path", "content"]).materialize()
    hist = word_histogram(ds, text_col="content")
    merges = train_bpe(hist, 30)
    vocab = build_token_vocab(hist, merges)
    export_packed_tokens(ds, pack, merges, vocab, seq_tokens=32,
                         nbuckets=8, key_cols=("repo", "path"),
                         text_col="content",
                         source_tag=f"lake@{ckpt.read_global_watermark(lake)}")

    calls = []

    def hook(lake_dir):
        calls.append(refresh_packed_tokens(
            lake_dir, pack, key_cols=("repo", "path"),
            text_col="content"))

    s = follow_replication(log, lake, num_partitions=4, history=True,
                           poll_interval_s=0.05, idle_polls_to_stop=2,
                           post_commit=[hook])
    assert s["events_applied"] > 0
    assert any(c.get("rewritten_buckets", 0) > 0 for c in calls)

    ref = str(tmp_path / "ref")
    ds2 = final_state(lake, columns=["repo", "path", "content"]).materialize()
    export_packed_tokens(ds2, ref, merges, vocab, seq_tokens=32,
                         nbuckets=8, key_cols=("repo", "path"),
                         text_col="content",
                         source_tag=f"lake@{ckpt.read_global_watermark(lake)}")
    assert _shard_bytes(pack) == _shard_bytes(ref)


def test_refresh_rejects_identity_mismatch(ray_session, lake_and_pack):
    from database_delta_plugins_ray.stages.tokexport import (
        refresh_packed_tokens)

    _, lake, pack, _, _ = lake_and_pack
    # the pack records key_cols=(repo,path)/content; a different
    # bucketing rule would silently interleave rewritten shards under a
    # different document order than the untouched ones
    with pytest.raises(ValueError, match="key_cols"):
        refresh_packed_tokens(lake, pack, key_cols=("doc_id",),
                              text_col="content")
    with pytest.raises(ValueError, match="text_col"):
        refresh_packed_tokens(lake, pack, key_cols=("repo", "path"),
                              text_col="text")
