"""Fused lake → packed-training-corpus gate (cdc_to_packed_corpus):
single-process reference parity + the persisted tokenizer artifact."""
import collections
import os
import re

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TOKEN = re.compile(r"[A-Za-z0-9_]+")


def reference(sf_dir, seq_tokens=256, merges_n=40):
    from database_delta_plugins_ray.pipelines.oracle import replay
    from database_delta_plugins_ray.pipelines.queries import ensure_log
    from database_delta_plugins_ray.stages.bpe import (
        encode_stats, train_bpe)
    from database_delta_plugins_ray.stages.sample import md5_u64

    rows = [v for v in replay(ensure_log(sf_dir)).values()
            if len(v["content"] or "") >= 64]
    # exact dedup by content sha, keep min (repo, path)
    best = {}
    for v in rows:
        k = (v["repo"], v["path"])
        cur = best.get(v["content_sha"])
        if cur is None or k < (cur["repo"], cur["path"]):
            best[v["content_sha"]] = v
    surv = list(best.values())
    wc = collections.Counter()
    for v in surv:
        wc.update(TOKEN.findall(v["content"].lower()))
    merges = train_bpe(dict(wc), merges_n)
    st = encode_stats(pd.Series([v["content"] for v in surv]), merges)
    keys = np.array([f"{v['repo']}|{v['path']}" for v in surv],
                    dtype=object)
    h = (md5_u64(keys) + np.uint64(1 << 63)).view(np.int64)
    df = pd.DataFrame({"key": keys, "h": h,
                       "n_tokens": st["n_subword_tokens"].to_numpy()})
    df = df.sort_values(["h", "key"], kind="stable").reset_index(drop=True)
    excl = df["n_tokens"].cumsum().shift(fill_value=0).to_numpy()
    df["seq_id"] = (excl // seq_tokens).astype("int64")
    out = (df.groupby("seq_id", as_index=False)
           .agg(n_docs=("key", "size"), n_tokens=("n_tokens", "sum")))
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return merges, out.sort_values("seq_id").reset_index(drop=True)


def test_packed_corpus_matches_reference(ray_session):
    from database_delta_plugins_ray.pipelines.queries import (
        CACHE_ROOT, cdc_to_packed_corpus, sf_tag)
    from database_delta_plugins_ray.stages.bpe import load_merges

    got = cdc_to_packed_corpus(SF_DIR)
    merges, exp = reference(SF_DIR)
    pd.testing.assert_frame_equal(got, exp)
    assert len(got) > 1  # the fixture actually fills several packs
    # the persisted tokenizer artifact round-trips and matches training
    lake = os.path.join(CACHE_ROOT, f"sf{sf_tag(SF_DIR)}", "lake_packed")
    loaded = load_merges(os.path.join(lake, "tokenizer.json"))
    pd.testing.assert_frame_equal(loaded, merges)


def test_pack_budget_respected(ray_session):
    from database_delta_plugins_ray.pipelines.queries import (
        cdc_to_packed_corpus)

    got = cdc_to_packed_corpus(SF_DIR, seq_tokens=512)
    # every pack except possibly the last begins under budget: the
    # exclusive-prefix rule bounds (pack start offset) % 512 == 0, so
    # consecutive seq_ids are dense from 0
    assert got["seq_id"].tolist() == list(range(len(got)))
    assert int(got["n_docs"].sum()) > 0
