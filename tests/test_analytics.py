"""Training-data operator tests (dedup families, ANN, multimodal plumbing)
on small in-memory datasets under the shared Ray session."""

import os

import numpy as np
import pandas as pd
import pytest

import ray.data


@pytest.fixture(scope="module")
def docs(ray_session):
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [
        {"doc_id": 0, "lang": "en", "text": base},
        {"doc_id": 1, "lang": "en", "text": base},  # exact dup of 0
        {"doc_id": 2, "lang": "en", "text": base.replace("dog", "cat")},  # near-dup
        {"doc_id": 3, "lang": "en",
         "text": "completely different words about database shuffles and lakes"},
        {"doc_id": 4, "lang": "de",
         "text": "der hund und die katze laufen durch das haus in der stadt"},
    ]
    return ray.data.from_items(rows)


def test_exact_dedup(docs):
    from database_delta_plugins_ray.stages.dedup import exact_dedup

    out = {r["doc_id"]: r["n_dups"] for r in exact_dedup(docs).take_all()}
    assert out[0] == 2          # docs 0,1 collapse, min id kept
    assert 1 not in out
    assert out[2] == 1 and out[3] == 1


def test_minhash_lsh_finds_near_dups(docs):
    from database_delta_plugins_ray.stages.dedup import minhash_lsh_pairs

    # num_perm/bands high enough that the 0.58-jaccard planted pair has
    # >99% bucket-collision probability (the default 64/16 leaves ~15%
    # miss chance at this similarity — a flaky test otherwise)
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in minhash_lsh_pairs(docs, threshold=0.5, num_perm=128,
                                        bands=64).take_all()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and 0.5 <= pairs[(0, 2)] < 1.0
    assert not any(3 in p or 4 in p for p in pairs)


def test_simhash_pairs(docs):
    from database_delta_plugins_ray.stages.dedup import simhash_pairs

    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in simhash_pairs(docs, max_hamming=10).take_all()}
    assert pairs[(0, 1)] == 0
    assert (0, 2) in pairs and pairs[(0, 2)] > 0


def test_ngram_jaccard_partitioned(docs):
    from database_delta_plugins_ray.stages.dedup import ngram_jaccard_pairs

    pairs = {(r["id_a"], r["id_b"]) for r in
             ngram_jaccard_pairs(docs, threshold=0.4).take_all()}
    assert (0, 1) in pairs and (0, 2) in pairs


def test_ann_bruteforce_matches_numpy(ray_session):
    from database_delta_plugins_ray.stages.similarity import ann_topk_bruteforce

    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((300, 16)).astype(np.float32)
    ds = ray.data.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(300)]
    )
    q = vecs[7]
    got = ann_topk_bruteforce(ds, q, k=5)
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    qs = unit @ (q / np.linalg.norm(q))
    want = sorted(range(300), key=lambda i: (-qs[i], i))[:5]
    assert got["vec_id"].tolist() == want
    assert got["vec_id"].iloc[0] == 7  # self


def test_ann_ivf_reasonable_recall(ray_session, tmp_path):
    """Persisted IVF index: recall on clustered data AND a pruned read —
    the search must touch only the nprobe bucket directories."""
    import glob

    from database_delta_plugins_ray.stages.similarity import (
        IVFDiskIndex,
        ann_topk_bruteforce,
        ann_topk_ivf,
    )

    rng = np.random.default_rng(6)
    centers = rng.standard_normal((8, 16)) * 4
    vecs = (centers[rng.integers(0, 8, 600)] +
            rng.standard_normal((600, 16))).astype(np.float32)
    ds = ray.data.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(600)]
    )
    q = vecs[11]
    idx_dir = str(tmp_path / "ivf")
    exact = set(ann_topk_bruteforce(ds, q, k=10)["vec_id"])
    approx = set(ann_topk_ivf(ds, q, k=10, index_dir=idx_dir,
                              n_clusters=8, nprobe=3)["vec_id"])
    assert len(exact & approx) >= 9  # clustered data -> high recall

    # index persisted: bucket dirs on disk; a second search reuses them
    clusters = glob.glob(str(tmp_path / "ivf" / "data" / "cluster=*"))
    assert len(clusters) >= 4
    idx = IVFDiskIndex(idx_dir)
    again = set(idx.search(q, k=10, nprobe=3)["vec_id"])
    assert again == approx


def test_embedding_cosine_pairs(ray_session):
    from database_delta_plugins_ray.stages.dedup import embedding_cosine_pairs

    rng = np.random.default_rng(7)
    base = rng.standard_normal(32).astype(np.float32)
    rows = [{"vec_id": 0, "embedding": base.tolist()},
            {"vec_id": 1, "embedding": (base + 0.05 * rng.standard_normal(32)
                                        .astype(np.float32)).tolist()}]
    rows += [{"vec_id": i, "embedding": rng.standard_normal(32).astype(np.float32).tolist()}
             for i in range(2, 50)]
    ds = ray.data.from_items(rows)
    pairs = {(r["id_a"], r["id_b"]) for r in
             embedding_cosine_pairs(ds, dim=32, threshold=0.9).take_all()}
    assert (0, 1) in pairs


def test_multimodal_plumbing(ray_session):
    from database_delta_plugins_ray.stages.multimodal import (
        FrameSampleStub,
        decode_pipeline,
        media_from_documents,
    )

    docs = ray.data.from_items(
        [{"doc_id": i, "text": f"payload {i} " * (i + 1)} for i in range(20)]
    )
    media = media_from_documents(docs)
    out = decode_pipeline(media, batch_size=8, concurrency=2)
    rows = out.take_all()
    assert len(rows) == 20
    for r in rows:
        assert 1 <= r["width"] <= 1920 and 1 <= r["height"] <= 1080
        assert len(r["features"]) == 8 and all(0 <= f <= 1 for f in r["features"])
        assert "media" not in r  # payload dropped after feature extraction
    # deterministic across runs
    rows2 = decode_pipeline(media_from_documents(docs), batch_size=8,
                            concurrency=2).take_all()
    assert {r["media_id"]: r["width"] for r in rows} == \
           {r["media_id"]: r["width"] for r in rows2}
    # frame sampling explodes rows
    frames = media.map_batches(FrameSampleStub, batch_format="pyarrow",
                               concurrency=2,
                               fn_constructor_kwargs={"n_frames": 3}).take_all()
    assert len(frames) == 60


def test_asof_join_strict_and_ties(ray_session, tmp_path):
    """As-of semantics: strictly-earlier view only (a view AT the purchase
    ts does not match); ties at one (user, ts) resolve to max event_id;
    users with no earlier view get nulls."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from database_delta_plugins_ray.pipelines.analytics import (
        purchases_asof_last_view,
    )

    t0 = np.datetime64("2024-01-01T00:00:00", "us")

    def ev(eid, user, secs, etype, value):
        return {"event_id": eid, "ts": t0 + np.timedelta64(secs, "s"),
                "user_id": user, "event_type": etype, "value": float(value),
                "props": "{}"}

    rows = [
        ev(1, 1, 0, "view", 10.0),
        ev(2, 1, 0, "view", 20.0),     # tie at same ts: max event_id wins
        ev(3, 1, 5, "purchase", 99.0),  # -> view_value 20.0
        ev(4, 1, 5, "view", 30.0),      # same ts as a purchase...
        ev(5, 1, 5, "purchase", 77.0),  # strict: still 20.0, NOT 30.0
        ev(6, 2, 1, "purchase", 50.0),  # user 2 has no view -> nulls
        ev(7, 3, 9, "click", 1.0),      # other types ignored entirely
    ]
    sf = tmp_path / "sf0.01x"
    sf.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(sf / "events.parquet"))

    out = {r["event_id"]: r
           for r in purchases_asof_last_view(str(sf)).take_all()}
    assert set(out) == {3, 5, 6}
    assert out[3]["view_value"] == 20.0
    assert out[5]["view_value"] == 20.0  # strict inequality
    assert out[6]["view_value"] is None or pd.isna(out[6]["view_value"])
    assert out[6]["view_ts"] is None or pd.isna(out[6]["view_ts"])


def test_top_docs_per_lang_combiner_exact(ray_session, tmp_path):
    """The per-batch partial top-k combiner must not change the exact
    grouped top-k (ties broken by doc_id)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from database_delta_plugins_ray.pipelines.analytics import (
        top_docs_per_lang,
    )

    rows = [{"doc_id": i, "text": "x", "lang": f"l{i % 3}",
             "source": "s", "n_chars": (i * 7) % 20}
            for i in range(60)]
    sf = tmp_path / "sf0.01y"
    sf.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(sf / "documents.parquet"))

    got = top_docs_per_lang(str(sf)).take_all()
    # exact reference
    import pandas as pd

    df = pd.DataFrame(rows)
    want = (df.sort_values(["n_chars", "doc_id"], ascending=[False, True])
              .groupby("lang").head(5))
    want_keys = {(r.lang, r.doc_id) for r in want.itertuples()}
    assert {(r["lang"], r["doc_id"]) for r in got} == want_keys
    for r in got:
        assert 1 <= r["rank"] <= 5


def test_ann_multi_query_matches_single(ray_session):
    """Batched multi-query brute force must equal Q independent
    single-query runs (and a direct numpy reference)."""
    import numpy as np
    import ray.data

    from database_delta_plugins_ray.stages.similarity import (
        ann_topk_bruteforce,
        ann_topk_bruteforce_multi,
    )

    rng = np.random.default_rng(5)
    n, d, nq, k = 500, 16, 3, 7
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    ds = ray.data.from_items(
        [{"vec_id": i, "embedding": vecs[i]} for i in range(n)])
    queries = rng.standard_normal((nq, d)).astype(np.float32)

    multi = ann_topk_bruteforce_multi(ds, queries, k)
    for qi in range(nq):
        single = ann_topk_bruteforce(ds, queries[qi], k)
        sub = multi[multi["query_idx"] == qi]
        assert list(sub["vec_id"]) == list(single["vec_id"])
        np.testing.assert_allclose(sub["score"].to_numpy(),
                                   single["score"].to_numpy(), atol=1e-6)
        assert list(sub["rank"]) == list(range(1, k + 1))
    # numpy reference for one query
    u = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    q0 = queries[0] / np.linalg.norm(queries[0])
    ref = np.argsort(-(u @ q0))[:k]
    assert list(multi[multi["query_idx"] == 0]["vec_id"]) == list(ref)


def test_ann_lsh_clustered_recall_and_pruned_read(ray_session, tmp_path):
    """Persisted LSH index: high recall on clustered data while reading
    only the multiprobe bucket set; reopen reuses the index."""
    import glob

    from database_delta_plugins_ray.stages.similarity import (
        LSHDiskIndex,
        ann_topk_bruteforce,
        ann_topk_lsh,
    )

    rng = np.random.default_rng(9)
    centers = rng.standard_normal((8, 16)) * 4
    vecs = (centers[rng.integers(0, 8, 600)] +
            rng.standard_normal((600, 16))).astype(np.float32)
    ds = ray.data.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(600)]
    )
    q = vecs[11]
    idx_dir = str(tmp_path / "lsh")
    exact = set(ann_topk_bruteforce(ds, q, k=10)["vec_id"])
    approx = set(ann_topk_lsh(ds, q, k=10, index_dir=idx_dir,
                              n_planes=6, n_tables=8, multiprobe=3)["vec_id"])
    assert len(exact & approx) >= 9  # clustered data -> high recall

    # persisted layout: one dir tree per table, bucket dirs inside
    tables = glob.glob(str(tmp_path / "lsh" / "data" / "tbl=*"))
    assert len(tables) == 8
    idx = LSHDiskIndex(idx_dir)
    # probe set is a strict subset: 3 buckets per table out of 2^6
    probes = idx.probe_buckets(q, 3)
    assert len(probes) == 8 * 3
    assert len({t for t, _ in probes}) == 8
    again = set(idx.search(q, k=10, multiprobe=3)["vec_id"])
    assert again == approx


def test_ann_lsh_dedups_cross_table_candidates(ray_session, tmp_path):
    """A vector colliding in several tables must fill only ONE top-k slot."""
    from database_delta_plugins_ray.stages.similarity import ann_topk_lsh

    rng = np.random.default_rng(3)
    base = rng.standard_normal(16).astype(np.float32)
    rows = [{"vec_id": i,
             "embedding": (base + 0.01 * rng.standard_normal(16)
                           .astype(np.float32)).tolist()}
            for i in range(12)]  # 12 near-identical vectors: collide in ALL tables
    ds = ray.data.from_items(rows)
    out = ann_topk_lsh(ds, base, k=10, index_dir=str(tmp_path / "lsh2"),
                       n_planes=4, n_tables=6, multiprobe=2)
    assert out["vec_id"].is_unique
    assert len(out) == 10


def test_ann_pq_recall_and_compression(ray_session, tmp_path):
    """Persisted PQ index: exact-rerank recall ~1.0 on synthetic data,
    ADC-only recall reasonable, codes table is m bytes/vector (the 32x
    exhaustive-scan compression), source_tag mismatch forces a rebuild."""
    import pyarrow.parquet as pq_mod

    from database_delta_plugins_ray.stages.similarity import (
        PQDiskIndex,
        ann_topk_bruteforce,
        ann_topk_pq,
    )

    rng = np.random.default_rng(17)
    vecs = rng.standard_normal((800, 32)).astype(np.float32)
    ds = ray.data.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(800)]
    )
    q = vecs[5] + 0.1 * rng.standard_normal(32).astype(np.float32)
    idx_dir = str(tmp_path / "pq")
    exact = set(ann_topk_bruteforce(ds, q, k=10)["vec_id"])
    got = ann_topk_pq(ds, q, k=10, index_dir=idx_dir, m=8,
                      source_tag="v1")
    assert len(exact & set(got["vec_id"])) >= 9
    # rerank scores are EXACT cosines: match brute's scores for the
    # overlapping ids
    brute = ann_topk_bruteforce(ds, q, k=10).set_index("vec_id")["score"]
    for _i, r in got.iterrows():
        if r["vec_id"] in brute.index:
            assert abs(r["score"] - brute[r["vec_id"]]) < 1e-5

    # codes table stores m uint8 codes per vector
    idx = PQDiskIndex(idx_dir)
    files = [os.path.join(dp, f)
             for dp, _dn, fn in os.walk(os.path.join(idx_dir, "codes"))
             for f in fn if f.endswith(".parquet")]
    t = pq_mod.read_table(files)
    assert t.num_rows == 800
    codes0 = t["codes"][0].as_py()
    assert len(codes0) == 8 and all(0 <= c < 256 for c in codes0)

    # ADC-only search (no rerank) still ranks by LUT scores
    adc = idx.search(q, k=10)
    assert len(adc) == 10
    assert len(exact & set(adc["vec_id"])) >= 5

    # source_tag mismatch rebuilds (books file replaced atomically)
    mtime0 = os.path.getmtime(os.path.join(idx_dir, "codebooks.npy"))
    ann_topk_pq(ds, q, k=10, index_dir=idx_dir, m=8, source_tag="v2")
    assert os.path.getmtime(
        os.path.join(idx_dir, "codebooks.npy")) >= mtime0
    with open(os.path.join(idx_dir, "source.txt")) as fh:
        assert fh.read() == "v2"


def test_candidate_bloom_prunes_and_never_false_negatives(ray_session):
    """The verify-stage Bloom prefilter: every candidate id passes the
    probe (no false negatives — exactness), most non-candidates don't
    (the pruning), and int32 corpus ids probe the int64-built filter
    correctly (width canonicalization)."""
    from database_delta_plugins_ray.functions.sketch import bloom_contains
    from database_delta_plugins_ray.stages.dedup import (
        _candidate_bloom,
        _id_hash,
    )

    cand = ray.data.from_items(
        [{"id_a": i, "id_b": i + 100000} for i in range(0, 1000, 7)])
    bits = _candidate_bloom(cand)
    members = np.array(
        [i for i in range(0, 1000, 7)]
        + [i + 100000 for i in range(0, 1000, 7)], dtype=np.int64)
    assert bloom_contains(bits, _id_hash(members), 4).all()
    assert bloom_contains(bits, _id_hash(members.astype(np.int32)), 4).all()
    others = np.arange(200000, 210000, dtype=np.int64)
    hit_rate = bloom_contains(bits, _id_hash(others), 4).mean()
    assert hit_rate < 0.01


def test_pq_search_multi_matches_single(ray_session, tmp_path):
    """Batched PQ search == per-query PQ search, and each query's exact
    rerank agrees with brute force on >= 9/10 ids."""
    from database_delta_plugins_ray.stages.similarity import (
        PQDiskIndex,
        ann_topk_bruteforce,
        pq_search_multi,
    )

    rng = np.random.default_rng(23)
    vecs = rng.standard_normal((600, 32)).astype(np.float32)
    ds = ray.data.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(600)]
    )
    idx = PQDiskIndex.build(ds, str(tmp_path / "pq"), m=8)
    qs = np.stack([vecs[3], vecs[77], vecs[240]])
    multi = pq_search_multi(idx, qs, k=10, rerank_ds=ds)
    assert len(multi) == 30
    for qi in range(3):
        single = idx.search(qs[qi], k=10, rerank_ds=ds)
        mrows = multi[multi["query_idx"] == qi]
        assert list(mrows["vec_id"]) == list(single["vec_id"])
        exact = set(ann_topk_bruteforce(ds, qs[qi], k=10)["vec_id"])
        assert len(exact & set(mrows["vec_id"])) >= 9
        assert list(mrows["rank"]) == list(range(1, 11))


def test_ivf_refresh_upsert_delete_matches_rebuild(ray_session, tmp_path):
    """CDC-style IVF maintenance: build on v0, refresh with upserts +
    deletes + brand-new vectors (no rebuild), and the search must equal
    a full rebuild over the CURRENT logical state (same centroids seed,
    so bucket routing matches). Also: crash-idempotent re-run at the
    same generation, and stale versions never resurface."""
    from database_delta_plugins_ray.stages.similarity import IVFDiskIndex

    rng = np.random.default_rng(31)
    centers = rng.standard_normal((8, 16)) * 4
    assign0 = rng.integers(0, 8, 500)
    v0 = (centers[assign0] + rng.standard_normal((500, 16))).astype(
        np.float32)

    def items(ids, vecs):
        return ray.data.from_items(
            [{"vec_id": int(i), "embedding": vecs[j].tolist()}
             for j, i in enumerate(ids)])

    idx_dir = str(tmp_path / "ivf")
    idx = IVFDiskIndex.build(items(range(500), v0), idx_dir, n_clusters=8)

    # increment: update 40 vectors (move them), delete 30, add 50 new
    upd_ids = list(range(0, 40))
    v_upd = (centers[rng.integers(0, 8, 40)]
             + rng.standard_normal((40, 16))).astype(np.float32)
    del_ids = list(range(100, 130))
    new_ids = list(range(500, 550))
    v_new = (centers[rng.integers(0, 8, 50)]
             + rng.standard_normal((50, 16))).astype(np.float32)
    add_ids = upd_ids + new_ids
    add_vecs = np.concatenate([v_upd, v_new])
    r = idx.refresh(items(add_ids, add_vecs), delete_ids=del_ids)
    assert r["gen"] == 1 and r["added"] == 90

    # current logical state
    cur_ids, cur_vecs = [], []
    upd_map = dict(zip(upd_ids, range(40)))
    for i in range(500):
        if i in del_ids:
            continue
        if i in upd_map:
            cur_ids.append(i)
            cur_vecs.append(v_upd[upd_map[i]])
        else:
            cur_ids.append(i)
            cur_vecs.append(v0[i])
    cur_ids += new_ids
    cur_vecs += list(v_new)
    rebuilt = IVFDiskIndex.build(
        items(cur_ids, np.stack(cur_vecs)), str(tmp_path / "ivf2"),
        n_clusters=8)

    for qi in (0, 105, 510, 333):
        q = (np.stack(cur_vecs)[min(qi, len(cur_vecs) - 1)]
             if qi != 105 else centers[3].astype(np.float32))
        got = idx.search(q, k=10, nprobe=8)
        want = rebuilt.search(q, k=10, nprobe=8)
        assert list(got["vec_id"]) == list(want["vec_id"])
        np.testing.assert_allclose(got["score"], want["score"], atol=1e-6)
        # deleted ids never surface
        assert not set(got["vec_id"]) & set(del_ids)

    # crash-idempotence: re-running the same increment at the same gen
    # (as a recovery would) leaves search results unchanged
    idx2 = IVFDiskIndex(idx_dir)
    # simulate the pre-meta-commit crash by rolling meta back one gen
    import json

    mp = os.path.join(idx_dir, "meta.json")
    with open(mp) as fh:
        m = json.load(fh)
    m["gen"] = 0
    with open(mp, "w") as fh:
        json.dump(m, fh)
    r2 = IVFDiskIndex(idx_dir).refresh(items(add_ids, add_vecs),
                                       delete_ids=del_ids)
    assert r2["gen"] == 1
    q = centers[3].astype(np.float32)
    again = IVFDiskIndex(idx_dir).search(q, k=10, nprobe=8)
    want = rebuilt.search(q, k=10, nprobe=8)
    assert list(again["vec_id"]) == list(want["vec_id"])


def test_lsh_refresh_upsert_delete_matches_rebuild(ray_session, tmp_path):
    """LSH incremental maintenance: refresh with upserts + deletes +
    adds == a full rebuild over the current logical state (same planes
    seed, so bucket routing matches exactly)."""
    from database_delta_plugins_ray.stages.similarity import LSHDiskIndex

    rng = np.random.default_rng(41)
    centers = rng.standard_normal((6, 16)) * 4
    v0 = (centers[rng.integers(0, 6, 400)]
          + rng.standard_normal((400, 16))).astype(np.float32)

    def items(ids, vecs):
        return ray.data.from_items(
            [{"vec_id": int(i), "embedding": vecs[j].tolist()}
             for j, i in enumerate(ids)])

    idx_dir = str(tmp_path / "lsh")
    idx = LSHDiskIndex.build(items(range(400), v0), idx_dir,
                             n_planes=5, n_tables=8)
    upd_ids = list(range(0, 30))
    v_upd = (centers[rng.integers(0, 6, 30)]
             + rng.standard_normal((30, 16))).astype(np.float32)
    del_ids = list(range(50, 80))
    new_ids = list(range(400, 440))
    v_new = (centers[rng.integers(0, 6, 40)]
             + rng.standard_normal((40, 16))).astype(np.float32)
    r = idx.refresh(items(upd_ids + new_ids,
                          np.concatenate([v_upd, v_new])),
                    delete_ids=del_ids)
    assert r["gen"] == 1 and r["added"] == 70

    cur_ids, cur_vecs = [], []
    upd_map = dict(zip(upd_ids, range(30)))
    for i in range(400):
        if i in del_ids:
            continue
        cur_ids.append(i)
        cur_vecs.append(v_upd[upd_map[i]] if i in upd_map else v0[i])
    cur_ids += new_ids
    cur_vecs += list(v_new)
    rebuilt = LSHDiskIndex.build(items(cur_ids, np.stack(cur_vecs)),
                                 str(tmp_path / "lsh2"),
                                 n_planes=5, n_tables=8)
    for q in (centers[2].astype(np.float32), v_new[7], v_upd[3]):
        got = idx.search(q, k=10, multiprobe=4)
        want = rebuilt.search(q, k=10, multiprobe=4)
        assert list(got["vec_id"]) == list(want["vec_id"])
        np.testing.assert_allclose(got["score"], want["score"], atol=1e-6)
        assert not set(got["vec_id"]) & set(del_ids)


def test_pq_refresh_upsert_delete_matches_rebuild(ray_session, tmp_path):
    """PQ incremental maintenance: refresh with upserts + deletes +
    adds == a full rebuild encoded over the current logical state (the
    rebuild trains on the same seed/sample-prefix, so codebooks match;
    rerank makes the comparison exact)."""
    from database_delta_plugins_ray.stages.similarity import PQDiskIndex

    rng = np.random.default_rng(57)
    v0 = rng.standard_normal((400, 32)).astype(np.float32)

    def items(ids, vecs):
        return ray.data.from_items(
            [{"vec_id": int(i), "embedding": vecs[j].tolist()}
             for j, i in enumerate(ids)])

    idx_dir = str(tmp_path / "pq")
    idx = PQDiskIndex.build(items(range(400), v0), idx_dir, m=8)
    upd_ids = list(range(0, 25))
    v_upd = rng.standard_normal((25, 32)).astype(np.float32)
    del_ids = list(range(60, 90))
    new_ids = list(range(400, 430))
    v_new = rng.standard_normal((30, 32)).astype(np.float32)
    r = idx.refresh(items(upd_ids + new_ids,
                          np.concatenate([v_upd, v_new])),
                    delete_ids=del_ids)
    assert r["gen"] == 1 and r["added"] == 55

    cur_ids, cur_vecs = [], []
    upd_map = dict(zip(upd_ids, range(25)))
    for i in range(400):
        if i in del_ids:
            continue
        cur_ids.append(i)
        cur_vecs.append(v_upd[upd_map[i]] if i in upd_map else v0[i])
    cur_ids += new_ids
    cur_vecs += list(v_new)
    cur = items(cur_ids, np.stack(cur_vecs))
    for q in (v_new[3], v_upd[7], v0[200]):
        got = idx.search(q, k=10, rerank_ds=cur)
        assert len(got) == 10
        assert not set(got["vec_id"]) & set(del_ids)
        # exact rerank: scores must equal brute force over the current
        # state for the returned ids, and include the true top-1
        from database_delta_plugins_ray.stages.similarity import (
            ann_topk_bruteforce,
        )

        brute = ann_topk_bruteforce(cur, q, k=10)
        assert brute["vec_id"].iloc[0] in set(got["vec_id"])
        overlap = len(set(got["vec_id"]) & set(brute["vec_id"]))
        assert overlap >= 8


def test_index_compact_folds_deltas(ray_session, tmp_path):
    """compact() folds deltas + tombstones into a fresh base for all
    three persisted indexes: search results identical before/after,
    delta dirs and the tombstone file gone, generation preserved."""
    import glob

    from database_delta_plugins_ray.stages.similarity import (
        IVFDiskIndex,
        LSHDiskIndex,
        PQDiskIndex,
    )

    rng = np.random.default_rng(71)
    v0 = rng.standard_normal((300, 16)).astype(np.float32)
    v1 = rng.standard_normal((40, 16)).astype(np.float32)

    def items(ids, vecs):
        return ray.data.from_items(
            [{"vec_id": int(i), "embedding": vecs[j].tolist()}
             for j, i in enumerate(ids)])

    q = v1[5]
    for name, cls, build_kw, search_kw in [
        ("ivf", IVFDiskIndex, {"n_clusters": 8}, {"nprobe": 8}),
        ("lsh", LSHDiskIndex, {"n_planes": 4, "n_tables": 6},
         {"multiprobe": 4}),
        ("pq", PQDiskIndex, {"m": 8}, {}),
    ]:
        d = str(tmp_path / name)
        idx = cls.build(items(range(300), v0), d, **build_kw)
        idx.refresh(items(range(300, 340), v1),
                    delete_ids=list(range(10, 30)))
        if name == "pq":
            search_kw = {"rerank_ds": None}
            before = idx.search(q, k=10)
        else:
            before = idx.search(q, k=10, **search_kw)
        out = idx.compact()
        assert out["rows"] == 300 - 20 + 40, name
        assert not glob.glob(os.path.join(d, "delta-g*")), name
        assert not os.path.exists(os.path.join(d, "tombstones.parquet"))
        idx2 = cls(d)
        after = (idx2.search(q, k=10) if name == "pq"
                 else idx2.search(q, k=10, **search_kw))
        assert list(after["vec_id"]) == list(before["vec_id"]), name
        np.testing.assert_allclose(after["score"], before["score"],
                                   atol=1e-6)
        # a post-compact refresh keeps working (gen continues)
        r = idx2.refresh(delete_ids=[0])
        assert r["gen"] == 2, name


def test_index_refresh_sweeps_stale_staging(ray_session, tmp_path):
    """A crashed writer's staging leftovers (.delta.tmp.*, foreign-pid
    compact dirs) are swept by the next refresh, and never corrupt it."""
    from database_delta_plugins_ray.stages.similarity import IVFDiskIndex

    rng = np.random.default_rng(77)
    v = rng.standard_normal((100, 16)).astype(np.float32)
    ds = ray.data.from_items(
        [{"vec_id": i, "embedding": v[i].tolist()} for i in range(100)])
    d = str(tmp_path / "ivf")
    idx = IVFDiskIndex.build(ds, d, n_clusters=4)
    stale = os.path.join(d, ".delta.tmp.99999")
    os.makedirs(stale)
    with open(os.path.join(stale, "junk.parquet"), "w") as fh:
        fh.write("not parquet")
    os.makedirs(d + ".compact.99999")
    r = idx.refresh(delete_ids=[1, 2])
    assert r["gen"] == 1
    assert not os.path.exists(stale)
    assert not os.path.exists(d + ".compact.99999")
    got = idx.search(v[5], k=5, nprobe=4)
    assert not {1, 2} & set(got["vec_id"])


def test_pq_search_multi_sees_refresh(ray_session, tmp_path):
    """Batched PQ search honors deltas and tombstones exactly like
    single-query search on a refreshed index."""
    from database_delta_plugins_ray.stages.similarity import (
        PQDiskIndex,
        pq_search_multi,
    )

    rng = np.random.default_rng(83)
    v0 = rng.standard_normal((200, 32)).astype(np.float32)
    v1 = rng.standard_normal((20, 32)).astype(np.float32)

    def items(ids, vecs):
        return ray.data.from_items(
            [{"vec_id": int(i), "embedding": vecs[j].tolist()}
             for j, i in enumerate(ids)])

    d = str(tmp_path / "pq")
    idx = PQDiskIndex.build(items(range(200), v0), d, m=8)
    idx.refresh(items(range(200, 220), v1), delete_ids=list(range(0, 30)))
    qs = np.stack([v1[3], v0[100]])
    multi = pq_search_multi(idx, qs, k=10)
    assert not set(multi["vec_id"]) & set(range(0, 30))
    for qi in range(2):
        single = idx.search(qs[qi], k=10)
        mrows = multi[multi["query_idx"] == qi]
        assert list(mrows["vec_id"]) == list(single["vec_id"])


def test_index_search_ignores_uncommitted_delta(ray_session, tmp_path):
    """A refresh that crashes between the delta-dir rename and the
    meta commit must be invisible: search serves only generations
    <= the committed meta gen (otherwise an upserted id ranks twice —
    its new row carries no tombstone until the commit)."""
    import pandas as pd

    from database_delta_plugins_ray.stages.similarity import (
        IVFDiskIndex,
        _idx_stage_delta,
    )

    rng = np.random.default_rng(91)
    v = rng.standard_normal((120, 16)).astype(np.float32)
    ds = ray.data.from_items(
        [{"vec_id": i, "embedding": v[i].tolist()} for i in range(120)])
    d = str(tmp_path / "ivf")
    idx = IVFDiskIndex.build(ds, d, n_clusters=4)
    q = v[7]
    before = idx.search(q, k=10, nprobe=4)

    # crash simulation: the delta dir lands (id 7 moved to ~q exactly,
    # which WOULD rank first), but _idx_commit_refresh never ran
    moved = v[7] / np.linalg.norm(v[7])
    c = idx.centroids
    cl = int(np.argmax(moved @ c.T))
    staged = ray.data.from_pandas(pd.DataFrame({
        "vec_id": [7], "embedding": [moved.astype(np.float32)],
        "gen": np.int64(1), "cluster": np.int32(cl)}))
    _idx_stage_delta(d, 1, staged, ["cluster"], "vec_id")

    after_crash = IVFDiskIndex(d).search(q, k=10, nprobe=4)
    assert list(after_crash["vec_id"]) == list(before["vec_id"])
    assert len(set(after_crash["vec_id"])) == len(after_crash)

    # the re-run replaces the same generation and commits: now visible
    r = IVFDiskIndex(d).refresh(
        ray.data.from_items([{"vec_id": 7, "embedding": moved.tolist()}]))
    assert r["gen"] == 1
    final = IVFDiskIndex(d).search(q, k=10, nprobe=4)
    assert list(final["vec_id"]).count(7) == 1
    assert final.iloc[0]["vec_id"] == 7  # the moved version won
