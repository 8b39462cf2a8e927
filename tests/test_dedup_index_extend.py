"""MinHash index extend(): the probe→extend crawl-ingestion loop —
survivors of one batch become the corpus the next batch dedupes
against; generation-fenced appends are crash-invisible until the meta
commit."""
import glob
import os

import numpy as np
import pytest


def _mkdocs(rng, vocab, ids, n_words=60):
    return [{"doc_id": i, "text": " ".join(rng.choice(vocab, size=n_words))}
            for i in ids]


def _near_dup(doc, new_id):
    words = doc["text"].split()
    words[5] = "edited"
    return {"doc_id": new_id, "text": " ".join(words)}


@pytest.fixture()
def built(ray_session, tmp_path):
    import ray.data

    from database_delta_plugins_ray.stages.dedup_index import (
        MinHashDiskIndex)

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(300)]
    corpus_rows = _mkdocs(rng, vocab, range(40))
    idx = MinHashDiskIndex.build(
        ray.data.from_items(corpus_rows), str(tmp_path / "idx"),
        nparts=8, source_tag="v1")
    return idx, corpus_rows, rng, vocab


def test_probe_extend_probe_loop(built, ray_session):
    import ray.data

    from database_delta_plugins_ray.stages.dedup_index import (
        MinHashDiskIndex)

    idx, corpus_rows, rng, vocab = built
    # batch B: all fresh docs -> no dups; extend with them
    batch_b = _mkdocs(rng, vocab, range(100, 108))
    out = idx.probe_df(ray.data.from_items(batch_b), threshold=0.5)
    assert len(out) == 0
    s = idx.extend(ray.data.from_items(batch_b))
    assert s["generation"] == 1 and s["docs_added"] == len(batch_b)

    # batch C: near-dups of BATCH-B docs (not the original corpus) must
    # now be caught, with dup_of pointing at the B ids
    batch_c = [_near_dup(batch_b[0], 200), _near_dup(batch_b[3], 201)]
    out = idx.probe_df(ray.data.from_items(batch_c), threshold=0.5)
    got = dict(zip(out["doc_id"], out["dup_of"]))
    assert got == {200: 100, 201: 103}

    # a reopened handle sees the committed generation too
    idx2 = MinHashDiskIndex(idx.index_dir)
    out2 = idx2.probe_df(ray.data.from_items(batch_c), threshold=0.5)
    assert dict(zip(out2["doc_id"], out2["dup_of"])) == got

    # second extend -> generation 2, still additive
    s2 = idx2.extend(ray.data.from_items(batch_c))
    assert s2["generation"] == 2
    batch_d = [_near_dup(batch_c[0], 300)]
    out3 = idx2.probe_df(ray.data.from_items(batch_d), threshold=0.5)
    # 300 dups BOTH 200 (gen 2) and its grandparent 100 (gen 1)
    assert set(out3["dup_of"]) >= {200}


def test_uncommitted_generation_is_invisible_and_swept(built, ray_session):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    idx, corpus_rows, rng, vocab = built
    # plant a crashed extend: a gen-1 band file with a FAKE band row that
    # would otherwise collide with everything (band_hash copied from a
    # real file), but meta still says generation 0
    part_dirs = sorted(glob.glob(os.path.join(idx.index_dir,
                                              "bands", "part=*")))
    src = sorted(glob.glob(os.path.join(part_dirs[0], "*.parquet")))[0]
    t = pq.read_table(src)
    fake = t.set_column(t.schema.get_field_index("doc_id"), "doc_id",
                        pa.array([9999] * len(t), pa.int64()))
    pq.write_table(fake, os.path.join(part_dirs[0],
                                      "g000001-deadbeef.parquet"))

    # a near-dup of corpus doc 0 probes IDENTICALLY to a fresh index:
    # the planted file's 9999 rows must not appear
    probe = [_near_dup(corpus_rows[0], 500)]
    out = idx.probe_df(ray.data.from_items(probe), threshold=0.5)
    assert 9999 not in set(out["dup_of"])
    assert set(out["dup_of"]) == {0}

    # the next extend sweeps the orphan before committing its own gen 1
    idx.extend(ray.data.from_items(_mkdocs(rng, vocab, [600])))
    assert not os.path.exists(os.path.join(
        part_dirs[0], "g000001-deadbeef.parquet"))
    out = idx.probe_df(ray.data.from_items(probe), threshold=0.5)
    assert set(out["dup_of"]) == {0}


def test_compact_folds_generations(built, ray_session):
    import glob

    import ray.data

    idx, corpus_rows, rng, vocab = built
    batch_b = _mkdocs(rng, vocab, range(100, 106))
    idx.extend(ray.data.from_items(batch_b))
    idx.extend(ray.data.from_items(_mkdocs(rng, vocab, range(110, 114))))
    probe = [_near_dup(batch_b[2], 400), _near_dup(corpus_rows[7], 401)]
    before = idx.probe_df(ray.data.from_items(probe), threshold=0.5)

    idx2 = idx.compact()
    assert idx2.meta["generation"] == 2  # counter preserved
    # no generation-suffixed files remain
    assert not glob.glob(os.path.join(idx2.index_dir, "*", "*",
                                      "g*.parquet"))
    after = idx2.probe_df(ray.data.from_items(probe), threshold=0.5)
    key = lambda df: sorted(zip(df["doc_id"], df["dup_of"]))  # noqa: E731
    assert key(after) == key(before)
    assert {400: 102, 401: 7} == dict(zip(after["doc_id"],
                                          after["dup_of"]))

    # extends continue past a compaction
    s = idx2.extend(ray.data.from_items(_mkdocs(rng, vocab, [500])))
    assert s["generation"] == 3
    again = idx2.probe_df(ray.data.from_items(probe), threshold=0.5)
    assert key(again) == key(before)

def test_compact_crash_between_renames_restores_on_open(built, ray_session):
    """compact() swaps via rename-aside; a crash after the aside rename
    (the committed index moved, the replacement not yet in place) must
    be healed by the next open — no rmtree window may lose the index."""
    import ray.data

    from database_delta_plugins_ray.stages.dedup_index import (
        MinHashDiskIndex)

    idx, corpus_rows, rng, vocab = built
    idx.extend(ray.data.from_items(_mkdocs(rng, vocab, range(100, 104))))
    probe = [_near_dup(corpus_rows[3], 300)]
    before = idx.probe_df(ray.data.from_items(probe), threshold=0.5)

    # simulate the crash window: index moved aside, replacement missing
    os.rename(idx.index_dir, idx.index_dir + ".compact.old")
    healed = MinHashDiskIndex(idx.index_dir)
    assert healed.meta["generation"] == 1
    assert not os.path.exists(idx.index_dir + ".compact.old")
    after = healed.probe_df(ray.data.from_items(probe), threshold=0.5)
    assert (sorted(zip(after["doc_id"], after["dup_of"]))
            == sorted(zip(before["doc_id"], before["dup_of"])))
