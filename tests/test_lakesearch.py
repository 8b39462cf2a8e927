"""CDC-maintained full-text index over the replicated lake
(LakeTextIndex): build at a watermark, refresh from the change feed.

Gold gate: build-on-half + replicate-rest + refresh must equal a full
REBUILD on the final lake — for plain term lookup AND for BM25 (which
additionally requires the maintained (n_docs, total_tokens) to be
exactly the rebuild's)."""

import os

import numpy as np
import pytest

from database_delta_plugins_ray.pipelines.replicate import (
    lake_diff,
    run_replication,
)
from database_delta_plugins_ray.stages.invindex import LakeTextIndex


@pytest.fixture()
def half_built(ray_session, small_log, tmp_path):
    log_dir, _, meta = small_log
    lake = str(tmp_path / "lake")
    idx_dir = str(tmp_path / "idx")
    half = meta["max_lsn"] // 2
    run_replication(log_dir, lake, num_partitions=8, history=True,
                    upto_lsn=half)
    idx = LakeTextIndex.build(lake, idx_dir)
    return log_dir, lake, idx, meta


def _res(ds, score_col="score"):
    return {r["doc_key"]: (r[score_col], r["n_terms"])
            for r in ds.take_all()}


TERMS = [["repo", "src"], ["def", "return"], ["v2"], ["v1", "def"]]


@pytest.mark.usefixtures("ray_session")
def test_refresh_equals_rebuild(half_built, tmp_path):
    log_dir, lake, idx, meta = half_built
    run_replication(log_dir, lake, num_partitions=8, history=True)
    s = idx.refresh(lake)
    assert s["changed"] > 0 and s["deleted"] > 0
    assert idx.overlay  # the live-docs overlay is doing real fencing

    rebuilt = LakeTextIndex.build(lake, str(tmp_path / "idx_rebuild"))
    assert idx.meta["n_docs"] == rebuilt.meta["n_docs"]
    assert idx.meta["total_tokens"] == rebuilt.meta["total_tokens"]
    assert idx.meta["watermark"] == rebuilt.meta["watermark"]

    for terms in TERMS:
        for mode in ("and", "or"):
            assert _res(idx.lookup(terms, mode=mode)) == \
                _res(rebuilt.lookup(terms, mode=mode)), (terms, mode)
    # BM25 bit-parity includes the maintained avgdl
    got = _res(idx.lookup_bm25(["def", "src"], mode="or"), "score_micros")
    want = _res(rebuilt.lookup_bm25(["def", "src"], mode="or"),
                "score_micros")
    assert got == want and got


@pytest.mark.usefixtures("ray_session")
def test_refresh_reflects_deletes_and_updates(half_built, tmp_path):
    log_dir, lake, idx, meta = half_built
    g0 = idx.meta["watermark"]
    run_replication(log_dir, lake, num_partitions=8, history=True)
    diff = lake_diff(lake, g0).take_all()
    deleted = [r for r in diff if r["change"] == "d"]
    updated = [r for r in diff if r["change"] == "u"]
    assert deleted and updated
    idx.refresh(lake)

    # a deleted doc matches nothing, even for its own old tokens
    dk = "\x1f".join(
        str(deleted[0][c]) for c in ("table", "repo", "path"))
    hits = _res(idx.lookup(["def"], mode="or"))
    assert dk not in hits

    # an updated doc surfaces ONCE (old generation fenced), with the
    # new content's term frequency
    uk = "\x1f".join(
        str(updated[0][c]) for c in ("table", "repo", "path"))
    rebuilt = LakeTextIndex.build(lake, str(tmp_path / "idx_rb2"))
    assert _res(idx.lookup(["def"], mode="or")).get(uk) == \
        _res(rebuilt.lookup(["def"], mode="or")).get(uk)


@pytest.mark.usefixtures("ray_session")
def test_refresh_noop_and_crash_rerun_idempotent(half_built):
    log_dir, lake, idx, meta = half_built
    base = _res(idx.lookup(["def"], mode="or"))

    # same watermark -> no-op
    s = idx.refresh(lake)
    assert s["changed"] == 0
    assert _res(idx.lookup(["def"], mode="or")) == base

    run_replication(log_dir, lake, num_partitions=8, history=True)
    # simulate a crash AFTER the data writes but BEFORE the meta commit:
    # run a full refresh, then roll meta/overlay back and refresh again —
    # fenced filenames must make the second pass byte-identical, not
    # append duplicates
    meta0 = dict(idx.meta)
    overlay0 = dict(idx.overlay)
    idx.refresh(lake)
    after_first = _res(idx.lookup(["def"], mode="or"))
    meta1 = dict(idx.meta)
    idx._commit_meta(overlay=overlay0, **{
        k: meta0[k] for k in ("watermark", "n_docs", "total_tokens")})
    s2 = idx.refresh(lake)
    assert s2["changed"] > 0
    assert _res(idx.lookup(["def"], mode="or")) == after_first
    # the counters must ALSO survive the crash-rerun: the superseded
    # state is computed at the committed watermark, so the crashed
    # attempt's already-written rows/tombstones must not skew the
    # n_docs/total_tokens deltas (they feed every BM25 score)
    assert idx.meta["n_docs"] == meta1["n_docs"]
    assert idx.meta["total_tokens"] == meta1["total_tokens"]
    assert idx.meta["watermark"] == meta1["watermark"]


@pytest.mark.usefixtures("ray_session")
def test_compact_equals_rebuild(half_built, tmp_path):
    """build → refresh → COMPACT must equal a fresh rebuild for term
    lookup AND BM25 (counters recomputed exactly), with the overlay
    cleared and every refresh-generation file physically gone."""
    import glob

    log_dir, lake, idx, meta = half_built
    run_replication(log_dir, lake, num_partitions=8, history=True)
    idx.refresh(lake)
    assert idx.overlay
    stats = idx.compact()
    assert stats["overlay_cleared"] > 0
    assert not stats["counters_drifted"]
    assert idx.overlay == {}
    assert not glob.glob(
        os.path.join(idx.index_dir, "*", "*", "refresh-*.parquet"))

    rebuilt = LakeTextIndex.build(lake, str(tmp_path / "idx_rb3"))
    assert idx.meta["n_docs"] == rebuilt.meta["n_docs"]
    assert idx.meta["total_tokens"] == rebuilt.meta["total_tokens"]
    assert idx.meta["watermark"] == rebuilt.meta["watermark"]
    for terms in TERMS:
        for mode in ("and", "or"):
            assert _res(idx.lookup(terms, mode=mode)) == \
                _res(rebuilt.lookup(terms, mode=mode)), (terms, mode)
    got = _res(idx.lookup_bm25(["def", "src"], mode="or"), "score_micros")
    want = _res(rebuilt.lookup_bm25(["def", "src"], mode="or"),
                "score_micros")
    assert got == want and got

    # refresh after compact is a no-op at the same watermark and the
    # compacted sidecar still answers the superseded-state read
    s = idx.refresh(lake)
    assert s["changed"] == 0


@pytest.mark.usefixtures("ray_session")
def test_compact_sweeps_crashed_refresh(half_built, tmp_path):
    """A refresh that crashed before its meta commit leaves fenced
    files at the TARGET watermark; compact at the committed watermark
    must sweep them (seq fence), restoring exactly the committed state
    — then a re-run refresh converges to the rebuild."""
    log_dir, lake, idx, meta = half_built
    committed = _res(idx.lookup(["def"], mode="or"))
    run_replication(log_dir, lake, num_partitions=8, history=True)
    meta0 = dict(idx.meta)
    overlay0 = dict(idx.overlay)
    idx.refresh(lake)  # full refresh ...
    idx._commit_meta(overlay=overlay0, **{  # ... then roll back = crash
        k: meta0[k] for k in ("watermark", "n_docs", "total_tokens")})
    stats = idx.compact()
    assert not stats["counters_drifted"]
    assert _res(idx.lookup(["def"], mode="or")) == committed

    s = idx.refresh(lake)
    assert s["changed"] > 0
    rebuilt = LakeTextIndex.build(lake, str(tmp_path / "idx_rb4"))
    assert idx.meta["n_docs"] == rebuilt.meta["n_docs"]
    assert idx.meta["total_tokens"] == rebuilt.meta["total_tokens"]
    assert _res(idx.lookup(["def"], mode="or")) == \
        _res(rebuilt.lookup(["def"], mode="or"))


@pytest.mark.usefixtures("ray_session")
def test_compact_then_refresh(half_built, tmp_path):
    """Compact between build and refresh (no overlay yet): the compacted
    base sidecar must still serve the superseded-state read the next
    refresh needs, and the CLI verb wraps the same call."""
    import json
    import subprocess
    import sys

    log_dir, lake, idx, meta = half_built
    r = subprocess.run(
        [sys.executable, "-m", "database_delta_plugins_ray",
         "--num-cpus", "2", "index", "compact",
         "--lake", lake, "--index", idx.index_dir],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["n_docs"] > 0 and not stats["counters_drifted"]

    idx = LakeTextIndex(idx.index_dir)
    run_replication(log_dir, lake, num_partitions=8, history=True)
    s = idx.refresh(lake)
    assert s["changed"] > 0
    rebuilt = LakeTextIndex.build(lake, str(tmp_path / "idx_rb5"))
    got = _res(idx.lookup_bm25(["def", "src"], mode="or"), "score_micros")
    want = _res(rebuilt.lookup_bm25(["def", "src"], mode="or"),
                "score_micros")
    assert got == want and got


def test_vector_search_lake_matches_brute(ray_session):
    """The CDC-refreshed vector index's top-10 must equal brute-force
    cosine over a ONE-SHOT replay's final-state embeddings — only true
    if the refresh upserted changed keys and tombstoned deletions
    exactly (the second half of the log updates and deletes keys)."""
    import numpy as np

    from database_delta_plugins_ray.pipelines.queries import (
        VEC_KEY_SEP,
        _content_vecs,
        cdc_vector_search_lake,
        ensure_log,
        fresh_lake,
    )
    from database_delta_plugins_ray.pipelines.replicate import (
        final_state,
        run_replication,
    )

    sf = "/root/testdata/sf0.001"
    got = cdc_vector_search_lake(sf)

    log = ensure_log(sf)
    ref_lake = fresh_lake(sf, "lake_vecidx_ref")
    run_replication(log, ref_lake, num_partitions=8)
    rows = final_state(
        ref_lake, columns=["table", "repo", "path", "content"]).take_all()
    ids = [VEC_KEY_SEP.join(map(str, (r["table"], r["repo"], r["path"])))
           for r in rows]
    vecs = _content_vecs([r["content"] for r in rows])
    q = _content_vecs(["vector probe"])[0]
    scores = vecs @ q
    order = sorted(range(len(ids)),
                   key=lambda i: (-scores[i], ids[i]))[:10]
    want_ids = [ids[i] for i in order]
    assert list(got["vec_id"]) == want_ids
    np.testing.assert_allclose(
        got["score"], np.round(scores[order].astype(np.float64), 6),
        atol=1e-6)


def test_cli_vecindex_lifecycle(ray_session, tmp_path):
    """CLI verbs wrap the vector-index build/refresh/compact/search
    lifecycle over a history lake."""
    import json
    import subprocess
    import sys

    from database_delta_plugins_ray.pipelines.queries import ensure_log
    from database_delta_plugins_ray.pipelines.replicate import (
        run_replication,
    )

    sf = "/root/testdata/sf0.001"
    log = ensure_log(sf)
    lake = str(tmp_path / "lake")
    idx = str(tmp_path / "vecidx")
    import os as _os

    with open(_os.path.join(log, "meta.json")) as fh:
        half = json.load(fh)["max_lsn"] // 2
    run_replication(log, lake, num_partitions=8, history=True,
                    upto_lsn=half)

    def cli(*args):
        r = subprocess.run(
            [sys.executable, "-m", "database_delta_plugins_ray",
             "--num-cpus", "2", "vecindex", *args],
            capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, r.stderr[-2000:]
        return [json.loads(x) for x in r.stdout.strip().splitlines()]

    b = cli("build", "--lake", lake, "--index", idx, "--clusters", "8")
    assert b[-1]["n_clusters"] == 8
    run_replication(log, lake, num_partitions=8, history=True)
    rf = cli("refresh", "--lake", lake, "--index", idx)
    assert rf[-1]["changed"] > 0
    rows = cli("search", "--lake", lake, "--index", idx,
               "--text", "vector probe", "--nprobe", "8")
    assert len(rows) == 10 and all("vec_id" in r for r in rows)
    c = cli("compact", "--lake", lake, "--index", idx)
    assert c[-1]["rows"] > 0
    rows2 = cli("search", "--lake", lake, "--index", idx,
                "--text", "vector probe", "--nprobe", "8")
    assert [r["vec_id"] for r in rows2] == [r["vec_id"] for r in rows]


def test_follow_refreshes_vecindex(ray_session, tmp_path):
    """replicate --follow --refresh-vecindex keeps the vector index
    current with the lake: after the follow drain, a probe over the
    index equals brute force over the final state."""
    import json
    import subprocess
    import sys

    import numpy as np

    from database_delta_plugins_ray.pipelines.queries import (
        VEC_KEY_SEP,
        _content_vecs,
        ensure_log,
        lake_vector_index_build,
    )
    from database_delta_plugins_ray.pipelines.replicate import (
        final_state,
        run_replication,
    )
    from database_delta_plugins_ray.stages.similarity import IVFDiskIndex

    sf = "/root/testdata/sf0.001"
    log = ensure_log(sf)
    lake = str(tmp_path / "lake")
    idx = str(tmp_path / "vecidx")
    with open(f"{log}/meta.json") as fh:
        half = json.load(fh)["max_lsn"] // 2
    run_replication(log, lake, num_partitions=8, history=True,
                    upto_lsn=half)
    lake_vector_index_build(lake, idx, n_clusters=8)

    r = subprocess.run(
        [sys.executable, "-m", "database_delta_plugins_ray", "--num-cpus",
         "2", "replicate", "--log", log, "--lake", lake, "--partitions",
         "8", "--history", "--follow", "--idle-stop", "2",
         "--poll-interval", "0.2", "--refresh-vecindex", idx],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]

    q = _content_vecs(["vector probe"])[0]
    got = IVFDiskIndex(idx).search(q, k=10, nprobe=8)
    rows = final_state(
        lake, columns=["table", "repo", "path", "content"]).take_all()
    ids = [VEC_KEY_SEP.join(map(str, (x["table"], x["repo"], x["path"])))
           for x in rows]
    vecs = _content_vecs([x["content"] for x in rows])
    scores = vecs @ q
    order = sorted(range(len(ids)),
                   key=lambda i: (-scores[i], ids[i]))[:10]
    assert list(got["vec_id"]) == [ids[i] for i in order]


def test_vecindex_compact_preserves_watermark(ray_session, small_log,
                                              tmp_path):
    """compact() stages a fresh index dir and swaps it in; the lake
    watermark stamp lives in that dir but belongs to the lake-index
    layer — a compact between build and refresh must not destroy it
    (refresh would crash on the missing file)."""
    import json

    from database_delta_plugins_ray.pipelines.queries import (
        VEC_KEY_SEP,
        _content_vecs,
        lake_vector_index_build,
        lake_vector_index_refresh,
    )
    from database_delta_plugins_ray.pipelines.replicate import final_state
    from database_delta_plugins_ray.stages.similarity import IVFDiskIndex

    log_dir, _, meta = small_log
    lake = str(tmp_path / "lake")
    idx_dir = str(tmp_path / "vecidx")
    half = meta["max_lsn"] // 2
    run_replication(log_dir, lake, num_partitions=8, history=True,
                    upto_lsn=half)
    lake_vector_index_build(lake, idx_dir, n_clusters=8)
    IVFDiskIndex(idx_dir).compact()
    with open(os.path.join(idx_dir, "lake_watermark.json")) as fh:
        wm = json.load(fh)["watermark"]  # stamp survived the swap
    assert isinstance(wm, int) and 0 < wm <= half

    run_replication(log_dir, lake, num_partitions=8, history=True)
    s = lake_vector_index_refresh(lake, idx_dir)
    assert s["changed"] > 0

    q = _content_vecs(["vector probe"])[0]
    got = IVFDiskIndex(idx_dir).search(q, k=10, nprobe=8)
    rows = final_state(
        lake, columns=["table", "repo", "path", "content"]).take_all()
    ids = [VEC_KEY_SEP.join(map(str, (x["table"], x["repo"], x["path"])))
           for x in rows]
    vecs = _content_vecs([x["content"] for x in rows])
    scores = vecs @ q
    order = sorted(range(len(ids)),
                   key=lambda i: (-scores[i], ids[i]))[:10]
    assert list(got["vec_id"]) == [ids[i] for i in order]


@pytest.mark.usefixtures("ray_session")
def test_refresh_lake_index_autocompacts(half_built, tmp_path):
    """The follow-mode maintenance step (refresh_lake_index, the CLI's
    --refresh-index hook): past the overlay limit the refresh is
    followed by a compaction — overlay resets, counters stay exact, and
    lookups equal a full rebuild."""
    from database_delta_plugins_ray.stages.invindex import (
        refresh_lake_index)

    log_dir, lake, idx, meta = half_built
    run_replication(log_dir, lake, num_partitions=8, history=True)
    out = refresh_lake_index(idx.index_dir, lake, compact_overlay_limit=1)
    assert out["changed"] > 0 and out.get("compacted") is True
    assert out["overlay_before"] >= 1

    fresh = LakeTextIndex(idx.index_dir)
    assert fresh.overlay == {}  # the segment merge reset the overlay
    rebuilt = LakeTextIndex.build(lake, str(tmp_path / "idx_rb2"))
    assert fresh.meta["n_docs"] == rebuilt.meta["n_docs"]
    assert fresh.meta["total_tokens"] == rebuilt.meta["total_tokens"]
    for terms in TERMS:
        assert _res(fresh.lookup(terms, mode="or")) == \
            _res(rebuilt.lookup(terms, mode="or")), terms

    # below the limit: no compaction, overlay persists
    out2 = refresh_lake_index(idx.index_dir, lake,
                              compact_overlay_limit=10**9)
    assert out2["changed"] == 0 and "compacted" not in out2
