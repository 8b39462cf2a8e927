"""JSONL corpus export."""
import numpy as np


def test_jsonl_export_roundtrip_and_skip(ray_session, tmp_path):
    """JSONL shards reload to the exact source rows; unchanged-source
    re-export is a manifest-hit no-op; routing matches md5 % nshards."""
    import glob as _glob
    import json

    import pandas as pd
    import ray.data as rd

    from database_delta_plugins_ray.stages.export import export_corpus_jsonl
    from database_delta_plugins_ray.stages.sample import md5_u64

    df = pd.DataFrame({"doc_id": np.arange(200),
                       "text": [f"doc {i} body" for i in range(200)]})
    out = str(tmp_path / "jsonl")
    m = export_corpus_jsonl(rd.from_pandas(df).repartition(5), out,
                            nshards=4, source_tag="v1")
    assert m["total_rows"] == 200 and not m["skipped"]
    # round-trip every shard; each row sits in its md5-routed shard
    back = []
    for d in sorted(_glob.glob(out + "/shard=*")):
        s = int(d.rsplit("=", 1)[1])
        for f in _glob.glob(d + "/*.jsonl"):
            with open(f) as fh:
                for line in fh:
                    r = json.loads(line)
                    assert md5_u64(np.array([r["doc_id"]])) % 4 == s
                    back.append((r["doc_id"], r["text"]))
    assert sorted(back) == list(zip(df["doc_id"], df["text"]))
    # per-shard manifest counts agree with reality
    assert sum(m["shards"].values()) == 200
    m2 = export_corpus_jsonl(rd.from_pandas(df), out, nshards=4,
                             source_tag="v1")
    assert m2["skipped"]
    m3 = export_corpus_jsonl(rd.from_pandas(df), out, nshards=4,
                             source_tag="v2")  # source changed -> rebuild
    assert not m3["skipped"]
