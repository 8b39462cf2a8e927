"""CLI `export --mode tokens`: lake live rows -> trained BPE -> packed
uint32 token shards, manifest arithmetic consistent with the shard
bytes."""
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CLI = [sys.executable, "-m", "database_delta_plugins_ray", "--num-cpus", "4"]


def test_cli_tokens_export(tmp_path):
    env = dict(os.environ, PYTHONPATH=REPO, RAY_ADDRESS="local")
    log = str(tmp_path / "log")
    lake = str(tmp_path / "lake")
    out = str(tmp_path / "tok")
    subprocess.run(
        CLI + ["gen", "--out", log, "--keys", "60", "--events", "300"],
        check=True, capture_output=True, env=env, cwd=REPO)
    subprocess.run(
        CLI + ["replicate", "--log", log, "--lake", lake,
               "--partitions", "4"],
        check=True, capture_output=True, env=env, cwd=REPO)
    r = subprocess.run(
        CLI + ["export", "--lake", lake, "--out", out, "--mode", "tokens",
               "--seq-tokens", "64", "--bpe-merges", "25", "--shards", "4"],
        check=True, capture_output=True, text=True, env=env, cwd=REPO)
    m = json.loads(r.stdout.strip().splitlines()[-1])
    assert m["format"] == "packed-tokens-v1"
    assert m["dtype"] == "uint32" and m["total_docs"] > 0

    # shard bytes match the manifest arithmetic exactly
    total = 0
    for sh in m["shards"]:
        f = os.path.join(out, f"shard-{sh['bucket']:05d}.bin")
        n = os.path.getsize(f) // 4
        assert n == sh["n_tokens"]
        assert sh["start_token"] == total
        total += n
    assert total == m["total_tokens"]

    # every id is in-vocab; EOD count equals the document count
    with open(os.path.join(out, "vocab.json")) as fh:
        vocab_n = len(json.load(fh)["tokens"])
    ids = np.concatenate([
        np.fromfile(os.path.join(out, f"shard-{sh['bucket']:05d}.bin"),
                    dtype="<u4") for sh in m["shards"]])
    assert ids.max() < vocab_n
    assert int((ids == 1).sum()) == m["total_docs"]  # one <eod> per doc
