"""Lake resharding (cluster resize): P -> P' re-partitioning with
exactly-once continuation.

The north rule runs the engine at N and 4N nodes; the lake's partition
count is the unit of merge parallelism, so a resize wants a re-shard.
Parity bar: replicate-half -> reshard -> continue must equal a one-shot
replication at the new partition count (same keys, same winning rows).
"""

import json
import os

import pytest

from database_delta_plugins_ray.pipelines.maintenance import reshard_lake
from database_delta_plugins_ray.pipelines.oracle import replay
from database_delta_plugins_ray.pipelines.replicate import (
    final_state,
    lookup_keys,
    read_lake,
    run_replication,
)
from database_delta_plugins_ray.state import checkpoint as ckpt


def _state_map(rows):
    return {
        (r["table"], r["repo"], r["path"]):
            (r["content_sha"], r["commit"], r["_sequence_num"])
        for r in rows
    }


def _oracle_map(log_dir):
    # replay() already drops deleted keys from its final state
    return {
        k: (v["content_sha"], v["commit"], v["_sequence_num"])
        for k, v in replay(log_dir).items()
    }


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("new_parts", [16, 3])
def test_reshard_then_continue_matches_oracle(small_log, tmp_path, new_parts):
    log_dir, _, meta = small_log
    lake = str(tmp_path / f"lake{new_parts}")
    dest = str(tmp_path / f"resharded{new_parts}")
    half = meta["max_lsn"] // 2

    run_replication(log_dir, lake, num_partitions=8, upto_lsn=half)
    s = reshard_lake(lake, dest, new_partitions=new_parts)
    assert s["new_partitions"] == new_parts
    assert s["watermark"] >= 1

    # pinned config rewritten for the new layout
    with open(os.path.join(dest, ckpt.CHECKPOINT_DIR, "lake_config.json")) as fh:
        assert json.load(fh)["num_partitions"] == new_parts

    # continuation applies only the unseen half, exactly once
    s2 = run_replication(log_dir, dest, num_partitions=new_parts)
    assert 0 < s2["events_applied"]
    got = _state_map(final_state(dest).take_all())
    assert got == _oracle_map(log_dir)

    # rerun is a no-op (watermarks carried + advanced correctly)
    s3 = run_replication(log_dir, dest, num_partitions=new_parts)
    assert s3["events_applied"] == 0


@pytest.mark.usefixtures("ray_session")
def test_reshard_preserves_tombstones_and_routing(small_log, tmp_path):
    log_dir, _, meta = small_log
    lake = str(tmp_path / "lakeT")
    dest = str(tmp_path / "reshardT")
    run_replication(log_dir, lake, num_partitions=8)

    before = read_lake(lake).take_all()
    n_tomb = sum(1 for r in before if r["_is_deleted"])
    assert n_tomb > 0

    reshard_lake(lake, dest, new_partitions=5)
    after = read_lake(dest).take_all()
    assert sum(1 for r in after if r["_is_deleted"]) == n_tomb
    assert _state_map(r for r in after if not r["_is_deleted"]) == \
        _state_map(r for r in before if not r["_is_deleted"])

    # physical placement agrees with partition_of_keys on the NEW config:
    # point lookups (which route via the pinned config) find every key
    live = [r for r in after if not r["_is_deleted"]][:20]
    keys = [(r["table"], r["repo"], r["path"]) for r in live]
    t = lookup_keys(dest, keys)
    assert t.num_rows == len(keys)
    got = dict(zip(zip(t["table"].to_pylist(), t["repo"].to_pylist(),
                       t["path"].to_pylist()), t["content_sha"].to_pylist()))
    for r in live:
        assert got[(r["table"], r["repo"], r["path"])] == r["content_sha"]


@pytest.mark.usefixtures("ray_session")
def test_reshard_refuses_crashed_lake_and_existing_dest(small_log, tmp_path):
    log_dir, _, meta = small_log
    lake = str(tmp_path / "lakeG")
    dest = str(tmp_path / "reshardG")
    run_replication(log_dir, lake, num_partitions=4)

    # dest already a lake
    reshard_lake(lake, dest, new_partitions=8)
    with pytest.raises(FileExistsError):
        reshard_lake(lake, dest, new_partitions=8)

    # simulate a crash window: a partition manifest past the global
    # watermark means events in (G, hi] may be applied in SOME partitions
    # only — resharding through it would fence them out forever
    m = ckpt.read_manifest(lake, 0)
    m["last_lsn"] = meta["max_lsn"] + 1000
    ckpt.write_manifest(lake, 0, m)
    with pytest.raises(ValueError, match="global"):
        reshard_lake(lake, str(tmp_path / "other"), new_partitions=8)


@pytest.mark.usefixtures("ray_session")
def test_reshard_history_does_not_span_the_cut(small_log, tmp_path):
    log_dir, _, meta = small_log
    lake = str(tmp_path / "lakeH")
    dest = str(tmp_path / "reshardH")
    run_replication(log_dir, lake, num_partitions=4)
    reshard_lake(lake, dest, new_partitions=8)
    g = ckpt.read_global_watermark(dest)
    assert g == ckpt.read_global_watermark(lake)
    with pytest.raises(ValueError, match="horizon"):
        read_lake(dest, as_of_lsn=g - 1)


@pytest.mark.usefixtures("ray_session")
def test_reshard_salted_lake(small_log, tmp_path):
    """Resharding a repo_salted lake carries the pinned salt map into
    the new config; continuation and point lookups stay exact."""
    log_dir, _, meta = small_log
    lake = str(tmp_path / "lakeS")
    dest = str(tmp_path / "reshardS")
    half = meta["max_lsn"] // 2
    run_replication(log_dir, lake, num_partitions=8,
                    partition_mode="repo_salted", upto_lsn=half)
    reshard_lake(lake, dest, new_partitions=12)

    with open(os.path.join(dest, ckpt.CHECKPOINT_DIR,
                           "lake_config.json")) as fh:
        cfg = json.load(fh)
    assert cfg["partition_mode"] == "repo_salted"
    assert cfg["num_partitions"] == 12
    with open(os.path.join(lake, ckpt.CHECKPOINT_DIR,
                           "lake_config.json")) as fh:
        assert cfg["repo_salt"] == json.load(fh)["repo_salt"]

    run_replication(log_dir, dest, num_partitions=12,
                    partition_mode="repo_salted")
    got = _state_map(final_state(dest).take_all())
    assert got == _oracle_map(log_dir)

    live = final_state(dest).take_all()[:10]
    keys = [(r["table"], r["repo"], r["path"]) for r in live]
    t = lookup_keys(dest, keys)
    assert t.num_rows == len(keys)


@pytest.mark.usefixtures("ray_session")
def test_lake_signature_layout_independent(small_log, tmp_path):
    """The content signature is invariant under resharding and OPTIMIZE
    (layout changes) but flips when the logical state changes."""
    from database_delta_plugins_ray.pipelines.maintenance import (
        lake_signature,
        optimize_lake,
        reshard_lake,
    )

    log_dir, _, meta = small_log
    lake = str(tmp_path / "lakeSig")
    dest = str(tmp_path / "lakeSig2")
    half = meta["max_lsn"] // 2
    run_replication(log_dir, lake, num_partitions=8, upto_lsn=half)
    s_half = lake_signature(lake)

    reshard_lake(lake, dest, new_partitions=3)
    assert lake_signature(dest) == s_half          # reshard: same state

    optimize_lake(dest)
    assert lake_signature(dest) == s_half          # optimize: same state

    run_replication(log_dir, dest, num_partitions=3)
    s_full = lake_signature(dest)
    assert s_full != s_half                        # more events: flips

    # an independently replicated lake at a different partition count
    # agrees — the anti-entropy replica check
    other = str(tmp_path / "lakeSig3")
    run_replication(log_dir, other, num_partitions=16)
    assert lake_signature(other) == s_full
