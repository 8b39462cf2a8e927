"""Dead-letter queue semantics (errors.tolerance=all analog): poisoned
events route to lake/_dlq instead of failing the job; the lake equals the
LWW over clean events; the DLQ read is exact (deduped) even though the
DLQ write is at-least-once."""

import os

import pandas as pd
import pytest

from database_delta_plugins_ray.pipelines.replicate import (
    final_state,
    log_max_lsn,
    read_dlq,
    run_replication,
)
from database_delta_plugins_ray.sources.gen import GenConfig, generate_log


@pytest.fixture(scope="module")
def poison_log(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("poison") / "log")
    generate_log(d, GenConfig(n_keys=500, n_events=3_000, n_repos=8, seed=33,
                              poison_frac=0.05))
    return d


def _expected_poison(log_dir) -> pd.DataFrame:
    import pyarrow.dataset as pads

    segs = [os.path.join(log_dir, f) for f in sorted(os.listdir(log_dir))
            if f.startswith("seg-")]
    t = pads.dataset(segs, format="parquet").to_table(
        columns=["lsn", "op", "before", "after"]).to_pandas()
    bad = t[(t["op"] == "X")
            | (t["op"].isin(["I", "U"]) & t["after"].isna())
            | ((t["op"] == "D") & t["before"].isna())]
    return bad


def test_fail_mode_raises(ray_session, poison_log, tmp_path):
    with pytest.raises(Exception):  # DeltaFailure inside a Ray task
        run_replication(poison_log, str(tmp_path / "boom"), num_partitions=4)


def test_dlq_mode_completes_and_captures_exactly_the_poison(
        ray_session, poison_log, tmp_path):
    lake = str(tmp_path / "lake")
    s = run_replication(poison_log, lake, num_partitions=4, on_error="dlq")
    assert s["rows"] > 0

    exp = _expected_poison(poison_log)
    assert len(exp) > 50  # discriminative corpus

    dlq = read_dlq(lake).to_pandas()
    assert set(dlq["lsn"]) == set(exp["lsn"])
    assert len(dlq) == len(set(dlq["lsn"]))  # deduped
    reasons = dict(zip(dlq["lsn"], dlq["reason"]))
    for _, r in exp.iterrows():
        want = "unknown_op" if r["op"] == "X" else "null_primary_key"
        assert reasons[r["lsn"]] == want

    # lake state == LWW over the CLEAN events only
    import pyarrow.dataset as pads

    segs = [os.path.join(poison_log, f)
            for f in sorted(os.listdir(poison_log)) if f.startswith("seg-")]
    t = pads.dataset(segs, format="parquet").to_table(
        columns=["lsn", "op", "before", "after"]).to_pandas()
    clean = t[t["op"].isin(["I", "U", "D"])
              & ~t["lsn"].isin(set(exp["lsn"]))].sort_values("lsn")
    key = clean.apply(
        lambda r: ((r["after"] or r["before"])["repo"],
                   (r["after"] or r["before"])["path"]), axis=1)
    last = clean.assign(key=key).groupby("key").tail(1)
    want_keys = set(last[last["op"] != "D"]["key"])
    got = final_state(lake, columns=["repo", "path"]).to_pandas()
    assert set(zip(got["repo"], got["path"])) == want_keys


def test_dlq_dedups_across_resume_replay(ray_session, poison_log, tmp_path):
    """A bounded run + full resume re-routes nothing extra: the DLQ read
    stays exactly the poison set."""
    lake = str(tmp_path / "lake_r")
    half = log_max_lsn(poison_log) // 2
    run_replication(poison_log, lake, num_partitions=4, on_error="dlq",
                    upto_lsn=half)
    run_replication(poison_log, lake, num_partitions=4, on_error="dlq")
    exp = _expected_poison(poison_log)
    dlq = read_dlq(lake).to_pandas()
    assert set(dlq["lsn"]) == set(exp["lsn"])
    assert len(dlq) == len(set(dlq["lsn"]))
