"""Lake drift-report gates (maintenance.lake_drift_report). The driver
gate (cdc_drift_report) is hash-exact vs a DuckDB PSI oracle; these
tests add the zero-drift identity, partition invariance, and the
null-category path."""
import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def drifted_lake(ray_session, tmp_path_factory):
    from database_delta_plugins_ray.pipelines.replicate import (
        run_replication)
    from database_delta_plugins_ray.sources.gen import (
        GenConfig, generate_log)

    from database_delta_plugins_ray.pipelines.queries import (
        _time_travel_boundary)

    d = tmp_path_factory.mktemp("drift")
    log = str(d / "log")
    lake = str(d / "lake")
    generate_log(log, GenConfig(n_keys=200, n_events=1500, seed=31))
    # the as-of point must postdate the monitored columns' schema
    # evolution (the time-travel read contract; the query uses the
    # same boundary rule)
    half = _time_travel_boundary(log)
    run_replication(log, lake, num_partitions=4, upto_lsn=half,
                    history=True)
    run_replication(log, lake, num_partitions=4, history=True)
    return lake, half


def test_zero_drift_at_same_version(ray_session, drifted_lake):
    from database_delta_plugins_ray.pipelines.maintenance import (
        lake_drift_report)
    from database_delta_plugins_ray.state import checkpoint as ckpt

    lake, _ = drifted_lake
    g = ckpt.read_global_watermark(lake)
    r = lake_drift_report(lake, g)
    assert (r["count_v0"] == r["count_v1"]).all()
    assert (r["contrib_micros"] == 0).all()


def test_drift_detects_movement_and_null_category(ray_session,
                                                  drifted_lake):
    from database_delta_plugins_ray.pipelines.maintenance import (
        lake_drift_report)

    lake, half = drifted_lake
    r = lake_drift_report(lake, half)
    # the second half applied events: totals differ somewhere
    assert (r["count_v0"] != r["count_v1"]).any()
    # PSI contributions are non-negative by construction
    assert (r["contrib_micros"] >= 0).all()
    # stars is null until the ALTER adds it: the '<null>' category exists
    stars = r[r["col"] == "stars"]
    assert "<null>" in set(stars["category"])


def test_report_is_deterministic(ray_session, drifted_lake):
    from database_delta_plugins_ray.pipelines.maintenance import (
        lake_drift_report)

    lake, half = drifted_lake
    a = lake_drift_report(lake, half)
    b = lake_drift_report(lake, half)
    pd.testing.assert_frame_equal(a, b)
