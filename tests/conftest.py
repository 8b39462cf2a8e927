import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_log(tmp_path_factory):
    """Shared deterministic event log (snapshot + stream + DDL plan)."""
    from database_delta_plugins_ray.sources.gen import GenConfig, generate_log

    d = str(tmp_path_factory.mktemp("cdc") / "log")
    cfg = GenConfig(n_keys=300, n_events=2000, n_repos=10, seed=42, n_segments=4)
    meta = generate_log(d, cfg)
    return d, cfg, meta
