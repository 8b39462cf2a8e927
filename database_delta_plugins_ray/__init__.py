"""Ray-Data-native CDC / incremental-ingest engine with a training-data
query catalog.

Top-level convenience API (each symbol lazy-imports its module so that
``import database_delta_plugins_ray`` stays cheap in Ray workers):

    run_replication / follow_replication / final_state   CDC replay
    generate_log / GenConfig                             simulated binlog
    CDC_QUERIES / ANALYTICS_QUERIES                      query catalog

CLI: ``python -m database_delta_plugins_ray --help`` (gen, replicate,
stop, vacuum, stats, catalog, query).
"""
from __future__ import annotations

__all__ = [
    "run_replication", "follow_replication", "final_state",
    "generate_log", "GenConfig",
    "CDC_QUERIES", "ANALYTICS_QUERIES",
]


def __getattr__(name: str):
    if name in ("run_replication", "follow_replication", "final_state"):
        from .pipelines import replicate

        return getattr(replicate, name)
    if name in ("generate_log", "GenConfig"):
        from .sources import gen

        return getattr(gen, name)
    if name == "CDC_QUERIES":
        from .pipelines.queries import CDC_QUERIES

        return CDC_QUERIES
    if name == "ANALYTICS_QUERIES":
        from .pipelines.analytics import ANALYTICS_QUERIES

        return ANALYTICS_QUERIES
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
