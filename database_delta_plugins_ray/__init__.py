"""Ray-Data-native CDC / incremental-ingest engine with a training-data
query catalog.

Top-level convenience API (each symbol lazy-imports its module so that
``import database_delta_plugins_ray`` stays cheap in Ray workers):

    run_replication / follow_replication / final_state   CDC replay
    maintain_view / read_view                            incremental views
    shuffle_hash_join                                    join family
    generate_log / GenConfig                             simulated binlog
    CDC_QUERIES / ANALYTICS_QUERIES                      query catalog

CLI: ``python -m database_delta_plugins_ray --help`` (gen, replicate,
stop, view, vacuum, stats, catalog, query).
"""
from __future__ import annotations

__all__ = [
    "run_replication", "follow_replication", "final_state",
    "maintain_view", "read_view", "shuffle_hash_join",
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
    if name in ("maintain_view", "read_view"):
        from .pipelines import ivm

        return getattr(ivm, name)
    if name == "shuffle_hash_join":
        from .stages.join import shuffle_hash_join

        return shuffle_hash_join
    if name == "CDC_QUERIES":
        from .pipelines.queries import CDC_QUERIES

        return CDC_QUERIES
    if name == "ANALYTICS_QUERIES":
        from .pipelines.analytics import ANALYTICS_QUERIES

        return ANALYTICS_QUERIES
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
