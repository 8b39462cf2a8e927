"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship CDC replication pipeline at sf0.001 scale;
``queries()`` exposes one callable per implemented operator/pipeline
(SURVEY.md §2); ``oracle_sql()`` gives the DuckDB-equivalent SQL for the
SQL-expressible ones. Ray is initialised by the driver before this module
is imported — nothing here calls ``ray.init``/``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: full CDC replay -> final lake state (sf0.001)."""
    from database_delta_plugins_ray.pipelines.queries import cdc_final_state

    return cdc_final_state("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from database_delta_plugins_ray.pipelines.queries import CDC_QUERIES

    out: dict[str, Callable[[str], Any]] = {}
    out.update(CDC_QUERIES)
    try:
        from database_delta_plugins_ray.pipelines.analytics import ANALYTICS_QUERIES

        out.update(ANALYTICS_QUERIES)
    except ImportError:
        pass
    return out


def oracle_sql() -> dict[str, str]:
    from database_delta_plugins_ray.pipelines.queries import (
        cdc_oracle_sql,
        ensure_log,
        ensure_typed_log,
        ensure_variant_log,
    )

    # the driver compares at sf=0.01; make sure the logs the SQL reads exist
    ensure_log("/root/testdata/sf0.01")
    ensure_typed_log("/root/testdata/sf0.01")
    ensure_variant_log("/root/testdata/sf0.01", "mt_log", n_tables=2,
                       ddl_plan=False)
    ensure_variant_log("/root/testdata/sf0.01", "trunc_log",
                       truncate_frac=0.5, ddl_plan=False)
    ensure_variant_log("/root/testdata/sf0.01", "noddl_log",
                       ddl_plan=False, snapshot=False)
    out = dict(cdc_oracle_sql("0.01"))
    try:
        from database_delta_plugins_ray.pipelines.analytics import ANALYTICS_ORACLE_SQL

        out.update(ANALYTICS_ORACLE_SQL)
    except ImportError:
        pass
    return out
