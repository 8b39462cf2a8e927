"""Foreign-store sink: apply the lake to a DuckDB database and VALIDATE
source-vs-target parity — the engine's analog of the reference's
end-to-end contract against a live external target
(mysql-delta-plugins/src/e2e-test/java/io/cdap/plugin/BQValidation.java:
55-90: pull both sides, compare row by row after the soft-delete
filter).

Three operations, all incremental and watermark-fenced exactly like the
lake's own consumers:

* ``duckdb_full_load`` — stream the lake's live rows (``final_state``
  batches, never a driver materialization of the corpus) into a fresh
  target table; stamp the lake watermark in a ``_sink_state`` table
  inside the SAME database, so target data and its position commit
  together (DuckDB transactions are the fence here). The target mirrors
  EVERY lake column — a pruned mirror could not survive a later column
  rename (untouched rows would hold NULLs the lake doesn't).
* ``duckdb_apply_changes`` — advance the target from its stamped
  watermark using the change data feed (``lake_diff``): per Arrow batch
  of changed keys, one set-based ``DELETE ... USING batch`` then one
  ``INSERT ... WHERE change <> 'd'`` — the standard upsert-into-a-
  SQL-store shape; cost is O(churn), never O(table). TARGET SCHEMA
  EVOLUTION rides the lake's own schema history (the rename/add/widen
  registry the reference's assessor dictates): renamed columns become
  ``ALTER ... RENAME COLUMN`` (history_names gives old->final),
  added columns ``ADD COLUMN``, widened columns ``SET DATA TYPE``.
  Idempotent: deletes + inserts + watermark bump are ONE DuckDB
  transaction, so a crashed apply re-runs off the old watermark.
* ``duckdb_validate`` — the BQValidation analog: row counts both sides
  plus a full-row symmetric difference (``EXCEPT ALL`` both ways) over
  the shared columns; returns mismatch counts (0 = parity). The lake
  side streams into a temp table batch by batch.

Scale note: the TARGET is a single-node SQL store by definition — this
sink proves the apply/validate contract against a foreign system; the
100-TB store is the Parquet lake itself. The lake→target transfer is
still streamed and churn-bounded.
"""
from __future__ import annotations

import os

import pyarrow as pa

__all__ = ["duckdb_full_load", "duckdb_apply_changes", "duckdb_validate"]

_STATE = "_sink_state"


def _key_cols(lake_dir: str) -> list[str]:
    from ..state import checkpoint as ckpt

    manifests = ckpt.all_manifests(lake_dir)
    if not manifests:
        raise FileNotFoundError(f"no committed partitions under {lake_dir}")
    any_m = next(iter(manifests.values()))
    return list(any_m.get("key_columns") or ["table", "repo", "path"])


def _q(c: str) -> str:
    return '"' + c.replace('"', '""') + '"'


def _duck_type(t: pa.DataType) -> str:
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "VARCHAR"
    if pa.types.is_int64(t) or pa.types.is_uint32(t):
        return "BIGINT"
    if pa.types.is_int32(t) or pa.types.is_int16(t) or pa.types.is_int8(t):
        return "INTEGER"
    if pa.types.is_floating(t):
        return "DOUBLE"
    if pa.types.is_boolean(t):
        return "BOOLEAN"
    if pa.types.is_date(t):
        return "DATE"
    if pa.types.is_timestamp(t):
        return "TIMESTAMP"
    if pa.types.is_decimal(t):
        return f"DECIMAL({t.precision},{t.scale})"
    if (pa.types.is_binary(t) or pa.types.is_large_binary(t)
            or pa.types.is_fixed_size_binary(t)):
        return "BLOB"
    return "VARCHAR"


def duckdb_full_load(lake_dir: str, db_path: str, *,
                     table: str = "lake_target") -> dict:
    """Create/replace ``table`` in ``db_path`` mirroring the lake's live
    rows (all columns) and stamp the lake watermark. Returns
    {rows, watermark}."""
    import duckdb

    from ..pipelines.replicate import final_state
    from ..state import checkpoint as ckpt

    g = int(ckpt.read_global_watermark(lake_dir))
    ds = final_state(lake_dir)
    # the soft-delete marker is engine bookkeeping, not table content —
    # a live mirror row is alive by definition (BQValidation filters it
    # out of the comparison the same way, :86-90)
    if "_is_deleted" in ds.schema().names:
        ds = ds.drop_columns(["_is_deleted"])
    con = duckdb.connect(db_path)
    try:
        con.execute("BEGIN")
        con.execute(f"DROP TABLE IF EXISTS {_q(table)}")
        n = 0
        made = False
        for batch in ds.iter_batches(batch_format="pyarrow"):
            con.register("_load_batch", batch)
            if not made:
                con.execute(f"CREATE TABLE {_q(table)} AS "
                            f"SELECT * FROM _load_batch")
                made = True
            else:
                con.execute(f"INSERT INTO {_q(table)} "
                            f"SELECT * FROM _load_batch")
            n += batch.num_rows
            con.unregister("_load_batch")
        if not made:
            raise ValueError(f"lake {lake_dir} has no live rows to load")
        con.execute(f"CREATE OR REPLACE TABLE {_STATE} AS SELECT "
                    f"? AS watermark, ? AS target_table", [g, table])
        con.execute("COMMIT")
    finally:
        con.close()
    return {"rows": n, "watermark": g}


def _evolve_target(con, table: str, lake_dir: str,
                   batch_schema: pa.Schema) -> list[str]:
    """Bring the target's columns up to the change feed's schema using
    the lake's own schema history (renames are ALTER RENAME, not
    drop+add — untouched rows keep their values), then adds and widens.
    Returns the target's column list after evolution."""
    from ..state import checkpoint as ckpt
    from ..state.ddl import Registry

    target_cols = [r[0] for r in con.execute(
        f"DESCRIBE {_q(table)}").fetchall()]
    diff_cols = [n for n in batch_schema.names
                 if n not in ("change", "_is_deleted")]

    hist_p = os.path.join(lake_dir, ckpt.CHECKPOINT_DIR,
                          "schema_history.jsonl")
    renames: dict[str, str] = {}
    if os.path.exists(hist_p):
        reg = Registry.load(hist_p)
        for ts in reg.tables.values():
            for final, hist in ts.history_names.items():
                for old in hist[1:]:
                    renames[old] = final
    for c in list(target_cols):
        f = renames.get(c)
        if (c not in diff_cols and f and f in diff_cols
                and f not in target_cols):
            con.execute(f"ALTER TABLE {_q(table)} RENAME COLUMN "
                        f"{_q(c)} TO {_q(f)}")
            target_cols[target_cols.index(c)] = f
    types = {r[0]: r[1] for r in con.execute(
        f"DESCRIBE {_q(table)}").fetchall()}
    for f in diff_cols:
        want = _duck_type(batch_schema.field(f).type)
        if f not in target_cols:
            con.execute(f"ALTER TABLE {_q(table)} ADD COLUMN "
                        f"{_q(f)} {want}")
            target_cols.append(f)
        elif (types.get(f, want), want) in (("INTEGER", "BIGINT"),
                                            ("FLOAT", "DOUBLE")):
            # genuine widen only (the registry's can_widen gated it).
            # NOT double-from-int: the change feed's outer merge
            # float64-ifies int columns in pandas — that is a wire
            # artifact, not a schema change, and DuckDB casts the
            # integral values back on INSERT
            con.execute(f"ALTER TABLE {_q(table)} ALTER COLUMN "
                        f"{_q(f)} SET DATA TYPE {want}")
    return target_cols


def duckdb_apply_changes(lake_dir: str, db_path: str, *,
                         table: str = "lake_target") -> dict:
    """Advance the target from its stamped watermark via the change data
    feed (requires a ``history=True`` lake). One transaction; idempotent
    re-run off the old watermark on a crash. Returns
    {changed, deleted, upserted, watermark}."""
    import duckdb

    from ..pipelines.replicate import lake_diff
    from ..state import checkpoint as ckpt

    keys = _key_cols(lake_dir)
    con = duckdb.connect(db_path)
    try:
        g0 = int(con.execute(
            f"SELECT watermark FROM {_STATE}").fetchone()[0])
        g1 = int(ckpt.read_global_watermark(lake_dir))
        if g1 <= g0:
            return {"changed": 0, "watermark": g0}
        diff = lake_diff(lake_dir, g0, to_lsn=g1)
        on = " AND ".join(f"{_q(table)}.{_q(k)} = b.{_q(k)}" for k in keys)
        changed = deleted = upserted = 0
        target_cols: list[str] | None = None
        con.execute("BEGIN")
        for batch in diff.iter_batches(batch_format="pyarrow"):
            if batch.num_rows == 0:
                continue
            if target_cols is None:
                target_cols = _evolve_target(con, table, lake_dir,
                                             batch.schema)
            diff_cols = set(batch.schema.names)
            sel = ", ".join(
                (f"b.{_q(c)}" if c in diff_cols else f"NULL AS {_q(c)}")
                for c in target_cols)
            con.register("b", batch)
            deleted += con.execute(
                f"DELETE FROM {_q(table)} USING b WHERE {on}"
            ).fetchone()[0]
            upserted += con.execute(
                f"INSERT INTO {_q(table)} SELECT {sel} FROM b "
                f"WHERE b.change <> 'd'").fetchone()[0]
            changed += batch.num_rows
            con.unregister("b")
        con.execute(f"UPDATE {_STATE} SET watermark = ?", [g1])
        con.execute("COMMIT")
    finally:
        con.close()
    return {"changed": changed, "deleted": deleted,
            "upserted": upserted, "watermark": g1}


def duckdb_validate(lake_dir: str, db_path: str, *,
                    table: str = "lake_target") -> dict:
    """BQValidation.java:55-90 analog: count both sides, then a
    full-row symmetric difference over the target's columns. Parity ==
    both mismatch counts 0 and equal counts."""
    import duckdb

    from ..pipelines.replicate import final_state

    con = duckdb.connect(db_path)
    try:
        target_cols = [r[0] for r in con.execute(
            f"DESCRIBE {_q(table)}").fetchall()]
        ds = final_state(lake_dir, columns=target_cols)
        con.execute("CREATE TEMP TABLE _lake_side AS "
                    f"SELECT * FROM {_q(table)} WHERE 1=0")
        cols = ", ".join(_q(c) for c in target_cols)
        for batch in ds.iter_batches(batch_format="pyarrow"):
            con.register("_v_batch", batch)
            con.execute(f"INSERT INTO _lake_side SELECT {cols} "
                        f"FROM _v_batch")
            con.unregister("_v_batch")
        n_src = con.execute(
            "SELECT count(*) FROM _lake_side").fetchone()[0]
        n_tgt = con.execute(
            f"SELECT count(*) FROM {_q(table)}").fetchone()[0]
        only_src = con.execute(
            f"SELECT count(*) FROM (SELECT {cols} FROM _lake_side "
            f"EXCEPT ALL SELECT {cols} FROM {_q(table)})").fetchone()[0]
        only_tgt = con.execute(
            f"SELECT count(*) FROM (SELECT {cols} FROM {_q(table)} "
            f"EXCEPT ALL SELECT {cols} FROM _lake_side)").fetchone()[0]
    finally:
        con.close()
    return {"rows_source": int(n_src), "rows_target": int(n_tgt),
            "only_in_source": int(only_src),
            "only_in_target": int(only_tgt),
            "parity": n_src == n_tgt and only_src == 0 and only_tgt == 0}
