"""Pure-Python oracle replay of an event log.

Single-threaded, dict-based, trivially-correct reference implementation of
the target-apply contract (reference: the Delta app's BigQuery target,
observable at mysql-delta-plugins/src/e2e-test/java/io/cdap/plugin/
BQValidation.java:86-90 — ordered apply, last-writer-wins upsert by primary
key, delete removes). Used by tests to validate the Ray pipeline's final
lake state via per-row content sha256 equality (BASELINE.json input_hint).
"""

from __future__ import annotations

import glob
import hashlib
import json
import os

import pyarrow.parquet as pq

from ..model import (
    OP_DDL,
    OP_DELETE,
    DDL_TRUNCATE_TABLE,
    DDL_DROP_TABLE,
    DDL_RENAME_TABLE,
)


def replay(log_dir: str, upto_lsn: int | None = None) -> dict:
    """Replay every event in lsn order; return final state.

    Returns ``{(table, repo, path): row_dict}`` where row_dict holds the
    *final logical schema* columns (rename applied: ``language`` =
    coalesce(language, lang)) plus ``_sequence_num`` (winning lsn) and
    ``content_sha`` (sha256 hex of content).
    """
    files = sorted(glob.glob(os.path.join(log_dir, "seg-*.parquet")))
    state: dict = {}
    table_renames: dict[str, str] = {}
    for f in files:
        tbl = pq.read_table(f)
        rows = tbl.to_pylist()
        for ev in rows:
            lsn = ev["lsn"]
            if upto_lsn is not None and lsn > upto_lsn:
                continue
            table = ev["table"]
            table = table_renames.get(table, table)
            if ev["op"] == OP_DDL:
                ddl = ev["ddl"]
                if ddl["op"] in (DDL_TRUNCATE_TABLE, DDL_DROP_TABLE):
                    for k in [k for k in state if k[0] == table]:
                        del state[k]
                elif ddl["op"] == DDL_RENAME_TABLE:
                    new = json.loads(ddl["payload"]).get("new_name") or ddl["table"]
                    prev = ddl["prev_table"]
                    # re-point earlier chain entries (A->B then B->C must
                    # leave A->C), mirroring state/ddl.py apply_ddl
                    for k, v in list(table_renames.items()):
                        if v == prev:
                            table_renames[k] = new
                    table_renames[prev] = new
                    for k in [k for k in state if k[0] == ddl["prev_table"]]:
                        row = state.pop(k)
                        state[(new, k[1], k[2])] = row
                continue
            if ev["op"] == OP_DELETE:
                img = ev["before"]
                key = (table, img["repo"], img["path"])
                state.pop(key, None)
                continue
            img = ev["after"]
            key = (table, img["repo"], img["path"])
            content = img["content"]
            state[key] = {
                "repo": img["repo"],
                "path": img["path"],
                "commit": img["commit"],
                "language": img["language"] if img["language"] is not None else img["lang"],
                "content": content,
                "stars": img["stars"],
                "content_sha": hashlib.sha256(content.encode()).hexdigest(),
                "_sequence_num": lsn,
                "table": table,
            }
    return state


def state_signature(state: dict) -> str:
    """Order-insensitive sha256 over (key, content_sha, _sequence_num)."""
    h = hashlib.sha256()
    for key in sorted(state):
        row = state[key]
        h.update(
            f"{key}|{row['content_sha']}|{row['_sequence_num']}|{row['commit']}|"
            f"{row['language']}|{row['stars']}\n".encode()
        )
    return h.hexdigest()
