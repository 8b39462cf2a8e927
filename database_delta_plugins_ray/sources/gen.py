"""Deterministic synthetic binlog / WAL generator.

Plays the role of the reference's Debezium embedded engine + MySQL binlog
(mysql-delta-plugins/src/main/java/io/cdap/delta/mysql/MySqlEventReader.java:85-174):
it produces a totally-ordered change log (monotone ``lsn``) for the
source-code table ``(repo, path, commit, lang, content)`` with PK
``(repo, path)``, written as Parquet *segments* (one file per contiguous
``lsn`` range, row order == log order — the Ray source preserves file order).

Semantics reproduced from the reference:

* snapshot phase: the golden DDL prefix ``[DROP_TABLE, DROP_DATABASE,
  CREATE_DATABASE, CREATE_TABLE]`` followed by one INSERT per existing row,
  all flagged ``is_snapshot`` (MySqlEventReaderIntegrationTest.java:182-245).
* stream phase: INSERT / UPDATE / DELETE per key in log order; an UPDATE
  carries both ``before`` and ``after`` images, a DELETE carries the before
  image (MySqlRecordConsumer.java:218-225).
* DDL interleaved with DML at exact log positions, bumping
  ``schema_version`` (ALTER add column / rename column / widen —
  FIXTURES.md F5, assessor rules SURVEY.md §1.2b).
* transaction ids in binlog ``file:pos`` style (MySqlRecordConsumer.java:190-195).

Everything is a pure function of the seed — the pure-Python oracle
(pipelines/oracle.py) replays the same files.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, asdict, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..model import (
    DEFAULT_DATABASE,
    DEFAULT_TABLE,
    DDL_ALTER_TABLE,
    DDL_CREATE_DATABASE,
    DDL_CREATE_TABLE,
    DDL_DROP_DATABASE,
    DDL_DROP_TABLE,
    DDL_STRUCT,
    DDL_TRUNCATE_TABLE,
    OP_DDL,
    OP_DELETE,
    OP_INSERT,
    OP_UPDATE,
    PAYLOAD_STRUCT,
    UNION_PAYLOAD_FIELDS,
    event_log_schema,
)

LANGS = np.array(["py", "java", "rs", "go", "ts", "c", "cpp", "rb"])

_INGEST_EPOCH_MS = 1_700_000_000_000


@dataclass
class GenConfig:
    """Knobs for the deterministic log generator."""

    n_keys: int = 2_000
    n_events: int = 10_000  # stream DML events (snapshot inserts extra)
    n_repos: int = 24
    n_base: int | None = None  # keys existing at snapshot; default n_keys // 2
    seed: int = 42
    skew: str = "zipf"  # "zipf" | "uniform" key popularity
    zipf_a: float = 1.35
    p_delete: float = 0.08
    snapshot: bool = True
    ddl_plan: bool = True  # inject ALTER add/rename/widen mid-stream
    truncate_frac: float | None = None  # stream fraction where TRUNCATE fires
    n_segments: int = 8
    table: str = DEFAULT_TABLE
    n_tables: int = 1  # keys spread over N tables: <table>, <table>_1, ...
    content_pad: int = 160  # approximate bytes of content body
    #: reference edge (MySqlEventReader.java:144-155): all snapshot DATA
    #: events share ONE offset — a resume cannot position inside the
    #: snapshot, so mid-snapshot restarts re-dump from scratch. The DDL
    #: prefix keeps distinct lsns (schema phase precedes the data phase).
    snapshot_shared_offset: bool = False
    #: mean events per stream transaction (1 = per-event autocommit). When
    #: >1, consecutive stream events share a tx_id encoding the tx's FIRST
    #: lsn ("binlog.<seg>:<start_lsn>") — contiguous runs, the MySQL binlog
    #: shape (all row events of one tx are consecutive, then the XID commit;
    #: the reference stamps the same transactionId on each DMLEvent,
    #: MySqlRecordConsumer.java:209-225).
    tx_size: int = 1
    #: DBLog-style chunked snapshot (Andreakis & Papapanagiotou 2019;
    #: Debezium "incremental snapshot"): instead of a blocking base dump
    #: before the stream, the base table is read in PK-range CHUNKS
    #: interleaved WITH the live stream. Each chunk's rows reflect the
    #: table state at the chunk's low-watermark position and carry
    #: tx_id "chunk:<low_watermark_lsn>"; the engine orders them at the
    #: low watermark so later stream events win reconciliation. Requires
    #: the fixed-schema single-table shape (no ddl_plan / truncate).
    incremental_snapshot: bool = False
    snapshot_chunks: int = 8
    #: fraction of stream events emitted POISONED (malformed, the
    #: errors.tolerance=all / dead-letter-queue scenario): half get an
    #: unknown op code ("X"), half lose the row image their op needs
    #: (insert/update: null after; delete: null before). Poisoned events
    #: occupy their lsn slot but carry no applicable row, so the correct
    #: final state is the LWW over the CLEAN events only.
    poison_frac: float = 0.0

    def table_names(self) -> list[str]:
        return [self.table] + [f"{self.table}_{i}" for i in range(1, self.n_tables)]

    def resolved_base(self) -> int:
        return self.n_keys // 2 if self.n_base is None else self.n_base


# ---------------------------------------------------------------------------
# vectorized helpers
# ---------------------------------------------------------------------------


def _hex_u64(a: np.ndarray) -> np.ndarray:
    """Vectorized 16-char lower hex of a uint64 array."""
    a = a.astype(np.uint64, copy=False)
    digits = np.array(list("0123456789abcdef"), dtype="<U1")
    out = np.empty((len(a), 16), dtype="<U1")
    for i in range(16):
        out[:, 15 - i] = digits[((a >> np.uint64(4 * i)) & np.uint64(0xF)).astype(np.int64)]
    return out.view("<U16").ravel()


def _mix(key: np.ndarray, version: np.ndarray, salt: int) -> np.ndarray:
    k = key.astype(np.uint64)
    v = version.astype(np.uint64)
    h = k * np.uint64(0x9E3779B97F4A7C15) + v * np.uint64(0xC2B2AE3D27D4EB4F)
    h ^= np.uint64((salt * 0xD6E8FEB86659FD93) % 2**64)
    h ^= h >> np.uint64(29)
    h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(32)
    return h


def _join(*parts) -> pa.Array:
    """Vectorized element-wise string concat (Arrow kernel; python str args
    broadcast as scalars)."""
    args = [p if isinstance(p, (pa.Array, pa.ChunkedArray)) else pa.scalar(p)
            for p in parts]
    return pa.compute.binary_join_element_wise(*args, "")


def _int_str(a: np.ndarray, width: int = 0) -> pa.Array:
    s = pa.compute.cast(pa.array(a.astype(np.int64)), pa.string())
    if width:
        s = pa.compute.utf8_lpad(s, width, padding="0")
    return s


def commit_hash(key: np.ndarray, version: np.ndarray) -> pa.Array:
    """Deterministic 40-hex 'commit sha' per (key, version)."""
    h1 = pa.array(_hex_u64(_mix(key, version, 1)))
    h2 = pa.array(_hex_u64(_mix(key, version, 2)))
    h3 = pa.compute.utf8_slice_codeunits(
        pa.array(_hex_u64(_mix(key, version, 3))), 0, 8
    )
    return _join(h1, h2, h3)


def key_repo_path(key: np.ndarray, n_repos: int, n_keys: int) -> tuple[pa.Array, pa.Array]:
    """Deterministic (repo, path) strings for key ids.

    Repos are zipf-sized: repo index = floor(n_repos * u^2) biases keys
    toward low-index repos (hot repos), deterministically from the key id.
    """
    u = (_mix(key, np.zeros_like(key), 7).astype(np.float64) / 2**64)
    repo_idx = np.minimum((n_repos * u * u).astype(np.int64), n_repos - 1)
    repo = _join("repo-", _int_str(repo_idx, 4))
    k = key.astype(np.int64)
    path = _join(
        "src/pkg_", _int_str(k // 64, 4), "/mod_", _int_str(k, 7), ".",
        pa.array(LANGS[k % len(LANGS)]),
    )
    return repo, path


def content_for(
    repo: pa.Array, path: pa.Array, version: np.ndarray, key: np.ndarray, pad: int
) -> pa.Array:
    """Deterministic content body per (key, version); ~pad bytes."""
    h = _mix(key, version, 11)
    line = _join(
        "x = 0x", pa.array(_hex_u64(h)), "\ndef f():\n    return ",
        _int_str((h % np.uint64(9973)).astype(np.int64)),
    )
    reps = max(1, pad // 48)
    body_parts: list = []
    for i in range(reps):
        if i:
            body_parts.append("\n")
        body_parts.append(line)
    return pa.compute.cast(
        _join("// ", repo, "/", path, " @v", _int_str(version), "\n", *body_parts),
        pa.large_string(),
    )


def _segmented_state(key_ids: np.ndarray, del_flag: np.ndarray, in_base_k: np.ndarray):
    """Compute (op_codes, version_after) per event, in log (draw) order.

    Implements the per-key lifecycle state machine vectorized:
    op = I if key not live, D if flagged while live, else U;
    version increments on I/U.
    """
    n = len(key_ids)
    order = np.argsort(key_ids, kind="stable")
    ko = key_ids[order]
    f = del_flag[order].copy()
    first = np.zeros(n, dtype=bool)
    if n:
        first[0] = True
        first[1:] = ko[1:] != ko[:-1]
    base_k = in_base_k[ko]

    # ignore delete flag on the creating event of a non-base key
    f[first & ~base_k] = False

    # d_j = f_j & ~d_{j-1} (reset at key boundary) -> alternating within runs
    prev_f = np.r_[False, f[:-1]]
    run_start = f & (~prev_f | first)
    rs_idx = np.where(run_start, np.arange(n), -1)
    last_rs = np.maximum.accumulate(rs_idx)
    d = f & ((np.arange(n) - last_rs) % 2 == 0)

    prev_d = np.r_[False, d[:-1]]
    prev_d[first] = False
    is_insert = (first & ~base_k) | prev_d
    op = np.where(d, OP_DELETE, np.where(is_insert, OP_INSERT, OP_UPDATE))

    # version_after = base_offset + (# of non-D events among 0..j inclusive)
    nd = (~d).astype(np.int64)
    c = np.cumsum(nd)
    seg_start_c = np.where(first, c - nd, 0)
    seg_base = np.maximum.accumulate(np.where(first, seg_start_c, np.int64(np.iinfo(np.int64).min)))
    within = c - seg_base
    version_after = base_k.astype(np.int64) + within

    # back to log order
    inv = np.empty(n, dtype=np.int64)
    inv[order] = np.arange(n)
    return op[inv], version_after[inv]


# ---------------------------------------------------------------------------
# payload construction
# ---------------------------------------------------------------------------


def _payload_struct(
    key: np.ndarray,
    version: np.ndarray,
    schema_version: np.ndarray,
    valid: np.ndarray,
    cfg: GenConfig,
) -> pa.StructArray:
    """Build the union-payload struct for rows where ``valid``; null elsewhere.

    Columns obey schema-version validity: ``stars`` only for sv>=1,
    ``language`` (renamed from ``lang``) only for sv>=2.
    """
    repo, path = key_repo_path(key, cfg.n_repos, cfg.n_keys)
    commit = commit_hash(key, version)
    lang_vals = pa.array(LANGS[key.astype(np.int64) % len(LANGS)])
    content = content_for(repo, path, version, key, cfg.content_pad)
    stars = pa.array((_mix(key, version, 5) % np.uint64(100_000)).astype(np.int64))

    has_stars = schema_version >= 1
    renamed = schema_version >= 2

    mask_invalid = ~valid  # True where struct is null

    def col(arr: pa.Array, null_extra: np.ndarray | None = None) -> pa.Array:
        null_mask = mask_invalid if null_extra is None else (mask_invalid | null_extra)
        if null_mask.any():
            arr = pa.compute.if_else(
                pa.array(~null_mask), arr, pa.scalar(None, arr.type)
            )
        if isinstance(arr, pa.ChunkedArray):  # string kernels chunk >2GiB
            arr = arr.combine_chunks()
        return arr

    arrays = [
        col(repo),
        col(path),
        col(commit),
        col(lang_vals, null_extra=renamed),
        col(content),
        col(stars, null_extra=~has_stars),
        col(lang_vals, null_extra=~renamed),
    ]
    return pa.StructArray.from_arrays(
        arrays, fields=list(UNION_PAYLOAD_FIELDS), mask=pa.array(mask_invalid)
    )


def _null_struct(n: int, typ) -> pa.Array:
    return pa.nulls(n, type=typ)


# ---------------------------------------------------------------------------
# main entry
# ---------------------------------------------------------------------------


def generate_log(out_dir: str, cfg: GenConfig | None = None, **kw) -> dict:
    """Write the event log (Parquet segments + ``meta.json``) to ``out_dir``.

    Returns the meta dict. Idempotent for a given config: if ``meta.json``
    exists with the same config, generation is skipped.
    """
    cfg = cfg or GenConfig(**kw)
    meta_path = os.path.join(out_dir, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            meta = json.load(fh)
        if meta.get("config") == asdict(cfg):
            return meta

    rng = np.random.default_rng(cfg.seed)
    n_base = cfg.resolved_base() if cfg.snapshot else 0
    n = cfg.n_events
    if cfg.incremental_snapshot:
        if cfg.ddl_plan or cfg.truncate_frac is not None or cfg.n_tables > 1:
            raise ValueError(
                "incremental_snapshot models a fixed-schema single-table "
                "chunk scan (set ddl_plan=False, no truncate, n_tables=1)")
        n_base = cfg.resolved_base()

    # --- stream key draws (log order) ---
    if cfg.skew == "zipf":
        raw = rng.zipf(cfg.zipf_a, size=n)
        key_ids = (raw - 1) % cfg.n_keys
    else:
        key_ids = rng.integers(0, cfg.n_keys, size=n)
    key_ids = key_ids.astype(np.int64)
    del_flag = rng.random(n) < cfg.p_delete
    in_base_k = np.zeros(cfg.n_keys, dtype=bool)
    in_base_k[:n_base] = True

    op, version = _segmented_state(key_ids, del_flag, in_base_k)

    # --- DDL injection positions (index into the stream) ---
    ddl_rows: list[tuple[int, str, str, str, str]] = []  # (pos, ddl_op, table, prev, payload)
    if cfg.ddl_plan:
        p1, p2, p3 = int(0.30 * n), int(0.55 * n), int(0.70 * n)
        ddl_rows += [
            (p1, DDL_ALTER_TABLE, cfg.table, "",
             json.dumps({"action": "add", "column": "stars", "type": "int64"})),
            (p2, DDL_ALTER_TABLE, cfg.table, "",
             json.dumps({"action": "rename", "column": "lang", "new_name": "language"})),
            (p3, DDL_ALTER_TABLE, cfg.table, "",
             json.dumps({"action": "widen", "column": "stars", "type": "int64",
                         "from_type": "int32"})),
        ]
    if cfg.truncate_frac is not None:
        ddl_rows.append(
            (int(cfg.truncate_frac * n), DDL_TRUNCATE_TABLE, cfg.table, "", "{}")
        )
    ddl_rows.sort(key=lambda r: r[0])

    # schema_version per stream event = # ALTERs at position <= event
    # position; the ALTER plan targets table 0 only, so events of other
    # tables stay at schema_version 0
    alter_pos = np.array([p for p, o, *_ in ddl_rows if o == DDL_ALTER_TABLE], dtype=np.int64)
    sv_stream = np.searchsorted(alter_pos, np.arange(n), side="right").astype(np.int32)
    if cfg.n_tables > 1:
        sv_stream = np.where((key_ids % cfg.n_tables) == 0, sv_stream, 0).astype(np.int32)

    # --- assemble global log: prefix DDL, snapshot inserts, stream(+DDL) ---
    tables: list[pa.Table] = []
    lsn_cursor = 1

    def ddl_table(lsns, ops, tbls, prevs, payloads, svs):
        m = len(lsns)
        ddl = pa.StructArray.from_arrays(
            [pa.array(ops), pa.array(tbls), pa.array(prevs), pa.array(payloads)],
            fields=list(DDL_STRUCT),
        )
        return pa.table(
            {
                "lsn": pa.array(lsns, pa.int64()),
                "tx_id": pa.array([f"ddl:{l}" for l in lsns]),
                "op": pa.array([OP_DDL] * m),
                "table": pa.array(tbls),
                "before": _null_struct(m, PAYLOAD_STRUCT),
                "after": _null_struct(m, PAYLOAD_STRUCT),
                "ddl": ddl,
                "is_snapshot": pa.array([False] * m),
                "ingest_ts": pa.array(
                    (np.asarray(lsns, np.int64) + _INGEST_EPOCH_MS), pa.timestamp("ms")
                ),
                "schema_version": pa.array(svs, pa.int32()),
            },
            schema=event_log_schema(),
        )

    tnames = cfg.table_names()
    tname_arr = np.array(tnames)
    key_table = tname_arr[np.arange(cfg.n_keys, dtype=np.int64) % cfg.n_tables]

    if cfg.snapshot:
        # golden DDL prefix (MySqlEventReaderIntegrationTest.java:182-245):
        # DROP_TABLE per table, DROP/CREATE_DATABASE once, CREATE_TABLE per
        # table (with schema + PK)
        schema_json = json.dumps(
            {
                "columns": [["repo", "string"], ["path", "string"], ["commit", "string"],
                            ["lang", "string"], ["content", "large_string"]],
                "primary_key": ["repo", "path"],
            }
        )
        T = cfg.n_tables
        prefix_ops = ([DDL_DROP_TABLE] * T
                      + [DDL_DROP_DATABASE, DDL_CREATE_DATABASE]
                      + [DDL_CREATE_TABLE] * T)
        prefix_tbls = (tnames + [DEFAULT_DATABASE, DEFAULT_DATABASE] + tnames)
        prefix_payloads = (["{}"] * (T + 2) + [schema_json] * T)
        m = len(prefix_ops)
        tables.append(
            ddl_table(
                list(range(1, m + 1)),
                prefix_ops,
                prefix_tbls,
                [""] * m,
                prefix_payloads,
                [0] * m,
            )
        )
        lsn_cursor = m + 1
        if n_base and not cfg.incremental_snapshot:
            bkeys = np.arange(n_base, dtype=np.int64)
            bver = np.ones(n_base, dtype=np.int64)
            bsv = np.zeros(n_base, dtype=np.int32)
            if cfg.snapshot_shared_offset:
                # one offset for the whole snapshot data phase
                lsns = np.full(n_base, lsn_cursor + n_base - 1, dtype=np.int64)
            else:
                lsns = np.arange(lsn_cursor, lsn_cursor + n_base, dtype=np.int64)
            after = _payload_struct(bkeys, bver, bsv, np.ones(n_base, bool), cfg)
            tables.append(
                pa.table(
                    {
                        "lsn": pa.array(lsns),
                        "tx_id": _join("binlog.000001:", _int_str(lsns)),
                        "op": pa.array(np.full(n_base, OP_INSERT)),
                        "table": pa.array(key_table[bkeys]),
                        "before": _null_struct(n_base, PAYLOAD_STRUCT),
                        "after": after,
                        "ddl": _null_struct(n_base, DDL_STRUCT),
                        "is_snapshot": pa.array(np.ones(n_base, bool)),
                        "ingest_ts": pa.array(lsns + _INGEST_EPOCH_MS, pa.timestamp("ms")),
                        "schema_version": pa.array(np.zeros(n_base, np.int32)),
                    },
                    schema=event_log_schema(),
                )
            )
            lsn_cursor += n_base

    # stream: interleave DDL at their positions; lsn = cursor + position + #ddl before
    ddl_positions = np.array([p for p, *_ in ddl_rows], dtype=np.int64)
    ddl_before = np.searchsorted(ddl_positions, np.arange(n), side="right")

    # --- DBLog chunked snapshot: PK-range chunks of the base table read at
    # positions spread over the first 60% of the stream, each reflecting
    # the per-key state AS OF its position (composite searchsorted over the
    # (key, position) event index). Chunk blocks occupy their own lsns,
    # shifting the stream exactly like interleaved DDL does.
    chunk_block = None
    chunk_pos = np.array([], dtype=np.int64)
    if cfg.incremental_snapshot and n_base and n:
        C = max(1, min(cfg.snapshot_chunks, n_base))
        chunk_pos = (np.arange(1, C + 1, dtype=np.int64) * 3 * n) // (5 * (C + 1))
        if len(np.unique(chunk_pos)) != C:
            raise ValueError("n_events too small for snapshot_chunks")
        kbounds = np.linspace(0, n_base, C + 1).astype(np.int64)
        comp = key_ids * np.int64(n + 1) + np.arange(n, dtype=np.int64)
        order_c = np.argsort(comp)
        comp_s = comp[order_c]
        keys_all, vers_all, svs_all = [], [], []
        sizes = np.zeros(C, np.int64)
        for c in range(C):
            kc = np.arange(kbounds[c], kbounds[c + 1], dtype=np.int64)
            q = kc * np.int64(n + 1) + np.int64(chunk_pos[c])
            idx = np.searchsorted(comp_s, q) - 1
            has = (idx >= 0) & (comp_s[np.maximum(idx, 0)] // np.int64(n + 1) == kc)
            last = order_c[np.maximum(idx, 0)]
            # untouched base keys carry the v1 base image; a key whose last
            # pre-chunk event deleted it is absent from the chunk read
            alive = np.where(has, op[last] != OP_DELETE, True)
            ver = np.where(has, version[last], 1)
            svp = np.where(has, sv_stream[last], 0).astype(np.int32)
            sizes[c] = int(alive.sum())
            keys_all.append(kc[alive])
            vers_all.append(ver[alive])
            svs_all.append(svp[alive])
        csum = np.cumsum(sizes)
        k_at = np.searchsorted(chunk_pos, np.arange(n), side="right")
        chunk_before = np.where(k_at > 0, csum[np.maximum(k_at - 1, 0)], 0)
        block_starts = lsn_cursor + chunk_pos + np.r_[0, csum[:-1]]
        chunk_block = (keys_all, vers_all, svs_all, block_starts, sizes)
    else:
        chunk_before = np.zeros(n, dtype=np.int64)

    lsn_stream = lsn_cursor + np.arange(n, dtype=np.int64) + ddl_before + chunk_before
    lsn_ddl = lsn_cursor + ddl_positions + np.arange(len(ddl_rows), dtype=np.int64)

    # DML stream table
    has_after = op != OP_DELETE
    has_before = op != OP_INSERT
    op_out = op
    if cfg.poison_frac > 0 and n:
        prng = np.random.default_rng(cfg.seed + 311)
        pmask = prng.random(n) < cfg.poison_frac
        pidx = np.flatnonzero(pmask)
        bad_op = pidx[::2]          # unknown op code
        bad_img = pidx[1::2]        # needed row image nulled
        op_out = op.copy()
        op_out[bad_op] = "X"
        null_after = bad_img[op[bad_img] != OP_DELETE]
        null_before = bad_img[op[bad_img] == OP_DELETE]
        has_after = has_after.copy()
        has_before = has_before.copy()
        has_after[null_after] = False
        has_before[null_before] = False
    before_ver = np.where(op == OP_DELETE, version, version - 1)
    after = _payload_struct(key_ids, version, sv_stream, has_after, cfg)
    before = _payload_struct(key_ids, before_ver, sv_stream, has_before, cfg)
    seg_no = 2 + (lsn_stream * cfg.n_segments) // (lsn_stream.max() + 1) if n else lsn_stream
    if cfg.tx_size > 1 and n:
        # contiguous multi-event transactions: a MySQL binlog transaction is
        # an unbroken run of row events ending in an XID/commit marker, so a
        # tx occupies CONSECUTIVE lsns and tx_id encodes its first lsn.
        # Deterministic variable run lengths (mean ~tx_size); boundaries are
        # forced where a DDL interleaves (DDL is auto-commit in MySQL — it
        # can never sit inside a tx) and at binlog segment rollovers (a tx
        # cannot span files).
        rng = np.random.default_rng(cfg.seed + 1009)
        is_start = rng.integers(0, cfg.tx_size, n) == 0
        is_start[0] = True
        is_start[1:] |= ddl_before[1:] != ddl_before[:-1]
        if len(chunk_pos):  # a tx cannot span an interleaved chunk block
            is_start[chunk_pos[chunk_pos < n]] = True
        is_start[1:] |= np.asarray(seg_no)[1:] != np.asarray(seg_no)[:-1]
        start_idx = np.maximum.accumulate(np.where(is_start, np.arange(n), 0))
        tx_lsn = lsn_stream[start_idx]
    else:
        tx_lsn = lsn_stream
    tx = _join("binlog.", _int_str(seg_no, 6), ":", _int_str(tx_lsn))
    stream_tbl = pa.table(
        {
            "lsn": pa.array(lsn_stream),
            "tx_id": tx,
            "op": pa.array(op_out),
            "table": pa.array(key_table[key_ids]),
            "before": before,
            "after": after,
            "ddl": _null_struct(n, DDL_STRUCT),
            "is_snapshot": pa.array(np.zeros(n, bool)),
            "ingest_ts": pa.array(lsn_stream + _INGEST_EPOCH_MS, pa.timestamp("ms")),
            "schema_version": pa.array(sv_stream, pa.int32()),
        },
        schema=event_log_schema(),
    )
    tables.append(stream_tbl)
    if chunk_block is not None:
        keys_all, vers_all, svs_all, block_starts, sizes = chunk_block
        for c in range(len(sizes)):
            m_c = int(sizes[c])
            if m_c == 0:
                continue
            lsns_c = int(block_starts[c]) + np.arange(m_c, dtype=np.int64)
            after_c = _payload_struct(keys_all[c], vers_all[c], svs_all[c],
                                      np.ones(m_c, bool), cfg)
            tables.append(pa.table(
                {
                    "lsn": pa.array(lsns_c),
                    "tx_id": pa.array([f"chunk:{int(block_starts[c])}"] * m_c),
                    "op": pa.array(np.full(m_c, OP_INSERT)),
                    "table": pa.array(key_table[keys_all[c]]),
                    "before": _null_struct(m_c, PAYLOAD_STRUCT),
                    "after": after_c,
                    "ddl": _null_struct(m_c, DDL_STRUCT),
                    "is_snapshot": pa.array(np.ones(m_c, bool)),
                    "ingest_ts": pa.array(lsns_c + _INGEST_EPOCH_MS,
                                          pa.timestamp("ms")),
                    "schema_version": pa.array(svs_all[c], pa.int32()),
                },
                schema=event_log_schema(),
            ))
    if ddl_rows:
        svs = np.searchsorted(alter_pos, ddl_positions, side="right").astype(np.int32)
        tables.append(
            ddl_table(
                lsn_ddl.tolist(),
                [r[1] for r in ddl_rows],
                [r[2] for r in ddl_rows],
                [r[3] for r in ddl_rows],
                [r[4] for r in ddl_rows],
                svs.tolist(),
            )
        )

    log = pa.concat_tables(tables)
    log = log.take(pa.compute.sort_indices(log, sort_keys=[("lsn", "ascending")]))

    # --- write segments ---
    os.makedirs(out_dir, exist_ok=True)
    for old in os.listdir(out_dir):
        if old.startswith("seg-"):
            os.remove(os.path.join(out_dir, old))
    total = log.num_rows
    n_seg = max(1, min(cfg.n_segments, total))
    bounds = np.linspace(0, total, n_seg + 1).astype(np.int64)
    seg_files = []
    for i in range(n_seg):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        if hi <= lo:
            continue
        fname = f"seg-{i:05d}.parquet"
        pq.write_table(log.slice(lo, hi - lo), os.path.join(out_dir, fname))
        seg_files.append(fname)

    meta = {
        "config": asdict(cfg),
        "total_events": total,
        "dml_events": int(n + n_base),
        "ddl_events": int(total - n - n_base),
        "max_lsn": int(log["lsn"][total - 1].as_py()) if total else 0,
        "segments": seg_files,
        "table": cfg.table,
        "ddl_lsns": {
            str(int(l)): r[1] for l, r in zip(lsn_ddl, ddl_rows)
        },
        "snapshot_shared_lsn": (
            int(lsn_cursor - 1)
            if (cfg.snapshot and cfg.snapshot_shared_offset and n_base)
            else None),
    }
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(meta, fh, indent=1)
    os.replace(tmp, meta_path)
    return meta
