"""Per-partition checkpoints and offset-fenced, idempotent Parquet commits.

Reproduces the reference's offset contract — the app commits the offset only
after the event is applied to the target (MySqlConstantOffsetBackingStore.java:30-32,
DBSchemaHistory.java:63-69), giving at-least-once delivery with idempotent
re-apply — natively for a Parquet lake:

* each partition's state lives at ``lake/part=NNNN/data-<last_lsn>.parquet``;
  the filename is a *fence*: re-executing the same input produces the same
  name and byte-identical content (atomic tmp+rename overwrite).
* each partition has a manifest ``lake/_checkpoints/part-NNNN.json`` carrying
  lineage: last applied lsn (watermark), cumulative event count, row counts,
  schema version — written atomically after the data commit.
* resume = read manifests, skip events with ``lsn <= watermark`` per
  partition (SqlServerRecordConsumer.java:93-97 duplicate-replay fence).
"""

from __future__ import annotations

import glob
import json
import os


CHECKPOINT_DIR = "_checkpoints"


def part_dir(lake_dir: str, part: int) -> str:
    return os.path.join(lake_dir, f"part={part:05d}")


def manifest_path(lake_dir: str, part: int) -> str:
    return os.path.join(lake_dir, CHECKPOINT_DIR, f"part-{part:05d}.json")


def _rebase(lake_dir: str, m: dict) -> dict:
    """Multi-node storage contract: a manifest may have been written by a
    process that mounted the lake at a DIFFERENT path (another node's
    mountpoint, or the lake directory was moved/renamed). Every data
    file a lake manifest references lives under the lake's own
    ``part=NNNNN`` directory, so stored paths are rebased onto THIS
    reader's ``lake_dir`` at load time — the stored absolute prefix is
    writer-local and never trusted across loads."""
    if "part" not in m:
        return m
    d = part_dir(lake_dir, int(m["part"]))
    out = dict(m)
    if m.get("file"):
        out["file"] = os.path.join(d, os.path.basename(m["file"]))
    if m.get("files"):
        out["files"] = [os.path.join(d, os.path.basename(f))
                        for f in m["files"]]
    return out


def read_manifest(lake_dir: str, part: int) -> dict | None:
    p = manifest_path(lake_dir, part)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return _rebase(lake_dir, json.load(fh))


def write_manifest(lake_dir: str, part: int, manifest: dict) -> None:
    p = manifest_path(lake_dir, part)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    tmp = p + f".tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, p)


def all_manifests(lake_dir: str) -> dict[int, dict]:
    out = {}
    for p in glob.glob(os.path.join(lake_dir, CHECKPOINT_DIR, "part-*.json")):
        with open(p) as fh:
            m = json.load(fh)
        out[m["part"]] = _rebase(lake_dir, m)
    return out


def global_watermark_path(lake_dir: str) -> str:
    return os.path.join(lake_dir, CHECKPOINT_DIR, "log_watermark.json")


def read_global_watermark(lake_dir: str) -> int:
    """Lake-level consumed-log watermark, written after a fully successful
    run: every event with lsn <= this has been routed to its partition and
    committed (including partitions that received no events at all, which
    have no manifest). Purely a read-pushdown optimization — per-partition
    fences inside the merger keep correctness even when this lags."""
    p = global_watermark_path(lake_dir)
    if not os.path.exists(p):
        return 0
    with open(p) as fh:
        return json.load(fh).get("lsn", 0)


def write_global_watermark(lake_dir: str, lsn: int) -> None:
    p = global_watermark_path(lake_dir)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    tmp = p + f".tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump({"lsn": int(lsn)}, fh)
    os.replace(tmp, p)


def min_watermark(lake_dir: str, num_partitions: int) -> int:
    """Coarse resume fence for the log read: events with lsn <= this are
    guaranteed already applied in EVERY partition. Uses the lake-level
    watermark (covers never-hit partitions); falls back to the min of
    per-partition manifests when a crash interrupted the last run."""
    g = read_global_watermark(lake_dir)
    ms = all_manifests(lake_dir)
    if len(ms) < num_partitions:
        return g
    return max(g, min(m["last_lsn"] for m in ms.values()))


def data_file(lake_dir: str, part: int, last_lsn: int) -> str:
    return os.path.join(part_dir(lake_dir, part), f"data-{last_lsn:020d}.parquet")


def version_log_path(lake_dir: str, part: int) -> str:
    return os.path.join(lake_dir, CHECKPOINT_DIR, f"part-{part:05d}.log.jsonl")


def append_version(lake_dir: str, part: int, manifest: dict) -> None:
    """Append a committed manifest to the partition's version log
    (history mode). Single writer per partition (the merger); a resumed
    run re-committing the same boundary appends a duplicate line, which
    ``version_log`` dedups by last_lsn keeping the LAST occurrence."""
    p = version_log_path(lake_dir, part)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "ab") as fh:
        if fh.tell() > 0:
            # a crash mid-append can leave a torn line missing its
            # newline; terminate it so THIS entry starts a fresh line
            # (the torn fragment then parses as its own skipped line
            # instead of swallowing this one)
            with open(p, "rb") as rd:
                rd.seek(-1, os.SEEK_END)
                torn = rd.read(1) != b"\n"
            if torn:
                fh.write(b"\n")
        fh.write((json.dumps(manifest) + "\n").encode())


def version_log(lake_dir: str, part: int) -> list[dict]:
    """The partition's committed versions, ascending by last_lsn, deduped
    (last write of a boundary wins). Empty when history was never on."""
    p = version_log_path(lake_dir, part)
    if not os.path.exists(p):
        return []
    by_lsn: dict[int, dict] = {}
    with open(p) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            try:
                m = json.loads(line)
            except json.JSONDecodeError:
                continue  # torn trailing line from a crash mid-append
            by_lsn[int(m["last_lsn"])] = m
    return [_rebase(lake_dir, by_lsn[k]) for k in sorted(by_lsn)]


def manifest_as_of(lake_dir: str, part: int, as_of_lsn: int) -> dict | None:
    """Latest retained version with ``last_lsn <= as_of_lsn`` — commit-
    granularity time travel (Delta-Lake-style: versions, not arbitrary
    positions). None when the partition had no commit at/below the
    position (it did not exist yet, or history was vacuumed past it)."""
    best = None
    for m in version_log(lake_dir, part):
        if int(m["last_lsn"]) <= as_of_lsn:
            best = m
    return best


def history_horizon(lake_dir: str) -> int:
    """Oldest position time travel can still reconstruct (0 = never
    vacuumed). Written by ``vacuum_history`` before it prunes, so a
    reader asking below it errors instead of silently reconstructing a
    partial state."""
    p = os.path.join(lake_dir, CHECKPOINT_DIR, "history_horizon.json")
    if not os.path.exists(p):
        return 0
    with open(p) as fh:
        return int(json.load(fh).get("keep_from_lsn", 0))


def all_manifests_as_of(lake_dir: str, as_of_lsn: int) -> dict[int, dict]:
    out = {}
    for p in glob.glob(os.path.join(lake_dir, CHECKPOINT_DIR, "part-*.log.jsonl")):
        part = int(os.path.basename(p)[len("part-"):-len(".log.jsonl")])
        m = manifest_as_of(lake_dir, part, as_of_lsn)
        if m is not None:
            out[part] = m
    return out


def commit_partition(lake_dir: str, part: int, table, last_lsn: int,
                     write_fn, manifest: dict, extra_files: list[str] | None = None,
                     keep_history: bool = False) -> str:
    """Fenced atomic commit: write parquet to tmp, rename to the fenced name,
    commit the manifest, and only THEN drop superseded data files. A crash
    between the data rename and the manifest write leaves the old manifest
    pointing at data files that still exist (resume re-applies and
    overwrites); a crash after the manifest write leaves stale extra files
    that the next commit's cleanup removes — never a manifest pointing at a
    deleted file. ``write_fn(table, path)`` performs the actual parquet write
    (injected to keep this module IO-library-agnostic).

    ``extra_files`` lists additional live data files (delta commits) that the
    manifest should reference alongside the newly written one; files not in
    the live set are garbage-collected after the manifest commit.

    ``keep_history=True`` (time-travel mode): superseded data files are
    RETAINED and the committed manifest is appended to the partition's
    version log, so ``manifest_as_of`` can reconstruct the state at any
    earlier commit boundary until ``vacuum_history`` prunes it. Run a
    lake consistently in one mode — a history=False commit on a lake
    with retained versions garbage-collects them."""
    d = part_dir(lake_dir, part)
    os.makedirs(d, exist_ok=True)
    final = data_file(lake_dir, part, last_lsn)
    tmp = final + f".tmp.{os.getpid()}"
    write_fn(table, tmp)
    os.replace(tmp, final)
    live = {final, *(extra_files or ())}
    manifest = dict(manifest, part=part, last_lsn=last_lsn, file=final,
                    files=sorted(live))
    write_manifest(lake_dir, part, manifest)
    if keep_history:
        append_version(lake_dir, part, manifest)
    if not keep_history:
        for old in glob.glob(os.path.join(d, "data-*.parquet")):
            if old not in live:
                os.remove(old)
    for stale_tmp in glob.glob(os.path.join(d, "data-*.parquet.tmp.*")):
        if stale_tmp != tmp:
            os.remove(stale_tmp)
    return final
