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


def read_manifest(lake_dir: str, part: int) -> dict | None:
    p = manifest_path(lake_dir, part)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)


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
        out[m["part"]] = m
    return out


def min_watermark(lake_dir: str, num_partitions: int) -> int:
    """Coarse resume fence for the log read: events with lsn <= this are
    guaranteed already applied in EVERY partition. 0 when any partition has
    no checkpoint yet."""
    ms = all_manifests(lake_dir)
    if len(ms) < num_partitions:
        return 0
    return min(m["last_lsn"] for m in ms.values())


def data_file(lake_dir: str, part: int, last_lsn: int) -> str:
    return os.path.join(part_dir(lake_dir, part), f"data-{last_lsn:020d}.parquet")


def commit_partition(lake_dir: str, part: int, table, last_lsn: int,
                     write_fn, manifest: dict) -> str:
    """Fenced atomic commit: write parquet to tmp, rename to the fenced name,
    drop superseded data files, then commit the manifest. ``write_fn(table,
    path)`` performs the actual parquet write (injected to keep this module
    IO-library-agnostic)."""
    d = part_dir(lake_dir, part)
    os.makedirs(d, exist_ok=True)
    final = data_file(lake_dir, part, last_lsn)
    tmp = final + f".tmp.{os.getpid()}"
    write_fn(table, tmp)
    os.replace(tmp, final)
    for old in glob.glob(os.path.join(d, "data-*.parquet")):
        if old != final:
            os.remove(old)
    manifest = dict(manifest, part=part, last_lsn=last_lsn, file=final)
    write_manifest(lake_dir, part, manifest)
    return final
