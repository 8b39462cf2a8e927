"""Hypothesis property: TOAST carry-forward equals a sequential
reference replay for ANY op/sentinel sequence, batch split, and
checkpoint split — pure Arrow path (Normalizer + PartitionMerger called
directly), no Ray session."""
import json

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from database_delta_plugins_ray.model import PAYLOAD_STRUCT
from database_delta_plugins_ray.stages.merge import (
    TOAST_SENTINEL, PartitionMerger)
from database_delta_plugins_ray.stages.normalize import Normalizer
from database_delta_plugins_ray.state.ddl import Registry


def make_registry():
    reg = Registry()
    reg.apply(1, "CREATE_TABLE", "db.t", "", json.dumps({
        "columns": [["repo", "string"], ["path", "string"],
                    ["commit", "string"], ["lang", "string"],
                    ["content", "large_string"]],
        "primary_key": ["repo", "path"],
    }))
    return reg


def make_batch(events):
    n = len(events)

    def img(d):
        if d is None:
            return None
        return {"repo": d["repo"], "path": d["path"], "commit": "c" * 8,
                "lang": "py", "content": d.get("content"),
                "stars": None, "language": None}

    return pa.table({
        "lsn": pa.array([e["lsn"] for e in events], pa.int64()),
        "tx_id": pa.array([f"tx{e['lsn']}" for e in events]),
        "op": pa.array([e["op"] for e in events]),
        "table": pa.array(["db.t"] * n),
        "before": pa.array([img(e.get("before")) for e in events],
                           type=PAYLOAD_STRUCT),
        "after": pa.array([img(e.get("after")) for e in events],
                          type=PAYLOAD_STRUCT),
        "ingest_ts": pa.array([e["lsn"] for e in events],
                              pa.timestamp("ms")),
    })


def reference(events):
    """Sequential carry-forward replay (the oracle rule)."""
    state, last = {}, {}
    for e in sorted(events, key=lambda x: x["lsn"]):
        key = (e.get("after") or e["before"])["path"]
        if e["op"] == "D":
            state[key] = None
            continue
        c = e["after"]["content"]
        if c == TOAST_SENTINEL:
            c = last.get(key)
        else:
            last[key] = c
        state[key] = (e["lsn"], c)
    return {k: v for k, v in state.items() if v is not None}


# per key: a sequence of (op_kind, value_id); op 0=I/U real, 1=U sentinel,
# 2=D then re-insert handled by next real op
key_seq = st.lists(st.integers(min_value=0, max_value=2),
                   min_size=1, max_size=8)


@settings(max_examples=25, deadline=None)
@given(seqs=st.lists(key_seq, min_size=1, max_size=4),
       batch_cuts=st.sets(st.integers(min_value=1, max_value=30),
                          max_size=3),
       leg_cut=st.integers(min_value=0, max_value=30),
       data=st.data())
def test_any_sequence_any_split_matches_reference(
        tmp_path_factory, seqs, batch_cuts, leg_cut, data):
    events = []
    lsn = 0
    for ki, seq in enumerate(seqs):
        alive = False
        for j, kind in enumerate(seq):
            lsn += 1
            key = {"repo": "r", "path": f"p{ki}"}
            if kind == 2 and alive:
                events.append({"lsn": lsn, "op": "D", "before": key,
                               "after": None})
                alive = False
            elif kind == 1 and alive:
                events.append({"lsn": lsn, "op": "U",
                               "after": {**key,
                                         "content": TOAST_SENTINEL}})
            else:
                op = "U" if alive else "I"
                events.append({"lsn": lsn, "op": op,
                               "after": {**key,
                                         "content": f"v{ki}.{j}"}})
                alive = True
    if not events:
        return

    reg = make_registry()
    norm = Normalizer(reg, num_partitions=1, compute_sha=False,
                      toast_fields=("content",))
    lake = str(tmp_path_factory.mktemp("toastprop"))

    def merge(evs):
        if not evs:
            return
        cuts = sorted(c for c in batch_cuts if 0 < c < len(evs))
        pieces = np.split(np.arange(len(evs)), cuts)
        outs = [norm(make_batch([evs[i] for i in p]))
                for p in pieces if len(p)]
        merger = PartitionMerger(
            lake, reg, ["repo", "path", "commit", "lang", "content"],
            toast_columns=("content",))
        merger(pa.concat_tables(outs, promote_options="default"))

    evs = sorted(events, key=lambda e: e["lsn"])
    cut = leg_cut
    merge([e for e in evs if e["lsn"] <= cut])
    merge([e for e in evs if e["lsn"] > cut])

    import pyarrow.parquet as pq

    from database_delta_plugins_ray.state import checkpoint as ckpt
    man = ckpt.read_manifest(lake, 0)
    files = man.get("files") or [man["file"]]
    tbl = pa.concat_tables([pq.read_table(f) for f in files],
                           promote_options="default")
    import pandas as pd
    df = tbl.to_pandas().sort_values("_sequence_num")
    live = df.drop_duplicates("path", keep="last")
    got = {r["path"]: (r["_sequence_num"], r["content"])
           for _, r in live.iterrows() if not r["_is_deleted"]}
    assert got == reference(events)
