"""Golden event-sequence test — the reference's integration test
transliterated (MySqlEventReaderIntegrationTest.java:165-303): a snapshot of
an existing table must emit exactly the DDL prefix [DROP_TABLE,
DROP_DATABASE, CREATE_DATABASE, CREATE_TABLE(schema+PK)] followed by one
snapshot INSERT per existing row with exact values."""

import glob
import json

import pyarrow.parquet as pq

from database_delta_plugins_ray.sources.gen import GenConfig, generate_log


def read_log(d):
    import pyarrow as pa

    files = sorted(glob.glob(d + "/seg-*.parquet"))
    return pa.concat_tables([pq.read_table(f) for f in files]).to_pylist()


def test_snapshot_golden_prefix(tmp_path):
    d = str(tmp_path / "log")
    generate_log(d, GenConfig(n_keys=6, n_base=3, n_events=4, n_repos=2,
                              seed=1, snapshot=True, ddl_plan=False,
                              n_segments=1))
    rows = read_log(d)

    ddl_ops = [r["ddl"]["op"] for r in rows[:4]]
    assert ddl_ops == ["DROP_TABLE", "DROP_DATABASE", "CREATE_DATABASE",
                       "CREATE_TABLE"]
    create = rows[3]["ddl"]
    schema = json.loads(create["payload"])
    assert schema["primary_key"] == ["repo", "path"]
    assert [c for c, _ in schema["columns"]] == [
        "repo", "path", "commit", "lang", "content"]

    # exactly n_base snapshot INSERTs follow, with full after images
    snap = rows[4:7]
    assert all(r["op"] == "I" and r["is_snapshot"] for r in snap)
    assert all(r["before"] is None and r["after"] is not None for r in snap)
    for r in snap:
        img = r["after"]
        assert img["content"].startswith(f"// {img['repo']}/{img['path']} @v1")
        assert len(img["commit"]) == 40
        # schema v0: no stars, lang populated, language not yet renamed
        assert img["stars"] is None and img["language"] is None
        assert img["lang"] is not None

    # stream events follow, none flagged snapshot
    assert all(not r["is_snapshot"] for r in rows[7:])
    # lsns strictly increasing from 1
    lsns = [r["lsn"] for r in rows]
    assert lsns == list(range(1, len(rows) + 1))


def test_no_snapshot_no_prefix(tmp_path):
    # replicateExistingData=false analog: no snapshot DDL prefix, no
    # snapshot inserts (M13 drop suppression)
    d = str(tmp_path / "log")
    generate_log(d, GenConfig(n_keys=6, n_events=10, n_repos=2, seed=1,
                              snapshot=False, ddl_plan=False, n_segments=1))
    rows = read_log(d)
    assert all(r["op"] != "DDL" or r["ddl"]["op"] not in
               ("DROP_TABLE", "DROP_DATABASE") for r in rows)
    assert not any(r["is_snapshot"] for r in rows)
    # every key's first event is an INSERT
    first_seen = {}
    for r in rows:
        if r["op"] == "DDL":
            continue
        img = r["after"] or r["before"]
        k = (img["repo"], img["path"])
        if k not in first_seen:
            first_seen[k] = r["op"]
    assert set(first_seen.values()) == {"I"}


def test_update_carries_before_and_after(tmp_path):
    # M7: UPDATE has previousRow + row (MySqlRecordConsumer.java:218-225)
    d = str(tmp_path / "log")
    generate_log(d, GenConfig(n_keys=3, n_base=3, n_events=40, n_repos=2,
                              seed=3, snapshot=True, ddl_plan=False,
                              p_delete=0.2, n_segments=1))
    rows = [r for r in read_log(d) if not r["is_snapshot"] and r["op"] != "DDL"]
    ups = [r for r in rows if r["op"] == "U"]
    dels = [r for r in rows if r["op"] == "D"]
    assert ups and dels
    for r in ups:
        assert r["before"] is not None and r["after"] is not None
        assert r["before"]["content"] != r["after"]["content"]
        assert (r["before"]["repo"], r["before"]["path"]) == (
            r["after"]["repo"], r["after"]["path"])
    for r in dels:
        assert r["after"] is None and r["before"] is not None
