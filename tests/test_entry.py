"""Driver-contract smoke tests: entry(), queries()/oracle_sql() key
consistency (the driver's t1 smoke + t2 gate shape)."""

import pytest


@pytest.mark.usefixtures("ray_session")
def test_entry_smoke():
    import __ray_entry__ as e

    res = e.entry()
    import ray.data

    assert isinstance(res, ray.data.Dataset)
    rows = res.take_all()
    assert len(rows) > 0
    cols = set(rows[0])
    assert {"repo", "path", "commit", "content_sha", "_sequence_num"} <= cols


def test_oracle_keys_subset_of_queries():
    import __ray_entry__ as e

    q = set(e.queries())
    o = set(e.oracle_sql())
    assert o <= q
    # every oracle string is non-empty SQL
    for name, sql in e.oracle_sql().items():
        assert "SELECT" in sql.upper(), name
