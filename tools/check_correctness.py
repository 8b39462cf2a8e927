"""Driver-style correctness harness: run each Ray query and its DuckDB
oracle side-by-side, compare row count, column names, and an
order-insensitive value hash.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    try:
        import ray.data

        if isinstance(res, ray.data.Dataset):
            res = res.to_pandas()
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        res = res.to_pandas()
    return res


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if col.dtype.kind == "f":
            df[c] = col.round(6)
        df[c] = df[c].astype(str)
    rows = sorted(df.apply("|".join, axis=1).tolist())
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e
    from database_delta_plugins_ray.pipelines.queries import cdc_oracle_sql, ensure_log, sf_tag

    ensure_log(sf_dir)
    qs = e.queries()
    sql = e.oracle_sql()
    sql.update(cdc_oracle_sql(sf_tag(sf_dir)))  # repoint CDC oracles at sf_dir

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL {name}: ray query raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        if name not in sql:
            print(f"ROWS-ONLY {name}: {len(got)} rows, cols={sorted(got.columns)}")
            continue
        try:
            want = con.execute(sql[name]).fetchdf()
        except Exception as ex:
            print(f"FAIL {name}: oracle raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        ok_rows = len(got) == len(want)
        ok_cols = sorted(got.columns) == sorted(want.columns)
        ok_vals = ok_rows and ok_cols and value_hash(got) == value_hash(want)
        status = "OK" if (ok_rows and ok_cols and ok_vals) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"{status} {name}: rows {len(got)}/{len(want)} cols_match={ok_cols} "
              f"values_match={ok_vals}")
        if not ok_cols:
            print(f"   ray cols:    {sorted(got.columns)}")
            print(f"   oracle cols: {sorted(want.columns)}")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
