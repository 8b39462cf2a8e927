"""Regenerate docs/QUERIES.md from the live query catalog.

One row per ``queries()`` entry, in catalog order; the gate column says
``oracle`` when an ``oracle_sql()`` entry exists, else ``rows-only``.
Summaries come from each callable's docstring (first ~220 chars,
whitespace-collapsed). Run from the repo root:

    python tools/gen_queries_md.py
"""
from __future__ import annotations

import importlib.util
import inspect
import os
import re
import sys

sys.path.insert(0, os.getcwd())

HEADER = """# Query catalog

One row per `queries()` entry (the driver's correctness surface).
`oracle` = hash-exact DuckDB SQL comparison at sf0.01; `rows-only` =
deterministic result gated by pytest (planted ground truth, parity vs
brute force, or property tests) because the semantics have no SQL
shape. Generated from the source docstrings by tools/gen_queries_md.py.

| # | query | gate | summary |
|---|---|---|---|
"""


def summary_of(fn) -> str:
    doc = inspect.getdoc(fn) or ""
    doc = re.sub(r"\s+", " ", doc).strip()
    if len(doc) > 220:
        doc = doc[:217] + "..."
    return doc.replace("|", "\\|")


def main() -> int:
    spec = importlib.util.spec_from_file_location("e", "__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    q, o = mod.queries(), mod.oracle_sql()
    rows = []
    for i, (name, fn) in enumerate(q.items(), 1):
        gate = "oracle" if name in o else "rows-only"
        rows.append(f"| {i} | `{name}` | {gate} | {summary_of(fn)} |")
    with open("docs/QUERIES.md", "w") as fh:
        fh.write(HEADER + "\n".join(rows) + "\n")
    print(f"wrote docs/QUERIES.md: {len(rows)} rows "
          f"({sum(1 for n in q if n in o)} oracled)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
