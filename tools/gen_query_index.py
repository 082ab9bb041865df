"""Regenerate the query table in docs/QUERIES.md from the registry.

    python tools/gen_query_index.py

Everything above the `| query |` table header is preserved (the
head-ordering policy prose); the table itself is rebuilt from
`__spark_entry__.queries()` + `oracle_sql()` + each query's docstring,
so the index can never drift from the code again. Run after adding or
changing a query.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

DOC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs",
    "QUERIES.md",
)


def summary(fn) -> str:
    doc = (fn.__doc__ or "").strip()
    # first sentence-ish chunk, flattened, de-table-ified
    flat = re.sub(r"\s+", " ", doc)
    cut = flat.split(". ")[0][:110].replace("|", "/")
    return cut


def main() -> None:
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    lines = []
    with open(DOC) as f:
        for line in f:
            if line.startswith("| query |"):
                break
            lines.append(line)
    n = len(queries)
    n_oracled = sum(1 for name in queries if name in oracles)
    head = "".join(lines)
    head = re.sub(
        r"^\d+ queries declared in `__spark_entry__\.queries\(\)`; all \d+ have",
        f"{n} queries declared in `__spark_entry__.queries()`; all {n_oracled} have",
        head,
        count=1,
        flags=re.M,
    )
    rows = ["| query | oracle | summary |\n", "|---|---|---|\n"]
    # the registry wraps callables; reach the underlying q_ function for
    # its docstring via the module namespace
    for name, fn in queries.items():
        q = getattr(entrymod, f"q_{name}", None)
        desc = summary(q if q is not None else fn)
        kind = "exact" if name in oracles else "rows-only"
        rows.append(f"| `{name}` | {kind} | {desc} |\n")
    with open(DOC, "w") as f:
        f.write(head)
        f.writelines(rows)
    print(f"wrote {DOC}: {n} queries, {n_oracled} oracled")


if __name__ == "__main__":
    raise SystemExit(main())
