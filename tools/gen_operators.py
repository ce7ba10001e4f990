"""Regenerate OPERATORS.md from __ray_entry__.py (queries + oracle status +
first-docstring summary).  Run from the repo root:

    python tools/gen_operators.py
"""
import re
import sys

sys.path.insert(0, ".")

import __ray_entry__ as E  # noqa: E402

HEADER = """# Operator / query inventory (auto-generated from `__ray_entry__.py`)

One row per `queries()` entry. "exact DuckDB oracle" = the driver runs the
Ray pipeline and the SQL side-by-side and compares row count, schema,
dtypes and a value hash; "rows-only" = no SQL equivalent exists (sketch /
codec / LSH / approximate semantics) — each such docstring states why and
names the test that verifies it instead.

Regenerate with `python tools/gen_operators.py` (this file is a convenience
index; `__ray_entry__.py` is the source of truth).

| # | query | correctness check | what it does |
|---|---|---|---|
"""


def summary(fn) -> str:
    doc = (fn.__doc__ or "").strip()
    flat = re.sub(r"\s+", " ", doc)
    if len(flat) > 155:
        flat = flat[:155].rstrip() + "..."
    return flat.replace("|", "\\|")


def main():
    qs = E.queries()
    oracles = E.oracle_sql()
    rows = []
    for i, name in enumerate(sorted(qs), 1):
        check = "exact DuckDB oracle" if name in oracles else "rows-only"
        rows.append(f"| {i} | `{name}` | {check} | {summary(qs[name])} |")
    n_or = sum(1 for n in qs if n in oracles)
    footer = (f"\n**{len(qs)} queries; {n_or} with exact DuckDB oracles, "
              f"{len(qs) - n_or} rows-only.**\n")
    open("OPERATORS.md", "w").write(HEADER + "\n".join(rows) + "\n" + footer)
    print(f"wrote OPERATORS.md: {len(qs)} queries, {n_or} oracled")


if __name__ == "__main__":
    main()
