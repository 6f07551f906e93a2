"""Regenerate OPERATORS.md — the implemented-surface index.

Run after adding/removing operators: ``python tools/gen_operators.py``.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from highspeedrailwaybigdatasystem_spark.registry import all_oracles, all_queries


def main() -> None:
    qs, ors = all_queries(), all_oracles()
    rows = []
    for name, fn in sorted(qs.items()):
        mod = fn.__module__.replace("highspeedrailwaybigdatasystem_spark.", "")
        doc = (fn.__doc__ or "").strip().split("\n")[0]
        if name.startswith("tpch_"):
            # r9 verdict task #7: every tpch_* summary must carry the
            # adaptation caveat so nobody reads these as spec-verbatim —
            # the corpus lacks partsupp and the queries re-parameterize
            # filters/thresholds to this data (documented per-op docstring).
            doc = f"[adapted, not spec-verbatim — see docstring] {doc}"
        rows.append(
            f"| `{name}` | `{mod}` | {'exact' if name in ors else 'rows-only'} | {doc} |"
        )
    out = [
        "# OPERATORS — implemented surface index",
        "",
        f"Auto-generated (tools/gen_operators.py): {len(qs)} operators, "
        f"{len(ors)} with exact DuckDB oracles, {len(qs) - len(ors)} rows-only.",
        "Every name is a key of `queries()` in `__spark_entry__.py`; \"exact\" rows",
        "also have an `oracle_sql()` entry hash-checked by the driver at sf0.01.",
        "",
        "| operator | module | oracle | summary |",
        "|---|---|---|---|",
    ] + rows
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "OPERATORS.md"), "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote OPERATORS.md: {len(qs)} ops")


if __name__ == "__main__":
    main()
