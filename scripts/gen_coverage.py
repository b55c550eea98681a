"""Regenerate COVERAGE.md from the query registry."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bdc_collection_builder_spark.plans.registry import (  # noqa: E402
    QUERY_REGISTRY,
    all_queries,
)

INVENTORY_SHAPE = [
    ("S", 17), ("F", 11), ("J", 9), ("A", 8), ("W", 3),
    ("T", 5), ("U", 3), ("X", 21), ("Y", 6), ("Z", 4),
]


def main() -> None:
    all_queries()
    surveyed: dict[str, list[tuple[str, bool]]] = {}
    for name, qd in sorted(QUERY_REGISTRY.items()):
        for s in qd.survey or ():
            surveyed.setdefault(s, []).append((name, bool(qd.oracle)))

    inventory = [f"{p}{i}" for p, n in INVENTORY_SHAPE for i in range(1, n + 1)]
    extra = sorted(k for k in surveyed if k not in inventory)

    def cell(key: str) -> str:
        qs = surveyed.get(key, [])
        return ", ".join(
            f"{'✅' if o else '◐'} `{n}`" for n, o in qs) or "MISSING"

    lines = [
        "# COVERAGE — SURVEY.md §2 inventory → query registry", "",
        "Generated from the query registry. Every row of the §2 operator inventory",
        "maps to at least one named query in `queries()`; ✅ = DuckDB-oracle-checked,",
        "◐ = rows-only (genuinely non-SQL: UDF stages, streaming state, approximate",
        "results). Regenerate with the command at the bottom.", "",
        "| §2 id | queries |", "|---|---|",
    ]
    lines += [f"| {k} | {cell(k)} |" for k in inventory]
    lines += [
        "", "## Beyond the reference (training-data-pipeline + engine features)",
        "", "| id | queries |", "|---|---|",
    ]
    lines += [f"| {k} | {cell(k)} |" for k in extra]
    n_oracle = sum(1 for qd in QUERY_REGISTRY.values() if qd.oracle)
    lines += [
        "",
        f"Totals: {len(QUERY_REGISTRY)} queries, {n_oracle} oracle-checked, "
        f"{len(QUERY_REGISTRY) - n_oracle} rows-only.",
        "", "```bash", "python scripts/gen_coverage.py  # regenerates this file",
        "```",
    ]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "COVERAGE.md"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"COVERAGE.md: {len(QUERY_REGISTRY)} queries, {n_oracle} oracles")


if __name__ == "__main__":
    main()
