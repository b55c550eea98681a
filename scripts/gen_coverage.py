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
        "## Rows-only ↔ oracled-twin pairings",
        "",
        "Each rows-only (◐) query is an engine-specific approximation",
        "whose semantics are value-checked through a green oracled twin",
        "plus property pins in pytest:",
        "",
        "| rows-only | oracled twin | pinned by |",
        "|---|---|---|",
        "| `a11_approx_distinct` | `a04_distinct_collections` | estimate within documented error of the exact count |",
        "| `a15_approx_percentiles` | `a12_group_percentiles` | t-digest quantiles vs exact full-sort percentiles |",
        "| `a18_hll_rollup` | `a18b_distinct_rollup_exact` | identical n_days; estimate within 5% of exact_users; daily-union = full-pass (tests/test_functions.py). `a18` is deliberately excluded from driver rotation — see `_DRIVER_PRIORITY` |",
        "| `dd_minhash_lsh_pairs` | `dd_minhash_lsh_md5` | same verified pairs + exact-Jaccard scores across hash families |",
        "| `dd_simhash_pairs` | `dd_simhash_md5` | bucketing exactly reproduces brute-force Hamming pairs per family |",
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
