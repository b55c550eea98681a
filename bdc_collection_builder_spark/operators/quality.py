"""Generic data-quality operators: single-scan column profiling for any
DataFrame (the reusable form of the oracle-locked dq_table_profile
query — same fused-aggregate plan, arbitrary schema)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double",
            "decimal"}


def profile(df: DataFrame, cols: list[str] | None = None,
            approx: bool = False) -> DataFrame:
    """Per-column profile (rows / non-null / distinct / min / max) in
    ONE aggregate over ONE scan, whatever the column count: Catalyst
    evaluates all expressions in a single partial-agg pass, then the
    1×N stats row unpivots via ``stack`` (map-only). min/max are
    reported for numeric columns and NULL otherwise, so the output
    schema is stable across tables. One scan, no joins; note the
    exact multi-column countDistinct rewrites through an Expand
    (one duplicated row-stream per distinct column), so at 100 TB
    pass ``approx=True`` for approx_count_distinct — same fused
    plan, no Expand blow-up (the a11 pattern; estimates within the
    HLL++ 2% default)."""
    cols = cols or df.columns
    dtypes = dict(df.dtypes)
    aggs = [F.count("*").cast("bigint").alias("n_rows")]
    for c in cols:
        aggs.append(F.count(c).cast("bigint").alias(f"nn_{c}"))
        nd = (F.approx_count_distinct(c, 0.02) if approx
              else F.countDistinct(c))
        aggs.append(nd.cast("bigint").alias(f"nd_{c}"))
        if dtypes[c].split("(")[0] in _NUMERIC:
            aggs.append(F.min(c).cast("double").alias(f"mn_{c}"))
            aggs.append(F.max(c).cast("double").alias(f"mx_{c}"))
    wide = df.agg(*aggs)

    def stat(c: str, kind: str) -> Column | str:
        if kind in ("mn", "mx") and dtypes[c].split("(")[0] not in _NUMERIC:
            return "CAST(NULL AS DOUBLE)"
        return f"`{kind}_{c}`"

    rows = ", ".join(
        f"'{c}', n_rows, `nn_{c}`, `nd_{c}`, {stat(c, 'mn')}, {stat(c, 'mx')}"
        for c in cols
    )
    return wide.select(F.expr(
        f"stack({len(cols)}, {rows}) AS "
        "(column_name, n_rows, n_nonnull, n_distinct, min_val, max_val)"))


def expect(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Declarative expectation checks: ``rules`` maps rule name → a
    boolean Column that is TRUE when the row VIOLATES the rule. All
    rules evaluate as conditional counts fused into ONE single-scan
    aggregate (the generic form of the oracle-locked dq_expectations
    query) — adding a rule adds an expression, never a scan. Returns
    (rule, n_violations, n_checked), one row per rule."""
    aggs = [F.count("*").cast("bigint").alias("n_checked")]
    names = list(rules)
    for i, (name, violated) in enumerate(rules.items()):
        aggs.append(F.sum(violated.cast("int")).cast("bigint")
                    .alias(f"v_{i}"))
    wide = df.agg(*aggs)
    rows = ", ".join(
        f"'{name}', `v_{i}`, n_checked" for i, name in enumerate(names))
    return wide.select(F.expr(
        f"stack({len(names)}, {rows}) AS (rule, n_violations, n_checked)"))
