"""Count-Min-Sketch heavy hitters — the mergeable frequency sketch
completing the repo's sketch family (HLL: a18_hll_rollup, Bloom:
cu_bloom_decontaminate, t-digest: a15_approx_percentiles).

A 100 TB token stream cannot afford an exact per-token dictionary on
every monitoring tick; a CMS is a fixed-size (d×w counters) summary
that is **mergeable across partitions and across time windows** by
plain cell-wise addition — which is exactly what expressing the build
as a ``groupBy(row, bucket).count()`` gives for free: map-side partial
counts per partition ARE per-partition sketches, and the single
shuffle that combines them carries at most ``d·w × n_partitions``
rows, independent of corpus size.

Hashing: the d row-hashes derive from ONE base digest per token via
Carter-Wegman multiply-adds mod the Mersenne prime 2³¹−1 — the same
one-hash-many-functions scheme the MinHash family uses
(extensions/dedup.py). One md5 per token instead of d; the derived
arithmetic is identical bigint math in Spark and DuckDB (operands stay
below 2⁶², so no overflow divergence).

The estimate ``min_r counter[r][hash_r(tok)]`` is biased high by
collisions only, with the standard (ε=e/w, δ=e^-d) guarantee. The
query reports estimate vs exact side by side so the oracle pins the
whole construction.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bdc_collection_builder_spark.extensions.dedup import md5_hash60
from bdc_collection_builder_spark.extensions.text import tokens
from bdc_collection_builder_spark.plans._util import t
from bdc_collection_builder_spark.plans.registry import query

_D = 4       # sketch rows (independent hash functions)
_W = 256     # buckets per row
_TOPK = 50
_M31 = (1 << 31) - 1
# fixed Carter-Wegman (a, b) per sketch row; a odd, below 2^31
_CW = [(0x27d4eb2f, 0x165667b1), (0x85ebca6b, 0x2b2ae35),
       (0xc2b2ae35, 0x27d4eb2f), (0x165667b1, 0x85ebca6b)]

_TOKS = r"list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')"

_HEX60 = "CAST(concat('0x', substr(md5({x}), 1, 15)) AS BIGINT)"

# base token hash reduced below 2^31 so a*h + b stays under 2^62
_BASE = f"({_HEX60.format(x='tok')} % {_M31})"


def _bucket_sql(r: int) -> str:
    a, b = _CW[r]
    return f"((({a} * h + {b}) % {_M31}) % {_W})"


def _cw_cases(col: str = "r") -> str:
    """CASE over the row index → derived bucket (SQL side)."""
    whens = " ".join(
        f"WHEN {r} THEN {_bucket_sql(r)}" for r in range(_D))
    return f"(CASE {col} {whens} END)"


@query(
    "sk_heavy_hitters_cms",
    survey=("SK-cms",),
    oracle=f"""
    WITH toks AS (
        SELECT unnest({_TOKS}) AS tok FROM documents
    ),
    hashed AS (
        SELECT tok, {_BASE} AS h FROM toks
    ),
    dict AS (
        SELECT tok, min(h) AS h, CAST(count(*) AS BIGINT) AS exact_n
        FROM hashed GROUP BY tok
    ),
    expl AS (
        SELECT h, unnest([{", ".join(str(r) for r in range(_D))}]) AS r
        FROM hashed
    ),
    sketch AS (
        SELECT r, {_cw_cases()} AS b, CAST(count(*) AS BIGINT) AS c
        FROM expl GROUP BY 1, 2
    ),
    probes AS (
        SELECT tok, exact_n, h,
               unnest([{", ".join(str(r) for r in range(_D))}]) AS r
        FROM dict
    ),
    est AS (
        SELECT p.tok, p.exact_n, min(s.c) AS est_n
        FROM (SELECT tok, exact_n, r, {_cw_cases()} AS b FROM probes) p
        JOIN sketch s ON s.r = p.r AND s.b = p.b
        GROUP BY p.tok, p.exact_n
    )
    SELECT tok, exact_n, est_n FROM est
    ORDER BY exact_n DESC, tok LIMIT {_TOPK}
""",
)
def sk_heavy_hitters_cms(spark, sf_dir):
    """CMS build + probe with exact counts alongside: the sketch is
    built straight from the token stream (the dict-free production
    path); the exact dictionary exists here only to expose the
    overestimate. ``est_n >= exact_n`` always; equality for all
    heavy hitters at this width is the correctness signal. One md5
    per token; the d=4 row buckets are Carter-Wegman-derived integer
    arithmetic (codegen, no further hashing)."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
    hashed = toks.select("tok", (md5_hash60(F.col("tok")) % _M31).alias("h"))
    rows = F.array(*[F.lit(r) for r in range(_D)])

    def bucket(r_col, h_col):
        expr = None
        for r, (a, b) in enumerate(_CW):
            derived = ((F.lit(a) * h_col + F.lit(b)) % _M31) % _W
            expr = (F.when(r_col == r, derived) if expr is None
                    else expr.when(r_col == r, derived))
        return expr

    sketch = (
        hashed.select("h", F.explode(rows).alias("r"))
        .select("r", bucket(F.col("r"), F.col("h")).alias("b"))
        .groupBy("r", "b").agg(F.count("*").alias("c"))
    )
    dict_df = hashed.groupBy("tok").agg(
        F.min("h").alias("h"), F.count("*").alias("exact_n"))
    probes = (
        dict_df.select("tok", "exact_n", "h", F.explode(rows).alias("r"))
        .select("tok", "exact_n", "r",
                bucket(F.col("r"), F.col("h")).alias("b"))
    )
    est = (
        probes.join(sketch, ["r", "b"])
        .groupBy("tok", "exact_n").agg(F.min("c").alias("est_n"))
    )
    return est.orderBy(F.col("exact_n").desc(), "tok").limit(_TOPK)


_KMV_K = 64  # bottom-k size (below the user-domain cardinality
             # at the harness scales, so the estimator path runs)


@query(
    "sk_kmv_distinct",
    survey=("A8", "SK-hll"),
    oracle=f"""
        WITH hashed AS (
            SELECT DISTINCT event_type,
                   CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)),
                        1, 15)) AS BIGINT) AS h
            FROM events
        ),
        ranked AS (
            SELECT event_type, h,
                   row_number() OVER (PARTITION BY event_type ORDER BY h)
                       AS rk
            FROM hashed
        ),
        stats AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_exact,
                   CAST(max(CASE WHEN rk = {_KMV_K} THEN h END)
                        AS BIGINT) AS vk
            FROM ranked GROUP BY event_type
        )
        SELECT event_type, n_exact,
               round(CASE WHEN vk IS NULL THEN CAST(n_exact AS DOUBLE)
                     ELSE CAST({_KMV_K - 1} AS DOUBLE)
                          / (CAST(vk AS DOUBLE)
                             / CAST(1152921504606846976 AS DOUBLE))
                     END, 2) AS kmv_estimate
        FROM stats
    """,
)
def sk_kmv_distinct(spark, sf_dir):
    """KMV (k-minimum-values / bottom-k) distinct-count sketch:
    distinct users per event type estimated from the k smallest 60-bit
    hashes — the k-th minimum v_k gives (k-1)/(v_k/2^60)
    (Bar-Yossef et al., public). Unlike HLL (a18_hll_rollup —
    rows-only because register layouts are engine-specific), KMV's
    estimate is a PURE FUNCTION of the hash values, so the DuckDB
    oracle reproduces it bit-for-bit — a fully value-checked
    approximate-distinct estimator, reported beside the exact count so
    the error is visible. Sketch properties at 100 TB: the k smallest
    hashes are trivially mergeable (union then re-take bottom-k),
    per-group state is k x 8 bytes, and resemblance/union/intersection
    estimates compose from the same sketches. Groups with fewer than k
    distinct values report exactly (the standard KMV small-set
    rule)."""
    from pyspark.sql import Window

    events = t(spark, sf_dir, "events")
    hashed = (
        events.select(
            "event_type",
            md5_hash60(F.col("user_id").cast("string")).alias("h"))
        .distinct()
    )
    rk = F.row_number().over(Window.partitionBy("event_type").orderBy("h"))
    ranked = hashed.withColumn("rk", rk)
    stats = ranked.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_exact"),
        F.max(F.when(F.col("rk") == _KMV_K, F.col("h")))
        .cast("bigint").alias("vk"))
    estimate = F.when(
        F.col("vk").isNull(), F.col("n_exact").cast("double")
    ).otherwise(
        F.lit(float(_KMV_K - 1))
        / (F.col("vk").cast("double") / F.lit(float(1 << 60))))
    return stats.select(
        "event_type", "n_exact", F.round(estimate, 2).alias("kmv_estimate"))
