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

The estimate ``min_r counter[r][hash_r(tok)]`` is biased high by
collisions only, with the standard (ε=e/w, δ=e^-d) guarantee. The
query reports estimate vs exact side by side so the oracle pins the
whole construction (engine-neutral md5-60bit bucket hash, same as the
dedup oracles — extensions/dedup.py:117).
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

_TOKS = r"list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')"

_HEX60 = "CAST(concat('0x', substr(md5({x}), 1, 15)) AS BIGINT)"

_BUCKET = _HEX60.format(
    x="concat(CAST(r AS VARCHAR), ':', tok)") + f" % {_W}"


@query(
    "sk_heavy_hitters_cms",
    survey=("SK-cms",),
    oracle=f"""
    WITH toks AS (
        SELECT unnest({_TOKS}) AS tok FROM documents
    ),
    dict AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS exact_n
        FROM toks GROUP BY tok
    ),
    expl AS (
        SELECT tok, unnest([{", ".join(str(r) for r in range(_D))}]) AS r
        FROM toks
    ),
    sketch AS (
        SELECT r, {_BUCKET} AS b, CAST(count(*) AS BIGINT) AS c
        FROM expl GROUP BY 1, 2
    ),
    probes AS (
        SELECT tok, exact_n,
               unnest([{", ".join(str(r) for r in range(_D))}]) AS r
        FROM dict
    ),
    est AS (
        SELECT p.tok, p.exact_n, min(s.c) AS est_n
        FROM (SELECT tok, exact_n, r, {_BUCKET} AS b FROM probes) p
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
    heavy hitters at this width is the correctness signal."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
    rows = F.array(*[F.lit(r) for r in range(_D)])

    def bucket(r_col, tok_col):
        return md5_hash60(
            F.concat(r_col.cast("string"), F.lit(":"), tok_col)) % _W

    sketch = (
        toks.select("tok", F.explode(rows).alias("r"))
        .select("r", bucket(F.col("r"), F.col("tok")).alias("b"))
        .groupBy("r", "b").agg(F.count("*").alias("c"))
    )
    dict_df = toks.groupBy("tok").agg(F.count("*").alias("exact_n"))
    probes = (
        dict_df.select("tok", "exact_n", F.explode(rows).alias("r"))
        .select("tok", "exact_n", "r",
                bucket(F.col("r"), F.col("tok")).alias("b"))
    )
    est = (
        probes.join(sketch, ["r", "b"])
        .groupBy("tok", "exact_n").agg(F.min("c").alias("est_n"))
    )
    return est.orderBy(F.col("exact_n").desc(), "tok").limit(_TOPK)
