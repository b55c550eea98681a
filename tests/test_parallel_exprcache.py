"""Unit tests for the round-4 perf infrastructure: the scan-parallelism
guard (functions/parallel.spread) and the cached-SQL expression path
(similarity._cached_expr + the SQL-text LSH/PQ builders), plus the
multi-probe recall property the 3x-smaller index claims rest on.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bdc_collection_builder_spark.extensions.similarity import (
    _cached_expr,
    _hyperplanes,
    hash_buckets,
    lsh_topk,
    multiprobe_lsh_topk,
)
from bdc_collection_builder_spark.functions.parallel import spread
from bdc_collection_builder_spark.sources.tables import load_table


def test_spread_raises_low_partition_counts(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    before = emb.rdd.getNumPartitions()
    after = spread(emb).rdd.getNumPartitions()
    goal = spark.sparkContext.defaultParallelism
    assert after >= min(goal, max(before, 1))
    # no-op when already at/above the target
    wide = emb.repartition(goal)
    assert spread(wide) is wide


def test_spread_is_value_neutral(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id")
    a = sorted(r.vec_id for r in emb.collect())
    b = sorted(r.vec_id for r in spread(emb).collect())
    assert a == b


def test_cached_expr_memoizes(spark):
    c1 = _cached_expr("1 + 1")
    c2 = _cached_expr("1 + 1")
    assert c1 is c2


def test_sql_text_buckets_match_column_api(spark, sf_dir):
    """The SQL-text fast path and the legacy Column composition must
    produce bit-identical bucket keys — the whole memoization rests on
    the arithmetic being the same expression."""
    emb = load_table(spark, sf_dir, "embeddings").limit(64)
    planes = _hyperplanes(4, 5, 64)
    fast = emb.select(
        "vec_id", hash_buckets("embedding", planes).alias("b"))
    slow = emb.select(
        "vec_id", hash_buckets(F.col("embedding"), planes).alias("b"))
    fa = {r.vec_id: r.b for r in fast.collect()}
    sl = {r.vec_id: r.b for r in slow.collect()}
    assert fa == sl


def _top1_recall(result, truth_top1):
    hits = 0
    got = {}
    for r in result.collect():
        if r.rank == 1:
            got[r.query_id] = r.vec_id
    for q, v in truth_top1.items():
        if got.get(q) == v:
            hits += 1
    return hits / max(len(truth_top1), 1)


def test_multiprobe_beats_single_probe_at_equal_tables(spark, sf_dir):
    """Multi-probe's pitch: at the SAME table count, probing the
    low-confidence bit flips can only add candidates, so top-1 recall
    (vs brute force) is >= the single-probe run with those tables."""
    from bdc_collection_builder_spark.extensions.similarity import (
        brute_force_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("query_id"), "embedding")
    truth = {
        r.query_id: r.vec_id
        for r in brute_force_topk(emb, queries, k=1).collect()
        if r.rank == 1
    }
    single = lsh_topk(emb, queries, k=1, n_tables=8, n_bits=6)
    multi = multiprobe_lsh_topk(emb, queries, k=1, n_tables=8,
                                n_bits=6, n_probes=2)
    assert _top1_recall(multi, truth) >= _top1_recall(single, truth)
