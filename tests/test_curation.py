"""Corpus-curation operator tests: behavioral invariants (rerun
stability, capacity bounds, planted contamination) and the plan shapes
that keep them cheap at scale (no shuffle where none is needed, window
parallelism by shard, benchmark side broadcast)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bdc_collection_builder_spark.extensions.curation import (
    decontaminate,
    hash_split,
    pack_sequences,
    stratified_sample,
)
from bdc_collection_builder_spark.plans.registry import (
    QUERY_REGISTRY,
    all_queries,
)
from bdc_collection_builder_spark.sources.tables import load_table


@pytest.fixture(scope="module", autouse=True)
def _load():
    all_queries()


def plan_of(spark, name, sf_dir) -> str:
    df = QUERY_REGISTRY[name].spark_fn(spark, sf_dir)
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_hash_split_stable_under_growth(docs):
    """A document's split must not move when the corpus grows — the
    property randomSplit lacks and eval-set hygiene requires."""
    full = hash_split(docs.select("doc_id"))
    subset = hash_split(docs.select("doc_id").filter(F.col("doc_id") < 50))
    joined = (subset.select("doc_id", F.col("split").alias("s_small"))
              .join(full.select("doc_id", F.col("split").alias("s_full")),
                    "doc_id"))
    assert joined.filter(F.col("s_small") != F.col("s_full")).count() == 0
    # all three splits materialize and cover every row exactly once
    counts = dict(full.groupBy("split").count().collect())
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == docs.count()
    assert counts["train"] > counts["val"] + counts["test"]


def test_stratified_sample_deterministic_and_stratified(docs):
    s1 = stratified_sample(docs, fractions={"en": 0.25}, salt="t")
    s2 = stratified_sample(docs, fractions={"en": 0.25}, salt="t")
    assert s1.exceptAll(s2).count() == 0 and s2.exceptAll(s1).count() == 0
    n_en = docs.filter(F.col("lang") == "en").count()
    k_en = s1.filter(F.col("lang") == "en").count()
    assert 0 < k_en < n_en  # en actually downsampled
    # non-en strata keep default fraction 1.0 -> untouched
    assert (s1.filter(F.col("lang") != "en").count()
            == docs.filter(F.col("lang") != "en").count())


def test_pack_sequences_offsets_and_capacity(docs):
    packed = pack_sequences(docs, capacity=512, n_shards=8).collect()
    by_shard: dict[int, list] = {}
    for r in sorted(packed, key=lambda r: (r.shard, r.doc_id)):
        by_shard.setdefault(r.shard, []).append(r)
    assert len(by_shard) > 1
    for rows in by_shard.values():
        offset = 0
        for r in rows:  # offsets are the exact running concatenation
            assert r.start_offset == offset
            assert r.pack_id == offset // 512
            offset += r.n_tokens


def test_decontaminate_finds_planted_leak(spark):
    bench = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], ["doc_id", "text"])
    train = spark.createDataFrame(
        [(10, "intro alpha beta gamma delta epsilon outro"),  # leaked
         (11, "completely unrelated words only here today")],
        ["doc_id", "text"])
    hits = {r.train_doc_id: r for r in decontaminate(train, bench).collect()}
    assert set(hits) == {10}
    assert hits[10].n_common_shingles == 1  # 'alpha..epsilon' 5-gram
    assert hits[10].n_bench_docs == 1


def test_split_and_sample_are_shuffle_free(spark, sf_dir):
    for name in ("cu_hash_split", "cu_stratified_sample"):
        plan = plan_of(spark, name, sf_dir)
        assert "Exchange" not in plan, name
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert marker not in plan, f"{name}: {marker}"


def test_pack_window_is_shard_parallel(spark, sf_dir):
    plan = plan_of(spark, "cu_pack_sequences", sf_dir)
    # exactly one shuffle (hash by shard); a global-order cumsum would
    # show rangepartitioning and serialize on one partition
    assert plan.count("Arguments: hashpartitioning") == 1
    assert "rangepartitioning" not in plan


def test_decontaminate_broadcasts_benchmark(spark, sf_dir):
    plan = plan_of(spark, "cu_decontaminate", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_token_budget_mix_balances_sources(docs, spark, sf_dir):
    from bdc_collection_builder_spark.extensions.curation import (
        token_budget_mix,
    )
    from bdc_collection_builder_spark.extensions.text import token_count

    budget = 2000
    kept = token_budget_mix(docs, budget_tokens=budget)
    tok = (kept.select("source", token_count(F.col("text")).alias("n"))
           .groupBy("source").agg(F.sum("n").alias("kept_tokens")))
    totals = (docs.select("source", token_count(F.col("text")).alias("n"))
              .groupBy("source").agg(F.sum("n").alias("total_tokens")))
    joined = {r.source: r for r in tok.join(totals, "source").collect()}
    n_sources = len(joined)
    share = budget / n_sources
    for src, r in joined.items():
        if r.total_tokens <= share:     # small sources pass untouched
            assert r.kept_tokens == r.total_tokens, src
        else:                           # big ones downsample toward share
            assert r.kept_tokens < r.total_tokens, src
    # deterministic: rerun keeps exactly the same rows
    again = token_budget_mix(docs, budget_tokens=budget)
    assert kept.exceptAll(again).count() == 0


def test_token_budget_mix_broadcasts_shares(spark, sf_dir):
    plan = plan_of(spark, "cu_token_budget_mix", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_chunk_documents_reconstructs_and_overlaps(spark):
    from bdc_collection_builder_spark.extensions.text import chunk_documents

    words = " ".join(f"w{i}" for i in range(150))
    docs = spark.createDataFrame(
        [(1, words), (2, "short doc"), (3, "")],
        "doc_id long, text string")
    out = chunk_documents(docs, chunk_tokens=64, overlap=16).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)

    # 150 tokens, stride 48: chunks at 0/48/96 -> 3 chunks
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_id)
    assert [r.chunk_id for r in c1] == [0, 1, 2]
    assert c1[0].n_tokens == 64 and c1[2].n_tokens == 150 - 96
    # overlap: last 16 tokens of chunk 0 == first 16 of chunk 1
    assert c1[0].chunk_text.split()[-16:] == c1[1].chunk_text.split()[:16]
    # stitching chunks with overlap dropped reconstructs the document
    stitched = c1[0].chunk_text.split()
    for r in c1[1:]:
        stitched += r.chunk_text.split()[16:]
    assert stitched == words.split()

    # short and empty docs emit exactly one chunk each
    assert len(by_doc[2]) == 1 and by_doc[2][0].chunk_text == "short doc"
    assert len(by_doc[3]) == 1 and by_doc[3][0].chunk_text == ""


def test_pack_ffd_matches_reference_and_never_overflows(spark, sf_dir):
    """Distributed per-shard FFD must equal a pure-Python FFD run over
    the same (n_tokens desc, doc_id) order, never overflow capacity,
    and waste no more packs than concat-and-chunk + shard count."""
    from collections import defaultdict

    from bdc_collection_builder_spark.extensions.curation import (
        pack_sequences_ffd,
    )
    from bdc_collection_builder_spark.sources.tables import load_table

    cap = 512
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    got = pack_sequences_ffd(docs, capacity=cap, n_shards=8).collect()

    # reference FFD per shard
    byshard = defaultdict(list)
    for r in got:
        byshard[r.shard].append(r)
    for shard, rows in byshard.items():
        rows_sorted = sorted(rows, key=lambda r: (-r.n_tokens, r.doc_id))
        fills = []
        for r in rows_sorted:
            placed = False
            if r.n_tokens <= cap:
                for i, fill in enumerate(fills):
                    if fill + r.n_tokens <= cap:
                        assert r.pack_id == i, (shard, r)
                        assert r.start_offset == fill, (shard, r)
                        fills[i] = fill + r.n_tokens
                        placed = True
                        break
            if not placed:
                assert r.pack_id == len(fills), (shard, r)
                assert r.start_offset == 0, (shard, r)
                fills.append(r.n_tokens)
        # no overflow for packable docs
        assert all(f <= cap for f in fills if f <= cap)
    # deterministic across runs
    again = pack_sequences_ffd(docs, capacity=cap, n_shards=8).collect()
    assert {(r.doc_id, r.pack_id, r.start_offset) for r in got} == \
        {(r.doc_id, r.pack_id, r.start_offset) for r in again}
