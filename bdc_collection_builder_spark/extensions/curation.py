"""Corpus-curation operators a large-scale training-data pipeline needs
beyond dedup/similarity/text-stats: deterministic dataset splits,
benchmark decontamination, sequence packing, stratified sampling, and
token-budget mixture balancing.

All of them are pure relational plans (no UDFs) and hash-deterministic, so
every one is replayable in an external engine (DuckDB oracle) and — the
property that matters at 100 TB — *stable under reprocessing*: re-running
the pipeline on a grown corpus never moves an old document to a different
split/sample/pack shard, because assignment depends only on the row's own
key, never on corpus order or size.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bdc_collection_builder_spark.extensions.dedup import md5_hash60, shingles
from bdc_collection_builder_spark.extensions.text import token_count


def hash_split(docs: DataFrame, id_col: str = "doc_id",
               train_pct: int = 90, val_pct: int = 5,
               salt: str = "split") -> DataFrame:
    """Deterministic train/val/test assignment by keyed hash bucket.

    A pure narrow projection — zero shuffles, scales linearly with input
    splits. ``bucket = md5_60bit(id:salt) mod 100``; the salt decouples
    this hash from any other keyed hash in the pipeline (sampling,
    sharding) so splits stay independent of them. Unlike
    ``df.randomSplit``, membership is a function of the row key alone:
    adding documents later never reshuffles existing assignments (the
    property training pipelines need to avoid eval-set churn)."""
    bucket = (
        md5_hash60(F.concat(F.col(id_col).cast("string"), F.lit(f":{salt}")))
        % 100
    )
    return docs.withColumn("bucket", bucket).withColumn(
        "split",
        F.when(F.col("bucket") < train_pct, "train")
        .when(F.col("bucket") < train_pct + val_pct, "val")
        .otherwise("test"),
    )


def decontaminate(train: DataFrame, benchmark: DataFrame, k: int = 5,
                  text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    k-token shingle with an evaluation/benchmark document.

    The industry-standard n-gram overlap check (eval-set leakage). Both
    sides shingle shuffle-free (per-doc array ops, see
    :func:`~.dedup.shingles`); the join key is the 60-bit hash of the
    shingle, not the string — at 100 TB that's an 8-byte shuffle key vs
    a ~40-byte one, and the benchmark side (shingles of the eval set,
    tiny next to the corpus) broadcasts, so the corpus never shuffles at
    all. Output: one row per contaminated training doc with the number
    of distinct overlapping shingles and of benchmark docs hit."""
    tr = shingles(train, text_col=text_col, id_col=id_col, k=k).select(
        F.col("doc_id").alias("train_doc_id"),
        md5_hash60(F.col("shingle")).alias("sh"))
    be = shingles(benchmark, text_col=text_col, id_col=id_col, k=k).select(
        F.col("doc_id").alias("bench_doc_id"),
        md5_hash60(F.col("shingle")).alias("sh"))
    return (
        tr.join(F.broadcast(be), "sh")
        .groupBy("train_doc_id")
        .agg(F.countDistinct("sh").alias("n_common_shingles"),
             F.countDistinct("bench_doc_id").alias("n_bench_docs"))
    )


def pack_sequences(docs: DataFrame, capacity: int = 512,
                   n_shards: int = 32, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Concat-and-chunk sequence packing: assign each document to a
    fixed-token-capacity pack for training-batch assembly.

    Documents are sharded by ``id mod n_shards``; within a shard the
    running token total (cumulative sum window, ROWS frame) places each
    doc in pack ``floor(tokens_before / capacity)``. One shuffle
    (hash-partition by shard + sort by id); each shard's window runs
    independently, so parallelism = n_shards regardless of corpus size —
    the global-order formulation (one cumsum over everything) would
    serialize on a single partition at 100 TB. Offsets are emitted so a
    writer can materialize the packed token stream without recomputing."""
    shard = F.pmod(F.col(id_col), F.lit(n_shards))
    toks = docs.select(
        F.col(id_col).alias("doc_id"), shard.alias("shard"),
        token_count(F.col(text_col)).alias("n_tokens"))
    w = (Window.partitionBy("shard").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum("n_tokens").over(w)
    return toks.select(
        "doc_id", "shard", "n_tokens",
        (cum - F.col("n_tokens")).alias("start_offset"),
        F.floor((cum - F.col("n_tokens")) / capacity).alias("pack_id"),
    )


def pack_sequences_ffd(docs: DataFrame, capacity: int = 512,
                       n_shards: int = 32, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """First-fit-decreasing sequence packing — the padding-minimizing
    packer real training pipelines use, vs :func:`pack_sequences`'s
    concat-and-chunk (which never wastes capacity but splits documents
    across pack boundaries). FFD keeps documents whole: within a
    shard, docs sorted by token count (desc, ties by id) drop into the
    first pack with room; docs longer than ``capacity`` get a pack of
    their own.

    Bin packing is inherently sequential PER SHARD (each placement
    depends on every fill level so far), so this is the canonical
    ``applyInPandas`` shape: shard-hash shuffle, then an Arrow batch
    per shard walked by a tight pandas loop. Parallelism = n_shards at
    any corpus size; packing quality is per-shard FFD (≥ 11/9 OPT + 1
    bins worst case within a shard). Deterministic given the
    (n_tokens desc, doc_id) order — the pytest companion pins output
    against a pure-Python reference and verifies no pack overflows.

    Not SQL-expressible (stateful loop), so the registered query is
    rows-only by design."""
    shard = F.pmod(F.col(id_col), F.lit(n_shards))
    toks = docs.select(
        F.col(id_col).alias("doc_id"), shard.alias("shard"),
        token_count(F.col(text_col)).alias("n_tokens"))

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values(["n_tokens", "doc_id"],
                              ascending=[False, True])
        fills: list[int] = []
        pack_ids = []
        offsets = []
        for n in pdf["n_tokens"].to_numpy():
            placed = False
            if n <= capacity:
                for i, fill in enumerate(fills):
                    if fill + n <= capacity:
                        pack_ids.append(i)
                        offsets.append(fill)
                        fills[i] = fill + n
                        placed = True
                        break
            if not placed:
                pack_ids.append(len(fills))
                offsets.append(0)
                fills.append(int(n))
        out = pdf.copy()
        out["pack_id"] = pd.array(pack_ids, dtype="int64")
        out["start_offset"] = pd.array(offsets, dtype="int64")
        return out

    return (
        toks.groupBy("shard").applyInPandas(
            pack,
            "doc_id long, shard long, n_tokens long, "
            "pack_id long, start_offset long")
    )


def stratified_sample(docs: DataFrame, strata_col: str = "lang",
                      fractions: Mapping[str, float] | None = None,
                      default_fraction: float = 1.0,
                      id_col: str = "doc_id",
                      salt: str = "sample") -> DataFrame:
    """Deterministic per-stratum downsampling by hash threshold — the
    domain/language rebalancing step of corpus curation.

    Keep a row iff ``md5_60bit(id:salt) mod 10000 < fraction(stratum) *
    10000``. A narrow filter (no shuffle, no sort, no per-stratum pass);
    unlike ``df.sampleBy`` the decision is a pure function of the row
    key, so reruns and incremental appends keep exactly the same rows —
    and the filter pushes all the way into the scan when strata align
    with partition values."""
    fractions = dict(fractions or {})
    thr = F.lit(int(default_fraction * 10000))
    for stratum, frac in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == stratum,
                     F.lit(int(frac * 10000))).otherwise(thr)
    u = (
        md5_hash60(F.concat(F.col(id_col).cast("string"), F.lit(f":{salt}")))
        % 10000
    )
    return docs.filter(u < thr)


def token_budget_mix(docs: DataFrame, budget_tokens: int,
                     strata_col: str = "source", id_col: str = "doc_id",
                     text_col: str = "text",
                     salt: str = "mix") -> DataFrame:
    """Balanced mixture sampling under a global token budget: every
    stratum (source/domain) gets an equal share of ``budget_tokens``,
    and strata bigger than their share are hash-downsampled to it —
    the mixture-weights step of assembling a training corpus from
    skewed sources.

    Two dimension-sized aggregates (per-stratum token totals, stratum
    count) broadcast back onto the corpus, which is then filtered by
    the same keyed-hash threshold as :func:`stratified_sample` — the
    corpus itself never shuffles, and membership is rerun-stable. The
    budget is met in expectation at document granularity (docs are not
    split); exact packing afterwards is :func:`pack_sequences`."""
    toks = docs.select(
        F.col(id_col), F.col(strata_col).alias("__stratum"),
        token_count(F.col(text_col)).alias("__n_tokens"))
    totals = toks.groupBy("__stratum").agg(
        F.sum("__n_tokens").alias("__stratum_tokens"))
    n_strata = totals.agg(F.count("*").alias("__n_strata"))
    share = (
        totals.crossJoin(F.broadcast(n_strata))
        .select(
            "__stratum", "__stratum_tokens",
            F.least(
                F.lit(1.0),
                (F.lit(float(budget_tokens)) / F.col("__n_strata"))
                / F.col("__stratum_tokens"),
            ).alias("__keep_frac"),
        )
    )
    u = (
        md5_hash60(F.concat(F.col(id_col).cast("string"), F.lit(f":{salt}")))
        % 10000
    )
    return (
        docs.join(F.broadcast(share),
                  docs[strata_col] == share["__stratum"])
        .filter(u < F.floor(F.col("__keep_frac") * 10000))
        .drop("__stratum", "__stratum_tokens", "__keep_frac")
    )


def seeded_shuffle(docs: DataFrame, id_col: str = "doc_id",
                   seed: str = "epoch-0", n_shards: int = 64) -> DataFrame:
    """Deterministic pseudo-random training order: shard + position per
    document, a pure function of (id, seed).

    Training loaders need a reproducible global shuffle per epoch; an
    actual global sort of a 100 TB corpus per epoch is absurd. Instead
    the shuffle key is ``md5_60bit(f"{id}:{seed}")``: changing the seed
    re-permutes everything, re-running is free of RNG state, and late-
    added documents slot in without disturbing existing relative order.
    ``shard = key mod n_shards`` spreads documents uniformly; the
    within-shard position is ONE ranking window per shard — the only
    shuffle, and it moves 8-byte keys, not text. Readers stream shards
    in any order and get an unbiased sample prefix at every point.
    """
    key = md5_hash60(
        F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}")))
    w = Window.partitionBy("shard").orderBy("shuffle_key", id_col)
    return (
        docs.withColumn("shuffle_key", key)
        .withColumn("shard", (F.col("shuffle_key") % n_shards).cast("int"))
        .withColumn("pos", F.row_number().over(w))
    )
