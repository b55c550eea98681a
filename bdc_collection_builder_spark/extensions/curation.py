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
    against a pure-Python reference and verifies no pack overflows,
    and the registered query is value-checked against a recursive-CTE
    DuckDB replay of the first-fit loop (bin loads as list-typed
    recursion state)."""
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


def _md5_hash60_hi(col) -> "F.Column":
    """Second independent 60-bit slice of the same md5 digest (hex
    chars 16-30) — pairs with :func:`~.dedup.md5_hash60` for
    Kirsch-Mitzenmacher double hashing (pos_i = h1 + i*h2), the
    standard way to derive k Bloom probes from two hashes."""
    return F.conv(F.substring(F.md5(col), 16, 15), 16, 10).cast("bigint")


def bloom_bitmap(items: DataFrame, key_col: str = "shingle",
                 m_bits: int = 1 << 15, n_hashes: int = 3) -> DataFrame:
    """Distributed Bloom-filter BUILD: fold a key column into an
    ``(word_idx, bits)`` bitmap table of ``ceil(m_bits/63)`` rows.

    Each key sets ``n_hashes`` bits (double hashing over two md5
    slices); bits pack 63 per signed-long word (bit 63 unused, so the
    shift never wraps sign in any engine). The build is one map-side
    explode + one ``bit_or`` partial agg on the word index — at 100 TB
    the filter for a billion-key benchmark set is still only
    ``m_bits/8`` bytes, the whole point: the PROBE side broadcasts this
    bitmap instead of the raw keys."""
    m = F.lit(m_bits)
    r1 = md5_hash60(F.col(key_col)) % m
    r2 = _md5_hash60_hi(F.col(key_col)) % m
    pos = F.explode(F.array(
        *[(r1 + F.lit(i) * r2) % m for i in range(n_hashes)])).alias("pos")
    return (
        items.select(pos)
        .select(F.expr("pos DIV 63").alias("word_idx"),
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 63 AS INT))")
                .alias("mask"))
        .groupBy("word_idx").agg(F.bit_or("mask").alias("bits"))
    )


def bloom_decontaminate(train: DataFrame, benchmark: DataFrame, k: int = 5,
                        m_bits: int = 1 << 15, n_hashes: int = 3,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Benchmark decontamination, Bloom-filter scale path: flag
    training documents whose k-token shingles hit the benchmark
    shingle set's Bloom filter on all ``n_hashes`` probes.

    :func:`decontaminate` broadcasts the benchmark shingle hashes
    themselves — right whenever the eval set is small. When it is NOT
    (industrial dedup against thousands of benchmarks, or
    corpus-vs-corpus leakage checks), the broadcast side becomes the
    bottleneck; the Bloom form compresses it to ``m_bits/8`` bytes at a
    tunable false-positive rate (``(1-e^{-kn/m})^k``), with zero false
    negatives — the guarantee that matters for decontamination, where
    flagged docs get the expensive exact recheck or are dropped
    outright. Probe = map-side explode of k positions + broadcast
    equi-join on the word index + one count-matching-probes agg; the
    corpus never shuffles.

    Deterministic end-to-end (md5 double hashing), so an external
    engine replays bitmap and probe bit-for-bit. Returns one row per
    flagged training doc: ``(train_doc_id, n_flagged_shingles)`` —
    a SUPERSET of :func:`decontaminate`'s docs by construction."""
    m = F.lit(m_bits)
    bitmap = bloom_bitmap(
        shingles(benchmark, text_col=text_col, id_col=id_col, k=k),
        key_col="shingle", m_bits=m_bits, n_hashes=n_hashes)
    tr = shingles(train, text_col=text_col, id_col=id_col, k=k).select(
        F.col("doc_id").alias("train_doc_id"),
        (md5_hash60(F.col("shingle")) % m).alias("r1"),
        (_md5_hash60_hi(F.col("shingle")) % m).alias("r2"),
    ).distinct()
    probes = tr.select(
        "train_doc_id", "r1", "r2",
        F.explode(F.array(*[
            (F.col("r1") + F.lit(i) * F.col("r2")) % m
            for i in range(n_hashes)])).alias("pos"))
    hit = (F.col("bits").isNotNull()
           & (F.col("bits").bitwiseAND(
               F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 63 AS INT))"))
              != 0))
    return (
        probes
        .join(F.broadcast(bitmap),
              F.expr("pos DIV 63") == F.col("word_idx"), "left")
        .groupBy("train_doc_id", "r1", "r2")
        .agg(F.sum(hit.cast("int")).alias("n_hits"))
        .filter(F.col("n_hits") == n_hashes)
        .groupBy("train_doc_id")
        .agg(F.count("*").cast("bigint").alias("n_flagged_shingles"))
    )
