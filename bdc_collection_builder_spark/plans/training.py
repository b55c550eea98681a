"""Training-corpus depth queries (round 2): span-level exact-substring
dedup, DSIR importance weighting + Gumbel-top-k resampling, CCNet-style
perplexity buckets, and zonal statistics.

These extend the SURVEY §2 LLM-pipeline surface (DD-*/TX-*/CU-* rows)
with more operators a pretraining-data pipeline runs corpus-wide.
Every step is built-in Catalyst expressions — no Python in any hot
path — and every query carries a DuckDB oracle that replays the same
derivation end-to-end.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from bdc_collection_builder_spark.plans._util import t
from bdc_collection_builder_spark.functions.persist import tracked_persist
from bdc_collection_builder_spark.plans.registry import query

# Tokenization shared with plans/extensions.py oracles (identical
# semantics to extensions.text.tokens).
_TOKS = r"list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')"

_SPAN_K = 8  # tokens per span window


@query(
    "tx_span_dedup",
    survey=("DD-exact", "TX-fingerprint"),
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, {_TOKS} AS tk FROM documents
        ),
        pos AS (
            SELECT doc_id, tk,
                   unnest(generate_series(1, len(tk) - {_SPAN_K - 1}))
                     AS i
            FROM toks WHERE len(tk) >= {_SPAN_K}
        ),
        spans AS (
            SELECT doc_id,
                   md5(array_to_string(tk[i:i + {_SPAN_K - 1}], ' '))
                     AS span_hash
            FROM pos
        ),
        counts AS (
            SELECT span_hash, count(DISTINCT doc_id) AS ndocs
            FROM spans GROUP BY span_hash
        )
        SELECT s.doc_id,
               CAST(count(*) AS BIGINT) AS n_spans,
               CAST(sum(CASE WHEN c.ndocs > 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_dup_spans,
               round(avg(CASE WHEN c.ndocs > 1 THEN 1.0 ELSE 0.0 END), 6)
                 AS dup_ratio
        FROM spans s JOIN counts c USING (span_hash)
        GROUP BY s.doc_id
    """,
)
def tx_span_dedup(spark, sf_dir):
    """Span-level exact-substring duplication profile (the hashed-k-gram
    approximation of Lee et al.'s suffix-array substring dedup —
    "Deduplicating Training Data Makes Language Models Better"): every
    8-token window is hashed, windows shared verbatim across documents
    are flagged, and each document reports what fraction of its spans
    is corpus-duplicated — the signal used to strip boilerplate and
    licence blocks that whole-document dedup can't see.

    Scale shape: span generation is map-only (one ``transform`` over a
    ``sequence`` of offsets — no self-join, no posexplode pyramid) and
    runs ONCE: the raw span stream collapses immediately into the
    distinct ``(span_hash, doc_id, multiplicity)`` table (map-side
    combined partial agg — the only shuffle that carries span volume);
    ``ndocs`` is a count(*) WINDOW over span_hash on that collapsed
    table (round 10, guide §2.4: the old groupBy(span_hash) +
    join-back form CLAIMED the subtree was shared, but Catalyst
    replayed the whole tokenize+md5 explode for both consumers — the
    committed before-plan shows two Generates over two document
    scans; the window form provably evaluates it once and drops the
    join). The window repartitions the hash-and-counts rows only —
    spans never move twice. The span table is ~L×(doc bytes)
    for overlap L=8, the same blow-up the published pipelines accept;
    cutting it needs the suffix-array sidecar, which is the documented
    non-Spark path.
    Reference anchor: collection_builder's scene-level F10 dedup
    (celery/tasks.py download dedup) generalized to sub-document spans.
    """
    from pyspark.sql import Window

    from bdc_collection_builder_spark.extensions.text import tokens

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    k = _SPAN_K
    spans = (
        docs.select("doc_id", tokens(F.col("text")).alias("tk"))
        .filter(F.size("tk") >= k)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("tk") - (k - 1)),
                    lambda i: F.md5(F.concat_ws(" ", F.slice("tk", i, k))),
                )
            ).alias("span_hash"),
        )
    )
    per_doc_span = spans.groupBy("span_hash", "doc_id").agg(
        F.count("*").alias("cnt"))
    joined = per_doc_span.withColumn(
        "ndocs", F.count("*").over(Window.partitionBy("span_hash")))
    dup = (F.col("ndocs") > 1).cast("long")
    dup_cnt = F.sum(F.col("cnt") * dup)
    tot_cnt = F.sum("cnt")
    return (
        joined
        .groupBy("doc_id")
        .agg(
            tot_cnt.cast("bigint").alias("n_spans"),
            dup_cnt.cast("bigint").alias("n_dup_spans"),
            F.round(dup_cnt.cast("double") / tot_cnt, 6).alias("dup_ratio"),
        )
    )


@query(
    "cu_dsir_weights",
    survey=("CU-mix", "TX-quality"),
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, lang, unnest({_TOKS}) AS tok FROM documents
        ),
        vocab AS (
            SELECT tok,
                   count(*) AS n_src,
                   sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS n_tgt
            FROM toks GROUP BY tok
        ),
        tot AS (
            SELECT sum(n_src) AS src_total, sum(n_tgt) AS tgt_total,
                   count(*) AS v
            FROM vocab
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               round(avg(
                   ln((vocab.n_tgt + 1.0)
                      / (tot.tgt_total + CAST(tot.v AS DOUBLE)))
                 - ln((vocab.n_src + 1.0)
                      / (tot.src_total + CAST(tot.v AS DOUBLE)))
               ), 6) AS dsir_weight
        FROM toks JOIN vocab USING (tok) CROSS JOIN tot
        GROUP BY doc_id
    """,
)
def cu_dsir_weights(spark, sf_dir):
    """DSIR importance weights (Xie et al., "Data Selection for Language
    Models via Importance Resampling"): score every document by the
    mean log-ratio of add-one-smoothed unigram likelihoods under a
    target distribution (here: the corpus's English slice) versus the
    full source distribution. Sampling proportionally to
    exp(dsir_weight) then tilts a 100 TB crawl toward the target
    domain without training a classifier.

    Scale shape: identical to tx_unigram_logprob — one partial-agg
    shuffle to build the (bounded-vocabulary) token table carrying BOTH
    source and target counts in a single pass (no second scan for the
    target slice), one token-keyed join + doc-keyed partial agg for
    scoring, totals attached as a one-row broadcast."""
    return _dsir_scored(spark, sf_dir)


def _dsir_scored(spark, sf_dir):
    """Shared DSIR scoring pipeline — the single source of the weight
    formula for BOTH cu_dsir_weights and cu_dsir_resample (mirroring
    how their oracles share _DSIR_SCORED_SQL). Returns
    (doc_id, n_tokens, dsir_weight)."""
    from bdc_collection_builder_spark.extensions.text import tokens

    docs = t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    toks = docs.select(
        "doc_id", "lang", F.explode(tokens(F.col("text"))).alias("tok"))
    vocab = toks.groupBy("tok").agg(
        F.count("*").alias("n_src"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("n_tgt"),
    )
    tot = vocab.agg(
        F.sum("n_src").alias("src_total"),
        F.sum("n_tgt").alias("tgt_total"),
        F.count("*").alias("v"),
    )
    v = F.col("v").cast("double")
    ratio = (
        F.log((F.col("n_tgt") + 1.0) / (F.col("tgt_total") + v))
        - F.log((F.col("n_src") + 1.0) / (F.col("src_total") + v))
    )
    return (
        toks.join(vocab, "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.round(F.avg(ratio), 6).alias("dsir_weight"),
        )
    )


@query(
    "tx_ccnet_buckets",
    survey=("TX-quality", "CU-sample"),
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, lang, unnest({_TOKS}) AS tok FROM documents
        ),
        vocab AS (
            SELECT tok, count(*) AS n FROM toks GROUP BY tok
        ),
        tot AS (SELECT sum(n) AS total FROM vocab),
        scored AS (
            SELECT doc_id, lang,
                   round(avg(ln(CAST(vocab.n AS DOUBLE)
                                / CAST(tot.total AS DOUBLE))), 6) AS lp
            FROM toks JOIN vocab USING (tok) CROSS JOIN tot
            GROUP BY doc_id, lang
        )
        SELECT doc_id, lang, lp AS avg_logprob,
               CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                       ELSE 'tail' END AS bucket
        FROM (
            SELECT doc_id, lang, lp,
                   ntile(3) OVER (PARTITION BY lang
                                  ORDER BY lp DESC, doc_id) AS nt
            FROM scored
        )
    """,
)
def tx_ccnet_buckets(spark, sf_dir):
    """CCNet-style perplexity bucketing (Wenzek et al., "CCNet:
    Extracting High Quality Monolingual Datasets from Web Crawl
    Data"): per language, rank documents by unigram-LM mean
    log-probability and split into head / middle / tail terciles — the
    standard quality stratification used to sample pretraining
    mixtures. The LM score is rounded to 6 places BEFORE ranking so
    the tercile boundary is bit-identical across engines; doc_id
    breaks the remaining ties deterministically.

    Scale shape: the scoring half is tx_unigram_logprob's two shuffles;
    the ntile window partitions by lang, so each language sorts
    independently — no global sort. A 100 TB corpus with few languages
    makes per-lang partitions large: the documented scale path swaps
    ntile for approx_percentile cut-points (a15 pattern) joined back as
    a broadcast, which this query's tests pin against."""
    from bdc_collection_builder_spark.extensions.text import tokens
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    toks = docs.select(
        "doc_id", "lang", F.explode(tokens(F.col("text"))).alias("tok"))
    vocab = toks.groupBy("tok").agg(F.count("*").alias("n"))
    tot = vocab.agg(F.sum("n").alias("total"))
    scored = (
        toks.join(vocab, "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id", "lang")
        .agg(F.round(F.avg(F.log(
            F.col("n").cast("double") / F.col("total").cast("double"))),
            6).alias("lp"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("lp"), F.asc("doc_id"))
    nt = F.ntile(3).over(w)
    return scored.select(
        "doc_id", "lang", F.col("lp").alias("avg_logprob"),
        F.when(nt == 1, "head").when(nt == 2, "middle")
         .otherwise("tail").alias("bucket"),
    )


_DSIR_SCORED_SQL = f"""
        toks AS (
            SELECT doc_id, lang, unnest({_TOKS}) AS tok FROM documents
        ),
        vocab AS (
            SELECT tok,
                   count(*) AS n_src,
                   sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS n_tgt
            FROM toks GROUP BY tok
        ),
        tot AS (
            SELECT sum(n_src) AS src_total, sum(n_tgt) AS tgt_total,
                   count(*) AS v
            FROM vocab
        ),
        scored AS (
            SELECT doc_id,
                   round(avg(
                       ln((vocab.n_tgt + 1.0)
                          / (tot.tgt_total + CAST(tot.v AS DOUBLE)))
                     - ln((vocab.n_src + 1.0)
                          / (tot.src_total + CAST(tot.v AS DOUBLE)))
                   ), 6) AS dsir_weight
            FROM toks JOIN vocab USING (tok) CROSS JOIN tot
            GROUP BY doc_id
        )
"""

_GUMBEL_SQL = """
            round(-ln(-ln(
                (CAST(concat('0x', substr(md5(
                     CAST(doc_id AS VARCHAR) || ':gumbel'), 1, 15))
                  AS BIGINT) % 1000000 + 0.5) / 1000000.0)), 6)
"""


@query(
    "cu_dsir_resample",
    survey=("CU-mix", "CU-sample"),
    oracle=f"""
        WITH {_DSIR_SCORED_SQL},
        keyed AS (
            SELECT doc_id, dsir_weight,
                   dsir_weight + {_GUMBEL_SQL} AS sample_key
            FROM scored
        )
        SELECT doc_id, dsir_weight, sample_rank FROM (
            SELECT doc_id, dsir_weight,
                   row_number() OVER (
                       ORDER BY sample_key DESC, doc_id
                   ) AS sample_rank
            FROM keyed
        ) WHERE sample_rank <= 100
    """,
)
def cu_dsir_resample(spark, sf_dir):
    """The resampling half of DSIR, via the Gumbel-top-k trick: adding
    independent Gumbel noise to each document's log-weight and taking
    the global top-k draws a weighted sample WITHOUT replacement
    proportionally to exp(dsir_weight) — in one pass, no normalizing
    constant, no rejection loop. The noise is a seeded keyed hash
    (md5(doc_id:'gumbel') → uniform → −ln(−ln u)), so the "random"
    sample is a pure function of the corpus: rerun-stable, auditable,
    and replayed exactly by the oracle.

    Scale shape: scoring is cu_dsir_weights' two shuffles; the top-k
    is a rank window — at 100 TB swap it for the t04/t05 pattern
    (per-partition top-k then merge) or a threshold on sample_key from
    approx_percentile; both documented scale paths of the sort family.
    Both the weight and the noise are rounded to 6 places BEFORE the
    sum so the ranking key is bit-identical across engines."""
    from bdc_collection_builder_spark.extensions.dedup import md5_hash60
    from pyspark.sql import Window

    scored = _dsir_scored(spark, sf_dir).select("doc_id", "dsir_weight")
    u = (
        (md5_hash60(F.concat(F.col("doc_id").cast("string"),
                             F.lit(":gumbel"))) % 1000000)
        .cast("double") + 0.5
    ) / 1000000.0
    gumbel = F.round(-F.log(-F.log(u)), 6)
    # orderBy().limit() plans as TakeOrderedAndProject — every
    # partition keeps its local top-100 and the driver merges 100×P
    # rows; no global sort, no single-partition window over the
    # corpus. The rank window then runs over the 100 surviving rows.
    top = (scored.withColumn("sample_key", F.col("dsir_weight") + gumbel)
           .orderBy(F.desc("sample_key"), F.asc("doc_id")).limit(100))
    w = Window.orderBy(F.desc("sample_key"), F.asc("doc_id"))
    return (
        top.withColumn("sample_rank", F.row_number().over(w))
        .select("doc_id", "dsir_weight", "sample_rank")
    )


from bdc_collection_builder_spark.functions.pixel import (  # noqa: E402
    synthetic_pixels_oracle,
)

_ZONAL_PIXELS = synthetic_pixels_oracle(n_scenes=4, height=16, width=16)


@query(
    "px_zonal_stats",
    survey=("X9", "A8", "X17"),
    oracle=f"""
        WITH px AS ({_ZONAL_PIXELS})
        SELECT scene_id,
               CAST((y // 8) * 2 + (x // 8) AS BIGINT) AS zone_id,
               CAST(count(*) AS BIGINT) AS n_pixels,
               CAST(count(CASE WHEN B04 = -9999.0 THEN 1 END) AS BIGINT)
                 AS n_nodata,
               round(avg(CASE WHEN B04 = -9999.0 THEN NULL ELSE B04 END), 4)
                 AS mean_b04,
               min(CASE WHEN B04 = -9999.0 THEN NULL ELSE B04 END)
                 AS min_b04,
               max(CASE WHEN B04 = -9999.0 THEN NULL ELSE B04 END)
                 AS max_b04
        FROM px
        GROUP BY scene_id, (y // 8) * 2 + (x // 8)
    """,
)
def px_zonal_stats(spark, sf_dir):
    """Zonal statistics — the standard EO summary (per-zone pixel
    count, nodata count, mean/min/max of a band) the reference's stack
    delegates to PostGIS raster summaries. Zones here are a regular
    quadrant grid, so zone assignment is pure integer arithmetic in
    the projection (zero joins, zero shuffles before the partial agg);
    irregular polygon zones route through j10's grid-bucketed spatial
    join to assign zone_id first, then this same aggregate. At 100 TB
    the partial aggregation combines map-side per (scene, zone) — the
    output is dimension-sized however large the raster."""
    from bdc_collection_builder_spark.functions.pixel import (
        mask_nodata,
        synthetic_pixels,
    )

    px = synthetic_pixels(spark, n_scenes=4, height=16, width=16)
    zone = (F.floor(F.col("y") / 8) * 2
            + F.floor(F.col("x") / 8)).cast("bigint")
    b04 = mask_nodata(F.col("B04"))
    return (
        px.select("scene_id", zone.alias("zone_id"), b04.alias("B04"))
        .groupBy("scene_id", "zone_id")
        .agg(F.count("*").cast("bigint").alias("n_pixels"),
             F.sum(F.col("B04").isNull().cast("int")).cast("bigint")
             .alias("n_nodata"),
             F.round(F.avg("B04"), 4).alias("mean_b04"),
             F.min("B04").alias("min_b04"),
             F.max("B04").alias("max_b04"))
    )


@query(
    "cu_reservoir_per_group",
    survey=("CU-sample",),
    oracle="""
        SELECT doc_id, source, sample_rank FROM (
            SELECT doc_id, source,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY CAST(concat('0x', substr(md5(
                           CAST(doc_id AS VARCHAR) || ':reservoir'), 1, 15))
                         AS BIGINT), doc_id
                   ) AS sample_rank
            FROM documents
        ) WHERE sample_rank <= 5
    """,
)
def cu_reservoir_per_group(spark, sf_dir):
    """Exact-k per-group sampling ("take k docs per source") — the
    deterministic reservoir: rank each group by a salted keyed hash
    and keep the first k. Equivalent in distribution to a uniform
    reservoir sample but rerun-stable and mergeable: because the hash
    order is a pure function of the key, re-running over a GROWN
    corpus keeps a document sampled until k better-hashed newcomers
    displace it — no RNG state, no resample churn. One shuffle on the
    group key; the rank window never sees more than a group. The
    fraction-based twin is cu_stratified_sample; this is the exact-k
    contract."""
    from bdc_collection_builder_spark.extensions.dedup import md5_hash60
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents").select("doc_id", "source")
    hkey = md5_hash60(F.concat(F.col("doc_id").cast("string"),
                               F.lit(":reservoir")))
    w = Window.partitionBy("source").orderBy(hkey.asc(), F.col("doc_id"))
    return (
        docs.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= 5)
        .select("doc_id", "source", "sample_rank")
    )


@query(
    "mm_av_align",
    survey=("MM-frames", "TJ-asof"),
    oracle="""
        WITH vid AS (
            SELECT i AS media_id, CAST(i // 3 AS BIGINT) AS gid,
                   CAST(f AS BIGINT) AS frame_ts_ms
            FROM range(0, 64) t(i),
                 unnest(generate_series(
                     0, greatest(1000 * (i % 30) - 1, 0), 1000)) u(f)
            WHERE i % 3 = 2
        ),
        aud AS (
            SELECT CAST(i // 3 AS BIGINT) AS gid,
                   CAST(c AS BIGINT) AS chunk_ts_ms
            FROM range(0, 64) t(i),
                 unnest(generate_series(
                     0, greatest(1000 * (i % 30) - 1, 0), 700)) u(c)
            WHERE i % 3 = 1
        )
        SELECT v.gid, v.media_id, v.frame_ts_ms,
               a.chunk_ts_ms AS aligned_chunk_ms
        FROM vid v ASOF LEFT JOIN aud a
          ON v.gid = a.gid AND a.chunk_ts_ms <= v.frame_ts_ms
    """,
)
def mm_av_align(spark, sf_dir):
    """Audio/video alignment — for every sampled video frame, the
    latest audio chunk at or before it within the same media group:
    the as-of join every multimodal training pipeline runs to pair
    frames with their soundtrack (and captions with both). Composes
    two existing operators: the Catalyst frame/chunk fan-out
    (mm_frame_sample's sequence+explode, no shuffle) and the
    union+carry-forward as-of join (operators/temporal.asof_join — one
    shuffle on the group key, no range cross-product). DuckDB replays
    it with a native ASOF LEFT JOIN, pinning the tie-inclusive
    backward semantics."""
    from bdc_collection_builder_spark.extensions.multimodal import (
        frame_sample_plan,
        synthetic_media,
    )
    from bdc_collection_builder_spark.operators.temporal import asof_join

    media = synthetic_media(spark, n=64)
    vid = (frame_sample_plan(media, every_ms=1000)
           .select("media_id",
                   F.floor(F.col("media_id") / 3).cast("bigint")
                   .alias("gid"),
                   F.col("frame_ts_ms").cast("bigint").alias("frame_ts_ms")))
    aud = (media.filter(F.col("kind") == "audio")
           .select(F.floor(F.col("media_id") / 3).cast("bigint")
                   .alias("gid"),
                   F.explode(F.sequence(
                       F.lit(0),
                       F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                       F.lit(700))).alias("__c"))
           .select("gid", F.col("__c").cast("bigint")
                   .alias("chunk_ts_ms")))
    aligned = asof_join(
        vid, aud, on=["gid"], left_ts="frame_ts_ms",
        right_ts="chunk_ts_ms", right_values=[],
        matched_ts_col="aligned_chunk_ms")
    return aligned.select("gid", "media_id", "frame_ts_ms",
                          F.col("aligned_chunk_ms").cast("bigint")
                          .alias("aligned_chunk_ms"))


@query(
    "tx_bigram_logprob",
    survey=("TX-quality", "TX-vocab"),
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest({_TOKS}) AS tok,
                   generate_subscripts({_TOKS}, 1) AS pos
            FROM documents
        ),
        big AS (
            SELECT doc_id, tok AS w1,
                   lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
            FROM toks
        ),
        pairs AS (SELECT * FROM big WHERE w2 IS NOT NULL),
        bg AS (SELECT w1, w2, count(*) AS c2 FROM pairs GROUP BY w1, w2),
        un AS (SELECT w1, count(*) AS c1 FROM pairs GROUP BY w1),
        vv AS (SELECT count(DISTINCT tok) AS v FROM toks)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
               round(avg(ln((bg.c2 + 1.0)
                            / (un.c1 + CAST(vv.v AS DOUBLE)))), 6)
                 AS avg_bigram_logprob
        FROM pairs JOIN bg USING (w1, w2) JOIN un USING (w1)
        CROSS JOIN vv
        GROUP BY doc_id
    """,
)
def tx_bigram_logprob(spark, sf_dir):
    """Bigram-LM quality score — one rung up the n-gram ladder from
    tx_unigram_logprob: each document scores the mean log-probability
    of its token transitions under the corpus's add-one-smoothed
    conditional bigram model, the signal that separates fluent text
    from shuffled-bag word salad (which unigram scoring cannot see).

    Scale shape: ONE doc-keyed window pass forms the transition pairs
    (posexplode + lead — no self-join on position), then two bounded
    partial-aggs build the bigram/unigram count tables and two
    token-keyed joins score the transitions; the vocabulary scalar
    rides as a one-row broadcast. Everything is count-shaped — at
    100 TB the model tables are vocabulary-bounded, never
    corpus-bounded."""
    from bdc_collection_builder_spark.extensions.text import tokens
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id",
        F.posexplode(tokens(F.col("text"))).alias("pos", "tok"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    pairs = (
        toks.select("doc_id", F.col("tok").alias("w1"),
                    F.lead("tok").over(w).alias("w2"))
        .filter(F.col("w2").isNotNull())
    )
    bg = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    un = pairs.groupBy("w1").agg(F.count("*").alias("c1"))
    vv = toks.agg(F.countDistinct("tok").alias("v"))
    lp = F.log((F.col("c2") + 1.0)
               / (F.col("c1") + F.col("v").cast("double")))
    return (
        pairs.join(bg, ["w1", "w2"]).join(un, "w1")
        .crossJoin(F.broadcast(vv))
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_bigrams"),
             F.round(F.avg(lp), 6).alias("avg_bigram_logprob"))
    )


@query(
    "tx_kneser_ney_bigram",
    survey=("TX-quality", "TX-vocab"),
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest({_TOKS}) AS tok,
                   generate_subscripts({_TOKS}, 1) AS pos
            FROM documents
        ),
        big AS (
            SELECT doc_id, tok AS w1,
                   lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
            FROM toks
        ),
        pairs AS (SELECT * FROM big WHERE w2 IS NOT NULL),
        bg AS (SELECT w1, w2, count(*) AS c2 FROM pairs GROUP BY w1, w2),
        un AS (
            SELECT w1, sum(c2) AS c1, count(*) AS n1f
            FROM bg GROUP BY w1
        ),
        cont AS (SELECT w2, count(*) AS n1p FROM bg GROUP BY w2),
        tot AS (SELECT count(*) AS nbt FROM bg)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
               round(avg(ln(
                   greatest(bg.c2 - CAST(0.75 AS DOUBLE), CAST(0 AS DOUBLE))
                       / un.c1
                   + (CAST(0.75 AS DOUBLE) * un.n1f / un.c1)
                       * (CAST(cont.n1p AS DOUBLE) / tot.nbt)
               )), 6) AS avg_kn_logprob
        FROM pairs JOIN bg USING (w1, w2) JOIN un USING (w1)
        JOIN cont USING (w2) CROSS JOIN tot
        GROUP BY doc_id
    """,
)
def tx_kneser_ney_bigram(spark, sf_dir):
    """Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995 /
    Chen & Goodman 1998, public) — the smoothing that add-one
    (tx_bigram_logprob) approximates badly: mass is removed by a fixed
    absolute discount D=0.75 from every seen transition and
    redistributed via the CONTINUATION probability (how many distinct
    left-contexts a word follows), which famously fixes the
    "san francisco" pathology where raw unigram frequency overrates
    "francisco" in novel contexts. Per-document mean log-probability
    of its transitions under the corpus model:

        P(w2|w1) = max(c12 - D, 0)/c1 + (D·N1+(w1·)/c1) · N1+(·w2)/N1+(··)

    Scale shape: identical to tx_bigram_logprob — one doc-keyed window
    forms transitions, the model tables (bigram counts, left-context
    stats, continuation counts) are vocabulary-bounded partial aggs,
    the bigram-type total rides as a one-row broadcast, and scoring is
    two token-keyed joins. No Python anywhere."""
    from pyspark.sql import Window

    from bdc_collection_builder_spark.extensions.text import tokens

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id",
        F.posexplode(tokens(F.col("text"))).alias("pos", "tok"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    pairs = (
        toks.select("doc_id", F.col("tok").alias("w1"),
                    F.lead("tok").over(w).alias("w2"))
        .filter(F.col("w2").isNotNull())
    )
    bg = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    # bg feeds the unigram/continuation/total reductions AND the scoring join — persist so it
    # computes once (the dd_prefix round-9 lesson)
    bg = tracked_persist(bg)
    un = bg.groupBy("w1").agg(
        F.sum("c2").alias("c1"), F.count("*").alias("n1f"))
    cont = bg.groupBy("w2").agg(F.count("*").alias("n1p"))
    tot = bg.agg(F.count("*").alias("nbt"))
    p_kn = (
        F.greatest(F.col("c2") - F.lit(0.75), F.lit(0.0)) / F.col("c1")
        + (F.lit(0.75) * F.col("n1f") / F.col("c1"))
        * (F.col("n1p").cast("double") / F.col("nbt"))
    )
    return (
        pairs.join(bg, ["w1", "w2"]).join(un, "w1").join(cont, "w2")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_bigrams"),
             F.round(F.avg(F.log(p_kn)), 6).alias("avg_kn_logprob"))
    )


@query(
    "tx_token_entropy",
    survey=("TX-quality",),
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
        ),
        tf AS (
            SELECT doc_id, tok, count(*) AS c FROM toks
            GROUP BY doc_id, tok
        ),
        dn AS (
            SELECT doc_id, sum(c) AS n FROM tf GROUP BY doc_id
        )
        SELECT tf.doc_id,
               CAST(dn.n AS BIGINT) AS n_tokens,
               round(-sum((tf.c / CAST(dn.n AS DOUBLE))
                          * ln(tf.c / CAST(dn.n AS DOUBLE))) / ln(2.0), 6)
                 AS token_entropy_bits
        FROM tf JOIN dn USING (doc_id)
        GROUP BY tf.doc_id, dn.n
    """,
)
def tx_token_entropy(spark, sf_dir):
    """Per-document Shannon entropy of the token distribution (bits):
    near-zero entropy marks degenerate repetition ("buy buy buy …"),
    abnormally high entropy at short length marks gibberish — the
    cheap information-theoretic complement to the Gopher repetition
    ratios (tx_repetition_stats) that thresholds cannot game with
    vocabulary shuffles.

    Scale shape: two doc-keyed partial aggs (term frequencies, then
    the entropy sum) — the second reuses the first's hash partitioning
    so at scale this is ONE shuffle over (doc, token) pairs and
    everything after is doc-local arithmetic."""
    from bdc_collection_builder_spark.extensions.text import tokens

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    tf = (docs.select("doc_id",
                      F.explode(tokens(F.col("text"))).alias("tok"))
          .groupBy("doc_id", "tok").agg(F.count("*").alias("c")))
    dn = tf.groupBy("doc_id").agg(F.sum("c").alias("n"))
    p = F.col("c") / F.col("n").cast("double")
    return (
        tf.join(dn, "doc_id")
        .groupBy("doc_id", "n")
        .agg(F.round((-F.sum(p * F.log(p))) / math.log(2.0), 6)
             .alias("token_entropy_bits"))
        .select("doc_id", F.col("n").cast("bigint").alias("n_tokens"),
                "token_entropy_bits")
    )


@query(
    "cu_weighted_sample_es",
    survey=("CU-sample",),
    oracle="""
        SELECT doc_id, source, sample_rank FROM (
            SELECT doc_id, source,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY
                         ln((CAST(concat('0x', substr(md5(
                                 CAST(doc_id AS VARCHAR) || ':es'), 1, 15))
                               AS BIGINT) + 1)
                            / CAST(1152921504606846976 AS DOUBLE))
                         / greatest(n_chars, 1) DESC,
                         doc_id
                   ) AS sample_rank
            FROM documents
        ) WHERE sample_rank <= 8
    """,
)
def cu_weighted_sample_es(spark, sf_dir):
    """Weight-proportional sampling WITHOUT replacement per source
    (Efraimidis–Spirakis A-ES): key_i = ln(u_i)/w_i with u_i a keyed-
    hash uniform in (0,1] and w_i = n_chars — the top-k keys per group
    are an exact weighted sample without replacement. Like the
    reservoir twin it is RNG-free and rerun-stable (u is a pure
    function of doc_id), and distributed the same way: one shuffle on
    the group key, a per-group rank window, k rows kept. This is how
    a curation pipeline oversamples long/high-quality documents
    without a replacement loop or a driver-side pass."""
    from bdc_collection_builder_spark.extensions.dedup import md5_hash60
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents").select("doc_id", "source",
                                                "n_chars")
    u = (md5_hash60(F.concat(F.col("doc_id").cast("string"), F.lit(":es")))
         + F.lit(1)) / F.lit(float(1 << 60))
    key = F.log(u) / F.greatest(F.col("n_chars"), F.lit(1))
    w = Window.partitionBy("source").orderBy(key.desc(), F.col("doc_id"))
    return (
        docs.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= 8)
        .select("doc_id", "source", "sample_rank")
    )


@query(
    "cu_temperature_mix",
    survey=("CU-mix",),
    oracle="""
        WITH sizes AS (
            SELECT source, CAST(count(*) AS BIGINT) AS n_docs
            FROM documents GROUP BY source
        ),
        powed AS (
            SELECT source, n_docs,
                   pow(CAST(n_docs AS DOUBLE), CAST(0.7 AS DOUBLE)) AS npow
            FROM sizes
        ),
        tot AS (SELECT sum(npow) AS z FROM powed)
        SELECT p.source, p.n_docs,
               round(p.npow / t.z, 8) AS mix_weight,
               round(p.npow / t.z * 10000 / p.n_docs, 8)
                   AS per_doc_sample_rate
        FROM powed p, tot t
    """,
)
def cu_temperature_mix(spark, sf_dir):
    """Temperature-based source mixing (α=0.7): the multilingual/
    multi-domain rebalancing rule p_i ∝ n_i^α that upsamples small
    sources without letting the biggest domains drown the mixture.
    Emits each source's mixture weight and the per-document sampling
    rate for a 10k-doc target epoch — the numbers a sampler like
    cu_weighted_sample_es or cu_hash_split consumes. One count
    aggregate over the corpus; everything after runs on the source
    dimension (the one-row normalizer attaches via broadcast)."""
    docs = t(spark, sf_dir, "documents")
    sizes = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    powed = sizes.withColumn(
        "npow", F.pow(F.col("n_docs").cast("double"), F.lit(0.7)))
    tot = powed.agg(F.sum("npow").alias("z"))
    return (
        powed.crossJoin(F.broadcast(tot))
        .select(
            "source", "n_docs",
            F.round(F.col("npow") / F.col("z"), 8).alias("mix_weight"),
            F.round(F.col("npow") / F.col("z") * 10000 / F.col("n_docs"), 8)
            .alias("per_doc_sample_rate"))
    )


_ER_DECAY = 0.7   # per-epoch value decay of repeated data
_ER_MAX = 8       # epoch cap
_ER_MULT = 3      # budget = 3x the corpus's unique tokens
# r^k precomputed as python literals so BOTH engines use identical
# doubles — no reliance on libm pow() agreeing across engines
_ER_POW = [_ER_DECAY ** k for k in range(_ER_MAX + 1)]
# geometric partial sums S_k = (1 - r^k) / (1 - r), same literal rule
_ER_GSUM = [(1 - _ER_DECAY ** k) / (1 - _ER_DECAY)
            for k in range(_ER_MAX + 1)]


def _er_case(col: str, vals: list[float]) -> str:
    whens = " ".join(f"WHEN {k} THEN CAST({v!r} AS DOUBLE)"
                     for k, v in enumerate(vals))
    return f"(CASE {col} {whens} END)"


@query(
    "cu_epoch_repeat_plan",
    survey=("CU-mix",),
    oracle=f"""
        WITH toks AS (
            SELECT source, CAST(sum(len({_TOKS})) AS BIGINT) AS u
            FROM documents GROUP BY source
        ),
        tot AS (
            SELECT sum(u) AS total_u, count(*) AS n_src FROM toks
        ),
        plan AS (
            SELECT t.source, t.u,
                   CAST({_ER_MULT} AS DOUBLE) * x.total_u / x.n_src
                       AS target_tokens,
                   least(CAST({_ER_MULT} AS DOUBLE) * x.total_u / x.n_src
                             / t.u,
                         CAST({_ER_MAX} AS DOUBLE)) AS epochs
            FROM toks t CROSS JOIN tot x
        ),
        split AS (
            SELECT source, u, target_tokens, epochs,
                   CAST(floor(epochs) AS BIGINT) AS full_ep,
                   epochs - floor(epochs) AS frac_ep
            FROM plan
        )
        SELECT source, u AS unique_tokens,
               round(target_tokens, 2) AS target_tokens,
               round(epochs, 4) AS epochs,
               round(u * ({_er_case('full_ep', _ER_GSUM)}
                          + frac_ep * {_er_case('full_ep', _ER_POW)}), 2)
                   AS effective_tokens,
               round(u * ({_er_case('full_ep', _ER_GSUM)}
                          + frac_ep * {_er_case('full_ep', _ER_POW)})
                     / target_tokens, 6) AS efficiency
        FROM split
    """,
)
def cu_epoch_repeat_plan(spark, sf_dir):
    """Data-constrained epoch planning (the Muennighoff et al. 2023
    "Scaling Data-Constrained Language Models" regime, public): when
    the token budget exceeds a source's unique tokens, the source is
    REPEATED, and repeated epochs are worth geometrically less
    (decay r={_ER_DECAY} per epoch here). Each source gets an equal
    share of a budget {_ER_MULT}x the corpus's unique tokens; the plan
    reports fractional epochs (capped at {_ER_MAX}), the EFFECTIVE
    token yield U·(S_full + frac·r^full) with S_k the geometric
    partial sum, and the efficiency ratio that tells the mixer when
    further repetition is wasted — the quantity that decides whether
    to buy more data or more epochs at 100 TB.

    Determinism: r^k and S_k are precomputed Python literals CASE'd on
    the integer epoch count — both engines consume identical doubles
    instead of trusting libm pow() to agree. Plan shape: one
    source-keyed token aggregate; everything after runs on the 20-row
    source dimension with a one-row total attach."""
    from bdc_collection_builder_spark.extensions.text import tokens

    docs = t(spark, sf_dir, "documents")
    toks = docs.groupBy("source").agg(
        F.sum(F.size(tokens(F.col("text")))).cast("bigint").alias("u"))
    tot = toks.agg(F.sum("u").alias("total_u"),
                   F.count("*").alias("n_src"))
    target = (F.lit(float(_ER_MULT)) * F.col("total_u") / F.col("n_src"))
    plan = (
        toks.crossJoin(F.broadcast(tot))
        .select("source", "u", target.alias("target_tokens"),
                F.least(target / F.col("u"),
                        F.lit(float(_ER_MAX))).alias("epochs"))
    )
    split = plan.select(
        "source", "u", "target_tokens", "epochs",
        F.floor(F.col("epochs")).cast("bigint").alias("full_ep"),
        (F.col("epochs") - F.floor(F.col("epochs"))).alias("frac_ep"))

    def case_of(vals: list[float]):
        expr = None
        for k, v in enumerate(vals):
            cond = F.col("full_ep") == k
            expr = (F.when(cond, F.lit(v)) if expr is None
                    else expr.when(cond, F.lit(v)))
        return expr

    eff = F.col("u") * (case_of(_ER_GSUM)
                        + F.col("frac_ep") * case_of(_ER_POW))
    return split.select(
        "source", F.col("u").alias("unique_tokens"),
        F.round("target_tokens", 2).alias("target_tokens"),
        F.round("epochs", 4).alias("epochs"),
        F.round(eff, 2).alias("effective_tokens"),
        F.round(eff / F.col("target_tokens"), 6).alias("efficiency"))


@query(
    "cu_length_bucketing",
    survey=("CU-pack",),
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens
            FROM documents
        ),
        bucketed AS (
            SELECT n_tokens,
                   CASE WHEN n_tokens <= 16 THEN 16
                        WHEN n_tokens <= 32 THEN 32
                        WHEN n_tokens <= 64 THEN 64
                        WHEN n_tokens <= 128 THEN 128
                        WHEN n_tokens <= 256 THEN 256
                        WHEN n_tokens <= 512 THEN 512
                        WHEN n_tokens <= 1024 THEN 1024
                        ELSE 2048 END AS bucket
            FROM toks
        )
        SELECT bucket,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS real_tokens,
               CAST(count(*) * bucket AS BIGINT) AS padded_tokens,
               round(CAST(sum(n_tokens) AS DOUBLE)
                     / (count(*) * bucket), 6) AS fill_ratio
        FROM bucketed GROUP BY bucket
    """,
)
def cu_length_bucketing(spark, sf_dir):
    """Length-bucketed batching report: docs binned to power-of-two
    sequence buckets (the pad-to-bucket batching that replaces
    pad-to-max), with per-bucket padding efficiency — the fill_ratio
    column is the fraction of compute that lands on real tokens. The
    bucket ladder is a fixed integer CASE (no float log2, which
    disagrees across engines at exact powers of two). Token counting
    is the shared whitespace contract; one scan, one bounded-key
    aggregate."""
    from bdc_collection_builder_spark.extensions.text import token_count

    docs = t(spark, sf_dir, "documents")
    n = token_count(F.col("text")).cast("bigint")
    ladder = F.when(n <= 16, 16)
    for b in (32, 64, 128, 256, 512, 1024):
        ladder = ladder.when(n <= b, b)
    bucketed = docs.select(
        n.alias("n_tokens"), ladder.otherwise(2048).alias("bucket"))
    return (
        bucketed.groupBy("bucket")
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_tokens").alias("real_tokens"),
             (F.count("*") * F.col("bucket")).cast("bigint")
             .alias("padded_tokens"),
             F.round(F.sum("n_tokens").cast("double")
                     / (F.count("*") * F.col("bucket")), 6)
             .alias("fill_ratio"))
    )


_CDC_MIN = 12  # chunks shorter than this are noise, not dedup signal


@query(
    "tx_cdc_chunk_dedup",
    survey=("DD-exact", "TX-fingerprint"),
    oracle=f"""
        WITH docs AS (
            SELECT doc_id, text FROM documents WHERE len(text) >= 1
        ),
        bounds AS (
            SELECT doc_id, text,
                   list_concat(list_concat([0], list_filter(
                       generate_series(1, len(text)),
                       i -> ascii(substr(text, i, 1)) % 17 = 0)),
                       [len(text)]) AS b
            FROM docs
        ),
        chunks AS (
            SELECT doc_id, text, unnest(list_transform(
                generate_series(2, len(b)),
                k -> substr(text, b[k-1] + 1, b[k] - b[k-1]))) AS chunk
            FROM bounds
        ),
        sized AS (
            SELECT doc_id, text, chunk, md5(chunk) AS h
            FROM chunks WHERE len(chunk) >= {_CDC_MIN}
        ),
        freq AS (
            SELECT h, count(DISTINCT doc_id) AS ndocs
            FROM sized GROUP BY h
        )
        SELECT s.doc_id,
               CAST(count(*) AS BIGINT) AS n_chunks,
               CAST(sum(CASE WHEN f.ndocs > 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_dup_chunks,
               round(CAST(sum(CASE WHEN f.ndocs > 1 THEN len(s.chunk)
                                   ELSE 0 END) AS DOUBLE)
                     / any_value(len(s.text)), 6) AS dup_char_ratio
        FROM sized s JOIN freq f USING (h)
        GROUP BY s.doc_id
    """,
)
def tx_cdc_chunk_dedup(spark, sf_dir):
    """Content-defined-chunking dedup (the rsync/FastCDC family): chunk
    boundaries are decided by the CONTENT (boundary chars whose code
    satisfies a hash rule — here ascii % 17 == 0, the 1-byte gear
    table), so an insertion early in a document shifts at most one
    chunk instead of re-aligning every fixed window — the property
    that makes chunk-level dedup robust where fixed k-gram windows
    (tx_span_dedup) smear. Per doc: boundary positions via a filtered
    `sequence` HOF, chunk slices via `transform` over consecutive
    boundary pairs — one codegen'd scan, no Python; then one shuffle
    on the chunk hash for cross-corpus frequency and one join back.
    Emits per-doc duplicated-chunk counts and the duplicated-character
    ratio (the contamination share a curation pass would strip). At
    100 TB the chunk table is the only corpus-sized intermediate and
    carries 8-byte hashes, not text (prod swaps md5 for xxhash64 like
    the other dedup twins)."""
    docs = t(spark, sf_dir, "documents").filter(
        F.length("text") >= 1).select("doc_id", "text")
    text = F.col("text")
    bpos = F.filter(
        F.sequence(F.lit(1), F.length(text)),
        lambda i: F.ascii(F.substr(text, i, F.lit(1))) % 17 == 0)
    # The boundary array MUST be materialized as a column before the
    # chunk transform references it: higher-order-function lambdas are
    # interpreted (no whole-stage codegen, no common-subexpression
    # elimination), so an inlined `b` would re-run the O(len)
    # filter+sequence scan for EVERY element_at — O(len x boundaries)
    # per doc instead of O(len). Round-10 census caught exactly that:
    # 8.5s -> 0.3s at sf0.001 for the chunking stage alone.
    docs = docs.withColumn(
        "b", F.concat(F.array(F.lit(0)), bpos, F.array(F.length(text))))
    b = F.col("b")
    chunks = F.transform(
        F.sequence(F.lit(2), F.size(b)),
        lambda k: F.substr(
            text, F.element_at(b, k - 1) + 1,
            F.element_at(b, k) - F.element_at(b, k - 1)))
    # Downstream (the frequency aggregate AND the join-back) needs
    # only (doc_id, doc_len, chunk_len, h): project the chunk TEXT
    # away before anything shuffles (guide §2.3/§8 — shuffle
    # metadata, never the payload), and persist the ~32-byte-per-row
    # metadata frame so the boundary scan + chunking + md5 chain runs
    # once instead of once per consumer (the winnow persist rule:
    # |frame| << producing work).
    sized = (
        docs.select("doc_id", F.length(text).alias("doc_len"),
                    F.explode(chunks).alias("chunk"))
        .filter(F.length("chunk") >= _CDC_MIN)
        .select("doc_id", "doc_len", F.length("chunk").alias("clen"),
                F.md5("chunk").alias("h"))
    )
    sized = tracked_persist(sized)
    freq = sized.groupBy("h").agg(
        F.countDistinct("doc_id").alias("ndocs"))
    dup = F.when(F.col("ndocs") > 1, 1).otherwise(0)
    return (
        sized.join(freq, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(dup).cast("bigint").alias("n_dup_chunks"),
            F.round(
                F.sum(F.when(F.col("ndocs") > 1, F.col("clen"))
                      .otherwise(0)).cast("double")
                / F.first("doc_len"), 6).alias("dup_char_ratio"))
    )


_WIN_K = 8      # char k-gram width
_WIN_W = 4      # winnowing window (hashes per window)
_WIN_HEAD = 512  # fingerprint the document head (bounds cost per doc)

# k-gram hash: positional base-131 polynomial over the gram's (code
# point % 256) digits — exact int64 on both engines (max term
# 255 * 131^7 ≈ 1.7e17, sum of 8 < 1.4e18, no overflow) — then one
# LCG scramble mod 2^31 so winnowing's min-selection isn't biased
# toward low-codepoint leading chars. Replaced md5+hex+conv in round
# 10: the census measured 30M per-gram md5s at ~4.2s of the query's
# 10.8s wall at sf0.1, and the fingerprint hash only needs to be
# DETERMINISTIC AND ORACLE-REPLAYABLE, not cryptographic — the
# winnowing guarantee (shared substring => shared fingerprint) holds
# for any deterministic hash. ascii(substr) cross-engine parity is
# the proven CDC-gear pattern (tx_cdc_chunk_dedup).
_WIN_M31 = 2_147_483_648
_WIN_POWS = [131 ** (_WIN_K - 1 - j) for j in range(_WIN_K)]
# the per-char codepoint array is computed ONCE per row and indexed
# O(1) per polynomial term — 8 substr allocations per gram position
# measured SLOWER than the md5 they replaced (15.7s vs 10.8s at
# sf0.1); with the precomputed array the hash is pure int64 adds
_WIN_CPS = (f"list_transform(generate_series(1, len(head)), "
            f"c -> CAST(ascii(substr(head, c, 1)) % 256 AS BIGINT))")
_WIN_POLY = " + ".join(
    f"cps[CAST(i AS INTEGER) + {j}] * {p}"
    for j, p in enumerate(_WIN_POWS))
_WIN_HASH = (f"((({_WIN_POLY}) % {_WIN_M31}) * 1103515245 + 12345) "
             f"% {_WIN_M31}")


@query(
    "tx_winnow_fingerprints",
    survey=("TX-fingerprint", "DD-exact"),
    oracle=f"""
        WITH docs AS (
            SELECT doc_id, substr(text, 1, {_WIN_HEAD}) AS head
            FROM documents WHERE len(text) >= {_WIN_K + _WIN_W - 1}
        ),
        cps AS (
            SELECT doc_id, head, {_WIN_CPS} AS cps FROM docs
        ),
        hashed AS (
            SELECT doc_id,
                   list_transform(
                       generate_series(1, len(head) - {_WIN_K - 1}),
                       i -> {_WIN_HASH}) AS hs
            FROM cps
        ),
        selected AS (
            SELECT doc_id, list_distinct(list_transform(
                generate_series(1, len(hs) - {_WIN_W - 1}),
                j -> list_min(hs[j:j + {_WIN_W - 1}]))) AS prints
            FROM hashed
        ),
        exploded AS (
            SELECT doc_id, unnest(prints) AS p FROM selected
        ),
        freq AS (
            SELECT p, count(DISTINCT doc_id) AS ndocs
            FROM exploded GROUP BY p
        )
        SELECT e.doc_id,
               CAST(count(*) AS BIGINT) AS n_prints,
               CAST(sum(CASE WHEN f.ndocs > 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_shared,
               round(avg(CASE WHEN f.ndocs > 1 THEN CAST(1.0 AS DOUBLE)
                              ELSE CAST(0.0 AS DOUBLE) END), 6)
                   AS shared_ratio
        FROM exploded e JOIN freq f USING (p)
        GROUP BY e.doc_id
    """,
)
def tx_winnow_fingerprints(spark, sf_dir):
    """Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken,
    the MOSS algorithm, public): hash every char k-gram, slide a
    w-hash window, keep each window's MINIMUM — guaranteeing any
    shared substring of length >= k+w-1 contributes at least one
    shared fingerprint while storing only ~2/(w+1) of the hashes.
    The overlap-robust middle ground between whole-doc fingerprints
    (tx_fingerprint — breaks on any edit) and all-k-gram span dedup
    (tx_span_dedup — k x the storage). Per doc everything is one
    codegen'd HOF chain (transform -> sliding array_min -> distinct);
    the only corpus-sized shuffle carries the SELECTED 8-byte prints.
    Fingerprints cover the document head (512 chars) — the
    plagiarism-detection convention that bounds per-doc cost; full-doc
    coverage is the same plan with the substr lifted."""
    docs = (
        t(spark, sf_dir, "documents")
        .filter(F.length("text") >= _WIN_K + _WIN_W - 1)
        .select("doc_id",
                F.substring("text", 1, _WIN_HEAD).alias("head"))
    )
    k, w = _WIN_K, _WIN_W
    # codepoint array ONCE per row (the HOF-materialization rule: a
    # real column, so the gram lambda's 8 reads are O(1) element_at,
    # never substr allocations — 8 substrs per position measured
    # SLOWER than the md5 they replaced)
    docs = docs.withColumn("cps", F.transform(
        F.sequence(F.lit(1), F.length("head")),
        lambda c: (F.ascii(F.substr(F.col("head"), c, F.lit(1)))
                   % 256).cast("bigint")))

    def gram_hash(i):
        poly = None
        for j, p in enumerate(_WIN_POWS):
            term = F.element_at(F.col("cps"), i + j) * F.lit(p)
            poly = term if poly is None else poly + term
        return ((poly % _WIN_M31) * 1103515245 + 12345) % _WIN_M31

    hs = F.transform(
        F.sequence(F.lit(1), F.length("head") - (k - 1)), gram_hash)
    prints = F.array_distinct(F.transform(
        F.sequence(F.lit(1), F.size("hs") - (w - 1)),
        lambda j: F.array_min(F.slice("hs", j, w))))
    exploded = (
        docs.select("doc_id", hs.alias("hs"))
        .select("doc_id", F.explode(prints).alias("p"))
    )
    # exploded feeds the frequency aggregate AND the join-back, and
    # Catalyst replays the producing chain per consumer — here ~30M
    # md5 k-gram hashes plus the sliding-min winnow (the round-10
    # census measured the double chain at 10.8s; persisting the
    # selected-print rows — two longs each, ~2/(w+1) of the hashes —
    # meets the persist rule: |frame| << producing work)
    exploded = tracked_persist(exploded)
    # (doc_id, p) rows are already distinct — array_distinct ran per
    # doc before the explode — so count(*) == countDistinct(doc_id)
    # without the distinct-expand phase
    freq = exploded.groupBy("p").agg(
        F.count("*").alias("ndocs"))
    shared = F.when(F.col("ndocs") > 1, 1).otherwise(0)
    return (
        exploded.join(freq, "p")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_prints"),
             F.sum(shared).cast("bigint").alias("n_shared"),
             F.round(F.avg(shared.cast("double")), 6)
             .alias("shared_ratio"))
    )


_RAG_CHUNK = 64   # tokens per chunk
_RAG_STRIDE = 32  # token stride (50% overlap)


@query(
    "tx_rag_chunking",
    survey=("CU-pack", "TX-stats"),
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, {_TOKS} AS tk FROM documents
        ),
        offsets AS (
            SELECT doc_id, tk,
                   unnest(generate_series(1, len(tk), {_RAG_STRIDE}))
                       AS o
            FROM toks WHERE len(tk) >= 1
        )
        SELECT doc_id,
               CAST((o - 1) / {_RAG_STRIDE} AS BIGINT) AS chunk_idx,
               CAST(len(tk[o:o + {_RAG_CHUNK - 1}]) AS BIGINT)
                   AS n_tokens,
               md5(array_to_string(tk[o:o + {_RAG_CHUNK - 1}], ' '))
                   AS chunk_hash
        FROM offsets
    """,
)
def tx_rag_chunking(spark, sf_dir):
    """Retrieval-corpus chunking: fixed-size overlapping token windows
    (64 tokens, 32 stride — the standard RAG ingestion
    shape) with a content hash per chunk so the embedding stage
    downstream can dedup identical chunks before paying for vectors.
    Chunk enumeration is one `sequence` + `explode` per document —
    map-only, no shuffle, no Python; the emitted rows are
    (doc, chunk_idx, token_count, hash), i.e. exactly the work list a
    distributed embedding pass consumes. The oracle replays the same
    slicing, value-checking chunk boundaries and content hashes."""
    from bdc_collection_builder_spark.extensions.text import tokens

    docs = t(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("tk"))
    chunked = (
        docs.filter(F.size("tk") >= 1)
        .select("doc_id", "tk",
                F.explode(F.sequence(F.lit(1), F.size("tk"),
                                     F.lit(_RAG_STRIDE))).alias("o"))
    )
    sliced = F.slice("tk", F.col("o"), _RAG_CHUNK)
    return chunked.select(
        "doc_id",
        ((F.col("o") - 1) / _RAG_STRIDE).cast("bigint").alias("chunk_idx"),
        F.size(sliced).cast("bigint").alias("n_tokens"),
        F.md5(F.concat_ws(" ", sliced)).alias("chunk_hash"),
    )


@query(
    "tx_zipf_slope",
    survey=("TX-vocab", "TX-quality"),
    oracle=f"""
        WITH words AS (
            SELECT tok AS w, CAST(count(*) AS BIGINT) AS cnt FROM (
                SELECT unnest({_TOKS}) AS tok FROM documents
            ) GROUP BY tok
        ),
        ranked AS (
            SELECT row_number() OVER (ORDER BY cnt DESC, w) AS r, cnt
            FROM words
            ORDER BY cnt DESC, w LIMIT 100
        ),
        q AS (
            SELECT CAST(floor(ln(CAST(r AS DOUBLE)) * 10000000e0)
                        AS BIGINT) AS x,
                   CAST(floor(ln(CAST(cnt AS DOUBLE)) * 10000000e0)
                        AS BIGINT) AS y
            FROM ranked
        ),
        s AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS sx,
                   CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(x * y) AS BIGINT) AS sxy,
                   CAST(sum(x * x) AS BIGINT) AS sxx
            FROM q
        )
        SELECT n AS n_words,
               round(CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE), 6)
                 AS zipf_slope,
               round((CAST(sy AS DOUBLE) / 10000000e0
                      - (CAST(n * sxy - sx * sy AS DOUBLE)
                         / CAST(n * sxx - sx * sx AS DOUBLE))
                        * CAST(sx AS DOUBLE) / 10000000e0)
                     / CAST(n AS DOUBLE), 6) AS zipf_intercept
        FROM s
    """,
)
def tx_zipf_slope(spark, sf_dir):
    """Zipf-law fit over the corpus vocabulary: the OLS slope (and
    intercept) of ln(frequency) against ln(rank) for the top-100
    words. Natural corpora sit near slope -1 (Zipf 1949, public);
    machine-generated or template text bends the curve — a one-number
    corpus-quality diagnostic alongside the entropy and repetition
    suites.

    Determinism contract: each point's ln() is computed per row and
    QUANTIZED to an int64 at 1e-7 granularity, so every regression
    moment is an exact integer sum (order-free); a 1-ulp libm/JVM
    disagreement on one ln() perturbs a moment by 1e-7 and the slope
    by under 1e-8 — orders below the 6-decimal round. The slope is
    then one double expression over exact integers on both engines.

    100 TB: one map-side-combined word-count shuffle (the corpus
    scan), a TakeOrdered top-100 (per-partition heaps, no global
    sort), then a 100-row fused aggregate. The regression itself is
    dimension-sized."""
    from pyspark.sql import Window

    from bdc_collection_builder_spark.extensions.text import tokens

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    words = (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("w").agg(F.count("*").cast("bigint").alias("cnt"))
    )
    top = words.orderBy(F.col("cnt").desc(), "w").limit(100)
    ranked = top.withColumn(
        "r", F.row_number().over(
            Window.partitionBy(F.lit(1)).orderBy(F.col("cnt").desc(),
                                                 "w")))
    scale = 10000000.0
    q = ranked.select(
        F.floor(F.log(F.col("r").cast("double")) * scale)
        .cast("bigint").alias("x"),
        F.floor(F.log(F.col("cnt").cast("double")) * scale)
        .cast("bigint").alias("y"))
    s = q.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"))
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) \
        .cast("double") / (F.col("n") * F.col("sxx")
                           - F.col("sx") * F.col("sx")).cast("double")
    intercept = (F.col("sy").cast("double") / scale
                 - slope * F.col("sx").cast("double") / scale) \
        / F.col("n").cast("double")
    return s.select(
        F.col("n").alias("n_words"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round(intercept, 6).alias("zipf_intercept"))


@query(
    "tx_word_burstiness",
    survey=("TX-vocab", "TX-quality"),
    oracle=f"""
        WITH per_doc AS (
            SELECT doc_id, tok AS w, CAST(count(*) AS BIGINT) AS c
            FROM (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents)
            GROUP BY 1, 2
        ),
        nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        moments AS (
            SELECT w,
                   CAST(count(*) AS BIGINT) AS n_docs_with,
                   CAST(sum(c) AS BIGINT) AS s1,
                   CAST(sum(c * c) AS BIGINT) AS s2
            FROM per_doc GROUP BY w
        ),
        top AS (
            SELECT w, n_docs_with, s1, s2
            FROM moments ORDER BY s1 DESC, w LIMIT 50
        )
        SELECT w AS word, n_docs_with,
               s1 AS total_count,
               round((CAST(t.n * s2 - s1 * s1 AS DOUBLE) / t.n)
                     / CAST(s1 AS DOUBLE), 6) AS burstiness
        FROM top CROSS JOIN nd t
    """,
)
def tx_word_burstiness(spark, sf_dir):
    """Word burstiness (Church & Gale 1995, public): the
    variance-to-mean ratio of a word's per-document count over the
    WHOLE corpus (zero-count documents included via the moment
    identity — never materialized). Function words sit near 1
    (Poisson); content words and boilerplate fragments burst far
    above it — a template/spam fingerprint the frequency rank alone
    cannot see (a word can be mid-frequency yet appear 40 times in
    each of a few documents). Top-50 words by total count.

    Exactness: per-doc counts are exact int64; the corpus moments
    (Σc, Σc²) are exact integer sums, zero documents contribute 0 to
    both, so var/mean = ((N·Σc² − (Σc)²)/N)/Σc is ONE fixed double
    expression over exact integers (N·Σc² < 2^63 at any realistic
    top-word mass) — bit-deterministic, no float folds.

    100 TB: one map-side-combined (doc_id, word) count shuffle, one
    word-moment rollup, a TakeOrdered top-50 (per-partition heaps) —
    the same envelope as the vocabulary/Zipf passes."""
    from bdc_collection_builder_spark.extensions.text import tokens

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()  # bounded scalar (dimension count)
    per_doc = (
        docs.select("doc_id", F.explode(tokens(F.col("text")))
                    .alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    moments = per_doc.groupBy("w").agg(
        F.count("*").cast("bigint").alias("n_docs_with"),
        F.sum("c").cast("bigint").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("s2"))
    top = moments.orderBy(F.col("s1").desc(), "w").limit(50)
    burst = ((F.lit(n_docs) * F.col("s2")
              - F.col("s1") * F.col("s1")).cast("double")
             / F.lit(n_docs)) / F.col("s1").cast("double")
    return top.select(
        F.col("w").alias("word"), "n_docs_with",
        F.col("s1").alias("total_count"),
        F.round(burst, 6).alias("burstiness"))


@query(
    "tx_heaps_vocab_growth",
    survey=("TX-vocab", "A2", "W1"),
    oracle=f"""
        WITH tot AS (
            SELECT CAST(count(*) AS BIGINT) AS nd FROM documents
        ),
        toks AS (
            SELECT CAST(d.doc_id * 16 // tot.nd AS BIGINT) AS bucket,
                   unnest({_TOKS}) AS tok
            FROM documents d, tot
        ),
        per_bucket AS (
            SELECT bucket, CAST(count(*) AS BIGINT) AS n_toks
            FROM toks GROUP BY bucket
        ),
        firsts AS (
            SELECT CAST(min(bucket) AS BIGINT) AS first_bucket
            FROM toks GROUP BY tok
        ),
        new_vocab AS (
            SELECT first_bucket AS bucket,
                   CAST(count(*) AS BIGINT) AS n_new
            FROM firsts GROUP BY first_bucket
        )
        SELECT p.bucket,
               CAST(sum(p.n_toks) OVER (ORDER BY p.bucket) AS BIGINT)
                 AS cum_tokens,
               CAST(sum(coalesce(v.n_new, 0)) OVER (ORDER BY p.bucket)
                    AS BIGINT) AS cum_vocab
        FROM per_bucket p
        LEFT JOIN new_vocab v ON v.bucket = p.bucket
    """,
)
def tx_heaps_vocab_growth(spark, sf_dir):
    """Heaps'-law vocabulary-growth curve (Heaps 1978, public): how
    the distinct-token count grows as the corpus is consumed in
    ingestion order — 16 ordered slices of the doc_id range, each row
    reporting CUMULATIVE tokens seen and CUMULATIVE vocabulary. A
    natural corpus grows ~ K*n^beta (beta ~0.5); a deduplicated or
    template-heavy corpus flattens early — the curve is the
    diagnostic the tokenizer-budget planner reads before fixing a
    vocab size (pairs with tx_zipf_slope's frequency view).

    The cumulative-distinct is NOT computed by re-scanning per prefix:
    each token contributes to exactly ONE slice (its first-occurrence
    slice, ``min(bucket)`` per token), so cumulative vocabulary is a
    running sum of first-occurrence counts — one extra groupBy, no
    quadratic prefix work. All counts exact int64.

    100 TB: one corpus-scale shuffle for the per-token min-bucket
    (map-side combined min), one for per-bucket token totals; the
    window runs over 16 rows on a single partition — dimension-sized
    by construction. doc_id * 16 stays well under int64."""
    from pyspark.sql import Window

    from bdc_collection_builder_spark.extensions.text import tokens

    docs = t(spark, sf_dir, "documents")
    nd = docs.count()
    toks = docs.select(
        F.expr(f"CAST(doc_id * 16 DIV {nd} AS BIGINT)").alias("bucket"),
        F.explode(tokens(F.col("text"))).alias("tok"))
    per_bucket = toks.groupBy("bucket").agg(
        F.count("*").cast("bigint").alias("n_toks"))
    new_vocab = (
        toks.groupBy("tok").agg(F.min("bucket").alias("bucket"))
        .groupBy("bucket").agg(F.count("*").cast("bigint")
                               .alias("n_new"))
    )
    w = Window.partitionBy(F.lit(1)).orderBy("bucket")
    return (
        per_bucket.join(new_vocab, "bucket", "left")
        .select("bucket",
                F.sum("n_toks").over(w).cast("bigint")
                .alias("cum_tokens"),
                F.sum(F.coalesce(F.col("n_new"), F.lit(0))).over(w)
                .cast("bigint").alias("cum_vocab"))
    )


@query(
    "tx_simpson_diversity",
    survey=("TX-vocab", "A2"),
    oracle=f"""
        WITH toks AS (
            SELECT lang, unnest({_TOKS}) AS tok FROM documents
        ),
        wc AS (
            SELECT lang, tok, CAST(count(*) AS HUGEINT) AS n
            FROM toks GROUP BY lang, tok
        )
        SELECT lang,
               CAST(count(*) AS BIGINT) AS vocab_size,
               CAST(sum(n) AS BIGINT) AS n_tokens,
               CAST(floor(CAST(sum(n * (n - 1)) AS DOUBLE) * 1000000e0
                          / (CAST(sum(n) AS DOUBLE)
                             * CAST(sum(n) - 1 AS DOUBLE)))
                    AS BIGINT) AS repeat_prob_ppm
        FROM wc GROUP BY lang
    """,
)
def tx_simpson_diversity(spark, sf_dir):
    """Simpson diversity of the token distribution per language
    (Simpson 1949, public): the probability that two tokens drawn
    without replacement are the SAME type — sum n_i(n_i-1) over
    N(N-1). High repeat probability = low lexical diversity =
    template/boilerplate-heavy text; the per-language split localizes
    which slice of a multilingual corpus needs heavier dedup (pairs
    with the entropy and burstiness screens).

    Exactness: both the numerator and denominator are exact integer
    sums — n_i(n_i-1) crosses int64 when a single token's count
    passes ~3e9 at 100 TB, so the Spark side carries decimal(38,0)
    matching DuckDB's hugeint; the reported ppm is ONE identical
    double chain (cast, x1e6, divide, floor) over those exact
    integers on both engines.

    100 TB: one corpus-scale shuffle for the (lang, token) counts
    (map-side combined), then a per-language rollup over the
    vocabulary — dimension-sized. No collect, no window."""
    from bdc_collection_builder_spark.extensions.text import tokens

    dec = "decimal(38,0)"
    toks = t(spark, sf_dir, "documents").select(
        "lang", F.explode(tokens(F.col("text"))).alias("tok"))
    wc = toks.groupBy("lang", "tok").agg(
        F.count("*").cast(dec).alias("n"))
    return wc.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("vocab_size"),
        F.sum("n").cast("bigint").alias("n_tokens"),
        F.floor(
            F.sum(F.col("n") * (F.col("n") - 1)).cast("double")
            * F.lit(1000000.0)
            / (F.sum("n").cast("double")
               * (F.sum("n") - 1).cast("double"))
        ).cast("bigint").alias("repeat_prob_ppm"))
