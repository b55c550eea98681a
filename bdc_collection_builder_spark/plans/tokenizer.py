"""Tokenizer-training statistics — the distributed scans behind BPE /
SentencePiece vocabulary construction.

BPE training never iterates over the corpus: it iterates over the
WORD-FREQUENCY DICTIONARY (orders of magnitude smaller), which is the
one corpus-sized scan these operators perform. Both queries therefore
share the same shape:

    corpus scan → whitespace-token explode → word dict (one shuffle,
    map-side combined) → per-word enumeration (pairs / substrings,
    weighted by word count) → count aggregate → TakeOrdered top-k

At 100 TB the word dict for natural-language text is ~10⁷ rows — the
enumeration stage runs over that, not the corpus, so the expensive
part stays a single map-side-combined count shuffle. Tokenization is
the shared ``tokens()`` contract (extensions/text.py) so results line
up with the vocabulary/TF-IDF queries.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bdc_collection_builder_spark.extensions.text import tokens
from bdc_collection_builder_spark.plans._util import t
from bdc_collection_builder_spark.plans.registry import query

# whitespace word dict, shared with the vocabulary queries (_TOKS in
# plans/extensions.py pins the identical DuckDB-side tokenization)
_WORD_DICT = r"""
    words AS (
        SELECT tok AS w, CAST(count(*) AS BIGINT) AS cnt FROM (
            SELECT unnest(list_filter(
                regexp_split_to_array(lower(text), '\s+'), x -> x <> ''
            )) AS tok FROM documents
        ) GROUP BY tok
    )
"""


@query(
    "tk_bpe_pair_counts",
    survey=("TK-bpe",),
    oracle="WITH " + _WORD_DICT + """,
    pairs AS (
        SELECT substr(w, CAST(i AS INTEGER), 2) AS pair, cnt
        FROM (
            SELECT w, cnt, unnest(generate_series(1, length(w) - 1)) AS i
            FROM words WHERE length(w) >= 2
        )
    )
    SELECT pair, CAST(sum(cnt) AS BIGINT) AS pair_count
    FROM pairs GROUP BY pair
    ORDER BY pair_count DESC, pair LIMIT 50
""",
)
def tk_bpe_pair_counts(spark, sf_dir):
    """The first BPE training step: adjacent-symbol pair frequencies
    over the word dict, weighted by word count — the statistic whose
    argmax becomes merge #1. Enumeration is per *distinct word*
    (sequence explode over positions), so cost is O(dict chars), not
    O(corpus chars). Top-k is TakeOrdered, never a global sort."""
    docs = t(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("w").agg(F.count("*").alias("cnt"))
        .filter(F.length("w") >= 2)
    )
    pairs = (
        words.select(
            "w", "cnt",
            F.explode(F.sequence(F.lit(1), F.length("w") - 1)).alias("i"))
        .select(F.col("w").substr(F.col("i"), F.lit(2)).alias("pair"), "cnt")
    )
    return (
        pairs.groupBy("pair").agg(F.sum("cnt").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), "pair").limit(50)
    )


@query(
    "tk_seed_vocab_substrings",
    survey=("TK-seed-vocab",),
    oracle="WITH " + _WORD_DICT + """,
    pieces AS (
        SELECT substr(w, CAST(i AS INTEGER), CAST(j AS INTEGER)) AS piece,
               cnt
        FROM (
            SELECT w, cnt, i,
                   unnest(generate_series(
                       1, least(4, length(w) - i + 1))) AS j
            FROM (
                SELECT w, cnt,
                       unnest(generate_series(1, length(w))) AS i
                FROM words
            )
        )
    )
    SELECT piece, CAST(sum(cnt) AS BIGINT) AS piece_count
    FROM pieces GROUP BY piece
    ORDER BY piece_count DESC, piece LIMIT 200
""",
)
def tk_seed_vocab_substrings(spark, sf_dir):
    """SentencePiece-style seed vocabulary: every substring up to
    length 4 of every dictionary word, count-weighted — the candidate
    set the unigram-LM trainer prunes by EM. Double sequence-explode
    over the word dict (positions × lengths) keeps enumeration
    O(dict chars × max_len), corpus untouched after the dict scan."""
    docs = t(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("w").agg(F.count("*").alias("cnt"))
    )
    pieces = (
        words.select(
            "w", "cnt",
            F.explode(F.sequence(F.lit(1), F.length("w"))).alias("i"))
        .select(
            "w", "cnt", "i",
            F.explode(F.sequence(
                F.lit(1),
                F.least(F.lit(4), F.length("w") - F.col("i") + 1))).alias("j"))
        .select(F.col("w").substr(F.col("i"), F.col("j")).alias("piece"),
                "cnt")
    )
    return (
        pieces.groupBy("piece").agg(F.sum("cnt").alias("piece_count"))
        .orderBy(F.col("piece_count").desc(), "piece").limit(200)
    )
