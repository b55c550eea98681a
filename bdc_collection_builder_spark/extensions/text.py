"""Text-analysis operators over a document table.

Everything is built-in `pyspark.sql.functions` — JVM-side, codegen'd;
no Python UDFs anywhere, so these run at full scan speed over 100 TB of
text. Each returns a Column usable in select/filter.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A small, fixed English stopword list (public knowledge) — used by both
# the language heuristic and the quality score.
STOPWORDS = (
    "the", "a", "an", "of", "to", "in", "and", "or", "is", "are", "was",
    "for", "on", "with", "as", "at", "by", "it", "this", "that",
)

TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
FINGERPRINT_MOD = 1_000_000_007


def tokens(text: Column) -> Column:
    """Whitespace tokenization; empty strings dropped."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda x: x != "")


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-approximating token count: words, numbers, and punctuation
    each count; long words count ~1 per 6 chars (a public rule-of-thumb
    approximation of byte-pair-encoded lengths)."""
    pieces = F.regexp_extract_all(F.lower(text), F.lit(TOKEN_PATTERN), 0)
    return F.aggregate(
        pieces,
        F.lit(0).cast("bigint"),
        lambda acc, p: acc + F.greatest(F.lit(1), F.ceil(F.length(p) / 6)).cast("bigint"),
    )


def stopword_ratio(text: Column) -> Column:
    """Fraction of whitespace tokens that are English stopwords."""
    toks = tokens(text)
    stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    return F.when(F.size(toks) > 0, stop / F.size(toks)).otherwise(F.lit(0.0))


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are punctuation/symbols."""
    n_punct = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    return F.when(F.length(text) > 0, n_punct / F.length(text)).otherwise(F.lit(0.0))


def mean_word_length(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0).cast("bigint"),
                        lambda acc, x: acc + F.length(x).cast("bigint"))
    return F.when(F.size(toks) > 0, total / F.size(toks)).otherwise(F.lit(0.0))


def language_id(text: Column) -> Column:
    """Heuristic language id: stopword-ratio threshold → 'en', else
    'unknown'. (A real n-gram model slots in here; the operator shape —
    a pure scalar column — is what matters for the pipeline.)"""
    return F.when(stopword_ratio(text) >= 0.08, F.lit("en")).otherwise(F.lit("unknown"))


def quality_score(text: Column) -> Column:
    """Composite quality score in [0,1]: rewards stopword presence and
    moderate word length, penalizes punctuation soup (the standard
    web-scrape quality heuristics, e.g. Gopher rules)."""
    len_ok = F.when(
        (F.length(text) >= 20) & (F.length(text) <= 20000), F.lit(0.4)
    ).otherwise(F.lit(0.0))
    stop_ok = F.when(stopword_ratio(text) >= 0.05, F.lit(0.3)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio(text) <= 0.2, F.lit(0.2)).otherwise(F.lit(0.0))
    word_ok = F.when(
        (mean_word_length(text) >= 2) & (mean_word_length(text) <= 12), F.lit(0.1)
    ).otherwise(F.lit(0.0))
    return len_ok + stop_ok + punct_ok + word_ok


def logreg_quality(text: Column) -> Column:
    """Model-based quality score: a linear model over the rule features
    (stopword ratio, punctuation ratio, mean word length, length) put
    through a RATIONAL sigmoid ``0.5 + 0.5*z/(1+|z|)`` — the fast
    sigmoid, chosen over exp() so the score is bit-reproducible across
    engines (only +,-,*,/,abs; exp's last-ulp varies by libm). The
    weights are fixed stand-ins for a trained classifier
    (fasttext-style corpus quality models apply exactly this shape: a
    broadcastable weight vector dotted with cheap per-doc features);
    retraining swaps constants, not the plan."""
    z = logreg_logit(text)
    return F.lit(0.5) + F.lit(0.5) * z / (F.lit(1.0) + F.abs(z))


def logreg_logit(text: Column) -> Column:
    """The raw linear score behind :func:`logreg_quality` (sign decides
    keep/drop without touching the sigmoid's rounding boundary)."""
    stop_r = stopword_ratio(text)
    punct_r = punct_ratio(text)
    mwl = mean_word_length(text)
    len_norm = F.least(F.length(text).cast("double"), F.lit(4000.0)) / 4000.0
    return (F.lit(-1.2) + F.lit(2.4) * stop_r - F.lit(3.0) * punct_r
            + F.lit(0.2) * (mwl - F.lit(4.0)) + F.lit(1.5) * len_norm)


def fingerprint(text: Column) -> Column:
    """Rolling polynomial document fingerprint over tokens:
    fold(acc*31 + (len(tok)*17 + ascii(tok[0]))) mod 1e9+7.
    Engine-neutral arithmetic (verifiable by any SQL engine)."""
    codes = F.transform(
        tokens(text),
        lambda tok: (F.length(tok) * 17 + F.ascii(tok)).cast("bigint"),
    )
    return F.aggregate(
        codes,
        F.lit(0).cast("bigint"),
        lambda acc, c: (acc * 31 + c) % FINGERPRINT_MOD,
    )


# PII patterns shared with the DuckDB oracle: both Java regex and RE2
# support this subset (character classes, \., \S, {m,}) identically.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^\s]+"


def pii_scrub(text: Column) -> Column:
    """Redact emails then URLs (email first: a URL never contains a
    bare email, but scrubbing URLs first could split an email's domain).
    Pure JVM-side regexp_replace — no Python in the hot path."""
    return F.regexp_replace(
        F.regexp_replace(text, EMAIL_RE, "<EMAIL>"), URL_RE, "<URL>")


def pii_counts(text: Column) -> tuple[Column, Column]:
    """(n_emails, n_urls) found in the raw text."""
    return (F.regexp_count(text, F.lit(EMAIL_RE)),
            F.regexp_count(text, F.lit(URL_RE)))


def chunk_documents(docs, chunk_tokens: int = 64, overlap: int = 16,
                    text_col: str = "text", id_col: str = "doc_id"):
    """Split long documents into fixed-size token windows with overlap —
    the training-prep step before sequence packing (each chunk becomes a
    trainable unit; the overlap preserves context across boundaries).

    Chunk i covers tokens [i·stride, i·stride + chunk_tokens) with
    stride = chunk_tokens − overlap; a document emits
    ceil(max(n − overlap, 1) / stride) chunks, always ≥ 1. Pure
    per-row array arithmetic (tokenize once, slice per chunk) — a
    narrow projection with NO shuffle at any corpus size; chunk ids are
    deterministic so reruns are stable (same property as hash_split).
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    # tokenize once into its own projection (lambda/slice consumers
    # would otherwise re-split per chunk), then size everything off the
    # materialized array
    n = F.size(F.col("__toks"))
    n_chunks = F.greatest(
        F.ceil((F.greatest(n - overlap, F.lit(1))) / F.lit(stride))
        .cast("int"),
        F.lit(1))
    return (
        docs.select(F.col(id_col).alias("doc_id"),
                    tokens(F.col(text_col)).alias("__toks"))
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
            F.col("__toks"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.concat_ws(
                " ",
                F.slice(F.col("__toks"),
                        F.col("chunk_id") * stride + 1, chunk_tokens))
            .alias("chunk_text"),
            F.least(
                F.size(F.col("__toks")) - F.col("chunk_id") * stride,
                F.lit(chunk_tokens)).alias("n_tokens"),
        )
    )


def perplexity_buckets_by_cutpoints(scored, lang_col: str = "lang",
                                    score_col: str = "lp"):
    """The 100 TB scale path of tx_ccnet_buckets' ntile tercile split:
    instead of a per-language full sort (ntile's window), compute the
    1/3 and 2/3 score cut-points per language with
    ``approx_percentile`` (t-digest, one partial-agg pass) and assign
    buckets by comparing against the broadcast cut-point dimension.
    Cost: one scan + one tiny shuffle, independent of per-language
    skew — where ntile on a 100 TB single-language corpus is one
    machine sorting 100 TB.

    Tie behavior intentionally matches a descending ntile: scores
    STRICTLY ABOVE the upper cut-point are 'head', strictly above the
    lower cut-point 'middle', else 'tail' — so boundary-valued docs
    fall into the lower bucket on both paths.
    """
    cuts = scored.groupBy(lang_col).agg(
        F.percentile_approx(score_col, [1.0 / 3.0, 2.0 / 3.0], 10000)
        .alias("__cuts"))
    hi = F.col("__cuts")[1]
    lo = F.col("__cuts")[0]
    return (
        scored.join(F.broadcast(cuts), lang_col)
        .select(
            *scored.columns,
            F.when(F.col(score_col) > hi, "head")
             .when(F.col(score_col) > lo, "middle")
             .otherwise("tail").alias("bucket"),
        )
    )


def flesch_reading_ease(text: Column) -> Column:
    """Flesch reading-ease score, all JVM-side regexp built-ins.

    Components (canonical heuristic approximations, deterministic and
    engine-portable): words = whitespace tokens; sentences =
    `[.!?]+` runs (min 1); syllables = vowel-group (`[aeiouy]+`) runs
    plus one for every vowel-less token (the "every word has at least
    one syllable" clamp). The score is a fixed arithmetic tree over
    three integers, so any engine evaluating the same tree produces
    bit-identical doubles — no order-dependent accumulation."""
    toks = tokens(text)
    w = F.greatest(F.lit(1), F.size(toks)).cast("bigint")
    s = F.greatest(F.lit(1),
                   F.regexp_count(text, F.lit(r"[.!?]+"))).cast("bigint")
    v = F.regexp_count(F.lower(text), F.lit("[aeiouy]+")).cast("bigint")
    z = F.size(F.filter(toks, lambda x: ~x.rlike("[aeiouy]"))).cast("bigint")
    return (F.lit(206.835)
            - F.lit(1.015) * (w.cast("double") / s)
            - F.lit(84.6) * ((v + z).cast("double") / w))
