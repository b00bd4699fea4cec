"""Text-analysis functions for large-scale training-data pipelines.

All hot-path functions are pure Spark Column expressions (JVM-side,
whole-stage-codegen friendly) with deterministic semantics that the DuckDB
oracle can reproduce exactly — see ``plans/oracle.py`` ``text_stats_sql`` /
``lang_id_sql``.

* ``token_count``       — single-space tokenization count
* ``text_stats``        — n_chars / n_tokens / n_alpha / distinct-token and
                          mean-token-length based ``quality_score``
* ``lang_id``           — stopword-hit n-gram heuristic over a fixed
                          language → marker-word profile table
* ``doc_fingerprint``   — md5 of whitespace-normalized lowercased text
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: language → marker words (order = deterministic tie priority).  The
#: heuristic is intentionally oracle-reproducible: score(lang) = number of
#: marker words contained as whole tokens; argmax wins, ties go to the
#: earlier entry; all-zero → 'und'.
DEFAULT_LANG_PROFILES: list[tuple[str, list[str]]] = [
    ("en", ["the", "and", "of", "is"]),
    ("de", ["der", "die", "und", "nicht"]),
    ("fr", ["le", "la", "et", "les"]),
    ("es", ["el", "los", "que", "como"]),
    ("pl", ["nie", "jest", "to", "czy"]),
]


def token_count(col: Column | str) -> Column:
    """Number of single-space-separated tokens; 0 for empty/blank text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(
        F.size(F.split(c, " "))
    ).cast("long")


#: BPE-ish pre-tokenizer regex (GPT-2 style, simplified to the subset with
#: identical semantics in Java regex and RE2 — no lookahead, ASCII classes):
#: contraction suffixes, space-prefixed letter runs, digit runs, punctuation
#: runs.  Whitespace itself is not counted as a token.
BPE_TOKEN_RE = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+"


def bpe_token_count(col: Column | str) -> Column:
    """Approximate BPE token count: number of matches of the GPT-2-style
    pre-tokenizer regex.  A much closer LLM-token proxy than whitespace
    splitting (punctuation and contractions count separately)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_RE), F.lit(0))).cast("long")


def _padded(c: Column) -> Column:
    return F.concat(F.lit(" "), F.lower(c), F.lit(" "))


def lang_score(col: Column | str, words: list[str]) -> Column:
    """Whole-token marker-word hit count."""
    c = F.col(col) if isinstance(col, str) else col
    p = _padded(c)
    score = F.lit(0)
    for w in words:
        score = score + F.when(p.contains(f" {w} "), 1).otherwise(0)
    return score.cast("long")


def lang_id(
    col: Column | str, profiles: list[tuple[str, list[str]]] | None = None
) -> Column:
    """Language id via marker-word scores; deterministic argmax with
    first-entry tie priority, 'und' when nothing matches."""
    profiles = profiles or DEFAULT_LANG_PROFILES
    c = F.col(col) if isinstance(col, str) else col
    # flat argmax via struct ordering: max by (score, -index) = highest
    # score with earliest-profile tie priority.  The previous fold-style
    # when-chain nested each iteration's best/best_score inside the next
    # condition AND the next otherwise, doubling the expression tree per
    # profile — every marker-word contains() was re-evaluated ~2^#profiles
    # times per row (sf1: 5.7 s -> the flat form evaluates each score once).
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    lang_score(c, words).alias("s"),
                    F.lit(-i).alias("ni"),
                    F.lit(lang).alias("l"),
                )
                for i, (lang, words) in enumerate(profiles)
            ]
        )
    )
    # strict '> 0': all-zero scores -> 'und' (same rule as before)
    return F.when(best["s"] > 0, best["l"]).otherwise(F.lit("und"))


def doc_fingerprint(col: Column | str) -> Column:
    """md5 of lowercased, whitespace-collapsed, trimmed text — the exact-dedup
    key."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.lower(F.trim(F.regexp_replace(c, r"\s+", " "))))


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append n_chars, n_tokens, n_alpha, distinct_ratio, mean_token_len,
    quality_score.  All double math is a fixed expression tree so the DuckDB
    oracle reproduces values bit-for-bit; quality_score is rounded to 6 dp."""
    c = F.col(text_col)
    toks = token_count(c)
    n_chars = F.length(c).cast("long")
    n_alpha = F.length(F.regexp_replace(c, "[^A-Za-z]", "")).cast("long")
    n_distinct = F.size(F.array_distinct(F.split(c, " "))).cast("long")
    out = (
        df.withColumn("n_chars", n_chars)
        .withColumn("n_tokens", toks)
        .withColumn("n_alpha", n_alpha)
        .withColumn(
            "distinct_ratio",
            F.when(F.col("n_tokens") > 0, n_distinct / F.col("n_tokens")).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "mean_token_len",
            F.when(
                F.col("n_tokens") > 0,
                F.length(F.replace(c, F.lit(" "), F.lit(""))) / F.col("n_tokens"),
            ).otherwise(F.lit(0.0)),
        )
    )
    # NOT rounded: the raw double is bit-reproducible from the fixed
    # expression tree, while round() tie behavior differs across engines
    quality = (
        F.least(F.col("n_tokens") / F.lit(50.0), F.lit(1.0)) * 0.3
        + F.col("distinct_ratio") * 0.4
        + F.least(F.col("mean_token_len") / F.lit(8.0), F.lit(1.0)) * 0.3
    )
    return out.withColumn("quality_score", quality)


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

#: redaction patterns — the conservative regex subset with identical
#: semantics in Java regex and RE2 (character classes + bounded repetition
#: only; no lookaround, no backreferences), so the scrub is reproducible
#: across engines.  Order matters: emails before bare domains, IPs last.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+", "<EMAIL>"),
    (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    (r"(\+|\b)[0-9][0-9 ()-]{7,}[0-9]\b", "<PHONE>"),
]


def scrub_pii(col: Column | str) -> Column:
    """Redact emails, IPv4 addresses, and phone-number-shaped digit runs
    with typed placetokens — the standard pre-training PII scrub.  Pure
    JVM ``regexp_replace`` chain (no UDF); patterns are restricted to the
    Java/RE2-identical subset so the DuckDB oracle reproduces the output
    byte-for-byte."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, token in PII_PATTERNS:
        c = F.regexp_replace(c, pat, token)
    return c


# ---------------------------------------------------------------------------
# Intra-document repetition (Gopher-style n-gram repetition metrics)
# ---------------------------------------------------------------------------


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
) -> DataFrame:
    """Per-document word n-gram repetition metrics — the Gopher/Dolma
    repetition-removal signals (Rae et al. 2021, "Scaling Language Models",
    table A1): one row per input document with

    * ``n_ngrams``          — total word n-gram occurrences (0 when the doc
                              has fewer than ``n`` words);
    * ``top_ngram_count``   — occurrences of the most frequent n-gram;
    * ``top_ngram_frac``    — ``top_ngram_count / n_ngrams`` (NULL when
                              ``n_ngrams`` is 0);
    * ``dup_ngram_frac``    — fraction of n-gram occurrences whose gram
                              appears more than once (NULL when 0).

    Plan: tokenize + gram assembly are codegen higher-order functions
    (``split``/``transform``/``slice`` — no UDF), then one explode and two
    hash aggregations keyed by ``(doc, gram)`` / ``doc`` — both map-side
    combined and shuffle-parallel, no window, no driver collect.  At 100 TB
    the (doc, gram) aggregate is the only wide stage and its key space is
    bounded by the corpus token count.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    if text_col not in df.columns or id_col not in df.columns:
        raise ValueError(f"columns {text_col!r}/{id_col!r} not found in input")
    # spread a narrow scan to cluster parallelism before the gram kernel:
    # a small parquet table arrives as 1-5 file partitions, serializing
    # the per-row splitting on one or two cores (same fix as the dedup
    # signature stage; measured 12 s → 3 s on the sf1 duplicated corpus)
    src = df
    if not src.isStreaming:
        p = src.sparkSession.sparkContext.defaultParallelism
        if src.rdd.getNumPartitions() < p:
            src = src.repartition(p)
    # materialize the words array in its own projection: an inline
    # split(...) referenced inside the transform lambda is NOT hoisted by
    # Catalyst's subexpression elimination — the text would re-split once
    # per emitted gram (measured 5× wall on the sf0.1 corpus)
    words_df = src.select(
        F.col(id_col),
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("__w"),
    )
    w = F.col("__w")
    grams = F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - F.lit(n - 1)),
            lambda i: F.array_join(F.slice(w, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    per_gram = (
        words_df.select(F.col(id_col), F.explode_outer(grams).alias("__g"))
        .groupBy(id_col, "__g")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    has = F.col("__g").isNotNull()
    return per_gram.groupBy(id_col).agg(
        F.coalesce(F.sum(F.when(has, F.col("__c"))), F.lit(0))
        .cast("long")
        .alias("n_ngrams"),
        F.coalesce(F.max(F.when(has, F.col("__c"))), F.lit(0))
        .cast("long")
        .alias("top_ngram_count"),
        (
            F.max(F.when(has, F.col("__c")))
            / F.sum(F.when(has, F.col("__c")))
        ).alias("top_ngram_frac"),
        (
            # coalesce the numerator only: a doc with grams but no
            # duplicates reads 0.0, a doc with no grams stays NULL (the
            # denominator is NULL there)
            F.coalesce(F.sum(F.when(has & (F.col("__c") > 1), F.col("__c"))), F.lit(0))
            / F.sum(F.when(has, F.col("__c")))
        ).alias("dup_ngram_frac"),
    )


def repetition_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    max_top_frac: float = 0.20,
    max_dup_frac: float = 0.60,
) -> DataFrame:
    """Drop documents whose ``n``-gram repetition exceeds the Gopher-style
    thresholds (defaults: top 2-gram fraction > 0.20 or duplicated-2-gram
    fraction > 0.60 → removed).  Documents with fewer than ``n`` words have
    no repetition signal and are KEPT.  One broadcastless left-semi join on
    the doc id against the stats frame — shuffle-parallel end to end."""
    stats = repetition_stats(df, text_col=text_col, id_col=id_col, n=n)
    keep = stats.filter(
        F.col("top_ngram_frac").isNull()
        | (
            (F.col("top_ngram_frac") <= max_top_frac)
            & (F.col("dup_ngram_frac") <= max_dup_frac)
        )
    ).select(id_col)
    return df.join(keep, id_col, "left_semi")


# module-level so repeated normalize_text calls reuse one registered UDF
# instead of registering a fresh pandas UDF per call.  na_action='ignore'
# covers every pandas null sentinel (None AND float NaN in an object
# batch) — an `is not None` check alone would pass NaN into
# unicodedata.normalize and raise TypeError.  Lambda form: __future__
# annotations stringify type hints in this module, which pandas_udf
# signature inference cannot resolve.
def _nfc_batch(texts):
    import unicodedata

    return texts.map(
        lambda t: unicodedata.normalize("NFC", t), na_action="ignore"
    )


_NFC_UDF = None


def _nfc_udf():
    # lazy singleton: pandas_udf registration needs an active SparkSession,
    # so the UDF cannot be built at import time — but repeated
    # normalize_text calls still reuse ONE registered UDF
    global _NFC_UDF
    if _NFC_UDF is None:
        _NFC_UDF = F.pandas_udf(_nfc_batch, "string")
    return _NFC_UDF


def normalize_text(col: Column | str, collapse_whitespace: bool = False) -> Column:
    """C4/CCNet-style text normalization: Unicode NFC composition plus
    control-character removal (C0/C1 and DEL, keeping ``\\t``/``\\n``/
    ``\\r``), optionally collapsing whitespace runs to single spaces.

    NFC is an Arrow-batched ``unicodedata.normalize`` pass (no Spark
    built-in exposes ICU normalization); the control strip and whitespace
    collapse are JVM regexes applied AFTER composition so the DuckDB
    oracle (``nfc_normalize`` + the same regexes) reproduces values
    byte-for-byte.  NULL passes through as NULL.
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.regexp_replace(
        _nfc_udf()(c), r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F-\x9F]", ""
    )
    if collapse_whitespace:
        out = F.trim(F.regexp_replace(out, r"\s+", " "))
    return out
