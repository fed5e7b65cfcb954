"""Text analysis over the `documents` table: token counting, quality
scoring, fingerprinting (all pure Catalyst expressions — whole-stage
codegen, no Python), and an n-gram language-ID heuristic as an
Arrow-batched pandas UDF (the one genuinely non-SQL op here).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def token_count_col(text_col):
    """Whitespace token count, JVM-side. '' counts as 0 tokens."""
    trimmed = F.trim(F.regexp_replace(text_col, r"\s+", " "))
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, " "))
    )


def with_token_count(df: DataFrame, text: str = "text") -> DataFrame:
    return df.withColumn("n_tokens", token_count_col(F.col(text)).cast("long"))


def with_quality_score(df: DataFrame, text: str = "text") -> DataFrame:
    """Length/punctuation/stopword-free quality heuristics, all codegen'd:
    - n_chars, n_tokens
    - avg_token_len = (chars - spaces) / tokens
    - alpha_ratio   = alphabetic chars / chars
    - score         = deterministic blend, rounded for cross-engine equality
    """
    t = F.col(text)
    n_chars = F.length(t)
    n_tokens = token_count_col(t)
    n_alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    avg_tok = F.when(n_tokens > 0, (n_chars - (n_tokens - 1)) / n_tokens).otherwise(
        F.lit(0.0)
    )
    alpha_ratio = F.when(n_chars > 0, n_alpha / n_chars).otherwise(F.lit(0.0))
    raw = (
        F.least(F.lit(1.0), n_tokens / F.lit(100.0)) * F.lit(0.5)
        + alpha_ratio * F.lit(0.3)
        + F.least(F.lit(1.0), avg_tok / F.lit(8.0)) * F.lit(0.2)
    )
    # floor(x*1e4 + 0.5)/1e4 instead of round(x, 4): engines disagree on
    # round() exactly at representation boundaries (measured: both compute
    # 0.47104999999999997, Spark's BigDecimal-exact round gives 0.471,
    # DuckDB's shortest-decimal-repr round gives 0.4711). floor over the
    # same IEEE double is bit-deterministic on every engine.
    score = F.floor(raw * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)
    return (
        df.withColumn("n_tokens", n_tokens.cast("long"))
        .withColumn("avg_token_len", F.round(avg_tok, 4))
        .withColumn("alpha_ratio", F.round(alpha_ratio, 4))
        .withColumn("quality_score", score)
    )


def with_fingerprint(df: DataFrame, text: str = "text") -> DataFrame:
    """Document fingerprint: md5 over the whitespace-normalized, lowercased
    text — deterministic, content-addressed, portable across engines
    (replaces the reference's UUID tmp-file identities, SURVEY §4.2.4)."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text), r"\s+", " ")))
    return df.withColumn("fingerprint", F.md5(norm.cast("binary")))


# --- language-ID heuristic (Arrow-batched pandas UDF) -----------------------

# Tiny per-language stopword profiles: enough signal for the heuristic and
# fully deterministic. Real models would be broadcast the same way.
_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "pour", "dans"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "por", "que"},
    "zh": set(),  # CJK handled by the codepoint-range rule below
}


def _lang_id_series(texts: pd.Series) -> pd.Series:
    def ident(t):
        if not t:
            return "und"
        # CJK codepoint density first
        cjk = sum(1 for ch in t[:400] if "一" <= ch <= "鿿")
        if cjk > len(t[:400]) * 0.2:
            return "zh"
        tokens = t.lower().split()
        if not tokens:
            return "und"
        best, best_hits = "und", 0
        for lang in ("en", "de", "fr", "es"):  # fixed order = deterministic ties
            hits = sum(1 for tok in tokens if tok in _PROFILES[lang])
            if hits > best_hits:
                best, best_hits = lang, hits
        return best

    return texts.map(ident)


def with_lang_id(df: DataFrame, text: str = "text") -> DataFrame:
    """Heuristic language-ID as a vectorized pandas UDF (Arrow transport;
    one Python call per batch, not per row). The UDF object is built
    lazily: pandas_udf type resolution needs an active SparkSession."""
    lang_id_udf = pandas_udf(_lang_id_series, "string")
    return df.withColumn("lang_pred", lang_id_udf(F.col(text)))


def repetition_stats(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Within-document repetition heuristics (the Gopher/C4 filter family):

    - dup_bigram_frac: fraction of word bigrams that are repeats of an
      earlier bigram in the same document — pure array expressions per row
      (whole-stage codegen, no shuffle);
    - top_token_frac: frequency share of the document's most common token —
      explode → (doc, token) hash agg → per-doc max/sum, two uniform-key
      map-side-combining shuffles (the mode of an array has no
      single-pass Catalyst expression).

    Fractions use the floor-scale rounding (see with_quality_score) so
    values hash-compare across engines."""
    from open_ocr_spark.dataops.dedup import tokens_col

    base = docs.withColumn("_toks", tokens_col(F.col("text"))).withColumn(
        "_n", token_count_col(F.col("text"))
    )
    n = F.col("_n")
    bigrams = F.when(n < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.array_join(F.slice(F.col("_toks"), i + 1, 2), " "),
        )
    )
    base = base.withColumn("_bi", bigrams)
    dup_frac = F.when(
        F.size("_bi") > 0,
        F.lit(1.0) - F.size(F.array_distinct("_bi")) / F.size("_bi"),
    ).otherwise(F.lit(0.0))

    def scale4(c):
        return F.floor(c * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)

    arrays_part = base.select(
        id_col,
        F.col("_n").cast("long").alias("n_tokens"),
        scale4(dup_frac).alias("dup_bigram_frac"),
    )
    top = (
        base.filter(n > 0)
        .select(id_col, F.explode("_toks").alias("_tok"))
        .groupBy(id_col, "_tok")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy(id_col)
        .agg((F.max("_c") / F.sum("_c")).alias("_f"))
    )
    return arrays_part.join(top, id_col, "left").select(
        id_col,
        "n_tokens",
        "dup_bigram_frac",
        scale4(F.coalesce(F.col("_f"), F.lit(0.0))).alias("top_token_frac"),
    )


# PII patterns written to mean the same thing in Java regex (Spark) and
# RE2 (DuckDB): explicit classes, no lookaround, no \d shorthand.
PII_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
PII_PHONE_RE = "[+][0-9]{1,2}-[0-9]{3}-[0-9]{3,4}-?[0-9]{0,4}"


def scrub_pii(df: DataFrame, text: str = "text", out: str = "scrubbed") -> DataFrame:
    """C4-style PII scrub: emails and international-format phone numbers
    replaced with typed placeholders. Pure regexp_replace (JVM, codegen);
    patterns are dialect-portable so the DuckDB oracle applies the exact
    same expressions."""
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col(text), PII_EMAIL_RE, "<EMAIL>"),
        PII_PHONE_RE,
        "<PHONE>",
    )
    return df.withColumn(out, scrubbed)


# BPE-ish pre-tokenizer pattern (GPT-2 split rule simplified to the
# lookahead-free subset both Java regex and RE2 execute identically):
# space-prefixed letter runs, digit runs, punctuation runs, whitespace runs.
BPE_SPLIT_RE = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n\r]+|[ \t\n\r]+"


def with_bpe_token_count(df: DataFrame, text: str = "text") -> DataFrame:
    """Approximate LLM token count: number of BPE-ish pre-tokenizer
    segments (regexp_count, JVM codegen — the standard budget estimator a
    training pipeline runs over every document). Cross-engine portable:
    the pattern avoids lookahead so DuckDB's RE2 counts identically."""
    return df.withColumn(
        "n_bpe_tokens",
        F.regexp_count(F.col(text), F.lit(BPE_SPLIT_RE)).cast("long"),
    )
