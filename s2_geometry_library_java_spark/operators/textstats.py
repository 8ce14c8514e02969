"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting. Pure Column expressions (JVM, codegen-friendly);
integer outputs so DuckDB oracles match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Tiny English stopword list shared with the oracle (keep sorted & stable).
STOPWORDS = ["a", "and", "by", "for", "in", "of", "on", "or", "the", "to", "with"]

#: BPE-ish token regex: alpha runs, digit runs, or single non-space symbols.
TOKEN_REGEX = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _intdiv(a, b) -> Column:
    """Integer floor division (non-negative operands): Spark `div`."""
    a = F.lit(a) if isinstance(a, int) else a
    b = F.lit(b) if isinstance(b, int) else b
    return F.try_divide(a - a % b, b).cast("long")


def whitespace_token_count(text) -> Column:
    t = F.trim(_c(text))
    return F.when(t == "", 0).otherwise(F.size(F.split(t, "\\s+")))


def regex_token_count(text) -> Column:
    return F.size(F.regexp_extract_all(F.lower(_c(text)), F.lit(TOKEN_REGEX), 0))


def stopword_count(text) -> Column:
    words = F.split(F.trim(F.regexp_replace(F.lower(_c(text)), "[^a-z ]", " ")), " +")
    return F.size(F.filter(words, lambda w: w.isin(STOPWORDS)))


def punct_count(text) -> Column:
    return F.size(F.regexp_extract_all(_c(text), F.lit("[^a-zA-Z0-9\\s]"), 0))


def lang_guess(text) -> Column:
    """n-gram-free heuristic language ID: stopword density on alpha words."""
    words = F.split(F.trim(F.regexp_replace(F.lower(_c(text)), "[^a-z ]", " ")), " +")
    n = F.size(words)
    sw = stopword_count(text)
    return (
        F.when(n == 0, F.lit("und"))
        .when(F.lit(20) * sw >= n, F.lit("en"))
        .otherwise(F.lit("unk"))
    )


def quality_score(text) -> Column:
    """Integer 0-100 quality score from length/punct/stopword ratios.

    Integer arithmetic only so Spark and the SQL oracle agree exactly:
    score = clamp(len div 20, 0, 40) + clamp(40 - (100*punct) div len, 0, 40)
            + clamp((200*stop) div ntok, 0, 20)
    — integer floor-division throughout (Spark ``div`` == DuckDB ``//`` on
    non-negative longs), no float casts anywhere.
    """
    ln = F.length(_c(text)).cast("long")
    ntok = F.greatest(whitespace_token_count(text), F.lit(1)).cast("long")
    len_term = F.least(_intdiv(ln, 20), F.lit(40))
    punct_term = F.greatest(
        F.least(
            F.lit(40) - _intdiv(F.lit(100) * punct_count(text), F.greatest(ln, F.lit(1))),
            F.lit(40),
        ),
        F.lit(0),
    )
    stop_term = F.least(_intdiv(F.lit(200) * stopword_count(text), ntok), F.lit(20))
    return (len_term + punct_term + stop_term).alias("quality")


def fingerprint64(text, modulus: int = 2147483647, base: int = 31) -> Column:
    """Polynomial rolling hash over character codes (mod 2^31-1).

    acc = (acc*31 + code(c)) mod M, left-to-right — a deterministic
    document fingerprint computable by both Spark ``aggregate`` and the
    DuckDB ``list_reduce`` oracle.
    """
    t = _c(text)
    idx = F.sequence(F.lit(1), F.length(t))
    agg = F.aggregate(
        idx,
        F.lit(0).cast("long"),
        lambda acc, i: (acc * base + F.ascii(F.substring(t, i, 1))) % modulus,
    )
    # sequence(1, 0) would count DOWN in Spark; guard the empty string.
    return F.when(F.length(t) == 0, F.lit(0).cast("long")).otherwise(agg)


def doc_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """The full text-stats row: one pass, no shuffle at all."""
    return df.select(
        _c(id_col).alias("id"),
        whitespace_token_count(text_col).alias("ws_tokens"),
        regex_token_count(text_col).alias("re_tokens"),
        stopword_count(text_col).alias("stopwords"),
        punct_count(text_col).alias("puncts"),
        lang_guess(text_col).alias("lang_guess"),
        quality_score(text_col).alias("quality"),
        fingerprint64(text_col).alias("fingerprint"),
    )
