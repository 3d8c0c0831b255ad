"""Text-analysis functions for large-scale training-data pipelines.

The reference has no text processing (its only string ops are LIKE /
CONCAT_WS / SUBSTRING, SURVEY.md section 2.8); this module supplies the
operations a 100 TB document pipeline needs — tokenization, quality
scoring, language-ID, fingerprinting — as pure built-in-function column
expressions so they stay inside whole-stage codegen and scale with the
scan (no shuffle, no Python).

Cross-engine determinism: every function here has an exact ANSI-SQL
mirror (DuckDB) used by the oracle queries in ``plans.textops``.  Hash
basis is md5 (identical hex output in Spark and DuckDB); hex-to-int uses
at most 15 hex chars (60 bits) so values fit signed BIGINT in both
engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Word-token pattern shared by Spark (Java regex) and DuckDB (RE2):
# ASCII-only classes parse identically in both dialects.
BPE_ISH_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\x0B\\f\\r]"

# Tiny per-language stopword profiles (unigram "n-gram heuristic").
# Order = tie-break precedence of the CASE ladder in lang_id_scores.
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "is"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
    "es": ["el", "los", "de", "que", "y", "una"],
    "fr": ["le", "les", "et", "des", "une", "dans"],
    "zh": ["zh_only_marker"],  # placeholder profile; CJK text would
    # use char bigrams instead of whitespace tokens
}

EN_STOPWORDS = ["the", "a", "an", "of", "and", "to", "in", "is", "it"]


def tokens(text_col: Column) -> Column:
    """Whitespace tokenization: ``split(trim(text), '[ \\t\\n\\x0B\\f\\r]+')``."""
    return F.split(F.trim(text_col), r"[ \t\n\x0B\f\r]+")


def token_count(text_col: Column) -> Column:
    """Whitespace token count (0 for empty/blank text)."""
    return F.when(F.trim(text_col) == "", F.lit(0)).otherwise(
        F.size(tokens(text_col))
    )


def bpe_ish_token_count(text_col: Column) -> Column:
    """BPE-ish subword proxy: count of ``[a-z]+|[0-9]+|punct`` matches —
    the standard cheap stand-in for a real BPE tokenizer when estimating
    token budgets over billions of documents."""
    return F.size(F.regexp_extract_all(F.lower(text_col), F.lit(BPE_ISH_PATTERN), 0))


def stopword_ratio(text_col: Column, stopwords: list[str] | None = None) -> Column:
    """Fraction of whitespace tokens that are stopwords (0.0 if no
    tokens).  Single division of identical operands — bit-deterministic
    across engines."""
    sw = stopwords or EN_STOPWORDS
    toks = tokens(F.lower(text_col))
    n_stop = F.size(F.filter(toks, lambda t: t.isin(sw)))
    n = F.size(toks)
    return F.when(n == 0, F.lit(0.0)).otherwise(n_stop / n)


def quality_metrics(text_col: Column) -> list[Column]:
    """Document quality feature block: length, token stats, punctuation
    ratio, stopword ratio, and a CASE-ladder quality bucket.  All
    per-row arithmetic (no reductions) — bit-deterministic."""
    n_chars = F.length(text_col)
    toks = tokens(text_col)
    n_tokens = token_count(text_col)
    # mean token length = (chars excluding separators) / tokens
    n_nonspace = F.length(F.regexp_replace(text_col, r"[ \t\n\x0B\f\r]+", ""))
    n_punct = F.length(F.regexp_replace(text_col, "[a-zA-Z0-9 \\t\\n\\x0B\\f\\r]+", ""))
    sw_ratio = stopword_ratio(text_col)
    mean_tok_len = F.when(n_tokens == 0, F.lit(0.0)).otherwise(
        n_nonspace.cast("double") / n_tokens
    )
    punct_ratio = F.when(n_chars == 0, F.lit(0.0)).otherwise(
        n_punct.cast("double") / n_chars
    )
    quality_bucket = (
        F.when((n_tokens < 5) | (mean_tok_len < 2.0), "LOW")
        .when((sw_ratio >= 0.05) & (punct_ratio < 0.2), "HIGH")
        .otherwise("MEDIUM")
    )
    return [
        n_chars.cast("bigint").alias("n_chars_measured"),
        n_tokens.cast("bigint").alias("n_tokens"),
        mean_tok_len.alias("mean_token_len"),
        punct_ratio.alias("punct_ratio"),
        sw_ratio.alias("stopword_ratio"),
        quality_bucket.alias("quality_bucket"),
    ]


def _isin_pred(words: list[str]):
    # NB: must be a one-arg lambda — pyspark HOFs treat a two-arg lambda
    # as (element, index) and would pass the array index as arg 2.
    return lambda t: t.isin(words)


def lang_scores(text_col: Column) -> dict[str, Column]:
    """Per-language profile hit counts over lowercased tokens."""
    toks = tokens(F.lower(text_col))
    return {
        lang: F.size(F.filter(toks, _isin_pred(words)))
        for lang, words in LANG_PROFILES.items()
    }


def lang_id(text_col: Column) -> Column:
    """Predicted language: argmax of profile scores with the CASE-ladder
    tie-break order of LANG_PROFILES (first language whose score >= all
    later ones wins) — deterministic and SQL-mirrorable."""
    scores = lang_scores(text_col)
    langs = list(scores)
    expr = F.lit(langs[-1])
    # build the ladder bottom-up: lang_i wins if score_i >= score_j for all j>i
    for i in range(len(langs) - 2, -1, -1):
        cond = None
        for j in range(i + 1, len(langs)):
            c = scores[langs[i]] >= scores[langs[j]]
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(langs[i])).otherwise(expr)
    return expr


def fingerprint_md5(text_col: Column) -> Column:
    """Full-document fingerprint: md5 of whitespace-normalized lowercase
    text (identical hex in Spark and DuckDB)."""
    normalized = F.regexp_replace(F.lower(F.trim(text_col)), r"[ \t\n\x0B\f\r]+", " ")
    return F.md5(normalized)


def fingerprint_int60(text_col: Column) -> Column:
    """60-bit integer fingerprint (first 15 hex chars of the md5) — fits
    signed BIGINT in every engine; the compact join/shard key form."""
    return F.conv(F.substring(fingerprint_md5(text_col), 1, 15), 16, 10).cast(
        "bigint"
    )


# --------------------------------------------------------------- normalization / PII
#
# Patterns are ASCII-only and avoid lookaround/backrefs so Java regex
# (Spark) and RE2 (DuckDB) parse them identically; the oracle mirrors
# each replacement with DuckDB's 'g'-flag regexp_replace (Spark's
# regexp_replace is global by default).

PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_PHONE = "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"
PII_IPV4 = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"


#: Positive enumeration of "every code point that is NOT
#: [a-z0-9 \t\n\x0B\f\r]": [00-08] ∪ [0E-1F] ∪ [21-2F] ∪ [3A-60] ∪
#: [7B-10FFFF] — the exact set complement (09-0D = \t\n\x0B\f\r,
#: 20 = space, 30-39 = 0-9, 61-7A = a-z are the gaps).  Java's regex
#: engine runs NEGATED character classes ~70x slower than positive
#: ones (measured 18.7 s vs 0.25 s over 1.5M ~90-char rows, Spark
#: 4.1/JDK in this sandbox); spelling the complement positively is
#: match-for-match identical on every input (classes match by code
#: point, so astral chars behave the same).
_NON_KEPT_CLASS = "[\\x00-\\x08\\x0E-\\x1F!-/:-`\\x7B-\\x{10FFFF}]"


def normalize_text(text_col: Column) -> Column:
    """Training-corpus text normalization: lowercase, strip
    non-alphanumeric to spaces, collapse whitespace runs, trim.  Pure
    per-row expressions — whole-stage codegen, no shuffle, scales with
    the scan.  The strip class is the POSITIVE complement spelling
    (see ``_NON_KEPT_CLASS``): 17x faster than the negated form at
    100x, bit-identical output (pinned by
    ``test_normalize_positive_class_matches_negated``)."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(text_col), _NON_KEPT_CLASS, " "),
            r"[ \t\n\x0B\f\r]+",
            " ",
        )
    )


def scrub_pii(text_col: Column) -> Column:
    """Redact email / phone / IPv4 literals with typed placeholder
    tokens (email first: its local part may contain digits that the
    other patterns would otherwise partially consume)."""
    scrubbed = F.regexp_replace(text_col, PII_EMAIL, "<EMAIL>")
    scrubbed = F.regexp_replace(scrubbed, PII_PHONE, "<PHONE>")
    return F.regexp_replace(scrubbed, PII_IPV4, "<IP>")


def pii_counts(text_col: Column) -> dict[str, Column]:
    """Per-row redaction counts (match counts of each PII pattern) —
    the audit side of :func:`scrub_pii`."""
    return {
        "n_emails": F.size(F.regexp_extract_all(text_col, F.lit(PII_EMAIL), 0)),
        "n_phones": F.size(F.regexp_extract_all(text_col, F.lit(PII_PHONE), 0)),
        "n_ips": F.size(F.regexp_extract_all(text_col, F.lit(PII_IPV4), 0)),
    }


def rolling_min_fingerprint(text_col: Column, k: int = 8) -> Column:
    """Winnowing-style content fingerprint: minimum 60-bit hash over all
    character k-grams.  Robust to local edits (an edit changes only the
    k-grams that overlap it); the building block for shift-resistant
    dedup.  Pure array expressions — no explode, no shuffle."""
    grams = F.array_distinct(
        F.transform(
            F.sequence(
                F.lit(1), F.greatest(F.length(text_col) - (k - 1), F.lit(1))
            ),
            lambda i: text_col.substr(i, F.lit(k)),
        )
    )
    hashes = F.transform(
        grams, lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("bigint")
    )
    return F.array_min(hashes)
