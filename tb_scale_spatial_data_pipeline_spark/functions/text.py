"""Text-analysis scalar functions (north-star extension, SURVEY §7.5).

All are pure Catalyst column expressions (JVM-side, codegen) — no
Python UDFs in the hot path, so they scale linearly over a 100 TB
documents table. Each has an exact ANSI-SQL equivalent for the DuckDB
oracle (see __spark_entry__.oracle_sql).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny embedded stopword list — deterministic, engine-owned (public
# common-English function words), used for the stopword-ratio quality
# signal.
STOPWORDS = (
    "the of and a to in is it that was for on are as with his they at be this "
    "have from or had by not but what all were we when your can said there use "
    "an each which she do how their if will up other about out many then them"
).split()


def word_tokens(text: Column) -> Column:
    """Whitespace tokenization → array<string> (empty strings dropped)."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(word_tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """A BPE-ish proxy count: word-piece chunks of up to 4 chars.

    ceil(len(word)/4) summed over whitespace words — a deterministic,
    SQL-expressible stand-in for subword token counting.
    """
    return F.aggregate(
        word_tokens(text),
        F.lit(0),
        lambda acc, w: acc + F.ceil(F.length(w) / F.lit(4.0)).cast("int"),
    )


def lang_id_heuristic(text: Column) -> Column:
    """n-gram/character heuristic language ID over a small closed set.

    Deterministic rules (checked in order):
      - any CJK codepoint           → 'ja'
      - any Cyrillic codepoint      → 'ru'
      - ASCII with common German function words / umlauts → 'de'
      - ASCII with common French function words / accents → 'fr'
      - common Spanish function words / n-tilde           → 'es'
      - otherwise                   → 'en'
    """
    lower = F.lower(text)
    padded = F.concat(F.lit(" "), lower, F.lit(" "))

    def any_word(words: list[str]) -> Column:
        cond = F.lit(False)
        for w in words:
            cond = cond | padded.contains(f" {w} ")
        return cond

    return (
        F.when(lower.rlike(r"[぀-ヿ一-鿿]"), F.lit("ja"))
        .when(lower.rlike(r"[Ѐ-ӿ]"), F.lit("ru"))
        .when(lower.rlike("[äöüß]") | any_word(["der", "die", "das", "und", "nicht", "ist"]), F.lit("de"))
        .when(lower.rlike("[éèêàçù]") | any_word(["le", "la", "les", "est", "une", "dans"]), F.lit("fr"))
        .when(lower.rlike("[ñ¿¡]") | any_word(["el", "los", "las", "es", "una", "que"]), F.lit("es"))
        .otherwise(F.lit("en"))
    )


def quality_score(text: Column) -> Column:
    """Document quality in [0, 1] from cheap surface statistics.

    Components (each in [0,1], equally weighted):
      - length score:    min(n_chars / 1000, 1)
      - word-len score:  1 if mean word length in [3, 12] else 0
      - alpha ratio:     letters / chars
      - stopword signal: 1 if any common stopword present else 0
    """
    n_chars = F.length(text)
    n_tokens = token_count(text)
    mean_wlen = F.when(n_tokens > 0, n_chars.cast("double") / n_tokens).otherwise(F.lit(0.0))
    alpha_ratio = F.when(
        n_chars > 0,
        F.length(F.regexp_replace(text, "[^A-Za-z]", "")).cast("double") / n_chars,
    ).otherwise(F.lit(0.0))
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    has_stop = F.lit(False)
    for w in STOPWORDS[:20]:
        has_stop = has_stop | padded.contains(f" {w} ")

    length_score = F.least(n_chars.cast("double") / 1000.0, F.lit(1.0))
    wlen_score = F.when((mean_wlen >= 3.0) & (mean_wlen <= 12.0), 1.0).otherwise(0.0)
    stop_score = F.when(has_stop, 1.0).otherwise(0.0)
    return (length_score + wlen_score + alpha_ratio + stop_score) / 4.0


def doc_fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the
    whitespace-normalized lowercased text. Engine-portable (DuckDB md5
    produces identical hex), so exact-dedup on the fingerprint is
    oracle-checkable."""
    normalized = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    return F.md5(normalized)


def normalize_text(text: Column) -> Column:
    """Lowercase + whitespace-collapse + trim — the shared normal form
    for fingerprinting/shingling."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def shingles_of_norm(norm: Column, k: int = 5) -> Column:
    """Character k-shingles of an ALREADY-NORMALIZED column.

    IMPORTANT: ``norm`` must be a plain column attribute (project
    ``normalize_text`` in a separate select first). Spark evaluates a
    higher-order-function lambda body per array element — if ``norm``
    were the normalization *expression*, the regexp would re-execute
    once per shingle (measured ~20× slowdown at sf0.1).
    """
    n = F.length(norm)
    return F.when(n < k, F.array(norm)).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - F.lit(k - 1)),
            lambda i: norm.substr(i, F.lit(k)),
        )
    )


def shingles(text: Column, k: int = 5) -> Column:
    """Character k-shingles of the normalized text → array<string>.

    Convenience form for one-off/small inputs. In hot paths, project
    ``normalize_text`` first and call ``shingles_of_norm`` (see its
    warning about per-element lambda evaluation).
    """
    return shingles_of_norm(normalize_text(text), k)
