"""Text-analysis column expressions for the LLM-pipeline operators.

Everything here is a Catalyst expression (split / higher-order array
functions / hashes) — JVM-side, codegen-friendly, no Python in the hot
path.  Each helper documents its exact DuckDB-SQL equivalent so oracle
queries stay in lockstep.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# Tiny English stopword list for the language-ID heuristic and quality
# scoring.  Deliberately small + fixed so the oracle SQL can inline it.
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")


def tokens(text: Column | str) -> Column:
    """Whitespace tokens.  DuckDB: ``string_split(text, ' ')``."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def token_count(text: Column | str) -> Column:
    """DuckDB: ``len(string_split(text, ' '))``."""
    return F.size(tokens(text))


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as strings (for MinHash / Jaccard).

    DuckDB: ``list_transform(range(1, len(toks)-n+2),
    i -> array_to_string(toks[i:i+n-1], ' '))`` — but the oracle-checked
    queries use distinct unigram tokens instead to keep SQL portable.
    """
    t = tokens(text)
    # A doc with fewer than n tokens has NO n-grams: the old
    # greatest(size-n, 0) floor emitted one TRUNCATED shingle (the
    # whole doc), so two 3-token duplicates "shared a 5-gram" and were
    # falsely flagged as contamination, and repetition stats counted a
    # 1-token doc's unigram as its top bigram (r9 review find).
    return F.when(
        F.size(t) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(t) - n),
            lambda i: F.concat_ws(" ", F.slice(t, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def portable_hash60(c: Column) -> Column:
    """Oracle-portable 60-bit non-negative hash: the first 15 hex chars
    of md5, read as an integer.  Bit-identical in DuckDB via
    ``CAST(concat('0x', substring(md5(s), 1, 15)) AS BIGINT)`` — the
    bridge that lets MinHash/SimHash declarations carry a SQL oracle
    (the production paths keep xxhash64: one 8-byte JVM hash instead of
    a crypto digest + hex parse).
    """
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


PORTABLE_HASH60_SQL = (
    "CAST(concat('0x', substring(md5({s}), 1, 15)) AS BIGINT)"
)


def doc_fingerprint(text: Column | str) -> Column:
    """Order-insensitive content fingerprint: md5 of sorted distinct tokens.

    DuckDB: ``md5(array_to_string(list_sort(list_distinct(
    string_split(text, ' '))), ' '))``.
    """
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(text)))))


def _stopword_hits(text: Column | str) -> Column:
    toks = tokens(text)
    stop = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    return F.size(F.array_intersect(toks, stop))


def quality_score(text: Column | str) -> Column:
    """Cheap quality heuristic in [0, 1]:
    0.5 * min(1, tokens/50) + 0.5 * min(1, distinct_stopwords/3).

    Long-enough documents containing common function words score high;
    token soup or tiny fragments score low.  DuckDB equivalent inlined
    in the oracle queries.
    """
    toks = tokens(text)
    len_part = F.least(F.lit(1.0), F.size(toks) / F.lit(50.0))
    stop_part = F.least(F.lit(1.0), _stopword_hits(text) / F.lit(3.0))
    return F.round(F.lit(0.5) * len_part + F.lit(0.5) * stop_part, 6)


def langid_heuristic(text: Column | str) -> Column:
    """'en' if ≥2 distinct English stopwords appear among tokens, else
    'unknown'.  A real system plugs fastText here; the heuristic keeps
    the operator deterministic and oracle-checkable."""
    return F.when(_stopword_hits(text) >= 2, F.lit("en")).otherwise(F.lit("unknown"))
