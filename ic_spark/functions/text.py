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


def hashed_word_shingles(text: Column | str, n: int = 3) -> Column:
    """``array<long>``: xxhash64 of each word n-gram, built WITHOUT
    materializing shingle strings — tokens are xxhash64-hashed once,
    then each shingle combines its n token hashes in ONE composite
    ``xxhash64(h_i, ..., h_{i+n-1})`` call.

    Same set semantics as hashing :func:`word_shingles` strings (1:1
    up to 64-bit collisions) at ~4x less cost: the string path builds
    an O(n)-sized concat per shingle inside an interpreted
    higher-order function (measured 1.3 s vs 0.35 s for the corpus
    shingle pass at sf0.1).  Composite hashing is also unambiguous
    where ' '-joining was not (["a b","c"] and ["a","b c"] both
    concat to "a b c").

    The token-hash array binds ONCE per row via the single-element-
    array transform (a let-binding: Catalyst re-inlining a projected
    subexpression under each shingle would recompute the token pass
    per shingle).  The shingle hash is ``xxhash64(slice(ht, i, n))``
    — one hash of the n-element sub-ARRAY, one outer-lambda reference;
    a multi-argument ``xxhash64(ht[i], ht[i+1], ht[i+2])`` spelling
    breaks Spark's Python-UDF input extraction when this expression
    later feeds a pandas UDF (INTERNAL_ERROR "Cannot evaluate
    expression", reproduced on 4.1).  Not oracle-portable — MinHash's
    portable twin keeps md5 over string shingles.
    """
    if isinstance(text, str):
        # Plain column name: ONE SQL parse of the identical tree — the
        # nested-lambda Column build below costs ~250 py4j round trips
        # per call (the lsh_band_keys single-parse fix, r12).
        # Backticks are escaped (r12 ADVICE); note the quoted form
        # resolves the whole string as ONE top-level column name —
        # a dotted name is NOT a nested-field path here (pass a
        # Column built with F.col for that).
        return F.expr(
            hashed_word_shingles_sql("`" + text.replace("`", "``") + "`", n)
        )
    t = tokens(text)
    ht = F.transform(t, lambda w: F.xxhash64(w))

    def body(h):
        return F.when(
            F.size(h) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(h) - n),
                lambda i: F.xxhash64(F.slice(h, i + 1, n)),
            ),
        ).otherwise(F.array().cast("array<long>"))

    return F.element_at(F.transform(F.array(ht), body), 1)


def hashed_word_shingles_sql(col_sql: str, n: int = 3) -> str:
    """SQL text of :func:`hashed_word_shingles` over the column
    expression ``col_sql`` — same Catalyst tree (CASE WHEN == when/
    otherwise, single-element-array let-binding preserved), parsed
    once."""
    return (
        f"element_at(transform(array(transform(split({col_sql}, ' '), "
        f"w -> xxhash64(w))), h -> CASE WHEN size(h) >= {n} THEN "
        f"transform(sequence(0, size(h) - {n}), "
        f"i -> xxhash64(slice(h, i + 1, {n}))) "
        f"ELSE CAST(array() AS ARRAY<BIGINT>) END), 1)"
    )


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
