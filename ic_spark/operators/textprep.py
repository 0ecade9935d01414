"""Training-data text preparation: PII scrubbing, chunking, repetition.

The prep stages between "raw corpus" and "training shards":

- ``scrub_pii`` / ``pii_counts`` — regexp redaction of emails / phone
  numbers / IPv4s.  Pure ``regexp_replace`` chains (JVM regex inside
  codegen); patterns stay in the RE2-compatible subset so the DuckDB
  oracle computes the identical result.
- ``chunk_documents`` — fixed-token-window chunking with overlap (the
  sequence-prep step before tokenizer packing).  One ``posexplode``
  over per-document chunk starts; shuffle-free (chunks inherit the
  document's partition), output is O(n_tokens / stride) rows per doc.
- ``repetition_stats`` — Gopher-style repetition quality signals:
  distinct-token fraction plus top unigram/bigram frequency fractions.
  Explode + two-level aggregation: the groupBy(doc, token) pass is
  map-side combinable, so at 100 TB it shuffles (doc, token, count)
  partials, not raw tokens.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ic_spark.functions.text import tokens, word_shingles

# (pattern, replacement) — RE2-compatible (works in Java regex AND
# DuckDB/RE2): no lookaround, no backrefs.  Order matters: emails are
# redacted before the bare-number patterns so an address's digits are
# gone by the time phone/IP run.
PII_PATTERNS = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}-\d{4}\b", "<PHONE>"),
    (r"\b\d{1,3}(\.\d{1,3}){3}\b", "<IP>"),
]


def scrub_pii(text: Column | str) -> Column:
    """Redact all PII_PATTERNS matches.  DuckDB equivalent: the same
    ``regexp_replace(..., 'g')`` chain (DuckDB replaces only the first
    match without the 'g' flag; Spark always replaces all)."""
    c = F.col(text) if isinstance(text, str) else text
    for pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def pii_counts(text: Column | str) -> list[Column]:
    """Per-pattern match counts (audit trail for the scrub).
    DuckDB: ``len(regexp_extract_all(text, pat))``."""
    c = F.col(text) if isinstance(text, str) else text
    return [F.regexp_count(c, F.lit(pat)) for pat, _ in PII_PATTERNS]


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 32,
    overlap: int = 8,
) -> DataFrame:
    """(id, chunk_idx, chunk_text, n_tokens): sliding token windows of
    ``chunk_tokens`` with ``overlap`` tokens shared between neighbors.

    Chunk starts are ``1, 1+stride, ...`` up to ``max(n - overlap, 1)``
    (stride = chunk_tokens - overlap), so a trailing fragment shorter
    than the overlap is never emitted as a duplicate chunk.  DuckDB:
    ``unnest(range(1, greatest(n - overlap, 1) + 1, stride))`` +
    ``list_slice`` — both engines clamp the final slice.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    toks = tokens(text_col)
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.size(toks) - overlap, F.lit(1)),
        F.lit(stride),
    )
    exploded = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.posexplode(starts).alias("chunk_idx", "__start"),
    )
    piece = F.slice(F.col("__toks"), F.col("__start"), chunk_tokens)
    return exploded.select(
        F.col(id_col),
        "chunk_idx",
        F.concat_ws(" ", piece).alias("chunk_text"),
        F.size(piece).alias("n_tokens"),
    )


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_tokens, distinct_token_frac, top_token_frac,
    top_bigram_frac) — the repetition signals used for quality
    filtering (high top-fraction = boilerplate / degenerate text).
    """
    uni = (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("__t"))
        .groupBy(id_col, "__t")
        .count()
        .groupBy(id_col)
        .agg(
            F.sum("count").alias("n_tokens"),
            F.count(F.lit(1)).alias("__distinct"),
            F.max("count").alias("__top"),
        )
    )
    bi = (
        df.select(
            F.col(id_col),
            F.explode(word_shingles(text_col, 2)).alias("__b"),
        )
        .groupBy(id_col, "__b")
        .count()
        .groupBy(id_col)
        .agg(F.sum("count").alias("__bn"), F.max("count").alias("__btop"))
    )
    return uni.join(bi, on=id_col).select(
        F.col(id_col),
        "n_tokens",
        F.round(F.col("__distinct") / F.col("n_tokens"), 6).alias(
            "distinct_token_frac"
        ),
        F.round(F.col("__top") / F.col("n_tokens"), 6).alias("top_token_frac"),
        F.round(F.col("__btop") / F.col("__bn"), 6).alias("top_bigram_frac"),
    )
