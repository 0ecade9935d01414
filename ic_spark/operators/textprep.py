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
    # Longest forms first: "(212) 555-0123" and "212-555-0123" must
    # redact WHOLE — the old 7-digit-only pattern left the area code
    # behind ("212-<PHONE>") while pii_counts reported the number as
    # fully handled (r10 review find).  No \b before '(' — boundaries
    # only apply between word chars.
    (
        r"(\(\d{3}\) ?\d{3}-\d{4})|(\b\d{3}[-. ]\d{3}-\d{4}\b)"
        r"|(\b\d{3}-\d{4}\b)",
        "<PHONE>",
    ),
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
    """Per-pattern counts of the replacements the scrub ACTUALLY
    performs: each pattern counts over the text with the EARLIER
    patterns already redacted, mirroring scrub_pii's sequential chain —
    counting every pattern over the raw text double-reported digits
    inside an email as a phone hit the scrub never made (r9 review
    find).  DuckDB: ``len(regexp_extract_all(<partially scrubbed>,
    pat))`` with the same nesting."""
    c = F.col(text) if isinstance(text, str) else text
    out = []
    for pat, repl in PII_PATTERNS:
        out.append(F.regexp_count(c, F.lit(pat)))
        c = F.regexp_replace(c, pat, repl)
    return out


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
    if not 0 <= overlap < chunk_tokens:
        # negative overlap silently SKIPPED tokens between consecutive
        # chunks (stride > chunk_tokens) — invisible data loss, since
        # each chunk still reads chunk_tokens long (r10 review find)
        raise ValueError(
            f"overlap must be in [0, chunk_tokens): got {overlap}"
        )
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


# --------------------------------------------------- quality filtering
#
# Document-level quality gates from the public Gopher (Rae et al. 2021,
# §A.1.1) and C4 (Raffel et al. 2020, §2.2) pipelines — the standard
# pre-training corpus filters.  Pure Catalyst expressions (split +
# higher-order array functions); each signal documents its DuckDB
# equivalent so the oracle SQL stays in lockstep.  At 100 TB these are
# embarrassingly parallel scan-side maps: no shuffle, no UDF.

GOPHER_MIN_TOKENS = 50
GOPHER_MAX_TOKENS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MAX_BULLET_FRAC = 0.9
GOPHER_MAX_ELLIPSIS_FRAC = 0.3
GOPHER_MIN_ALPHA_WORD_FRAC = 0.8
GOPHER_MIN_STOPWORD_HITS = 2


def gopher_quality_signals(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Gopher-rule quality signals + pass flag per document.

    Signals (paper §A.1.1): token-count bounds, mean word length
    bounds, symbol-to-word ratio (# and …), bullet-started /
    ellipsis-ended line fractions, fraction of words containing an
    alphabetic character, and a minimum distinct-stopword requirement.

    Ratios are rounded to 6 digits so cross-engine float hashing is
    stable.  ``passes_gopher`` is an int (1/0) for the same reason.
    """
    from ic_spark.functions.text import _stopword_hits

    text = F.col(text_col)
    toks = tokens(text)
    n = F.size(toks)
    mean_len = F.round(
        F.aggregate(
            F.transform(toks, lambda t: F.length(t)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        / n.cast("double"),
        6,
    )
    alpha_frac = F.round(
        F.size(F.filter(toks, lambda t: t.rlike("[a-zA-Z]"))) / n.cast("double"), 6
    )
    hash_count = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    # Both ellipsis spellings (Gopher SSA.1.1 counts the single
    # character too — the '...'-only count let '…'-heavy boilerplate
    # through; r10 review find, oracle updated identically).
    ellipsis_count = (
        F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))
    ) / F.lit(3) + (
        F.length(text) - F.length(F.replace(text, F.lit("…"), F.lit("")))
    )
    symbol_ratio = F.round((hash_count + ellipsis_count) / n.cast("double"), 6)
    lines = F.split(text, "\n")
    n_lines = F.size(lines)
    bullet_frac = F.round(
        F.size(
            F.filter(
                lines,
                lambda l: F.ltrim(l).rlike("^[-*•]"),
            )
        )
        / n_lines.cast("double"),
        6,
    )
    ellipsis_line_frac = F.round(
        F.size(F.filter(lines, lambda l: F.rtrim(l).rlike("(\\.\\.\\.|…)$")))
        / n_lines.cast("double"),
        6,
    )
    stop_hits = _stopword_hits(text)
    passes = (
        (n >= GOPHER_MIN_TOKENS)
        & (n <= GOPHER_MAX_TOKENS)
        & (mean_len >= GOPHER_MIN_MEAN_WORD_LEN)
        & (mean_len <= GOPHER_MAX_MEAN_WORD_LEN)
        & (symbol_ratio <= GOPHER_MAX_SYMBOL_RATIO)
        & (bullet_frac <= GOPHER_MAX_BULLET_FRAC)
        & (ellipsis_line_frac <= GOPHER_MAX_ELLIPSIS_FRAC)
        & (alpha_frac >= GOPHER_MIN_ALPHA_WORD_FRAC)
        & (stop_hits >= GOPHER_MIN_STOPWORD_HITS)
    )
    return df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        mean_len.alias("mean_word_len"),
        alpha_frac.alias("alpha_word_frac"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_frac.alias("bullet_line_frac"),
        ellipsis_line_frac.alias("ellipsis_line_frac"),
        stop_hits.alias("stopword_hits"),
        passes.cast("int").alias("passes_gopher"),
    )


def c4_line_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words_per_line: int = 3,
    min_sentences: int = 3,
) -> DataFrame:
    """C4-style line-level cleaning + document gate.

    Line rules (paper §2.2): keep only lines that end in terminal
    punctuation and have at least ``min_words_per_line`` words.
    Document rules: drop pages containing "lorem ipsum" or a curly
    brace; require ``min_sentences`` sentences AFTER line cleaning.

    Returns (id, clean_text, n_lines_kept, n_lines_total, keep_doc).
    All line work happens inside one ``filter``/``array_join`` over the
    split array — scan-side, shuffle-free.
    """
    text = F.col(text_col)
    lines = F.split(text, "\n")
    kept = F.filter(
        lines,
        lambda l: F.rtrim(l).rlike("[.!?\"]$")
        & (F.size(F.split(F.trim(l), " ")) >= min_words_per_line),
    )
    clean = F.array_join(kept, "\n")
    n_sentences = F.size(F.split(clean, "[.!?]")) - 1
    has_lorem = F.lower(text).contains("lorem ipsum")
    has_brace = text.contains("{")
    keep = (~has_lorem) & (~has_brace) & (n_sentences >= min_sentences)
    return df.select(
        F.col(id_col),
        clean.alias("clean_text"),
        F.size(kept).alias("n_lines_kept"),
        F.size(lines).alias("n_lines_total"),
        keep.cast("int").alias("keep_doc"),
    )


def quality_logreg_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights: dict[str, float] | None = None,
    bias: float = -3.0,
) -> DataFrame:
    """Linear quality classifier: sigmoid(bias + w·features) per doc.

    The production pattern behind fastText/logreg corpus filters
    (CCNet, GPT-3's quality classifier): features are engineered
    expressions, weights come from an OFFLINE fit, and scoring is a
    pure whole-stage-codegen projection — no model runtime, no UDF,
    scan-speed at any corpus size.

    Features (all SQL-expressible for oracle parity): capped token
    count, mean word length, distinct-stopword hits, digit fraction,
    uppercase fraction.  Ratios and the score round to 6 digits for
    cross-engine float hashing.
    """
    from ic_spark.functions.text import _stopword_hits

    w = {
        "n_tokens_capped": 0.015,
        "mean_word_len": 0.2,
        "stop_hits": 0.35,
        "digit_frac": -4.0,
        "upper_frac": -2.0,
    }
    unknown = set(weights or {}) - set(w)
    if unknown:
        # a misspelled feature name was a silent no-op: the scoring
        # loop iterates the KNOWN features only, so the caller's
        # intended re-weighting never applied (r10 review find)
        raise ValueError(
            f"quality_logreg_score: unknown weight keys {sorted(unknown)}; "
            f"features are {sorted(w)}"
        )
    w.update(weights or {})
    text = F.col(text_col)
    toks = tokens(text)
    n = F.size(toks)
    feats = {
        "n_tokens_capped": F.least(n, F.lit(400)).cast("double"),
        "mean_word_len": F.round(
            F.aggregate(
                F.transform(toks, lambda t: F.length(t)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
            / n.cast("double"),
            6,
        ),
        "stop_hits": _stopword_hits(text).cast("double"),
        # Zero-guarded: an empty document divided 0/0 → NULL score and
        # keep (neither kept nor rejected; DIVIDE_BY_ZERO under ANSI) —
        # an empty doc has 0.0 of everything (r9 review find).
        "digit_frac": F.round(
            F.when(
                F.length(text) > 0,
                (
                    F.length(text)
                    - F.length(F.regexp_replace(text, "[0-9]", ""))
                )
                / F.length(text).cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        ),
        "upper_frac": F.round(
            F.when(
                F.length(text) > 0,
                (
                    F.length(text)
                    - F.length(F.regexp_replace(text, "[A-Z]", ""))
                )
                / F.length(text).cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        ),
    }
    z = F.lit(float(bias))
    for name, col in feats.items():
        z = z + F.lit(float(w[name])) * col
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    return df.select(
        F.col(id_col),
        *[col.alias(name) for name, col in feats.items()],
        score.alias("quality_score"),
        (score >= 0.5).cast("int").alias("keep"),
    )
