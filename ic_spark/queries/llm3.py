"""Training-data prep queries: PII scrubbing, token-window chunking,
repetition/quality signals.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from ic_spark.operators.textprep import (
    PII_PATTERNS,
    chunk_documents,
    pii_counts,
    repetition_stats,
    scrub_pii,
)
from ic_spark.queries.llm import SQL_STOPLIST
from ic_spark.queries.registry import query
from ic_spark.tables import load_table

# The synthetic corpus contains no PII, so the query plants
# deterministic fake PII derived from doc_id — the scrub is then
# actually exercised (and its result hash-checked) on every row.
_PII_RAW_SPARK = (
    "concat(text, ' contact user', CAST(doc_id AS STRING), '@example.com or ',"
    " '555-', lpad(CAST(pmod(doc_id, 10000) AS STRING), 4, '0'),"
    " ' ip 10.0.', CAST(pmod(doc_id, 256) AS STRING), '.1')"
)
_PII_RAW_DUCK = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or '"
    " || '555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    " || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1'"
)


def _duck_scrub(expr: str) -> str:
    for pat, repl in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return expr


def _duck_scrub_partial(expr: str, upto: int) -> str:
    """Scrub only the first ``upto`` patterns — the audit counts mirror
    scrub_pii's SEQUENTIAL chain (each pattern counts over text with
    the earlier patterns already redacted)."""
    for pat, repl in PII_PATTERNS[:upto]:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return expr


@query(
    "text_pii_scrub",
    oracle=f"""
    WITH raw AS (SELECT doc_id, {_PII_RAW_DUCK} AS raw FROM documents)
    SELECT doc_id,
           {_duck_scrub('raw')} AS scrubbed,
           CAST(len(regexp_extract_all(raw, '{PII_PATTERNS[0][0]}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all({_duck_scrub_partial('raw', 1)},
                '{PII_PATTERNS[1][0]}')) AS INT) AS n_phones,
           CAST(len(regexp_extract_all({_duck_scrub_partial('raw', 2)},
                '{PII_PATTERNS[2][0]}')) AS INT) AS n_ips
    FROM raw
    """,
    headline=True,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str):
    """PII redaction over the corpus: emails, phone numbers, IPv4s
    replaced by typed placeholders, with per-pattern audit counts.
    Pure regexp expressions in codegen — at 100 TB this is a map-only
    pass fused into the scan (no shuffle, no Python)."""
    d = load_table(spark, sf_dir, "documents")
    raw = d.select("doc_id", F.expr(_PII_RAW_SPARK).alias("raw"))
    n_emails, n_phones, n_ips = pii_counts("raw")
    return raw.select(
        "doc_id",
        scrub_pii("raw").alias("scrubbed"),
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        n_ips.alias("n_ips"),
    )


@query(
    "text_chunk_documents",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    )
    SELECT doc_id,
           CAST(i AS INT) AS chunk_idx,
           array_to_string(list_slice(t, s, s + 31), ' ') AS chunk_text,
           CAST(len(list_slice(t, s, s + 31)) AS INT) AS n_tokens
    FROM (
        SELECT doc_id, t,
               generate_subscripts(starts, 1) - 1 AS i,
               unnest(starts) AS s
        FROM (
            SELECT doc_id, t,
                   range(1, greatest(len(t) - 8, 1) + 1, 24) AS starts
            FROM toks
        )
    )
    """,
)
def text_chunk_documents(spark: SparkSession, sf_dir: str):
    """Sliding-window chunking: 32-token chunks, 8-token overlap — the
    sequence-prep step before packing.  chunk_idx is 0-based within the
    document."""
    d = load_table(spark, sf_dir, "documents")
    return chunk_documents(
        d.select("doc_id", "text"), "doc_id", "text", chunk_tokens=32, overlap=8
    )


@query(
    "text_repetition_stats",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
    ),
    uni_counts AS (
        SELECT doc_id, t, COUNT(*) AS c FROM toks GROUP BY doc_id, t
    ),
    uni AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
               COUNT(*) AS d, MAX(c) AS m
        FROM uni_counts GROUP BY doc_id
    ),
    bigrams AS (
        -- 1-token docs have NO bigrams (word_shingles' r9 contract);
        -- the old greatest() floor counted the unigram as a bigram,
        -- and the inner join below must DROP such docs like Spark's
        -- repetition_stats does (r10 review find)
        SELECT doc_id,
               unnest(list_transform(
                   range(1, len(t) - 1 + 1),
                   i -> array_to_string(list_slice(t, i, i + 1), ' ')
               )) AS b
        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
        WHERE len(t) >= 2
    ),
    bi_counts AS (
        SELECT doc_id, b, COUNT(*) AS c FROM bigrams GROUP BY doc_id, b
    ),
    bi AS (
        SELECT doc_id, SUM(c) AS bn, MAX(c) AS btop FROM bi_counts GROUP BY doc_id
    )
    SELECT uni.doc_id, n_tokens,
           ROUND(CAST(d AS DOUBLE) / n_tokens, 6) AS distinct_token_frac,
           ROUND(CAST(m AS DOUBLE) / n_tokens, 6) AS top_token_frac,
           ROUND(CAST(btop AS DOUBLE) / bn, 6) AS top_bigram_frac
    FROM uni JOIN bi ON uni.doc_id = bi.doc_id
    """,
)
def text_repetition_stats(spark: SparkSession, sf_dir: str):
    """Gopher-style repetition signals per document: distinct-token
    fraction and top unigram/bigram frequency fractions — the standard
    boilerplate/degenerate-text filters in corpus cleaning."""
    d = load_table(spark, sf_dir, "documents")
    return repetition_stats(d.select("doc_id", "text"), "doc_id", "text")


@query(
    "pipeline_prepare_training",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    chunks AS (
        SELECT doc_id,
               CAST(i AS INT) AS chunk_idx,
               CAST(len(list_slice(t, s, s + 31)) AS BIGINT) AS n_tokens
        FROM (
            SELECT doc_id, t,
                   generate_subscripts(starts, 1) - 1 AS i,
                   unnest(starts) AS s
            FROM (
                SELECT doc_id, t,
                       range(1, greatest(len(t) - 8, 1) + 1, 24) AS starts
                FROM toks WHERE len(t) >= 64
            )
        )
    ),
    packed AS (
        SELECT n_tokens,
               CAST(FLOOR(
                 (SUM(n_tokens) OVER (ORDER BY doc_id, chunk_idx
                                      ROWS UNBOUNDED PRECEDING) - n_tokens)
                 / 2048.0) AS BIGINT) AS shard_id
        FROM chunks
    )
    SELECT shard_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM packed GROUP BY shard_id
    """,
    headline=True,
)
def pipeline_prepare_training(spark: SparkSession, sf_dir: str):
    """End-to-end sequence prep: length-filter the corpus, chunk into
    32-token windows (8 overlap), pack chunks in (doc_id, chunk_idx)
    order into ~2048-token shards, and report the shard manifest.
    Composition of chunk_documents + pack_shards — filter and chunking
    fuse into the scan; packing is the distributed prefix sum."""
    from ic_spark.functions.text import token_count
    from ic_spark.operators.packing import pack_shards, shard_summary

    d = load_table(spark, sf_dir, "documents")
    chunks = chunk_documents(
        d.where(token_count(F.col("text")) >= 64).select("doc_id", "text"),
        "doc_id",
        "text",
        chunk_tokens=32,
        overlap=8,
    ).select("doc_id", "chunk_idx", F.col("n_tokens").cast("long").alias("n_tokens"))
    packed = pack_shards(chunks, "n_tokens", ["doc_id", "chunk_idx"], 2048)
    return shard_summary(packed, "n_tokens").select(
        "shard_id",
        F.col("n_docs").cast("long").alias("n_chunks"),
        F.col("total_tokens").cast("long").alias("total_tokens"),
    )


@query(
    "text_unigram_logprob",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    freq AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
    total AS (SELECT COUNT(*) AS n FROM toks)
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(AVG(ln(CAST(f.c AS DOUBLE) / total.n)), 6) AS avg_logprob
    FROM toks t JOIN freq f USING (tok) CROSS JOIN total
    GROUP BY t.doc_id
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str):
    """CCNet-style unigram language-model quality score: the corpus
    itself is the model (P(tok) = corpus frequency / corpus size) and
    each document scores the mean log-probability of its tokens — low
    scores flag gibberish/outlier documents for filtering.

    Scale shape: the model is ONE vocabulary-sized aggregate reused via
    an equi-join on the token (no broadcast hint — vocabulary grows
    with the corpus, AQE decides at runtime); the corpus total enters
    as a broadcast single-row cross join; per-doc scoring is a map-side
    partial avg on doc_id."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = toks.select(F.count(F.lit(1)).alias("n"))
    return (
        toks.join(freq, "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.avg(F.log(F.col("c").cast("double") / F.col("n"))), 6
            ).alias("avg_logprob"),
        )
    )


@query(
    "text_bigram_logprob",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    flat AS (SELECT doc_id, unnest(t) AS tok FROM toks),
    ufreq AS (SELECT tok, COUNT(*) AS c FROM flat GROUP BY tok),
    utotal AS (SELECT COUNT(*) AS n FROM flat),
    bi AS (
        SELECT doc_id, t[i] AS prev, t[i + 1] AS cur
        FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i)
    ),
    bfreq AS (SELECT prev, cur, COUNT(*) AS cb FROM bi GROUP BY prev, cur)
    SELECT b.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(AVG(ln(
               0.75 * CAST(f.cb AS DOUBLE) / up.c
             + 0.25 * CAST(uc.c AS DOUBLE) / ut.n)), 6) AS avg_logprob
    FROM bi b
    JOIN bfreq f ON f.prev = b.prev AND f.cur = b.cur
    JOIN ufreq up ON up.tok = b.prev
    JOIN ufreq uc ON uc.tok = b.cur
    CROSS JOIN utotal ut
    GROUP BY b.doc_id
    """,
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str):
    """Interpolated bigram language-model quality score (the KenLM-lite
    step up from text_unigram_logprob): each document averages
    ``log(0.75 * P(cur|prev) + 0.25 * P(cur))`` over its adjacent token
    pairs, with ``P(cur|prev) = c(prev,cur) / c(prev)`` estimated from
    the corpus itself.  The unigram interpolation floor keeps unseen-ish
    transitions finite, so gibberish with real words but impossible
    word ORDER now scores low too — the main blind spot of a pure
    unigram filter.  Documents with fewer than two tokens have no
    bigrams and drop out (same in the oracle).

    Scale shape: the model is two corpus-sized aggregates (bigram and
    unigram frequency tables) reused via equi-joins on the gram — no
    broadcast hints (gram vocabularies grow with the corpus; AQE
    decides), no doc x doc term anywhere.  At 100 TB the string gram
    keys would be xxhash64-compressed on the shuffle exactly like
    operators/contamination.py does; the string path here is the
    oracle-portable declaration of the same plan.
    """
    d = load_table(spark, sf_dir, "documents")
    t = F.split("text", " ")
    base = d.select("doc_id", t.alias("t"))
    # zip_with over two shifted slices: slice length size-1 is 0 for
    # single-token docs (empty bigram array), never negative.
    bi = base.select(
        "doc_id",
        F.explode(
            F.expr(
                "zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1),"
                " (p, c) -> struct(p AS prev, c AS cur))"
            )
        ).alias("b"),
    ).select("doc_id", "b.prev", "b.cur")
    flat = base.select(F.explode("t").alias("tok"))
    ufreq = flat.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    utotal = flat.select(F.count(F.lit(1)).alias("n"))
    bfreq = bi.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("cb"))
    prob = (
        F.lit(0.75) * F.col("cb").cast("double") / F.col("up_c")
        + F.lit(0.25) * F.col("uc_c").cast("double") / F.col("n")
    )
    return (
        bi.join(bfreq, ["prev", "cur"])
        .join(ufreq.select(F.col("tok").alias("prev"), F.col("c").alias("up_c")), "prev")
        .join(ufreq.select(F.col("tok").alias("cur"), F.col("c").alias("uc_c")), "cur")
        .crossJoin(F.broadcast(utotal))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(F.log(prob)), 6).alias("avg_logprob"),
        )
    )


@query(
    "dedup_chunk_spans",
    oracle="""
    WITH chunks AS (
        SELECT doc_id,
               CAST(i AS INT) AS chunk_idx,
               md5(array_to_string(list_slice(t, s, s + 31), ' ')) AS h
        FROM (
            SELECT doc_id, t,
                   generate_subscripts(starts, 1) - 1 AS i,
                   unnest(starts) AS s
            FROM (
                SELECT doc_id, string_split(text, ' ') AS t,
                       range(1, greatest(len(string_split(text, ' ')) - 0, 1) + 1, 32) AS starts
                FROM documents
            )
        )
    ),
    dups AS (
        SELECT h, CAST(COUNT(*) AS BIGINT) AS dup_count
        FROM chunks GROUP BY h HAVING COUNT(*) > 1
    )
    SELECT c.doc_id, c.chunk_idx, d.dup_count
    FROM chunks c JOIN dups d USING (h)
    """,
)
def dedup_chunk_spans(spark: SparkSession, sf_dir: str):
    """Exact substring-level dedup (the chunked analog of Lee et al.'s
    dedup of repeated training spans): non-overlapping 32-token chunks,
    hashed; every (doc, chunk) whose text occurs at more than one
    position corpus-wide is flagged with its occurrence count.
    Downstream, flagged spans are cut from documents rather than
    dropping whole near-identical docs.

    Scale shape: chunks shuffle as (hash, doc, idx) triples — md5 here
    for oracle portability; swap xxhash64 at the 100 TB operating point
    for an 8-byte shuffle key.  The group-by and the flag join are both
    on the hash key; document text never joins against document text."""
    d = load_table(spark, sf_dir, "documents")
    chunks = chunk_documents(
        d.select("doc_id", "text"), "doc_id", "text", chunk_tokens=32, overlap=0
    ).select("doc_id", "chunk_idx", F.md5(F.col("chunk_text")).alias("h"))
    dups = (
        chunks.groupBy("h")
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .where(F.col("dup_count") > 1)
    )
    return chunks.join(dups, "h").select("doc_id", "chunk_idx", "dup_count")


# ----------------------------------------------- quality-filter gates

# The synthetic corpus is punctuation-free single-line text, so the
# queries PLANT deterministic structure from doc_id (same trick as the
# PII queries above): symbol runs, bullet/ellipsis lines and
# lorem-ipsum/brace markers — every Gopher/C4 rule then actually fires
# on a known subset and the whole signal matrix is hash-checked.

_GOPHER_RAW_SPARK = (
    "concat(text,"
    " CASE WHEN doc_id % 5 = 0 THEN ' ## ## ##' ELSE '' END,"
    " CASE WHEN doc_id % 7 = 0 THEN concat('\\n- bullet one two', '\\n- more') ELSE '' END,"
    " CASE WHEN doc_id % 11 = 0 THEN '\\nterse line...' ELSE '' END)"
)
_GOPHER_RAW_DUCK = (
    "text || CASE WHEN doc_id % 5 = 0 THEN ' ## ## ##' ELSE '' END"
    " || CASE WHEN doc_id % 7 = 0 THEN chr(10) || '- bullet one two' || chr(10) || '- more' ELSE '' END"
    " || CASE WHEN doc_id % 11 = 0 THEN chr(10) || 'terse line...' ELSE '' END"
)


@query(
    "text_gopher_filters",
    oracle=f"""
    WITH raw AS (
        SELECT doc_id, {_GOPHER_RAW_DUCK} AS t FROM documents
    ),
    sig AS (
        SELECT doc_id, t,
               string_split(t, ' ') AS toks,
               string_split(t, chr(10)) AS lines
        FROM raw
    ),
    m AS (
        SELECT doc_id,
            len(toks) AS n_tokens,
            ROUND(list_sum(list_transform(toks, x -> CAST(len(x) AS BIGINT)))
                  / CAST(len(toks) AS DOUBLE), 6) AS mean_word_len,
            ROUND(len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]')))
                  / CAST(len(toks) AS DOUBLE), 6) AS alpha_word_frac,
            ROUND(((len(t) - len(replace(t, '#', '')))
                   + (len(t) - len(replace(t, '...', ''))) / 3
                   + (len(t) - len(replace(t, '…', ''))))
                  / CAST(len(toks) AS DOUBLE), 6) AS symbol_ratio,
            ROUND(len(list_filter(lines, l -> regexp_matches(ltrim(l), '^[-*•]')))
                  / CAST(len(lines) AS DOUBLE), 6) AS bullet_line_frac,
            ROUND(len(list_filter(lines, l -> regexp_matches(rtrim(l), '(\\.\\.\\.|…)$')))
                  / CAST(len(lines) AS DOUBLE), 6) AS ellipsis_line_frac,
            len(list_intersect(toks, {SQL_STOPLIST})) AS stopword_hits
        FROM sig
    )
    SELECT doc_id, n_tokens, mean_word_len, alpha_word_frac, symbol_ratio,
           bullet_line_frac, ellipsis_line_frac, stopword_hits,
           CAST(n_tokens BETWEEN 50 AND 100000
                AND mean_word_len BETWEEN 3.0 AND 10.0
                AND symbol_ratio <= 0.1
                AND bullet_line_frac <= 0.9
                AND ellipsis_line_frac <= 0.3
                AND alpha_word_frac >= 0.8
                AND stopword_hits >= 2 AS INT) AS passes_gopher
    FROM m
    """,
)
def text_gopher_filters(spark: SparkSession, sf_dir: str):
    """Gopher quality-rule matrix (Rae et al. 2021 §A.1.1) with every
    rule exercised via planted doc_id-derived structure."""
    from ic_spark.operators.textprep import gopher_quality_signals

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_GOPHER_RAW_SPARK).alias("gtext")
    )
    return gopher_quality_signals(d, "doc_id", "gtext")


_C4_RAW_SPARK = (
    "concat(regexp_replace(text, ' (merge|join) ', '.\\n'),"
    " CASE WHEN doc_id % 13 = 0 THEN ' lorem ipsum' ELSE '' END,"
    " CASE WHEN doc_id % 17 = 0 THEN ' {' ELSE '' END)"
)
_C4_RAW_DUCK = (
    "regexp_replace(text, ' (merge|join) ', '.' || chr(10), 'g')"
    " || CASE WHEN doc_id % 13 = 0 THEN ' lorem ipsum' ELSE '' END"
    " || CASE WHEN doc_id % 17 = 0 THEN ' {' ELSE '' END"
)


@query(
    "text_c4_clean",
    oracle=f"""
    WITH raw AS (
        SELECT doc_id, {_C4_RAW_DUCK} AS t FROM documents
    ),
    sig AS (
        SELECT doc_id, t,
               string_split(t, chr(10)) AS lines,
               list_filter(string_split(t, chr(10)),
                           l -> regexp_matches(rtrim(l), '[.!?"]$')
                                AND len(string_split(trim(l), ' ')) >= 3) AS kept
        FROM raw
    )
    SELECT doc_id,
           -- DuckDB's array_to_string yields NULL for an empty list;
           -- Spark's array_join yields ''
           COALESCE(array_to_string(kept, chr(10)), '') AS clean_text,
           len(kept) AS n_lines_kept,
           len(lines) AS n_lines_total,
           CAST(NOT contains(lower(t), 'lorem ipsum')
                AND NOT contains(t, '{{')
                AND len(string_split_regex(
                        COALESCE(array_to_string(kept, chr(10)), ''), '[.!?]')) - 1 >= 3
                AS INT) AS keep_doc
    FROM sig
    """,
)
def text_c4_clean(spark: SparkSession, sf_dir: str):
    """C4 line-level cleaning (Raffel et al. 2020 §2.2): terminal-
    punctuation + min-words line filter, lorem-ipsum/brace page gates,
    min-sentence requirement after cleaning.  Lines derived
    deterministically from the fixture (merge/join → sentence breaks)."""
    from ic_spark.operators.textprep import c4_line_filter

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_C4_RAW_SPARK).alias("ctext")
    )
    return c4_line_filter(d, "doc_id", "ctext")


@query(
    "text_quality_logreg",
    oracle=f"""
    -- Linear (logreg-style) quality classifier: offline-fit weights,
    -- scoring as a pure projection.  Same features/weights as the
    -- Spark operator; score and ratios rounded for float hashing.
    WITH sig AS (
        SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents
    ),
    feats AS (
        SELECT doc_id,
            CAST(LEAST(len(toks), 400) AS DOUBLE) AS n_tokens_capped,
            ROUND(list_sum(list_transform(toks, x -> CAST(len(x) AS BIGINT)))
                  / CAST(len(toks) AS DOUBLE), 6) AS mean_word_len,
            CAST(len(list_intersect(toks, {SQL_STOPLIST})) AS DOUBLE) AS stop_hits,
            -- zero-length guard matching the r9 Spark fix: empty text
            -- scores 0.0, not NULL via 0/0 (r10 review find)
            CASE WHEN len(text) = 0 THEN 0.0 ELSE
              ROUND((len(text) - len(regexp_replace(text, '[0-9]', '', 'g')))
                    / CAST(len(text) AS DOUBLE), 6) END AS digit_frac,
            CASE WHEN len(text) = 0 THEN 0.0 ELSE
              ROUND((len(text) - len(regexp_replace(text, '[A-Z]', '', 'g')))
                    / CAST(len(text) AS DOUBLE), 6) END AS upper_frac
        FROM sig
    ),
    scored AS (
        SELECT *,
            ROUND(1.0 / (1.0 + exp(-(-3.0 + 0.015 * n_tokens_capped
                                     + 0.2 * mean_word_len
                                     + 0.35 * stop_hits
                                     - 4.0 * digit_frac
                                     - 2.0 * upper_frac))), 6) AS quality_score
        FROM feats
    )
    SELECT doc_id, n_tokens_capped, mean_word_len, stop_hits, digit_frac,
           upper_frac, quality_score,
           CAST(quality_score >= 0.5 AS INT) AS keep
    FROM scored
    """,
)
def text_quality_logreg(spark: SparkSession, sf_dir: str):
    """Offline-fit linear quality classifier scored as a pure
    projection (the CCNet/GPT-3 corpus-filter pattern, minus the
    model runtime)."""
    from ic_spark.operators.textprep import quality_logreg_score

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return quality_logreg_score(d, "doc_id", "text")


@query("text_bpe_subword_tokenize", oracle=None)
def text_bpe_subword_tokenize(spark: SparkSession, sf_dir: str):
    """Corpus-trained BPE subword tokenization (operators/bpe.py):
    ONE distributed word-count pass learns the merge list (indexed
    Sennrich loop on the count-capped vocab), one mapInPandas pass
    applies it (GPT-2 greedy lowest-rank-first).  Rows-only check
    (iterative training has no SQL analog); merge learning is pinned
    EXACTLY equal to a naive recount reference and the apply rule to a
    hand-walked reference in tests/test_operators.py."""
    from ic_spark.operators.bpe import bpe_encode, bpe_train

    d = load_table(spark, sf_dir, "documents")
    merges = bpe_train(d, "text", n_merges=200)
    return bpe_encode(d, "text", merges).select(
        "doc_id",
        "n_bpe_tokens",
        F.slice("bpe_tokens", 1, 8).alias("head_tokens"),
    )
