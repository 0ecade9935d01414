"""Second batch of text/LLM-pipeline queries: BPE-ish tokenization,
rolling-hash fingerprints, token frequency analysis, pivot, and
approximate sketches.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from ic_spark.operators.topk import grouped_top_k
from ic_spark.queries.llm import SQL_STOPLIST as SQL_STOPLIST_REF
from ic_spark.queries.registry import query
from ic_spark.tables import load_table

# Word-ish / number / single-punct pieces — the "BPE-ish" pre-tokenizer
# shape (split on category boundaries, keep punctuation as tokens).
BPE_ISH = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


@query(
    "text_bpeish_token_count",
    oracle=f"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS ws_tokens,
           len(regexp_extract_all(lower(text), '{BPE_ISH}')) AS bpeish_tokens
    FROM documents
    """,
)
def text_bpeish_token_count(spark: SparkSession, sf_dir: str):
    """Token counting two ways: whitespace and a BPE-ish regex
    pre-tokenizer (word / number / punctuation pieces)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(BPE_ISH), 0)).alias(
            "bpeish_tokens"
        ),
    )


@query(
    "text_rolling_hash_fingerprint",
    oracle="""
    SELECT doc_id,
           list_reduce(
             list_prepend(0, list_transform(string_split(text, ' '),
               t -> CAST(concat('0x', substr(md5(t), 1, 8)) AS BIGINT))),
             (acc, h) -> (acc * 1000003 + h) % 2147483647
           ) AS rolling_hash
    FROM documents
    """,
)
def text_rolling_hash_fingerprint(spark: SparkSession, sf_dir: str):
    """Order-SENSITIVE document fingerprint: polynomial rolling hash over
    per-token md5-derived ints, mod 2^31-1 (exact integer arithmetic in
    both engines — intermediate values stay < 2^52, no overflow).

    Complements the order-insensitive md5 fingerprint: reordered copies
    get different rolling hashes but identical bag-of-words prints.
    """
    d = load_table(spark, sf_dir, "documents")
    tok_hash = lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
    rolling = F.aggregate(
        F.split("text", " "),
        F.lit(0).cast("long"),
        lambda acc, t: (acc * 1000003 + tok_hash(t)) % F.lit(2147483647),
    )
    return d.select("doc_id", rolling.alias("rolling_hash"))


@query(
    "text_top_tokens",
    oracle="""
    SELECT tok, n FROM (
        SELECT tok, COUNT(*) AS n,
               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok ASC) AS rnk
        FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        GROUP BY tok
    ) WHERE rnk <= 20
    """,
)
def text_top_tokens(spark: SparkSession, sf_dir: str):
    """Corpus token frequencies via explode → count → top-20 (map-side
    partial agg keeps the shuffle at vocabulary size, not token count)."""
    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        grouped_top_k(
            counts.withColumn("__g", F.lit(1)),
            ["__g"],
            [F.col("n").desc(), F.col("tok").asc()],
            20,
        )
        .select("tok", "n")
    )


@query(
    "text_tfidf_top_terms",
    oracle="""
    WITH tf AS (
        SELECT doc_id, tok, COUNT(*) AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        GROUP BY doc_id, tok
    ),
    dfreq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT doc_id, tok, tfidf, rank FROM (
        SELECT tf.doc_id, tf.tok,
               ROUND(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfreq.df), 6) AS tfidf,
               ROW_NUMBER() OVER (
                 PARTITION BY tf.doc_id
                 ORDER BY tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfreq.df) DESC,
                          tf.tok ASC) AS rank
        FROM tf JOIN dfreq USING (tok) CROSS JOIN n
    ) WHERE rank <= 3
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str):
    """Per-document top-3 TF-IDF terms.  Scale shape: term frequencies
    aggregate map-side (shuffle is vocabulary x docs-containing, not
    token count); document frequency joins on the token key WITHOUT a
    broadcast hint (vocabulary grows with the corpus — AQE makes the
    runtime call); the corpus size enters as a broadcast single-row
    cross join, not a driver-side constant; top-3 per doc uses
    shuffle-side partial limits (WindowGroupLimit)."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    ndocs = d.select(F.count(F.lit(1)).alias("n_docs"))
    tfidf = F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df"))
    scored = (
        tf.join(dfreq, "tok")
        .crossJoin(F.broadcast(ndocs))
        .select("doc_id", "tok", tfidf.alias("__s"))
    )
    return grouped_top_k(
        scored, ["doc_id"], [F.col("__s").desc(), F.col("tok").asc()], 3
    ).select("doc_id", "tok", F.round(F.col("__s"), 6).alias("tfidf"), "rank")


@query(
    "text_token_positions",
    oracle="""
    SELECT doc_id, i - 1 AS pos, tok
    FROM (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS tok,
               generate_subscripts(string_split(text, ' '), 1) AS i
        FROM documents
    )
    WHERE i <= 5
    """,
)
def text_token_positions(spark: SparkSession, sf_dir: str):
    """posexplode: first five (position, token) pairs per document."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok"))
        .where(F.col("pos") < 5)
    )


@query(
    "pivot_returnflag_revenue",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS A,
           CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS N,
           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS R
    FROM lineitem GROUP BY l_linestatus
    """,
)
def pivot_returnflag_revenue(spark: SparkSession, sf_dir: str):
    """Pivot with an explicit value list (explicit values keep the output
    schema static — at scale, value discovery is an extra full pass)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double"))
    )


@query("agg_approx_sketches", oracle=None)
def agg_approx_sketches(spark: SparkSession, sf_dir: str):
    """Approximate sketches (HLL distinct count, quantile sketch) —
    engine-specific estimators, so no cross-engine oracle; the accuracy
    property (±5% of exact) is pinned in tests/test_operators.py."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx_median_price"),
    )


@query(
    "pipeline_clean_corpus",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, source, text,
               -- ROUND mirrors quality_score()'s own 6-digit rounding:
               -- averaging unrounded values drifts in the 6th digit.
               ROUND(0.5 * LEAST(1.0, len(string_split(text, ' ')) / 50.0)
                   + 0.5 * LEAST(1.0, len(list_intersect(string_split(text, ' '), {SQL_STOPLIST_REF})) / 3.0), 6)
               AS quality
        FROM documents
    ),
    kept AS (SELECT * FROM scored WHERE quality >= 0.5),
    deduped AS (
        SELECT * FROM kept
        QUALIFY ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
    )
    SELECT source,
           COUNT(*) AS n_docs,
           ROUND(AVG(len(string_split(text, ' '))), 6) AS avg_tokens,
           -- integer-exact mean: quality is a 6-decimal quantum, so sum
           -- the millionths as BIGINT (no float-summation boundary flips)
           CAST(SUM(CAST(ROUND(quality * 1000000) AS BIGINT)) AS DOUBLE)
             / (COUNT(*) * 1000000) AS avg_quality
    FROM deduped GROUP BY source
    """,
)
def pipeline_clean_corpus(spark: SparkSession, sf_dir: str):
    """End-to-end corpus cleaning — the composed shape of a training-data
    job: quality-score filter → exact dedup (min doc_id per content) →
    per-source stats.  Each stage is one of the engine's operators; the
    whole pipeline stays lazy, so Catalyst collapses it into
    scan → filter → one dedup shuffle → one agg shuffle."""
    from ic_spark.functions.text import quality_score, tokens as _tokens
    from ic_spark.operators.dedup import exact_dedup

    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", "source", "text", quality_score(F.col("text")).alias("quality")
    )
    kept = scored.where(F.col("quality") >= 0.5)
    deduped = exact_dedup(kept, "text", "doc_id")
    return deduped.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(F.size(_tokens(F.col("text")))), 6).alias("avg_tokens"),
        (
            F.sum(F.round(F.col("quality") * 1000000).cast("long")).cast("double")
            / (F.count(F.lit(1)) * 1000000)
        ).alias("avg_quality"),
    )


@query(
    "pack_training_shards",
    oracle="""
    WITH toks AS (
        SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
        FROM documents
    ),
    packed AS (
        SELECT doc_id, n_tokens,
               CAST(FLOOR(
                 (SUM(n_tokens) OVER (ORDER BY doc_id
                                      ROWS UNBOUNDED PRECEDING) - n_tokens)
                 / 5000.0) AS BIGINT) AS shard_id
        FROM toks
    )
    SELECT shard_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM packed GROUP BY shard_id
    """,
)
def pack_training_shards(spark: SparkSession, sf_dir: str):
    """Training-shard packing: documents in doc_id order fill
    consecutive ~5k-token shards (a doc never splits).  Spark side is
    the DISTRIBUTED prefix sum (range partition → driver offset sum →
    partition-local Arrow cumsum); the oracle is the single-window
    definition — integer token counts make them exactly equal."""
    from ic_spark.functions.text import token_count
    from ic_spark.operators.packing import pack_shards, shard_summary

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", token_count(F.col("text")).cast("long").alias("n_tokens"))
    packed = pack_shards(toks, "n_tokens", ["doc_id"], 5000)
    return shard_summary(packed, "n_tokens").select(
        "shard_id",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("total_tokens").cast("long").alias("total_tokens"),
    )


@query(
    "dedup_cluster_components",
    oracle="""
    WITH RECURSIVE t AS (
        SELECT doc_id, lang, source, list_distinct(string_split(text, ' ')) AS toks
        FROM documents
    ),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM t a JOIN t b
          ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
              / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.8
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION
        SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    reach AS (
        SELECT src AS node, dst AS label FROM edges
        UNION
        SELECT e.src, r.label FROM edges e JOIN reach r ON r.node = e.dst
    )
    SELECT node AS doc_id,
           MIN(LEAST(node, label)) AS cluster_id
    FROM reach GROUP BY node
    """,
)
def dedup_cluster_components(spark: SparkSession, sf_dir: str):
    """Transitive near-dup clusters: token-Jaccard pairs (>=0.8, blocked
    by lang+source) become edges; each clustered document gets the
    smallest doc_id in its connected component.  Spark runs iterative
    min-label propagation over the (small) edge set; the oracle is the
    recursive-CTE transitive closure — identical fixpoint."""
    from ic_spark.operators.cluster import connected_components
    from ic_spark.operators.dedup import token_jaccard_pairs

    d = load_table(spark, sf_dir, "documents")
    pairs = token_jaccard_pairs(d, "doc_id", "text", ["lang", "source"], threshold=0.8)
    return connected_components(pairs.select("id_a", "id_b")).select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )


@query(
    "embedding_quantize_int8",
    oracle="""
    WITH q AS (
        SELECT vec_id,
               list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))) AS amax,
               CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
    )
    SELECT vec_id,
           ROUND(amax / 127.0, 9) AS scale,
           array_to_string(
             list_transform(v, x -> CAST(CAST(ROUND(127.0 * x / GREATEST(amax, 1e-30), 0) AS BIGINT) AS VARCHAR)),
             ',') AS codes
    FROM q
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str):
    """Symmetric int8 quantization of the embedding corpus — the 4x
    storage shrink for large vector stores.  Codes serialize to a joined
    string (list cells are unhashable in the driver canonicalizer); the
    per-vector scale rides alongside for dequantization."""
    from ic_spark.functions.vectors import linf_norm, quantize_int8

    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.round(linf_norm(F.col("embedding")) / 127.0, 9).alias("scale"),
        F.array_join(
            quantize_int8(F.col("embedding")).cast("array<string>"), ","
        ).alias("codes"),
    )


@query(
    "sample_corpus_mix",
    oracle="""
    SELECT doc_id, lang, source FROM (
        SELECT doc_id, lang, source,
               ROW_NUMBER() OVER (
                 PARTITION BY lang
                 ORDER BY (doc_id % 2147483648) * 2654435761 % 4294967296 ASC,
                          doc_id ASC) AS rn
        FROM documents
    ) WHERE rn <= 40
    """,
)
def sample_corpus_mix(spark: SparkSession, sf_dir: str):
    """Deterministic stratified sample: 40 documents per language under
    a fixed integer scramble — reproducible corpus mixing, exact and
    engine-independent (vs seed-dependent fraction sampling)."""
    from ic_spark.operators.sampling import stratified_sample

    d = load_table(spark, sf_dir, "documents")
    return stratified_sample(
        d.select("doc_id", "lang", "source"), ["lang"], "doc_id", 40
    )


@query(
    "sample_temperature_mix",
    oracle="""
    WITH counts AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
    z AS (SELECT SUM(pow(CAST(n AS DOUBLE), 0.7)) AS z FROM counts),
    rates AS (
        SELECT source,
               LEAST(1.0, 100.0 * pow(CAST(n AS DOUBLE), 0.7) / z.z
                          / CAST(n AS DOUBLE)) AS p
        FROM counts CROSS JOIN z
    )
    SELECT d.doc_id, d.source
    FROM documents d JOIN rates r USING (source)
    WHERE CAST((d.doc_id % 2147483648) * 2654435761 % 4294967296 AS DOUBLE)
          / 4294967296.0 < r.p
    """,
)
def sample_temperature_mix(spark: SparkSession, sf_dir: str):
    """Temperature-weighted source mixing (alpha = 0.7, the multilingual
    alpha-sampling scheme): each source's expected share of 100 sampled
    docs is n^0.7-proportional, taken with a deterministic per-row
    Bernoulli (Knuth-scramble u01 — engine-portable, no seed)."""
    from ic_spark.operators.sampling import temperature_sample

    d = load_table(spark, sf_dir, "documents")
    return temperature_sample(
        d.select("doc_id", "source"), ["source"], "doc_id", 100, alpha=0.7
    )


@query("agg_hll_partials_rollup", oracle=None)
def agg_hll_partials_rollup(spark: SparkSession, sf_dir: str):
    """Re-aggregatable distinct counts: per-(returnflag, linestatus)
    HLL sketches built ONCE, then UNIONED up to per-returnflag
    estimates — the pattern that makes distinct-count rollups work at
    100 TB (pre-aggregated sketch partials merge; raw distinct counts
    don't).  Engine-specific binary sketches, so rows-only driver
    check; merge==direct accuracy is pinned in tests."""
    li = load_table(spark, sf_dir, "lineitem")
    partials = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.hll_sketch_agg("l_partkey").alias("pk_sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return (
        partials.groupBy("l_returnflag")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("pk_sketch")).alias(
                "approx_distinct_parts"
            ),
            F.sum("n_rows").alias("n_rows"),
        )
        .select("l_returnflag", "approx_distinct_parts", "n_rows")
    )


@query(
    "dedup_quality_survivors",
    oracle="""
    WITH RECURSIVE t AS (
        SELECT doc_id, lang, source,
               list_distinct(string_split(text, ' ')) AS toks,
               len(string_split(text, ' ')) AS q
        FROM documents
    ),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM t a JOIN t b
          ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
              / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.8
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION
        SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    reach AS (
        SELECT src AS node, dst AS label FROM edges
        UNION
        SELECT e.src, r.label FROM edges e JOIN reach r ON r.node = e.dst
    ),
    comps AS (
        SELECT node, MIN(LEAST(node, label)) AS component
        FROM reach GROUP BY node
    ),
    losers AS (
        SELECT node FROM (
            SELECT c.node,
                   ROW_NUMBER() OVER (
                       PARTITION BY c.component
                       ORDER BY t.q DESC, c.node ASC
                   ) AS rn
            FROM comps c JOIN t ON t.doc_id = c.node
        ) WHERE rn > 1
    )
    SELECT t.doc_id, t.q AS n_tokens
    FROM t WHERE t.doc_id NOT IN (SELECT node FROM losers)
    """,
)
def dedup_quality_survivors(spark: SparkSession, sf_dir: str):
    """Quality-ranked cluster survivorship: near-dup clusters (token
    Jaccard >= 0.8 within lang+source blocks, transitive closure) each
    keep their HIGHEST-token-count member — the production dedup rule
    (the clean original outranks truncated spam copies), composed from
    token_jaccard_pairs + connected_components + a clustered-subset
    window.  Singletons always survive."""
    from ic_spark.operators.cluster import quality_survivors
    from ic_spark.operators.dedup import token_jaccard_pairs

    d = load_table(spark, sf_dir, "documents")
    pairs = token_jaccard_pairs(
        d, "doc_id", "text", ["lang", "source"], threshold=0.8
    )
    kept = quality_survivors(
        d,
        pairs.select("id_a", "id_b"),
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long"),
    )
    return kept.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens")
    )
