"""UDF-surface queries: grouped-map applyInPandas, grouped-agg
pandas UDAF, and a Python UDTF — each hash-checked against a DuckDB
oracle so the Arrow boundary's numeric semantics (median/quantile
interpolation, row fan-out) are pinned, not just exercised.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from ic_spark.operators.grouped import mad_outliers, trimmed_mean
from ic_spark.functions.udtf_fns import register_sentence_split
from ic_spark.queries.registry import query
from ic_spark.tables import load_table


@query(
    "prep_mad_outliers",
    oracle="""
    WITH med AS (
        SELECT lang, median(CAST(n_chars AS DOUBLE)) AS med
        FROM documents GROUP BY lang
    ),
    dev AS (
        SELECT d.lang, m.med, abs(CAST(d.n_chars AS DOUBLE) - m.med) AS adev
        FROM documents d JOIN med m USING (lang)
    ),
    mad AS (
        SELECT lang, any_value(med) AS med, median(adev) AS mad
        FROM dev GROUP BY lang
    )
    SELECT m.lang,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(m.med AS DOUBLE) AS med,
           CAST(m.mad AS DOUBLE) AS mad,
           CAST(SUM(CASE WHEN abs(CAST(d.n_chars AS DOUBLE) - m.med)
                              > 3.0 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
               AS n_outliers
    FROM documents d JOIN mad m USING (lang)
    GROUP BY m.lang, m.med, m.mad
    """,
)
def prep_mad_outliers(spark: SparkSession, sf_dir: str):
    """Per-language doc-length outliers (median/MAD) via grouped-map
    applyInPandas — nested medians, one Arrow pass per group."""
    docs = load_table(spark, sf_dir, "documents")
    return mad_outliers(docs, "lang", "n_chars", k=3.0)


@query(
    "prep_trimmed_mean_chars",
    oracle="""
    WITH band AS (
        SELECT lang,
               quantile_cont(CAST(n_chars AS DOUBLE), 0.1) AS lo,
               quantile_cont(CAST(n_chars AS DOUBLE), 0.9) AS hi
        FROM documents GROUP BY lang
    )
    SELECT d.lang,
           CAST(AVG(CASE WHEN CAST(d.n_chars AS DOUBLE) BETWEEN b.lo AND b.hi
                         THEN CAST(d.n_chars AS DOUBLE) END) AS DOUBLE)
               AS trimmed_mean,
           CAST(COUNT(d.n_chars) AS BIGINT) AS n_rows
    FROM documents d JOIN band b USING (lang)
    GROUP BY d.lang
    """,
)
def prep_trimmed_mean_chars(spark: SparkSession, sf_dir: str):
    """10%-trimmed mean doc length per language via a grouped-agg
    pandas UDAF (numpy quantile == DuckDB quantile_cont)."""
    docs = load_table(spark, sf_dir, "documents")
    return trimmed_mean(docs, "lang", "n_chars", trim=0.1)


@query(
    "text_sentence_split_udtf",
    oracle=r"""
    WITH sent AS (
        -- explicit ASCII whitespace in both the split class and trim:
        -- matches the UDTF's spelling exactly (r10 review find —
        -- Python \s/strip() are Unicode-wide, DuckDB trim() is
        -- space-only; both sides now use the same six chars)
        SELECT d.lang,
               trim(s.part, concat(' ', chr(9), chr(13), chr(10),
                                   chr(12), chr(11))) AS sentence
        FROM documents d,
             unnest(regexp_split_to_array(
                 d.text,
                 '[.!?]+[ ' || chr(9) || chr(13) || chr(10) ||
                 chr(12) || chr(11) || ']+')) AS s(part)
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_sentences,
           CAST(SUM(length(sentence)) AS BIGINT) AS total_chars,
           CAST(MAX(length(sentence)) AS BIGINT) AS max_chars
    FROM sent WHERE sentence <> ''
    GROUP BY lang
    """,
)
def text_sentence_split_udtf(spark: SparkSession, sf_dir: str):
    """Sentence fan-out via a Python UDTF in a SQL LATERAL join,
    aggregated per language so the oracle hash-checks the fan-out."""
    docs = load_table(spark, sf_dir, "documents")
    name = register_sentence_split(spark)
    docs.createOrReplaceTempView("udtf_docs")
    return spark.sql(
        f"""
        SELECT lang,
               COUNT(*) AS n_sentences,
               SUM(length(sentence)) AS total_chars,
               MAX(length(sentence)) AS max_chars
        FROM udtf_docs, LATERAL {name}(text) AS s
        GROUP BY lang
        """
    )


@query(
    "prep_contamination_check",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    grams AS (
        -- docs shorter than 3 tokens have NO 3-grams (word_shingles'
        -- r9 contract; the old greatest() floor emitted one truncated
        -- gram and over-reported contamination — r10 review find)
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   range(0, len(w) - 3 + 1),
                   i -> array_to_string(w[i+1:i+3], ' ')))) AS gram
        FROM toks WHERE len(w) >= 3
    ),
    ev AS (SELECT doc_id AS eval_id, gram FROM grams WHERE doc_id % 97 = 0),
    tr AS (SELECT doc_id AS train_id, gram FROM grams WHERE doc_id % 97 <> 0)
    SELECT train_id, eval_id, CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM tr JOIN ev USING (gram)
    GROUP BY train_id, eval_id
    """,
)
def prep_contamination_check(spark: SparkSession, sf_dir: str):
    """Train/eval word-3-gram contamination pairs (eval set = every
    97th doc).  Oracle joins on gram STRINGS; the production path
    (hashed=True, xxhash64 keys) is pinned equal by pytest."""
    from ic_spark.operators.contamination import contamination_overlap

    docs = load_table(spark, sf_dir, "documents")
    ev = docs.where(F.col("doc_id") % 97 == 0)
    tr = docs.where(F.col("doc_id") % 97 != 0)
    return contamination_overlap(tr, ev, n=3, hashed=False)


@query(
    "pipeline_decontaminate",
    headline=True,
    oracle="""
    -- Surgical decontamination: cut every >=8-token training span
    -- appearing verbatim in the eval split (doc_id %% 17 == 0),
    -- rebuild the remaining text, count removed tokens.
    WITH train AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
        WHERE doc_id % 17 <> 0
    ),
    grams AS (
        SELECT doc_id, pos, array_to_string(t[pos:pos+7], ' ') AS g
        FROM (SELECT doc_id, t, unnest(range(1, len(t) - 6)) AS pos
              FROM train WHERE len(t) >= 8)
    ),
    eg AS (
        SELECT DISTINCT array_to_string(et[pos:pos+7], ' ') AS g
        FROM (SELECT et, unnest(range(1, greatest(len(et) - 6, 1))) AS pos
              FROM (SELECT string_split(text, ' ') AS et FROM documents
                    WHERE doc_id % 17 = 0))
    ),
    hits AS (SELECT doc_id, pos FROM grams WHERE g IN (SELECT g FROM eg)),
    isl AS (
        SELECT doc_id, pos,
               CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 8
                    THEN 0 ELSE 1 END AS brk
        FROM hits
    ),
    grp AS (SELECT doc_id, pos,
                   SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS gid
            FROM isl),
    spans AS (SELECT doc_id, MIN(pos) AS s, MAX(pos) + 7 AS e
              FROM grp GROUP BY doc_id, gid),
    kill AS (SELECT doc_id, unnest(range(s, e + 1)) AS pos FROM spans),
    tokpos AS (
        SELECT doc_id, pos, t[pos] AS tok
        FROM (SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS pos FROM train)
    ),
    kept AS (
        SELECT tp.doc_id, tp.pos, tp.tok
        FROM tokpos tp LEFT JOIN kill k
          ON tp.doc_id = k.doc_id AND tp.pos = k.pos
        WHERE k.pos IS NULL
    ),
    rebuilt AS (
        SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text_clean,
               COUNT(*) AS kept FROM kept GROUP BY doc_id
    )
    SELECT tr.doc_id,
           COALESCE(r.text_clean, '') AS text_clean,
           CAST(len(tr.t) - COALESCE(r.kept, 0) AS BIGINT) AS removed_tokens
    FROM train tr LEFT JOIN rebuilt r USING (doc_id)
    """,
)
def pipeline_decontaminate(spark: SparkSession, sf_dir: str):
    """Span-removal decontamination (operators/contamination.py::
    remove_contaminated_spans): training docs (doc_id %% 17 != 0) lose
    every >=8-token run that appears verbatim in the eval split
    (doc_id %% 17 == 0).  Production path joins on xxhash64 gram keys;
    the rebuilt text is hash-free, so the string oracle matches."""
    from ic_spark.operators.contamination import remove_contaminated_spans

    docs = load_table(spark, sf_dir, "documents")
    ev = docs.where(F.col("doc_id") % 17 == 0)
    tr = docs.where(F.col("doc_id") % 17 != 0)
    return remove_contaminated_spans(tr, ev, k=8)
