"""Train/eval contamination detection: training documents sharing word
n-grams with a held-out evaluation set.

The standard pre-training hygiene check (the reference has no analog;
this is LLM-pipeline surface): before training, every benchmark/eval
document is shingled into word n-grams and any training document
containing one of those n-grams is flagged for removal or decontam
auditing.

Scale design: both sides explode to DISTINCT n-grams per doc, then meet
in an equi-join on the gram key — never a pairwise doc x doc
comparison.  With ``hashed=True`` (the production path) grams become
8-byte ``xxhash64`` keys before the shuffle, so the exchange carries
hashes, not text.  The eval side is benchmarks — thousands of docs
against billions — so AQE broadcasts it and the train side never
shuffles at all.  ``hashed=False`` joins on the gram strings
(bit-identical semantics, heavier shuffle) and exists so the DuckDB
oracle can hash-check the plan; a pytest pins hashed == unhashed.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ic_spark.functions.text import tokens, word_shingles


def _doc_grams(
    df: DataFrame, id_col: str, out_id: str, text_col: str, n: int, hashed: bool
) -> DataFrame:
    out = df.select(
        F.col(id_col).alias(out_id),
        F.explode(
            F.array_distinct(word_shingles(F.col(text_col), n))
        ).alias("gram"),
    )
    if hashed:
        out = out.select(out_id, F.xxhash64("gram").alias("gram"))
    return out


def contamination_overlap(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    hashed: bool = True,
) -> DataFrame:
    """(train_id, eval_id, n_shared) for every train/eval pair sharing
    at least one word ``n``-gram; ``n_shared`` counts distinct shared
    grams."""
    tg = _doc_grams(train, id_col, "train_id", text_col, n, hashed)
    eg = _doc_grams(eval_df, id_col, "eval_id", text_col, n, hashed)
    return (
        tg.join(eg, on="gram")
        .groupBy("train_id", "eval_id")
        .agg(F.count("*").alias("n_shared"))
    )


def remove_contaminated_spans(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    hashed: bool = True,
) -> DataFrame:
    """Decontamination by SPAN REMOVAL: cut every run of >= ``k``
    training tokens that appears verbatim in the eval set, keeping the
    rest of the document (the GPT-3/PaLM-style surgical decontam — a
    doc quoting one benchmark question loses the quote, not the doc).

    Returns (doc_id, text_clean, removed_tokens).  Span semantics match
    :func:`ic_spark.operators.dedup.substring_dup_spans`: hit k-gram
    start positions merge gaps-and-islands while ``pos - prev <= k``,
    each covering ``[pos, pos+k-1]``.

    Scale shape: train k-grams reduce to 8-byte xxhash64 keys before
    the equi-join (``hashed``; the output carries no hashes, so the
    string oracle matches exactly); the eval side is distinct grams of
    a benchmark-sized corpus — AQE broadcasts it and the train side
    never shuffles for the probe.  The rebuild is one groupBy over the
    kept (doc, pos, token) rows; the window runs over HIT positions
    only.
    """
    # The gram derivation and the gaps-and-islands merge are dedup's
    # helpers, NOT local twins: the module claims span semantics match
    # substring_dup_spans, and two hand-kept copies of the position
    # arithmetic is exactly how the r9 shingle fix failed to propagate
    # (r10 review find).
    from ic_spark.operators.dedup import (
        _doc_grams as _span_grams,
        _merge_islands,
    )

    toks_col = tokens(F.col(text_col))
    base = train.select(F.col(id_col).alias("doc_id"), toks_col.alias("__t"))
    grams = _span_grams(train, id_col, text_col, k, hash_grams=hashed)
    eg = eval_df.select(
        F.explode(F.array_distinct(word_shingles(F.col(text_col), k))).alias(
            "gram"
        )
    )
    ekey = F.xxhash64("gram") if hashed else F.col("gram")
    eg = eg.select(ekey.alias("__g")).distinct()
    hits = grams.join(eg, on="__g", how="left_semi")

    kill = _merge_islands(hits, k).select(
        "doc_id",
        F.explode(F.sequence("span_start", "span_end")).alias("pos"),
    )
    tok_pos = base.select(
        "doc_id", F.posexplode("__t").alias("__p0", "tok")
    ).select("doc_id", (F.col("__p0") + 1).alias("pos"), "tok")
    kept = tok_pos.join(kill, on=["doc_id", "pos"], how="left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("text_clean"),
        F.count(F.lit(1)).alias("__kept"),
    )
    # Per-doc token counts ride the anchor scan as nullif(size(toks), 0)
    # (r12, guide §2.2): the previous shape re-derived tok_pos — Spark
    # shares no subplans, so "reuse" was a SECOND full scan + tokenize +
    # posexplode of the corpus plus a count aggregate and an extra join.
    # nullif(size, 0) is exactly the left-join-miss semantics it
    # replaces: a 0-token doc produced no tok_pos rows (count NULL) and
    # a NULL-text doc has size NULL — both stay NULL removed_tokens.
    anchor = train.select(
        F.col(id_col).alias("doc_id"),
        F.nullif(F.size(toks_col), F.lit(0)).cast("long").alias("__ntok"),
    )
    return (
        anchor.join(rebuilt, on="doc_id", how="left")
        .select(
            "doc_id",
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
            (
                F.col("__ntok") - F.coalesce(F.col("__kept"), F.lit(0))
            ).cast("long").alias("removed_tokens"),
        )
    )
