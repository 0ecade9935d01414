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

from ic_spark.functions.text import word_shingles


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
