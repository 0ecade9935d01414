"""Byte-pair-encoding tokenizer training + application over a corpus.

The core LLM-pipeline op the rest of the text suite feeds: learn a
subword vocabulary from the corpus (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units"), then tokenize
documents with it (the GPT-2 greedy lowest-rank-first apply rule).

100 TB shape — the split that makes BPE trainable at corpus scale:

- The ONLY corpus-sized work is ONE word-frequency aggregation
  (explode tokens → groupBy word → count), a shuffle of short strings
  with map-side partial aggregation.  At any corpus size this is the
  same single pass a word-count takes.
- Merge learning then runs on the WORD VOCABULARY — ``max_words``
  (count-capped, deterministic tie-break) distinct words with counts,
  megabytes not terabytes — using the indexed pair-statistics
  algorithm (incremental pair-count updates per merge, never a full
  recount).  Training quality is count-weighted, so the tail cap
  loses only hapax words, the standard practice.
- Encoding is one ``mapInPandas`` pass with the merge ranks broadcast
  in the closure and per-batch word→tokens memoization (Zipf makes
  the cache hit rate high), emitting token arrays + counts.

Reference scope note: nimtable/IC has no tokenizer surface (its query
set is SQL-shaped — core/src/executor/datafusion/datafusion_processor.rs);
this extends the engine's training-data pipeline the way
operators/dedup.py extends dedup.
"""

from __future__ import annotations

from collections import defaultdict
from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ic_spark.functions.text import tokens

END = "</w>"


def _learn_merges(word_counts: list[tuple[str, int]], n_merges: int):
    """Indexed BPE merge learning (incremental pair statistics): at
    each step merge the (count, pair)-max adjacent symbol pair; update
    only the words containing it.  Deterministic: ties break to the
    lexicographically greatest pair, matching the naive reference
    implementation pinned in tests."""
    words: list[tuple[tuple[str, ...], int]] = [
        (tuple(w) + (END,), c) for w, c in word_counts if w
    ]
    pair_counts: dict[tuple[str, str], int] = defaultdict(int)
    pair_words: dict[tuple[str, str], set[int]] = defaultdict(set)
    for wi, (syms, c) in enumerate(words):
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] += c
            pair_words[(a, b)].add(wi)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        (a, b), cnt = max(pair_counts.items(), key=lambda kv: (kv[1], kv[0]))
        if cnt <= 0:
            break
        merges.append((a, b))
        ab = a + b
        for wi in list(pair_words[(a, b)]):
            syms, c = words[wi]
            for pa, pb in zip(syms, syms[1:]):
                pair_counts[(pa, pb)] -= c
                if pair_counts[(pa, pb)] <= 0:
                    del pair_counts[(pa, pb)]
                pair_words[(pa, pb)].discard(wi)
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_syms = tuple(out)
            words[wi] = (new_syms, c)
            for pa, pb in zip(new_syms, new_syms[1:]):
                pair_counts[(pa, pb)] += c
                pair_words[(pa, pb)].add(wi)
    return merges


def bpe_train(
    df: DataFrame,
    content_col: str,
    n_merges: int = 1000,
    max_words: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Learn an ordered BPE merge list from a document corpus.

    One distributed word-count pass (the only corpus-sized work), then
    the driver's indexed merge loop over the count-capped vocabulary —
    see the module docstring for why this is the scalable split.
    Deterministic: the vocabulary cap orders by (count desc, word asc)
    and merge ties break to the lexicographically greatest pair."""
    wc = (
        df.select(F.explode(tokens(F.col(content_col))).alias("__w"))
        .where(F.col("__w") != "")
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__c"))
        .orderBy(F.col("__c").desc(), F.col("__w").asc())
        .limit(max_words)
        .collect()
    )
    return _learn_merges([(r["__w"], r["__c"]) for r in wc], n_merges)


def _bpe_schema(id_field: StructField) -> StructType:
    """Output schema keyed by the CALLER'S id column (name and type):
    the old hardcoded ``doc_id long`` crashed the Arrow pass for
    string/UUID ids and silently renamed everyone's id column (r10
    review find)."""
    return StructType(
        [
            id_field,
            StructField("bpe_tokens", ArrayType(StringType()), True),
            StructField("n_bpe_tokens", IntegerType(), False),
        ]
    )


# The default-id shape, kept for callers/tests that reference it.
BPE_SCHEMA = _bpe_schema(StructField("doc_id", LongType(), False))


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(word) + [END]
    while len(syms) > 1:
        best = None
        bi = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best):
                best, bi = r, i
        if best is None:
            break
        syms[bi : bi + 2] = [syms[bi] + syms[bi + 1]]
    return syms


def bpe_encode(
    df: DataFrame,
    content_col: str,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, bpe_tokens, n_bpe_tokens) — tokenize each document with
    the learned merges (greedy lowest-rank-first per word, the GPT-2
    apply rule).  One Arrow-batched ``mapInPandas`` pass; the merge
    ranks ride the task closure (KBs–MBs, an index parameter) and a
    per-batch word→tokens cache exploits Zipf's law."""
    import pandas as pd

    ranks = {tuple(p): i for i, p in enumerate(merges)}
    id_field = StructField(
        id_col, df.schema[id_col].dataType, df.schema[id_col].nullable
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            ids, toks_col, counts = [], [], []
            for did, text in zip(pdf[id_col], pdf[content_col]):
                toks: list[str] = []
                # split(" ") to match tokens()'s F.split(c, " ") exactly
                for w in (text or "").split(" "):
                    if not w:
                        continue
                    got = cache.get(w)
                    if got is None:
                        got = _encode_word(w, ranks)
                        if len(cache) < 1_000_000:
                            cache[w] = got
                    toks.extend(got)
                ids.append(did)
                toks_col.append(toks)
                counts.append(len(toks))
            yield pd.DataFrame(
                {
                    # the id rides through untyped (object): Arrow
                    # validates it against the caller's actual id type
                    # — the old int64 coercion crashed string ids
                    id_col: pd.Series(ids, dtype=object),
                    "bpe_tokens": pd.Series(toks_col, dtype=object),
                    "n_bpe_tokens": pd.Series(counts, dtype="int32"),
                }
            )

    return df.select(F.col(id_col), F.col(content_col)).mapInPandas(
        run, schema=_bpe_schema(id_field)
    )
