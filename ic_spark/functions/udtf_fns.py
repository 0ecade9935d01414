"""Python UDTF surface (SURVEY.md §2.2 "UDF/UDAF/UDTF"): a
table-valued function fanning one document row out to N sentence rows.

UDTFs (Spark 4) run Python per input row and yield output rows; like
all Python-row paths they are the slow lane — the production-scale
equivalent of this exact split is the pure-expression
``posexplode(split(...))`` (see ``text_chunk_documents``).  The UDTF
exists to pin the surface: registration, lateral join, and row fan-out
semantics, oracle-checked through an aggregate.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf

# Explicit ASCII whitespace class, NOT \s: Python's \s (and .strip())
# cover Unicode whitespace while RE2's \s and DuckDB's trim() are
# ASCII/space-only, so the engines diverged on any tab/newline-bearing
# text (r10 review find).  One spelling, used by both split and trim.
_ASCII_WS = " \t\r\n\f\v"
_SENT_RE = re.compile(r"[.!?]+[ \t\r\n\f\v]+")


@udtf(returnType="idx int, sentence string")
class SentenceSplit:
    """Emit (1-based idx, trimmed sentence) for each non-empty sentence
    of ``text``, splitting on runs of ``.!?`` followed by ASCII
    whitespace — a trailing terminator stays attached to the final
    sentence, exactly like the oracle's ``regexp_split_to_array`` on
    the same pattern."""

    def eval(self, text: str):
        if text is None:
            return
        idx = 0
        for part in _SENT_RE.split(text):
            part = part.strip(_ASCII_WS)
            if part:
                idx += 1
                yield idx, part


def register_sentence_split(spark: SparkSession, name: str = "sentence_split"):
    """Register the UDTF for SQL lateral use:
    ``SELECT d.doc_id, s.* FROM documents d, LATERAL sentence_split(d.text) s``
    """
    spark.udtf.register(name, SentenceSplit)
    return name
