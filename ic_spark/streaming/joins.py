"""Streaming joins: stream-static enrichment and watermarked
stream-stream interval joins.

The reference is batch-only; this is the Structured Streaming slice of
the declared engine surface (SURVEY.md §2.2).  The state-boundedness
rules are the design core:

- **stream-static**: the static side is a plain DataFrame — Spark
  rebroadcasts it per micro-batch, no streaming state at all.
- **stream-stream**: BOTH sides must be watermarked and the join
  condition must bound event-time distance; Spark then expires buffered
  rows once the watermark passes the bound.  Without the time-range
  predicate the state store grows forever — at production ingest rates
  that is the failure mode, so the API here makes the bound mandatory.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def stream_static_join(
    stream: DataFrame, static: DataFrame, on: list[str] | str, how: str = "inner"
) -> DataFrame:
    """Per-micro-batch enrichment join against a static table (no
    streaming state; the static side follows normal broadcast rules)."""
    return stream.join(static, on=on, how=how)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    max_delay: str = "30 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on ``key`` where the right event happened within
    ``[left_time - max_delay, left_time]``.

    Both sides are watermarked and the range predicate is part of the
    join condition — the two requirements for Spark to expire join
    state.  State held per key ≈ rows within (watermark + max_delay) of
    the frontier, independent of total stream length.
    """
    lw = left.withWatermark(left_time, watermark)
    rw = right.withWatermark(right_time, watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_time] >= lw[left_time] - F.expr(f"INTERVAL {max_delay}"))
        & (rw[right_time] <= lw[left_time])
    )
    joined = lw.join(rw, cond, how)
    # Collapse the duplicated key like `on=<name>` would.  COALESCE, not
    # lw[key]: under rightOuter/fullOuter an unmatched right row has a
    # NULL left side, and emitting only lw[key] would drop the event's
    # actual key (r9 review find — downstream consumers could not
    # attribute the unmatched event).
    return joined.select(
        F.coalesce(lw[key], rw[key]).alias(key),
        *[lw[c] for c in left.columns if c != key],
        *[rw[c] for c in right.columns if c != key],
    )
