"""Query registry: name → (spark fn, oracle SQL).

The driver contract (``__spark_entry__.py``) and the test suite both
iterate this registry, so a query is declared exactly once and its
Spark and oracle forms stay adjacent.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    headline: bool = False  # include in bench.py


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, headline: bool = False):
    """Decorator registering a (spark, sf_dir) -> DataFrame callable."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, headline=headline)
        return fn

    return deco
