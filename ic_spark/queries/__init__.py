"""Declared query surface: every entry pairs a Spark DataFrame query
with its ANSI-SQL DuckDB oracle (SURVEY.md §2 inventory).

Importing this package populates the registry.
"""

from ic_spark.queries.registry import REGISTRY, Query, query

# Import for side effect: each module registers its queries.
from ic_spark.queries import tpch  # noqa: F401
from ic_spark.queries import tpch2  # noqa: F401
from ic_spark.queries import analytics  # noqa: F401
from ic_spark.queries import analytics2  # noqa: F401
from ic_spark.queries import mor  # noqa: F401
from ic_spark.queries import llm  # noqa: F401
from ic_spark.queries import llm2  # noqa: F401

__all__ = ["REGISTRY", "Query", "query"]
