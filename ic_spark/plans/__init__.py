"""Plan-level utilities: deterministic task scheduling, plan inspection."""

from ic_spark.plans.scheduling import split_n_groups

__all__ = ["split_n_groups"]
