"""Deterministic size-balanced task grouping (LPT bin-packing).

Port of the reference's scheduler semantics
(``split_n_vecs``, core/src/executor/datafusion/iceberg_file_task_scan.rs:102-170):
distribute weighted tasks across k groups, always assigning the next
task to the currently-lightest group; ties broken by lowest group
index.  O(n log k) time, O(k) space, deterministic and order-stable —
the reference pins determinism with a 10,000-repetition test.

In Spark, input split packing is normally left to
``spark.sql.files.maxPartitionBytes`` bin-packing; this utility exists
for the compaction path where the reference's exact deterministic
grouping is part of the contract (per-group scan → per-group writer).
"""

from __future__ import annotations

import heapq
from collections.abc import Callable, Sequence
from typing import TypeVar

T = TypeVar("T")


def split_n_groups(
    tasks: Sequence[T],
    n: int,
    weight: Callable[[T], int],
) -> list[list[T]]:
    """Distribute ``tasks`` into ``n`` groups balancing total weight.

    Matches the reference's min-heap construction: heap entries ordered
    by (accumulated weight, group index) so equal-weight groups fill in
    index order — stable for any input order of equal-weight tasks.
    """
    if n <= 0:
        raise ValueError("n must be positive")
    groups: list[list[T]] = [[] for _ in range(n)]
    heap: list[tuple[int, int]] = [(0, i) for i in range(n)]
    heapq.heapify(heap)
    for task in tasks:
        total, idx = heapq.heappop(heap)
        groups[idx].append(task)
        heapq.heappush(heap, (total + weight(task), idx))
    return groups
