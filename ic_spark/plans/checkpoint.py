"""Plan-truncating checkpoint with cluster-grade fault tolerance when
available (VERDICT r10 #5).

Several operators must materialize an intermediate exactly once while
still letting the context cleaner release its blocks with the frame
(``localCheckpoint``, the r10 persist-leak fix).  But localCheckpoint
blocks are UNREPLICATED executor memory/disk: on a real cluster, losing
one executor mid-query fails the whole query instead of recomputing —
an availability caveat at the 100 TB north star.

``stable_checkpoint`` keeps the local[*] behavior byte-for-byte when no
checkpoint directory is configured, and silently upgrades to a RELIABLE
``checkpoint()`` (written to the configured HDFS/object-store dir,
survives executor loss) whenever the deployment has called
``sparkContext.setCheckpointDir`` — the standard cluster setup step.
No per-operator knob needed: the session's checkpoint dir IS the knob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def stable_checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """``df.checkpoint()`` when the session has a checkpoint dir,
    else ``df.localCheckpoint()`` (single-machine fast path)."""
    sc = df.sparkSession.sparkContext
    try:
        has_dir = sc.getCheckpointDir() is not None
    except Exception:
        has_dir = False
    if has_dir:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
