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

import warnings

from pyspark.sql import DataFrame

# One warning per session: reliable checkpoint data is NEVER deleted by
# Spark unless spark.cleaner.referenceTracking.cleanCheckpoints=true
# (default false) — the ContextCleaner then removes a frame's
# checkpoint files when the frame is garbage collected.  Without it, a
# long-lived cluster session accumulates corpus-scale files in the
# checkpoint dir (the disk analog of the r9 persist leak).  The config
# is read at SparkContext creation, so it cannot be repaired here —
# warn loudly instead (r11 ADVICE).
_warned_no_cleanup = False


def stable_checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """``df.checkpoint()`` when the session has a checkpoint dir,
    else ``df.localCheckpoint()`` (single-machine fast path).

    Deployments that set a checkpoint dir should ALSO set
    ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` at
    session build time so released frames free their checkpoint files;
    a one-time warning fires otherwise."""
    global _warned_no_cleanup
    sc = df.sparkSession.sparkContext
    try:
        has_dir = sc.getCheckpointDir() is not None
    except Exception:
        has_dir = False
    if has_dir:
        if not _warned_no_cleanup:
            clean = (
                sc.getConf()
                .get("spark.cleaner.referenceTracking.cleanCheckpoints", "false")
                .lower()
            )
            if clean != "true":
                _warned_no_cleanup = True
                warnings.warn(
                    "a checkpoint dir is configured but spark.cleaner."
                    "referenceTracking.cleanCheckpoints is false: reliable "
                    "checkpoint files are never deleted and will accumulate "
                    "for the session's lifetime. Set the config to true at "
                    "session build time (it is read at SparkContext "
                    "creation).",
                    RuntimeWarning,
                    stacklevel=2,
                )
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
