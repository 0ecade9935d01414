"""Every registry query must run in a DRIVER-OWNED session.

The correctness driver builds its own SparkSession with stock confs —
Spark 4 defaults ANSI ON (overflow/cast errors instead of permissive
wraparound), and none of the engine's session tuning is present.  The
engine may only rely on confs it can set at runtime on any session
(``tables.ensure_session_confs``).  This sweep executes the FULL
registry under an ANSI-on session; an overflow or strict-cast bug
anywhere surfaces here instead of in the driver's report.
"""

from __future__ import annotations

import pytest
from ic_spark.queries import REGISTRY

# sf0.01, not the tests' default sf0.001: overflow/strict-cast bugs are
# data-dependent and the driver checks at sf0.01.
SWEEP_SF_DIR = "/root/testdata/sf0.01"


@pytest.mark.slow
def test_full_registry_runs_under_ansi_session(spark):
    ns = spark.newSession()
    ns.conf.set("spark.sql.ansi.enabled", "true")
    failures = []
    for name, q in REGISTRY.items():
        try:
            assert q.fn(ns, SWEEP_SF_DIR).count() >= 0
        except Exception as exc:  # noqa: BLE001 — collect all, report once
            failures.append(f"{name}: {type(exc).__name__}: {str(exc)[:200]}")
    assert not failures, "ANSI-session failures:\n" + "\n".join(failures)
