"""Measured-size broadcast gating for relations that are data-sized in the
worst case (graph frontiers / reached rank tables / per-entity lookup
tables).

An unconditional ``F.broadcast`` hint on such a relation is the scale
hazard the round-6/7 audits removed repeatedly (MaxSim group sizes, the
sparse-cosine norm table, item popularity): the relation grows with the
corpus, so at 100 TB the hint ships an unbounded table to every executor.
But the hint is also what keeps iterative loops from re-shuffling a
data-sized edge set every round while the working set IS small (early BFS
hops, a PPR neighborhood). The resolution is to MEASURE: broadcast only
below a fixed row bound, else let the join shuffle.

``BCAST_MAX_ROWS`` is 4M rows ≈ 64 MB of (long, double) pairs — small
against any sane executor heap (Spark's hard broadcast-table limit is
8 GB; the default auto-broadcast threshold of 10 MB is tuned for scans
whose row width is unknown, while these gated tables are two narrow
columns). Above the bound the shuffle join is the same per-round cost
global PageRank pays, and on a real cluster it spills per-task; the bound
exists so no single table ever has to fit one JVM.

The plan-audit gate (tests/test_registry_plan_audit.py) treats
``maybe_broadcast`` as safe by construction: the hint only fires under
the measured bound. Callers must pass a row count MEASURED from the same
relation (or a provable upper bound of it, e.g. the dimension table's
count for a table keyed by that dimension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Row bound under which a narrow (key, value) relation broadcasts.
BCAST_MAX_ROWS = 4_000_000


def maybe_broadcast(df: DataFrame, n_rows: int) -> DataFrame:
    """``F.broadcast(df)`` while ``n_rows`` (a measured count or a provable
    upper bound on df's rows) stays under ``BCAST_MAX_ROWS``; df unchanged
    otherwise, letting the optimizer shuffle the join."""
    return F.broadcast(df) if n_rows <= BCAST_MAX_ROWS else df
