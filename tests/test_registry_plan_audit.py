"""Registry-WIDE physical-plan anti-pattern gates.

tests/test_plans_audit.py asserts the right plan for ~60 named queries;
these two tests instead sweep the ENTIRE registry so a scale anti-pattern
cannot slip in through any future query:

1. No single-partition global-window chain (``Window <- Sort <- Exchange
   SinglePartition``) over a data-bearing relation. A small allowlist names
   the queries where the windowed relation is provably bounded (calendar
   spine, lifetable, histogram bins, per-source quota) or an explicitly
   documented dimension-sized aggregate.
2. No row-at-a-time Python UDFs anywhere in the package source — only
   Arrow-vectorized forms (pandas_udf / mapInPandas / applyInPandas /
   cogroup / UDTF) are allowed on the Python path.
"""

from __future__ import annotations

import pathlib
import re

from cbde_mapreduce_spark.plans import REGISTRY

#: Window <- Sort <- Exchange SinglePartition adjacency in the executed
#: plan's tree rendering (child printed under parent).
_SP_WINDOW = re.compile(
    r"Window[^\n]*\n[^\n]*Sort[^\n]*\n[^\n]*Exchange SinglePartition"
)

#: Queries whose global-order window runs over a BOUNDED relation — the
#: window input is O(calendar) / O(bins) / O(lifetable), or a documented
#: dimension-sized aggregate (see each query's docstring):
_BOUNDED_WINDOW_OK = {
    "cumulative_distinct_users",  # day spine
    "expected_clv_curve",  # lifetable (distinct 30-day durations) + 24 months
    "kaplan_meier_customers",  # lifetable
    "ks_binned_order_drift",  # fixed histogram bins
    "largest_remainder_quota",  # per-source quota rows
    "monthly_revenue_growth",  # month spine
    "seasonal_decompose_daily",  # day spine
    # (round 4 closed the list: abc_analysis_parts and
    # gini_customer_revenue — the last dimension-sized offenders — were
    # rewritten onto exclusive_prefix_sum; only genuinely bounded
    # relations remain above.)
}


def test_no_single_partition_window_anywhere(spark, sf_smoke):
    """Sweep every registered query's executed plan at sf0.001."""
    offenders: dict[str, int] = {}
    for name, spec in sorted(REGISTRY.items()):
        if name in _BOUNDED_WINDOW_OK:
            continue
        df = spec.fn(spark, sf_smoke)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        hits = _SP_WINDOW.findall(plan)
        if hits:
            offenders[name] = len(hits)
    assert not offenders, (
        f"single-partition global windows outside the bounded allowlist: "
        f"{offenders}"
    )


def test_bounded_window_allowlist_is_not_stale():
    """Names in the allowlist must exist (catch renames silently widening
    the gate)."""
    missing = _BOUNDED_WINDOW_OK - set(REGISTRY)
    assert not missing, missing


def test_no_row_at_a_time_python_udf_in_package():
    """Only Arrow-batched Python execution paths are allowed; a plain
    ``F.udf`` / ``@udf`` row-at-a-time UDF is the 10-100x slow path."""
    pkg = pathlib.Path(__file__).resolve().parents[1] / "cbde_mapreduce_spark"
    bad: list[str] = []
    for py in sorted(pkg.rglob("*.py")):
        src = py.read_text()
        for i, line in enumerate(src.splitlines(), 1):
            code = line.split("#")[0]
            if re.search(r"\bF\.udf\s*\(|^\s*@udf\b|[^_\w]udf\s*\(", code):
                # allow the vectorized/table-function forms
                if re.search(r"pandas_udf|udtf|_udf_profiler", code):
                    continue
                bad.append(f"{py.name}:{i}: {line.strip()}")
    assert not bad, f"row-at-a-time UDFs found: {bad}"
