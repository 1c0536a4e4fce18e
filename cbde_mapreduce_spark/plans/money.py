"""Exact-integer money arithmetic for oracled aggregates (round-11 sweep).

THE RULE (SCALING.md round-10 addendum; VERDICT r10 "Next round" #1):
a rounded double sum/avg of a monetary column is a run-nondeterministic
coin flip whenever the true value sits within the engines' ulp spread of
a rounding-grid boundary — Spark's partial-aggregate merge order varies
with task scheduling, DuckDB's with its own morsel order, and the two
never have to agree (three different names flaked on three passes over
the SAME corpus in round 10). So money NEVER rides a rounded double sum:

1. Per-row exact integer units: ``round(x * 100)::bigint`` (every
   monetary fixture column is cents-quantized — verified on all SFs:
   o_totalprice / c_acctbal / s_acctbal / l_extendedprice /
   p_retailprice / events.value; l_discount and l_tax are
   percent-quantized, i.e. ``round(d * 100)`` is exact). The single
   IEEE multiply-and-round of a cents-quantized double lands >= 1e-4
   away from any half-integer tie, so it is engine-identical.
2. Exact order-independent integer sums. Plain cents ride bigint
   (int64 overflows only past ~9e16 dollars — beyond 100 TB TPC-H).
   PRODUCT units (extendedprice*(1-discount) scaled by 1e4, *(1+tax)
   by 1e6, value*duration_us, ...) are cast to ``decimal(38,0)``
   per-row BEFORE the sum: a global charge sum in bigint units would
   overflow int64 around sf1500 already, while decimal(38,0) sums are
   exact in both engines to 1e38.
3. ONE deterministic float division chain at the end, identical
   textually on both engine sides (bigint/decimal -> double conversion
   of the same exact integer is IEEE round-to-nearest in both engines),
   then the final ``round(..., nd)``.

Per-row TRANSCENDENTAL transforms of money (ln, exp-decay weights) are
deterministic per row on each engine run-to-run; only their double SUM
is order-dependent. Those sites quantize the per-row double to a fixed
fine grid (bigint units) before summing, which removes the
run-nondeterminism by construction. The residual cross-engine risk is a
last-ulp libm (JVM Math vs C libm) disagreement landing exactly at a
half-grid boundary: for a value of magnitude m on grid g the per-row
flip window is ~2 ulp wide, probability ≈ 4.4e-16·m/g per row IF the
engines' libm differ at that argument at all — ln @1e9 (m≈10) ≈ 4e-6,
exp-decay @1e6 (m≈500) ≈ 2e-7, pow residual @1e16 essentially 0 (a
single IEEE multiply, exactly reproducible). Since round 12 this is
asserted at the ROW level, not just sampled through aggregates:
plans/rowlevel.py compares the quantized integers row by row for one
site per family on every fixture (tests/test_money_rowlevel.py) and on
every rolled dup corpus (tools_dup_value_sweep.py), so a libm
divergence is caught at the exact row it occurs on (ADVICE r11). The
probes' first run PROVED the class is real: the KL@1e15 ratio family
(p·ln(p/q) with ln arguments near 1 — the densest grid relative to
value) hit the boundary once at sf0.01 (one cell, exactly 1 grid unit).
That family's production aggregate is insulated by construction — the
final round(Σ/1e15, 6) has a 0.5e-6 margin against ±1e-15 unit flips,
and each engine's own integer sum stays order-exact — so its probe is a
BOUNDED monitor (|diff| <= 1 unit, few cells) rather than exact; the
ln/entropy/exp/pow families remain row-exact-asserted.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column | str) -> Column:
    """Per-row exact integer cents of a cents-quantized double column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("bigint")


def pct(col: Column | str) -> Column:
    """Per-row exact integer percent of a percent-quantized double
    (l_discount / l_tax: 0.00-0.10 in 0.01 steps)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("bigint")


def sum_money(col: Column | str, nd: int = 2) -> Column:
    """round(sum(cents)/100.0, nd) — exact bigint sum, one division.

    SQL twin: ``round(sum(round(x * 100)::bigint) / 100.0, nd)``.
    """
    return F.round(F.sum(cents(col)) / F.lit(100.0), nd)


def avg_money(col: Column | str, nd: int = 2) -> Column:
    """round(sum(cents)/100.0/count(x), nd) — exact sum, one division
    chain. SQL twin:
    ``round(sum(round(x*100)::bigint) / 100.0 / count(x), nd)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(cents(c)) / F.lit(100.0) / F.count(c), nd)


def disc_units(ep: Column | str = "l_extendedprice",
               d: Column | str = "l_discount") -> Column:
    """extendedprice*(1-discount) as exact integer 1e-4-dollar units,
    decimal(38,0) so the sum never overflows at scale.

    SQL twin: ``(round(l_extendedprice*100)::bigint
                 * (100 - round(l_discount*100)::bigint))::decimal(38,0)``.
    """
    return (cents(ep) * (F.lit(100) - pct(d))).cast("decimal(38,0)")


def charge_units(ep: Column | str = "l_extendedprice",
                 d: Column | str = "l_discount",
                 t: Column | str = "l_tax") -> Column:
    """extendedprice*(1-discount)*(1+tax) as exact integer 1e-6-dollar
    units, decimal(38,0).

    SQL twin: ``(round(l_extendedprice*100)::bigint
                 * (100 - round(l_discount*100)::bigint)
                 * (100 + round(l_tax*100)::bigint))::decimal(38,0)``.
    """
    return (
        cents(ep) * (F.lit(100) - pct(d)) * (F.lit(100) + pct(t))
    ).cast("decimal(38,0)")


def promo_units(ep: Column | str = "l_extendedprice",
                d: Column | str = "l_discount") -> Column:
    """extendedprice*discount as exact integer 1e-4-dollar units.

    SQL twin: ``(round(l_extendedprice*100)::bigint
                 * round(l_discount*100)::bigint)::decimal(38,0)``.
    """
    return (cents(ep) * pct(d)).cast("decimal(38,0)")


def sum_units(units: Column, scale: int, nd: int = 2) -> Column:
    """round(sum(units)::double / 10^scale, nd) — the one float step.

    SQL twin: ``round(sum(u)::double / 1e{scale}, nd)``.
    """
    return F.round(
        F.sum(units).cast("double") / F.lit(float(10 ** scale)), nd
    )
