"""Engine-portable rounding.

Spark's ``round(x, 4)`` rounds the exact decimal expansion of the double
(BigDecimal HALF_UP); DuckDB's computes ``round(x * 1e4) / 1e4`` in floating
point.  On values like 0.86154999... (whose *1e4 product lands exactly on a
.5 double) they disagree in the last digit — enough to break value-hash
parity.  Both engines agree on integer rounding (half away from zero), so we
pin the DuckDB formulation on BOTH sides: multiply, round to integer,
divide.  Every float-producing query output goes through this pair.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCALE = 10_000.0  # 4 decimal places


def round4(col: Column) -> Column:
    """Spark side of the portable 4-decimal round.  The trailing ``+ 0.0``
    canonicalizes IEEE negative zero (DuckDB's round emits -0.0 for small
    negatives; -0.0 + 0.0 == +0.0)."""
    return F.round(col * F.lit(SCALE), 0) / F.lit(SCALE) + F.lit(0.0)


def round4_sql(expr: str) -> str:
    """DuckDB side — textually identical computation."""
    return f"((round(({expr}) * 10000) / 10000) + 0.0)"


SCALE6 = 1_000_000.0  # 6 decimal places — used where a rounded value feeds a
# cross-engine ARGMAX (e.g. IVF cell assignment): both engines sum doubles in
# different orders, so raw similarities differ in the last ulps; rounding to
# 6 decimals before ranking makes the ranking engine-portable.


def round6(col: Column) -> Column:
    return F.round(col * F.lit(SCALE6), 0) / F.lit(SCALE6) + F.lit(0.0)


def round6_sql(expr: str) -> str:
    return f"((round(({expr}) * 1000000) / 1000000) + 0.0)"
