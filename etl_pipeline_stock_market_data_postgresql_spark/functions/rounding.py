"""Engine-portable rounding for double outputs.

Spark ROUND on doubles is half-up; DuckDB's is half-even. On exact ties
(the input double is precisely representable at the target digit) the
engines disagree by one ulp of the last kept digit — observed in
practice with dyadic-rational inputs (q31 at sf0.1). Both engines
evaluate ``floor(x * 10^d + 0.5) / 10^d`` identically on the same
double, so every rounded workload output uses this form on both sides.
(Half-up-toward-+inf for negatives — consistent cross-engine, which is
what matters.)
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def round_half_up(col: Column, digits: int) -> Column:
    factor = 10 ** digits
    return F.floor(col * factor + F.lit(0.5)) / factor


def round_half_up_sql(expr: str, digits: int) -> str:
    factor = 10 ** digits
    return f"floor(({expr}) * {factor} + 0.5) / {factor}"
