"""Engine-exact integer arithmetic helpers — the house parity rules.

Every hot aggregate in this engine runs on scaled BIGINT (micro/centi
units) and derives doubles only at the very end with identical expression
trees on both engines; these helpers are the shared primitives so the
formulas live in ONE place (they were previously duplicated inline in
star.py and text_q.py)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ha_micro(num: Column, den: Column) -> Column:
    """round-half-away((num/den) * 1e6) as exact integers, num/den >= 0.

    True integer division (IntegralDivide over decimal(38,0)) — NOT
    floor(a / b), whose double division loses bits past 2^53 and whose
    2*scaled would wrap BIGINT at large operand magnitudes.  Both engines
    compute the same exact quotient at any magnitude: the DuckDB oracle
    mirror is `(num * 2000000 + den) // (den * 2)` over HUGEINT."""
    n = num.cast("decimal(38,0)")
    d = den.cast("decimal(38,0)")
    return F.call_function("div", n * 2_000_000 + d, d * 2).cast("long")
