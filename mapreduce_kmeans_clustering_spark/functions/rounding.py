"""The repo's cross-engine rounding contract, in ONE place.

Spark and DuckDB ``round(double, n)`` DISAGREE near .5 ties (proven by
the sf0.1 parity sweep on q_min_cost_supplier / q_text_quality —
SCALE.md §5), so every oracle-checked double is rounded with the same
explicit half-up floor chain on both engines:

    floor(x * 1e6 + 0.5) / 1e6          (DuckDB spelling identical)

``half_up6`` is the double form; ``half_up6_micro`` is the integer
MICRO-unit form (floor(x*1e6 + .5) as a long) used where per-row terms
must SUM order-independently — integer addition is associative, double
addition is not (the PSI / isotonic / DSIR recipe).

This module exists because the chain was load-bearing in four separate
module-local copies (code-review r11); edits to the contract now have
exactly one home.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def half_up(col: Column, digits: int) -> Column:
    """Half-up rounding of a computed double at ``digits`` decimals —
    the same floor chain at any grid (round 12: q_mix_epochs needed
    the 2-dp token grid alongside the 6-dp ratio grid)."""
    scale = F.lit(float(10 ** int(digits)))
    return F.floor(col * scale + F.lit(0.5)) / scale


def half_up6(col: Column) -> Column:
    """Half-up 6-dp rounding of a computed double."""
    return half_up(col, 6)


def half_up6_micro(col: Column) -> Column:
    """Half-up 6-dp grid as integer micro-units (long)."""
    return F.floor(col * F.lit(1000000.0) + F.lit(0.5)).cast("long")
