"""Single-pass column profiling — the data-quality gate a pipeline
runs before training on a new drop: row/null/distinct counts plus
numeric ranges per column, as one DataFrame.

Shape: ONE wide aggregate row over one scan (Catalyst plans the
multi-DISTINCT via Expand — n_cols copies of the projected row, still
a single pass over the files, partial→final), then an unpivot
(``stack``) to long (column, metrics) form. Nothing touches the
driver except the final n_cols-row result.

At 100 TB exact distinct counts are the expensive part (Expand
multiplies shuffle volume by the column count); ``approx=True`` swaps
in HyperLogLog ``approx_count_distinct`` which aggregates without
Expand. The exact form is the oracle-checkable default.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def column_profile(
    df: DataFrame, cols: list[str], approx: bool = False
) -> DataFrame:
    """Profile ``cols`` of ``df``: one output row per column with
    n_rows, n_null, n_distinct (exact by default), and min/max cast to
    double for numeric columns (NULL for non-numeric — lexicographic
    string ranges are rarely what a pipeline wants to gate on)."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        nd = (
            F.approx_count_distinct(c) if approx else F.countDistinct(c)
        ).cast("long")
        aggs.append(F.count(c).cast("long").alias(f"__nn_{c}"))
        aggs.append(nd.alias(f"__nd_{c}"))
        if isinstance(df.schema[c].dataType, NumericType):
            aggs.append(F.min(F.col(c).cast("double")).alias(f"__min_{c}"))
            aggs.append(F.max(F.col(c).cast("double")).alias(f"__max_{c}"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"__min_{c}"))
            aggs.append(F.lit(None).cast("double").alias(f"__max_{c}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __n - __nn_{c}, __nd_{c}, __min_{c}, __max_{c}" for c in cols
    )
    return wide.selectExpr(
        "__n as n_rows",
        f"stack({len(cols)}, {stack_args}) as "
        "(col_name, n_null, n_distinct, min_val, max_val)",
    ).select(
        "col_name",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_null").cast("long").alias("n_null"),
        "n_distinct",
        "min_val",
        "max_val",
    )
