"""Grouped isotonic regression (pool-adjacent-violators) — monotone
calibration of an empirical rate curve, per group.

The model-calibration primitive (Zadrozny & Elkan KDD'02): fit the
best nondecreasing step function to (x, successes/trials) points
under weighted least squares. PAV is inherently sequential WITHIN a
group, so this is the textbook `applyInPandas` case (SURVEY §7's
"custom operator" ladder rung b): groups are independent, each
group's point count is small (bucketed x), and the per-group state
is a block stack — exactly what a Pandas UDF over a grouped Arrow
batch expresses. The cross-engine contract stays exact: block
ratios are compared by INTEGER cross-multiplication (no float
compares anywhere in the pooling), and the fitted value is one
num/den double division per block — the same division the minimax
characterization ŷ_i = max_{j<=i} min_{k>=i} mean(y_j..y_k)
evaluates in the DuckDB oracle (monotone IEEE rounding preserves
the max/min identity, so the doubles agree bit-for-bit).

Plan shape: one shuffle on the group key into FlatMapGroupsInPandas;
a group is processed by one task — group cardinality is the
parallelism knob, block state is O(points per group).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def isotonic_fit(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    num_col: str,
    den_col: str,
) -> DataFrame:
    """Per-group weighted isotonic fit over integer (num, den) rate
    points. Input: one row per (group, x) with success count ``num``
    and trial count ``den``. Output: the input columns plus ``y_hat``
    (the fitted nondecreasing rate, raw double — callers round)."""
    import pandas as pd

    out_fields = ", ".join(
        f"{c} {t}"
        for c, t in zip(
            group_cols + [x_col, num_col, den_col, "y_hat"],
            [dict(df.dtypes)[c] for c in group_cols]
            + [
                dict(df.dtypes)[x_col],
                dict(df.dtypes)[num_col],
                dict(df.dtypes)[den_col],
                "double",
            ],
        )
    )

    def pav(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(x_col).reset_index(drop=True)
        # block stack: [num, den, n_rows]; merge while the previous
        # block's rate >= the new block's rate (integer cross-mult —
        # exact, no float ordering anywhere in the pooling)
        blocks: list[list[int]] = []
        for _, row in pdf.iterrows():
            blocks.append([int(row[num_col]), int(row[den_col]), 1])
            while (
                len(blocks) >= 2
                and blocks[-2][0] * blocks[-1][1]
                >= blocks[-1][0] * blocks[-2][1]
            ):
                n2, d2, c2 = blocks.pop()
                blocks[-1][0] += n2
                blocks[-1][1] += d2
                blocks[-1][2] += c2
        y = []
        for bn, bd, bc in blocks:
            y.extend([bn / bd] * bc)
        pdf["y_hat"] = y
        return pdf

    return df.groupBy(*group_cols).applyInPandas(pav, out_fields)
