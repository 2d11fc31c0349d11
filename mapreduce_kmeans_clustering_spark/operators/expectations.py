"""Data-contract validation — the expectations gate (dbt-tests /
Great-Expectations shape) a pipeline runs before promoting a drop:
declare rules, get one row per rule with its violation count.

Rule forms (tuples):
  ("not_null", col)
  ("between", col, lo, hi)        # inclusive bounds
  ("in_set", col, [v, ...])
  ("regex", col, pattern)         # full-match not required; rlike
  ("unique", col)                 # duplicate value count
  ("fk", col, other_df, other_col)  # orphan rows (anti semi-join)

Physical shape: every ROW-level rule folds into ONE wide aggregate
over ONE scan (a violation is a 0/1 projection summed map-side).
"unique" adds a count-distinct on the same scan; each "fk" costs one
anti-join against the referenced keys (the join AQE sizes). Nothing
row-scale reaches the driver — the report is n_rules rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _violation(df: DataFrame, rule: tuple) -> Column:
    kind = rule[0]
    if kind == "not_null":
        return F.col(rule[1]).isNull().cast("long")
    if kind == "between":
        _, c, lo, hi = rule
        v = F.col(c)
        return (v.isNull() | (v < F.lit(lo)) | (v > F.lit(hi))).cast("long")
    if kind == "in_set":
        _, c, vals = rule
        return (~F.col(c).isin(list(vals))).cast("long")
    if kind == "regex":
        _, c, pat = rule
        return (~F.coalesce(F.col(c), F.lit("")).rlike(pat)).cast("long")
    raise ValueError(f"unknown row-level rule: {rule!r}")


def rule_name(rule: tuple) -> str:
    kind = rule[0]
    if kind == "fk":
        return f"fk:{rule[1]}"
    if kind in ("between", "in_set", "regex"):
        return f"{kind}:{rule[1]}"
    return f"{kind}:{rule[1]}"


def expect(df: DataFrame, rules: list[tuple]) -> DataFrame:
    """Violation report: (rule STRING, n_violations LONG), one row per
    rule, ordered as declared is NOT guaranteed (sort on rule)."""
    row_rules = [r for r in rules if r[0] not in ("unique", "fk")]
    uniq_rules = [r for r in rules if r[0] == "unique"]
    fk_rules = [r for r in rules if r[0] == "fk"]

    reports: list[DataFrame] = []
    if row_rules or uniq_rules:
        aggs = [
            F.sum(_violation(df, r)).cast("long").alias(rule_name(r))
            for r in row_rules
        ]
        for r in uniq_rules:
            aggs.append(
                (F.count(F.col(r[1])) - F.countDistinct(F.col(r[1])))
                .cast("long")
                .alias(rule_name(r))
            )
        wide = df.agg(*aggs)
        names = [rule_name(r) for r in row_rules + uniq_rules]
        stack = ", ".join(f"'{n}', `{n}`" for n in names)
        reports.append(
            wide.selectExpr(
                f"stack({len(names)}, {stack}) as (rule, n_violations)"
            )
        )
    for r in fk_rules:
        _, c, other, other_col = r
        # NULL contract (pinned so the Spark check and any SQL twin
        # agree even if the data ever gains NULL keys): a NULL FK is
        # NOT an orphan (that's a not_null rule's job), and NULLs in
        # the referenced column match nothing. Both sides filtered
        # explicitly — a bare NOT IN oracle would collapse to 0
        # violations the moment either side held a NULL, silently.
        orphans = df.select(F.col(c).alias("__k")).where(
            F.col("__k").isNotNull()
        ).join(
            other.select(F.col(other_col).alias("__k"))
            .where(F.col("__k").isNotNull())
            .distinct(),
            "__k",
            "left_anti",
        )
        reports.append(
            orphans.agg(F.count("*").cast("long").alias("n_violations")).select(
                F.lit(rule_name(r)).alias("rule"), "n_violations"
            )
        )
    if not reports:
        raise ValueError("no rules given")
    out = reports[0]
    for rep in reports[1:]:
        out = out.unionAll(rep)
    return out
