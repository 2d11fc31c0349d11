"""Grouped OLS (q_revenue_trend): the quantized integer-moment
formula must agree with a float least-squares fit — the oracle only
proves Spark==DuckDB of the same expression; this pins that the
expression IS ordinary least squares."""

from __future__ import annotations

from collections import defaultdict

import duckdb
import numpy as np

from tests.conftest import TESTDATA

SF = f"{TESTDATA}/sf0.001"


def test_trend_matches_numpy_polyfit(spark):
    from mapreduce_kmeans_clustering_spark.queries_pipeline import (
        q_revenue_trend,
    )

    got = {r["nationkey"]: r for r in q_revenue_trend(spark, SF).collect()}
    assert len(got) >= 20
    monthly = duckdb.sql(
        f"""
        SELECT c_nationkey,
               ((year(o_orderdate)-1995)*12 + (month(o_orderdate)-1)) AS x,
               sum(CAST(round(o_totalprice*100) AS BIGINT)) AS y
        FROM '{SF}/orders.parquet'
        JOIN '{SF}/customer.parquet' ON o_custkey = c_custkey
        GROUP BY 1, 2"""
    ).fetchall()
    pts = defaultdict(list)
    for nk, x, y in monthly:
        pts[nk].append((float(x), float(y)))
    for nk, row in got.items():
        xs = np.array([p[0] for p in pts[nk]])
        ys = np.array([p[1] for p in pts[nk]])
        slope, intercept = np.polyfit(xs, ys, 1)
        r = np.corrcoef(xs, ys)[0, 1]
        assert abs(row["slope_q6"] - slope) < 1e-3 * max(1.0, abs(slope)), nk
        assert abs(row["intercept_q6"] - intercept) < 1e-3 * max(
            1.0, abs(intercept)
        ), nk
        assert abs(row["r2_q6"] - r * r) < 1e-6, nk
        assert 0.0 <= row["r2_q6"] <= 1.0 + 1e-9
