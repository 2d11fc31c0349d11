"""Distance/similarity column expressions.

The reference's only math is 3-D Euclidean distance via
``Math.sqrt(Math.pow(...))`` (Task1.java:42). These builders produce
pure Column expressions so the hot path stays inside whole-stage
codegen — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def euclidean_sq(ax: Column, ay: Column, az: Column, bx, by, bz) -> Column:
    """Squared 3-D Euclidean distance (monotonic proxy for argmin)."""
    dx, dy, dz = ax - bx, ay - by, az - bz
    return dx * dx + dy * dy + dz * dz


def euclidean(ax: Column, ay: Column, az: Column, bx, by, bz) -> Column:
    """3-D Euclidean distance, sqrt included (Task1.java:42 — the
    displacement metric at Task3.java:121-126 sums raw norms, so sqrt
    matters there)."""
    return F.sqrt(euclidean_sq(ax, ay, az, bx, by, bz))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<numeric> columns, JVM-side via
    zip_with + aggregate (no Python in the loop)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)
