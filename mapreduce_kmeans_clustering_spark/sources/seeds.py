"""Centroid/seed side-file source (reference operator O2) and seed
derivation for scale runs.

The reference loads the centroid list whole into each mapper's memory
in ``setup()`` and accepts two encodings (Task2.java:52-93): initial
``x,y,z`` CSV (id = line index) and prior-iteration ``id\\tx,y,z`` TSV
(tab detect at Task2.java:62). Malformed lines are skipped with a
warning (Task2.java:84-89). SilhouetteEvaluation2.java:65 additionally
strips a ``"; point; point; ..."`` member-list suffix.

K is tiny (the centroid relation is K rows), so the idiomatic Spark
shape is driver-side parse + literal/broadcast — the distribution role
of Hadoop's side-file channel is played by Spark's broadcast (O3).
"""

from __future__ import annotations

import sys
from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_kmeans_clustering_spark import schemas


class Centroid(NamedTuple):
    id: int
    x: float
    y: float
    z: float


def _parse_line(line: str, line_index: int) -> Centroid | None:
    """Dual-format tolerant parse of one seed line (Task2.java:52-93)."""
    line = line.strip()
    if not line:
        return None
    try:
        if "\t" in line:
            # iteration-output format: id \t x,y,z[; member; member...]
            key, value = line.split("\t", 1)
            value = value.split(";", 1)[0]  # SilhouetteEvaluation2.java:65
            parts = value.strip().split(",")
            if len(parts) != 3:  # 3-field guard, Task2.java:77
                raise ValueError(f"expected 3 coords, got {len(parts)}")
            return Centroid(int(key.strip()), *(float(p.strip()) for p in parts))
        parts = line.split(",")
        if len(parts) != 3:
            raise ValueError(f"expected 3 coords, got {len(parts)}")
        return Centroid(line_index, *(float(p.strip()) for p in parts))
    except (ValueError, IndexError) as exc:
        # tolerant skip with warning, Task2.java:84-89
        print(f"WARN: skipping malformed seed line {line!r}: {exc}", file=sys.stderr)
        return None


def load_seeds(path: str) -> list[Centroid]:
    """Driver-side load of a seed file in either reference format.

    For the CSV format, id = index among *valid* lines, matching the
    reference's post-skip ``centroids.size()`` indexing.
    """
    out: list[Centroid] = []
    with open(path) as fh:
        for raw in fh:
            c = _parse_line(raw, len(out))
            if c is not None:
                out.append(c)
    return out


def seeds_df(spark: SparkSession, centroids: list[Centroid]) -> DataFrame:
    """K-row centroid DataFrame (for join-based operators / oracles)."""
    return spark.createDataFrame(
        [(int(c.id), float(c.x), float(c.y), float(c.z)) for c in centroids],
        schema=schemas.SEEDS,
    )


def seeds_from_points(points: DataFrame, k: int) -> list[Centroid]:
    """Deterministic K seeds from a points relation (scale runs,
    FIXTURES.md §5): order rows by ``(rid % 997, rid)`` — a fixed
    pseudo-spread that needs no RNG — and take the first K distinct
    coordinate triples. Collects exactly K rows to the driver.
    """
    rows = (
        points.select("rid", "x", "y", "z")
        .orderBy((F.col("rid") % 997).asc(), F.col("rid").asc())
        .limit(k * 4)  # small over-fetch in case of duplicate coords
        .collect()
    )
    seen: set[tuple[float, float, float]] = set()
    out: list[Centroid] = []
    for r in rows:
        key = (r["x"], r["y"], r["z"])
        if key in seen:
            continue
        seen.add(key)
        out.append(Centroid(len(out), r["x"], r["y"], r["z"]))
        if len(out) == k:
            break
    if len(out) < k:
        raise ValueError(f"could not find {k} distinct seed points")
    return out
