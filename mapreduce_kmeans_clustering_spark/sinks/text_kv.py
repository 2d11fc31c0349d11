"""Text sinks with reference output parity (operators O17, O18).

The reference writes ``key\\tvalue`` lines via TextOutputFormat plus a
``_SUCCESS`` marker (Task1.java:121; artifacts output/task1/). Spark's
HadoopMapReduceCommitProtocol emits the same ``_SUCCESS``.

Two coordinate formats: ``fmt='repr'`` (default — Python shortest
round-trip, numerically identical to Java's) and ``fmt='java'``
(``java_double_str`` — Java ``Double.toString`` layout, BYTE-identical
to the reference artifacts; since round 5 the golden tests pin every
committed centroid line of task1 and the full task5a chain verbatim).
Silhouette intra/inter sums remain numeric-compared (1e-9): their
O(n²) pair sums accumulate in distributed order, so the low bits
legitimately differ from the Java reducer's sequential sum — the
silhouette SCORE itself still matches byte-for-byte because the ratio
cancels the low-bit drift (SURVEY §7 hard part a).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_kmeans_clustering_spark.sources.seeds import Centroid, _parse_line


def _coord_str(v: float, fmt: str) -> str:
    if fmt == "java":
        return java_double_str(v)
    if fmt == "repr":
        return repr(v)
    raise ValueError(f"unknown coordinate format {fmt!r} (repr|java)")


def format_centroids_kv(centroids: list[Centroid], fmt: str = "repr") -> str:
    """Render the iteration-output format ``id\\tx,y,z`` (reducer emit
    Task1.java:97), id-sorted like the shuffle-sorted part file.
    ``fmt='java'`` renders coordinates via java_double_str for
    BYTE-level parity with the reference's TextOutputFormat artifacts —
    pinned in tests/test_golden_replay.py, which reproduces every
    committed centroid line of task1 and the 28-iteration task5a chain
    verbatim."""
    return "\n".join(
        f"{c.id}\t{_coord_str(c.x, fmt)},{_coord_str(c.y, fmt)},{_coord_str(c.z, fmt)}"
        for c in sorted(centroids)
    )


def write_centroids_kv(
    spark: SparkSession, centroids: list[Centroid], path: str, fmt: str = "repr"
) -> None:
    """Distributed single-file write of the K-row centroid table in the
    reference's TSV format (creates part files + _SUCCESS);
    ``fmt='java'`` for byte parity with the reference artifacts."""
    df = spark.createDataFrame(
        [
            (
                c.id,
                f"{_coord_str(c.x, fmt)},{_coord_str(c.y, fmt)},{_coord_str(c.z, fmt)}",
            )
            for c in sorted(centroids)
        ],
        schema="id INT, coords STRING",
    )
    (
        df.coalesce(1)
        .select(F.concat_ws("\t", F.col("id"), F.col("coords")))
        .write.mode("overwrite")
        .text(path)
    )


def read_centroids_kv(path_or_lines) -> list[Centroid]:
    """Parse reference-format centroid output (file path or iterable of
    lines) with the tolerant dual-format parser."""
    if isinstance(path_or_lines, str):
        with open(path_or_lines) as fh:
            lines = fh.readlines()
    else:
        lines = list(path_or_lines)
    out: list[Centroid] = []
    for raw in lines:
        c = _parse_line(raw, len(out))
        if c is not None:
            out.append(c)
    return out


def write_labeled(labeled: DataFrame, path: str) -> None:
    """Labeled-points sink (Task5B.java:241-243's console epilogue as a
    distributed CSV write)."""
    labeled.select("x", "y", "z", "cluster").write.mode("overwrite").csv(path)


def write_members_kv(members_df: DataFrame, path: str) -> None:
    """Members sink in the reference's packed-text shape
    (``cluster\\tcx,cy,cz; x,y,z; x,y,z; ...``,
    SilhouetteEvaluation2.java:128) — kept only for output parity;
    downstream consumers should read the typed array column instead."""
    packed = members_df.select(
        F.concat_ws(
            "\t",
            F.col("cluster"),
            F.concat_ws(
                "; ",
                F.concat_ws(",", F.col("cx"), F.col("cy"), F.col("cz")),
                F.array_join(
                    F.transform(
                        F.col("points"),
                        lambda p: F.concat_ws(",", p["x"], p["y"], p["z"]),
                    ),
                    "; ",
                ),
            ),
        )
    )
    packed.write.mode("overwrite").text(path)


def java_double_str(x: float) -> str:
    """Render a double exactly as Java's ``Double.toString`` (JDK 19+
    Ryu semantics: shortest digit string that round-trips, Java's
    plain-vs-scientific thresholds) — the optional EXACT-string sink
    mode for byte-level parity with the reference's TextOutputFormat
    artifacts (SURVEY §7 hard part (a); golden tests stay numeric, the
    byte mode is for diffing part files directly).

    Rules (JLS Double.toString): NaN -> "NaN", infinities ->
    "[-]Infinity", zeros keep their sign; magnitudes in [1e-3, 1e7)
    print plain with at least one fractional digit; outside that range
    print ``d.dddE<exp>`` with one digit before the point and no
    exponent padding. Python's ``repr(float)`` supplies the shortest
    round-trip digits; only the layout differs. (Sole known divergence:
    when several shortest strings round-trip to the same SUBNORMAL
    double the two runtimes may pick different ones — e.g.
    Double.MIN_VALUE prints 4.9E-324 in Java, 5E-324 digits in Python;
    unreachable for any analytics output, and all 2280 doubles across
    every committed reference artifact format back byte-identically,
    pinned in tests.)"""
    import math
    from decimal import Decimal

    if math.isnan(x):
        return "NaN"
    if math.isinf(x):
        return "Infinity" if x > 0 else "-Infinity"
    if x == 0.0:
        return "-0.0" if math.copysign(1.0, x) < 0 else "0.0"
    neg = x < 0
    m = abs(x)
    sign, digits, exp = Decimal(repr(m)).as_tuple()
    point = len(digits) + exp  # digits before the decimal point
    # repr of an integer-valued float carries a trailing ".0" digit;
    # the layout below re-adds zeros as needed, so strip to the
    # significant core first (value == 0.<ds> * 10^point throughout)
    ds = ("".join(map(str, digits))).rstrip("0") or "0"
    ndig = len(ds)
    if 1e-3 <= m < 1e7:
        if point <= 0:
            out = "0." + "0" * (-point) + ds
        elif point >= ndig:
            out = ds + "0" * (point - ndig) + ".0"
        else:
            out = ds[:point] + "." + ds[point:]
    else:
        mant = ds[0] + "." + (ds[1:] or "0")
        out = f"{mant}E{point - 1}"
    return ("-" + out) if neg else out
