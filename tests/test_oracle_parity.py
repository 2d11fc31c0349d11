"""Local mirror of the driver's DuckDB oracle gate: run every
``queries()`` entry and its ``oracle_sql()`` twin at sf0.001, compare
row count, column names, and values (columns sorted by name, rows
sorted, exact match after the queries' own rounding).

This is deliberately stricter than a tolerance compare — the query
definitions round wherever cross-engine float drift is possible, so
any difference here is a real semantic divergence.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

from tests.conftest import TESTDATA

import os

SF_DIR = os.environ.get("ORACLE_SF_DIR", f"{TESTDATA}/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


ALL = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    oracles = entry_mod.oracle_sql()
    sdf = q(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if name not in oracles:
        assert len(srows) >= 0  # rows-only check (non-SQL-expressible op)
        return
    res = ddb.execute(oracles[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(scols) == sorted(ocols), f"{name}: column names differ"
    assert len(srows) == len(orows), f"{name}: row count {len(srows)} vs {len(orows)}"
    sc, oc = _canon(scols, srows), _canon(ocols, orows)
    for i, (a, b) in enumerate(zip(sc, oc)):
        assert a == pytest.approx(b, rel=1e-9, abs=1e-9), f"{name}: row {i}: {a} vs {b}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"x", "y", "z", "cluster"}


def test_every_query_has_an_oracle():
    """The registry's contract is 'none rows-only': a queries() entry
    without an oracle_sql() twin silently weakens the gate (the parity
    test falls back to a vacuous rows-only branch), so its absence
    must fail loudly here instead."""
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    missing = sorted(k for k in qs if k not in oracles)
    assert not missing, f"queries without oracles: {missing}"
