"""Documents sources: JSONL with explicit malformed-line policy, CSV,
and operator interop (any source feeds the text/dedup operators)."""

from __future__ import annotations

import pytest

from mapreduce_kmeans_clustering_spark.operators.text import tokens
from mapreduce_kmeans_clustering_spark.sources.documents import (
    clean_documents,
    corrupt_documents,
    read_documents_csv,
    read_documents_jsonl,
)

GOOD = [
    '{"doc_id": 1, "text": "the quick brown fox", "lang": "en", "source": "web", "n_chars": 19}',
    '{"doc_id": 2, "text": "der schnelle fuchs", "lang": "de", "source": "web", "n_chars": 18}',
]
BAD = ['{"doc_id": 3, "text": "unterminated', "not json at all"]


@pytest.fixture()
def jsonl_path(tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(GOOD + BAD) + "\n")
    return str(p)


def test_jsonl_permissive_quarantines_bad_lines(spark, jsonl_path):
    df = read_documents_jsonl(spark, jsonl_path)
    clean = clean_documents(df)
    assert {r["doc_id"] for r in clean.collect()} == {1, 2}
    bad = corrupt_documents(df).collect()
    assert len(bad) == len(BAD)


def test_jsonl_dropmalformed_and_failfast(spark, jsonl_path):
    dropped = read_documents_jsonl(spark, jsonl_path, mode="DROPMALFORMED")
    assert dropped.count() == len(GOOD)
    with pytest.raises(Exception):
        read_documents_jsonl(spark, jsonl_path, mode="FAILFAST").collect()


def test_jsonl_feeds_text_operators(spark, jsonl_path):
    clean = clean_documents(read_documents_jsonl(spark, jsonl_path))
    toks = clean.select(tokens("text").alias("t")).collect()
    assert sorted(len(r["t"]) for r in toks) == [3, 4]


def test_csv_roundtrip(spark, tmp_path):
    src = spark.createDataFrame(
        [(1, 'text with, comma and "quote"', "en", "web", 28), (2, None, None, None, None)],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    out = str(tmp_path / "docs_csv")
    src.write.option("header", "true").option("escape", '"').mode("overwrite").csv(out)
    back = read_documents_csv(spark, out)
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in src.collect()
    )
