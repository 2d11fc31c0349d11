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


def test_orc_roundtrip(spark, tmp_path):
    from mapreduce_kmeans_clustering_spark.sources.documents import (
        read_documents_orc,
        write_documents_orc,
    )

    docs = clean_documents(
        spark.createDataFrame(
            [
                (1, "alpha beta", "en", "web", 10),
                (2, "gamma delta", "en", "books", 11),
            ],
            "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
        )
    )
    path = str(tmp_path / "docs_orc")
    write_documents_orc(docs, path)
    back = read_documents_orc(spark, path)
    assert sorted(back.collect()) == sorted(docs.collect())


def test_jsonl_sharded_sink_roundtrip_one_file_per_shard(spark, tmp_path):
    """The training-handoff layout: hive-partitioned by (split, shard),
    exactly one data file per pair (small-files guard), and the
    content round-trips through the JSONL reader."""
    import glob

    from mapreduce_kmeans_clustering_spark.operators.curation import split_assign
    from mapreduce_kmeans_clustering_spark.sources.documents import (
        write_documents_jsonl_sharded,
    )

    docs = spark.createDataFrame(
        [
            (i, f"text number {i}", "en", "web", 12 + (i % 3))
            for i in range(200)
        ],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    tagged = split_assign(docs, n_shards=4).repartition(8)  # messy input layout
    path = str(tmp_path / "shards")
    write_documents_jsonl_sharded(tagged, path)

    pairs = {
        tuple(p.split("/")[-3:-1])
        for p in glob.glob(f"{path}/split=*/shard=*/part-*.txt")
    }
    for split, shard in pairs:
        files = glob.glob(f"{path}/{split}/{shard}/part-*.txt")
        assert len(files) == 1, (split, shard, files)

    back = clean_documents(
        read_documents_jsonl(spark, f"{path}/split=*/shard=*/*.txt")
    )
    assert back.count() == 200
    assert {r["doc_id"] for r in back.collect()} == set(range(200))
