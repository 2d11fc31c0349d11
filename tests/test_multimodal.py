"""Multimodal plumbing tests: schema, Arrow batch path, determinism.
The decode itself is a documented stub (no codecs in the container)."""

from __future__ import annotations

import pytest

from mapreduce_kmeans_clustering_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_media,
    extract_features,
    synthesize_media,
)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(i, f"document number {i} with some text payload", "en", "src", 30 + i) for i in range(12)],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    return synthesize_media(docs)


def test_media_schema_and_kinds(media):
    assert [f.name for f in media.schema.fields] == ["media_id", "kind", "payload", "meta"]
    assert media.schema["payload"].dataType.typeName() == "binary"
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_extract_features_shapes(media):
    out = extract_features(media)
    rows = out.collect()
    assert len(rows) == 12
    for r in rows:
        assert len(r["features"]) == FEATURE_DIM
        assert all(0.0 <= v < 1.0 for v in r["features"])
        assert r["n_bytes"] > 0


def test_extract_features_deterministic_and_partitioned(media):
    a = {r["media_id"]: r["features"] for r in extract_features(media).collect()}
    b = {
        r["media_id"]: r["features"]
        for r in extract_features(media.repartition(5)).collect()
    }
    assert a == b  # partitioning must not affect results


def test_decode_is_a_clear_stub():
    with pytest.raises(NotImplementedError, match="codec"):
        decode_media(b"bytes", "image")
