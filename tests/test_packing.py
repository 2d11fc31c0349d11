"""Sequence packing invariants: contiguous layout (each doc starts
where the previous one ended, mod pack_len), straddle counting, empty
docs occupy one slot's worth of nothing (n_packs 1, zero advance)."""

from __future__ import annotations

from mapreduce_kmeans_clustering_spark.operators.packing import pack_sequences


def _docs(spark, rows):
    return spark.createDataFrame(rows, "source STRING, doc_id BIGINT, text STRING")


def test_layout_is_contiguous_per_group(spark):
    rows = [("a", i, " ".join(f"t{j}" for j in range(7 * (i + 1)))) for i in range(40)]
    rows += [("b", i, "one two three") for i in range(5)]
    out = pack_sequences(_docs(spark, rows), pack_len=50).collect()
    by_group: dict[str, list] = {}
    for r in sorted(out, key=lambda r: (r["source"], r["doc_id"])):
        by_group.setdefault(r["source"], []).append(r)
    for rs in by_group.values():
        offset = 0
        for r in rs:
            assert (r["pack_id"], r["offset_in_pack"]) == (offset // 50, offset % 50)
            offset += r["n_tokens"]


def test_straddle_and_empty_docs(spark):
    rows = [
        ("a", 1, " ".join(f"t{j}" for j in range(8))),   # pack 0, offset 0
        ("a", 2, ""),                                      # empty: 1 pack, no advance
        ("a", 3, " ".join(f"t{j}" for j in range(5))),   # offsets 8..12 -> straddles
    ]
    got = {r["doc_id"]: r for r in pack_sequences(_docs(spark, rows), pack_len=10).collect()}
    assert (got[1]["pack_id"], got[1]["n_packs"]) == (0, 1)
    assert (got[2]["n_tokens"], got[2]["n_packs"], got[2]["offset_in_pack"]) == (0, 1, 8)
    assert (got[3]["pack_id"], got[3]["offset_in_pack"], got[3]["n_packs"]) == (0, 8, 2)
