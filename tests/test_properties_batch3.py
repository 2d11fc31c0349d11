"""Property tests for the round-11-continuation curation operators
(boilerplate removal, DSIR weighting, distinct-n diversity): laws that
must hold for EVERY corpus, checked against plain-Python brute-force
replays on drawn fixtures — the same falsifier posture as the earlier
property batches."""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

VOCAB = ["aa", "bb", "cc", "dd", "ee", "ff"]
L = 3  # tokens per pseudo-line

# corpus: per doc (domain_group 0-2, token list) — text is the exact
# space-joined token stream, so the [a-z0-9]+ tokenizer round-trips it
doclist = st.lists(
    st.tuples(
        st.integers(0, 2),
        st.lists(st.sampled_from(VOCAB), min_size=0, max_size=14),
    ),
    min_size=1,
    max_size=16,
)


import pytest

# Exhaustive property batch — slow (VERDICT r12 item 2): excluded
# from the default run; CI/round-close run with --runslow.
pytestmark = pytest.mark.slow


def _mkdocs(spark, docs):
    rows = [
        (i, f"https://d{g}.com/p/{i}", " ".join(toks))
        for i, (g, toks) in enumerate(docs)
    ]
    return spark.createDataFrame(
        rows, "doc_id LONG, url STRING, text STRING"
    )


def _chunks(toks):
    return [
        " ".join(toks[i : i + L]) for i in range(0, len(toks), L)
    ]


def _brute_flagged(docs, min_frac=0.3, min_df=2):
    by_dom: dict = {}
    dom_docs: dict = {}
    for i, (g, toks) in enumerate(docs):
        d = f"d{g}.com"
        dom_docs[d] = dom_docs.get(d, 0) + 1
        for line in set(_chunks(toks)):
            by_dom.setdefault((d, line), set()).add(i)
    return {
        (d, line)
        for (d, line), ids in by_dom.items()
        if len(ids) >= max(min_df, math.ceil(min_frac * dom_docs[d]))
    }


@given(docs=doclist)
@SETTINGS
def test_boilerplate_scrub_matches_brute_force(spark, docs):
    """Conservation + content law: per doc, n_lines = ceil(tokens/L),
    removed lines are exactly the domain-flagged ones, and clean_text
    is the in-order join of the surviving lines."""
    from mapreduce_kmeans_clustering_spark.operators.web import (
        remove_boilerplate,
    )

    flagged = _brute_flagged(docs)
    got = {
        r["doc_id"]: r
        for r in remove_boilerplate(_mkdocs(spark, docs)).collect()
    }
    assert set(got) == set(range(len(docs)))
    for i, (g, toks) in enumerate(docs):
        d = f"d{g}.com"
        lines = _chunks(toks)
        keep = [ln for ln in lines if (d, ln) not in flagged]
        assert got[i]["n_lines"] == len(lines) == -(-len(toks) // L)
        assert got[i]["n_removed"] == len(lines) - len(keep)
        assert got[i]["clean_text"] == " ".join(keep)


@given(docs=doclist, cut=st.integers(0, 15))
@SETTINGS
def test_boilerplate_index_additive_for_any_split(spark, docs, cut):
    """Merging per-batch indexes over ANY disjoint split equals the
    full-corpus index — the streaming-maintenance contract."""
    from mapreduce_kmeans_clustering_spark.operators.web import (
        boilerplate_index,
        extend_boilerplate_index,
    )

    df = _mkdocs(spark, docs)
    b1, b2 = df.where(f"doc_id < {cut}"), df.where(f"doc_id >= {cut}")
    merged = extend_boilerplate_index(
        boilerplate_index(b1), boilerplate_index(b2)
    )
    key = lambda t: tuple((x is None, x) for x in t)  # noqa: E731
    assert sorted((tuple(r) for r in merged.collect()), key=key) == sorted(
        (tuple(r) for r in boilerplate_index(df).collect()), key=key
    )


B = 512


def _bkt(feat):
    return int(hashlib.md5(feat.encode()).hexdigest()[:8], 16) % B


@given(docs=doclist)
@SETTINGS
def test_dsir_matches_brute_force_replay(spark, docs):
    """The whole DSIR chain replayed in plain Python (md5 buckets,
    add-one smoothing, micro-unit floor): n_feats exact, weight within
    one micro-unit per feature (ln may differ in the last ulp across
    libms — the micro pin bounds the divergence instead of hiding it)."""
    from pyspark.sql import functions as F

    from mapreduce_kmeans_clustering_spark.operators.curation import (
        dsir_logweights,
    )

    tgt = {i for i in range(len(docs)) if i % 3 == 0}
    feats = {
        i: toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        for i, (g, toks) in enumerate(docs)
    }
    ct: dict = {}
    cr: dict = {}
    for i, fs in feats.items():
        side = ct if i in tgt else cr
        for f_ in fs:
            side[_bkt(f_)] = side.get(_bkt(f_), 0) + 1
    T, R = sum(ct.values()), sum(cr.values())
    micro = {
        b: math.floor(
            (
                math.log((ct.get(b, 0) + 1) / (T + B))
                - math.log((c + 1) / (R + B))
            )
            * 1e6
            + 0.5
        )
        for b, c in cr.items()
    }
    expect = {
        i: (len(fs), sum(micro[_bkt(f_)] for f_ in fs) / 1e6 if fs else 0.0)
        for i, fs in feats.items()
        if i not in tgt
    }
    got = {
        r["doc_id"]: (r["n_feats"], r["logweight"])
        for r in dsir_logweights(
            _mkdocs(spark, docs), F.col("doc_id") % 3 == 0, n_buckets=B
        ).collect()
    }
    assert set(got) == set(expect)
    for i, (nf, wt) in expect.items():
        assert got[i][0] == nf
        assert abs(got[i][1] - wt) <= nf * 1e-6 + 1e-9


@given(docs=doclist)
@SETTINGS
def test_ngram_diversity_matches_brute_force(spark, docs):
    """distinct/total per (source, n) equals direct counting (md5-60bit
    hashing cannot collide at test sizes), rows exist exactly for the
    (group, n) pairs with at least one window."""
    from mapreduce_kmeans_clustering_spark.operators.text import (
        ngram_diversity,
    )

    df = _mkdocs(spark, docs).selectExpr(
        "doc_id", "concat('s', doc_id % 2) AS source", "text"
    )
    brute: dict = {}
    for i, (g, toks) in enumerate(docs):
        s = f"s{i % 2}"
        for n in (1, 2, 3):
            grams = [
                " ".join(toks[j : j + n])
                for j in range(len(toks) - n + 1)
            ]
            if grams:
                tot, dis = brute.get((s, n), (0, set()))
                brute[(s, n)] = (tot + len(grams), dis | set(grams))
    got = {
        (r["source"], r["n"]): (r["total_ngrams"], r["distinct_ngrams"])
        for r in ngram_diversity(df).collect()
    }
    assert set(got) == set(brute)
    for k, (tot, dis) in brute.items():
        assert got[k] == (tot, len(dis))
