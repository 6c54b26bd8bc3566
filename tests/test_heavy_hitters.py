"""CMS-driven heavy-hitter identification vs exact pandas oracles:
candidate recall (no false negatives by construction), exact verify
(no false positives), threshold edge cases, and pruning effectiveness."""

import collections

import pytest
from pyspark.sql import functions as F

from tetrex_spark.operators.heavy_hitters import (
    build_global_cms,
    heavy_hitters,
    heavy_hitters_topk,
)


@pytest.fixture(scope="module")
def skewed_docs(spark):
    """Zipf-ish corpus: a few hot tokens, a long tail of singletons; one
    token planted EXACTLY at the phi=1/50 threshold."""
    rows = []
    doc_id = 0

    def add(words):
        nonlocal doc_id
        rows.append((doc_id, " ".join(words)))
        doc_id += 1

    # 2000 total tokens: hot tokens hot1 x300, hot2 x200, hot3 x100,
    # edge x40 (exactly 2000/50), sub x39 (just below), tail fills the rest
    stream = (
        ["hot1"] * 300 + ["hot2"] * 200 + ["hot3"] * 100
        + ["edge"] * 40 + ["sub"] * 39
    )
    stream += [f"tail{i}" for i in range(2000 - len(stream))]
    for i in range(0, len(stream), 25):
        add(stream[i : i + 25])
    return spark.createDataFrame(rows, "doc_id long, text string")


def _exact_counts(df):
    texts = [r["text"] for r in df.collect()]
    c = collections.Counter()
    for t in texts:
        c.update(t.lower().split())
    return c


def test_heavy_hitters_equals_exact_threshold(spark, skewed_docs):
    c = _exact_counts(skewed_docs)
    n = sum(c.values())
    want = {t: k for t, k in c.items() if k * 50 >= n}
    got = {r["token"]: r["cnt"] for r in heavy_hitters(skewed_docs, 1, 50).collect()}
    assert got == want
    # the planted edge token (count*50 == N) is IN, the sub token is OUT
    assert "edge" in got and "sub" not in got


def test_heavy_hitters_prunes_tail(spark, skewed_docs):
    """The candidate pass must NOT pass the singleton tail through the
    shuffle: with eps*N << phi*N, candidates ~= true heavy hitters."""
    from pyspark.sql import types as T

    from tetrex_spark.operators.dedup import tokens_col
    from tetrex_spark.operators.heavy_hitters import _CAND_SCHEMA
    from tetrex_spark.kernel import from_bytes

    cms, n = build_global_cms(skewed_docs, width=8192, depth=5)
    c = _exact_counts(skewed_docs)
    assert n == sum(c.values())
    # probe every distinct token the way the operator does
    import numpy as np

    from tetrex_spark.functions.text import hash_token_shingle

    uniq = sorted(c)
    est = cms.estimate(
        np.array([hash_token_shingle([t]) for t in uniq], dtype=np.uint64)
    )
    cand = {t for t, e in zip(uniq, est) if e * 50 >= n}
    true_hh = {t for t, k in c.items() if k * 50 >= n}
    assert true_hh <= cand  # no false negatives, ever
    # pruning: far fewer candidates than distinct tokens
    assert len(cand) < len(c) / 10


def test_heavy_hitters_topk_matches_exact(spark, skewed_docs):
    c = _exact_counts(skewed_docs)
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    got = [
        (r["token"], r["cnt"])
        for r in heavy_hitters_topk(skewed_docs, k=3, phi_num=1, phi_den=50)
        .orderBy("rank")
        .collect()
    ]
    assert got == want


def test_heavy_hitters_topk_refuses_truncation(spark, skewed_docs):
    """Asking for more ranks than there are heavy hitters would silently
    return a wrong tail -> must raise."""
    with pytest.raises(ValueError, match="lower phi"):
        heavy_hitters_topk(skewed_docs, k=10, phi_num=1, phi_den=50)


def test_heavy_hitters_empty_corpus(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    assert heavy_hitters(df, 1, 50).count() == 0
