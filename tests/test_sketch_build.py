"""End-to-end Spark sketch build: partials -> merge tree -> estimates,
checked against exact answers and determinism across parallelism levels."""

import numpy as np
import pandas as pd
import pytest

from tetrex_spark.functions.text import corpus_text_series, token_shingle_hashes_series
from tetrex_spark.kernel import from_bytes
from tetrex_spark.operators.sketch_build import (
    SketchSpec,
    build_sketches,
    collect_sketches,
    max_bin_cardinality,
)
from tetrex_spark.sources.corpus import webtext_small, with_bin_id

N_BINS = 16


@pytest.fixture(scope="module")
def corpus(spark):
    return with_bin_id(webtext_small(spark), N_BINS).cache()


@pytest.fixture(scope="module")
def corpus_pdf(corpus):
    pdf = corpus.toPandas()
    pdf["norm"] = corpus_text_series(pdf["text"], pdf["html"])
    return pdf


def specs():
    return [
        SketchSpec("tok_bloom", "bloom", "token_shingle", k=2,
                   params={"m_bits": 1 << 14, "n_hashes": 3}),
        SketchSpec("tok_hll", "hll", "token_shingle", k=2, params={"p": 12}),
        SketchSpec("tok_cms", "cms", "token", k=1,
                   params={"width": 2048, "depth": 5}),
        SketchSpec("len_kll", "kll", "doc_length_tokens", params={"k": 200}),
        SketchSpec("len_td", "tdigest", "doc_length_chars", params={"delta": 100.0}),
    ]


@pytest.fixture(scope="module")
def built(corpus):
    return build_sketches(corpus, specs()).cache()


def test_one_row_per_bin_and_spec(built, corpus_pdf):
    rows = built.collect()
    names = {r["name"] for r in rows}
    assert names == {s.name for s in specs()}
    # every (bin, name) unique
    keys = [(r["bin_id"], r["name"]) for r in rows]
    assert len(keys) == len(set(keys))


def test_hll_estimate_matches_exact_distinct(built, corpus_pdf):
    sk = collect_sketches(built.filter("name = 'tok_hll'"))
    merged = None
    for (_, _), s in sk.items():
        merged = s if merged is None else merged.merge(s)
    hashes, _ = token_shingle_hashes_series(corpus_pdf["norm"], 2)
    exact = len(np.unique(hashes))
    est = merged.estimate()
    assert abs(est - exact) / exact < 3 * merged.rel_error + 0.01


def test_bloom_no_false_negatives_per_bin(built, corpus_pdf):
    sk = collect_sketches(built.filter("name = 'tok_bloom'"))
    for bin_id in corpus_pdf["bin_id"].unique():
        sub = corpus_pdf[corpus_pdf["bin_id"] == bin_id]
        hashes, _ = token_shingle_hashes_series(sub["norm"], 2)
        if hashes.size == 0:
            continue
        bf = sk[(int(bin_id), "tok_bloom")]
        assert bf.contains(hashes).all(), f"false negative in bin {bin_id}"


def test_cms_token_counts_within_eps(built, corpus_pdf):
    sk = collect_sketches(built.filter("name = 'tok_cms'"))
    merged = None
    for s in sk.values():
        merged = s if merged is None else merged.merge(s)
    toks = corpus_pdf["norm"].str.split().explode().dropna()
    exact = toks.value_counts()
    n = len(toks)
    from tetrex_spark.functions.text import hash_token_shingle

    for tok in ["zyzzyva", "the", "spark"]:
        est = int(merged.estimate(np.array([hash_token_shingle([tok])], dtype=np.uint64))[0])
        assert exact.get(tok, 0) <= est <= exact.get(tok, 0) + merged.eps * n


def test_zyzzyva_planted_count(corpus_pdf):
    toks = corpus_pdf["norm"].str.split().explode()
    assert (toks == "zyzzyva").sum() == 37


def test_kll_quantiles_within_bound(built, corpus_pdf):
    sk = collect_sketches(built.filter("name = 'len_kll'"))
    merged = None
    for s in sk.values():
        merged = s if merged is None else merged.merge(s)
    lens = corpus_pdf["norm"].str.split().str.len().to_numpy(np.float64)
    assert merged.n == 64
    svals = np.sort(lens)
    for q in [0.1, 0.5, 0.9]:
        est = merged.quantile(q)
        rank = np.searchsorted(svals, est, side="right") / len(svals)
        assert abs(rank - q) <= 3.0 / 200 + 1.0 / 64  # sketch + n-granularity


def test_deterministic_across_parallelism(spark, corpus):
    """Same input at 2 vs 8 partitions -> byte-identical lattice payloads
    (the two-cluster-size determinism invariant)."""
    sp = [s for s in specs() if s.kind in ("bloom", "hll", "cms")]
    a = build_sketches(corpus.repartition(2), sp).collect()
    b = build_sketches(corpus.repartition(8), sp).collect()
    ka = {(r["bin_id"], r["name"]): bytes(r["payload"]) for r in a}
    kb = {(r["bin_id"], r["name"]): bytes(r["payload"]) for r in b}
    assert ka == kb


def test_two_level_merge_same_result(corpus):
    sp = [s for s in specs() if s.kind in ("bloom", "hll", "cms")]
    wide = build_sketches(corpus.repartition(16), sp, fanin=4).collect()
    narrow = build_sketches(corpus.repartition(16), sp, fanin=1000).collect()
    kw = {(r["bin_id"], r["name"]): bytes(r["payload"]) for r in wide}
    kn = {(r["bin_id"], r["name"]): bytes(r["payload"]) for r in narrow}
    assert kw == kn


def test_n_items_matches_exact_shingle_count(built, corpus_pdf):
    rows = built.filter("name = 'tok_bloom'").collect()
    total = sum(r["n_items"] for r in rows)
    hashes, _ = token_shingle_hashes_series(corpus_pdf["norm"], 2)
    assert total == hashes.size


def test_max_bin_cardinality_is_safe_upper_bound(corpus, corpus_pdf):
    mx = max_bin_cardinality(corpus, "token_shingle", 2)
    hashes_per_bin = corpus_pdf.groupby("bin_id")["norm"].apply(
        lambda s: token_shingle_hashes_series(s, 2)[0].size
    )
    assert mx >= hashes_per_bin.max()


def test_payload_roundtrip_via_spark(built):
    row = built.filter("name = 'tok_hll'").limit(1).collect()[0]
    sk = from_bytes(bytes(row["payload"]))
    assert sk.KIND == "hll"
