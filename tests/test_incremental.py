"""Incremental exact dedup (operators/incremental.py): build a frozen
membership index, gate an increment against it, and check the verdict
is EXACT (Bloom FPs confirmed away, FNs impossible) under default and
adversarially small filters."""

import json

import pytest
from pyspark.sql import functions as F

from tetrex_spark.operators.incremental import (
    build_membership_index,
    incremental_exact_dedup,
)


def _corpus(spark, texts, start_id=0):
    return spark.createDataFrame(
        [(start_id + i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


REF_TEXTS = [f"reference document number {i} about topic {i % 7}" for i in range(200)]


@pytest.fixture()
def index_dir(spark, tmp_path):
    d = str(tmp_path / "memb_idx")
    stats = build_membership_index(
        _corpus(spark, REF_TEXTS), d, n_buckets=16, fpr=0.01
    )
    assert stats["n_keys"] == 200
    return d


def _gate(spark, index_dir, texts):
    inc = _corpus(spark, texts, start_id=1000)
    got = incremental_exact_dedup(inc, index_dir).collect()
    return {r["doc_id"]: r["is_new"] for r in got}


def test_exact_verdict(spark, index_dir):
    """Known copies flagged dup, fresh texts flagged new, one row per
    increment doc."""
    texts = ["brand new text alpha", REF_TEXTS[3], "another new one", REF_TEXTS[150]]
    got = _gate(spark, index_dir, texts)
    assert got == {1000: True, 1001: False, 1002: True, 1003: False}


def test_normalization_applies(spark, index_dir):
    """Whitespace/case variants of a reference doc are duplicates (the
    gate hashes the same normalization as exact_dedup)."""
    got = _gate(spark, index_dir, ["  " + REF_TEXTS[0].upper() + "  "])
    assert got == {1000: False}


def test_no_false_negatives_tiny_filter(spark, tmp_path):
    """fpr=0.5 makes the filters tiny and FP-riddled; every true dup
    must STILL be flagged (no FN) and every fresh text must survive the
    confirm step (FPs die against the stored hashes)."""
    d = str(tmp_path / "idx_small")
    build_membership_index(
        _corpus(spark, REF_TEXTS), d, n_buckets=4, fpr=0.5
    )
    texts = [f"fresh text {i}" for i in range(100)] + REF_TEXTS[::10]
    got = _gate(spark, d, texts)
    for i in range(100):
        assert got[1000 + i] is True
    for j in range(len(REF_TEXTS[::10])):
        assert got[1100 + j] is False


def test_empty_bucket_is_new(spark, tmp_path):
    """A 1-doc reference fills one bucket; increment rows routed to the
    other buckets meet no filter and are new without any confirm scan."""
    d = str(tmp_path / "idx_one")
    build_membership_index(_corpus(spark, ["only doc"]), d, n_buckets=32)
    got = _gate(spark, d, [f"spread {i}" for i in range(50)] + ["only doc"])
    assert sum(not v for v in got.values()) == 1
    assert got[1050] is False


def test_partitioning_independent(spark, index_dir):
    texts = [REF_TEXTS[i] if i % 3 == 0 else f"inc {i}" for i in range(60)]
    inc1 = _corpus(spark, texts).repartition(1)
    inc16 = _corpus(spark, texts).repartition(16)
    a = {r["doc_id"]: r["is_new"] for r in incremental_exact_dedup(inc1, index_dir).collect()}
    b = {r["doc_id"]: r["is_new"] for r in incremental_exact_dedup(inc16, index_dir).collect()}
    assert a == b
    assert sum(not v for v in a.values()) == 20


def test_params_guard(spark, index_dir):
    """A layout / normalization version mismatch refuses loudly instead
    of silently missing every probe."""
    p = json.load(open(f"{index_dir}/params.json"))
    json.dump({**p, "norm_version": 99}, open(f"{index_dir}/params.json", "w"))
    with pytest.raises(ValueError, match="normalization"):
        incremental_exact_dedup(_corpus(spark, ["x"]), index_dir)
    json.dump({**p, "_layout": 99}, open(f"{index_dir}/params.json", "w"))
    with pytest.raises(ValueError, match="layout"):
        incremental_exact_dedup(_corpus(spark, ["x"]), index_dir)


def test_index_is_text_free_and_pruned(spark, index_dir):
    """The index stores 16 B/doc (no text column), and the confirm scan
    carries a literal bucket partition filter."""
    hashes = spark.read.parquet(f"{index_dir}/hashes")
    assert set(hashes.columns) == {"bucket", "h", "h2"}
    inc = _corpus(spark, [REF_TEXTS[5]])
    out = incremental_exact_dedup(inc, index_dir)
    assert out.collect()[0]["is_new"] is False
