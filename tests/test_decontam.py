"""Benchmark decontamination (operators/decontam.py): verbatim
benchmark windows are caught, short docs are clean by definition,
min_hits tolerates incidental single-gram overlap, and the plan
broadcasts the benchmark instead of shuffling the corpus."""

import pytest
from pyspark.sql import functions as F

from tetrex_spark.operators.decontam import (
    benchmark_gram_hashes,
    decontaminate,
)


def _df(spark, rows, schema="doc_id long, text string"):
    return spark.createDataFrame(rows, schema)


WORDS = [f"tok{i * 2654435761 % 100003}" for i in range(60)]


@pytest.fixture(scope="module")
def docs(spark):
    return _df(spark, [
        (0, " ".join(WORDS[:40])),                  # contains the bench window
        (1, " ".join(WORDS[20:60])),                # overlaps it partially
        (2, " ".join(reversed(WORDS[:40]))),        # same tokens, wrong order
        (3, "totally unrelated text about spark partitions and shuffles"),
        (4, " ".join(WORDS[5:17])),                 # 12 tokens < n=13: no grams
        (5, ""),                                    # empty
    ]).cache()


@pytest.fixture(scope="module")
def bench(spark):
    # the "eval question": tokens 10..29 of the WORDS stream (20 tokens
    # -> 8 distinct 13-grams)
    return _df(spark, [(0, " ".join(WORDS[10:30]))])


def test_verdicts(spark, docs, bench):
    got = {
        r["doc_id"]: (r["n_hit_grams"], r["is_clean"])
        for r in decontaminate(docs, bench, n=13).collect()
    }
    # doc 0 holds the whole window: all 8 bench grams hit; doc 1 starts
    # at token 20 so shares windows 20..29 only (<13 tokens): clean
    assert got[0] == (8, False)
    assert got[1] == (0, True)
    assert got[2] == (0, True)
    assert got[3] == (0, True)
    assert got[4] == (0, True)
    assert got[5] == (0, True)


def test_min_hits_threshold(spark, docs, bench):
    """min_hits=9 exceeds the 8 possible shared grams: everything is
    kept, but the hit count still reports."""
    got = {
        r["doc_id"]: (r["n_hit_grams"], r["is_clean"])
        for r in decontaminate(docs, bench, n=13, min_hits=9).collect()
    }
    assert got[0] == (8, True)


def test_partial_window_overlap(spark, bench):
    """A doc carrying only SOME of the benchmark's windows reports the
    exact count of shared grams."""
    doc = _df(spark, [(7, " ".join(WORDS[10:25]))])  # 15 toks = 3 grams
    [r] = decontaminate(doc, bench, n=13).collect()
    assert (r["n_hit_grams"], r["is_clean"]) == (3, False)


def test_bench_gram_set_distinct(spark, bench):
    assert benchmark_gram_hashes(bench, n=13).count() == 8
    # a duplicated benchmark row must not double the set
    assert benchmark_gram_hashes(bench.unionAll(bench), n=13).count() == 8


def test_partitioning_independent(spark, docs, bench):
    a = sorted(tuple(r) for r in
               decontaminate(docs.repartition(1), bench, n=13).collect())
    b = sorted(tuple(r) for r in
               decontaminate(docs.repartition(7), bench, n=13).collect())
    assert a == b


def test_validation(spark, docs, bench):
    with pytest.raises(ValueError, match="min_hits"):
        decontaminate(docs, bench, n=0)
    with pytest.raises(ValueError, match="min_hits"):
        decontaminate(docs, bench, min_hits=0)


def test_plan_broadcasts_benchmark(spark, docs, bench):
    """The gram join — the one the full corpus flows through — must be
    a broadcast hash join (benchmark side built), never a sort-merge:
    the corpus text is never shuffled. (The final verdict join carries
    8-byte doc ids only and is left to AQE.)"""
    plan = decontaminate(docs, bench, n=13)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin [gram" in plan
    assert "SortMergeJoin [gram" not in plan


def test_n1_token_membership(spark, bench):
    """n=1 degenerates to token membership — sanity anchor for the
    window math."""
    doc = _df(spark, [(9, WORDS[10] + " zzz " + WORDS[29])])
    [r] = decontaminate(doc, bench, n=1).collect()
    assert (r["n_hit_grams"], r["is_clean"]) == (2, False)


def test_cli_decont_end_to_end(spark, tmp_path, capsys):
    from tetrex_spark.cli import main

    corpus = str(tmp_path / "corpus.parquet")
    _df(spark, [(0, " ".join(WORDS[:40])), (1, "unrelated text entirely")]
        ).write.parquet(corpus)
    bench = str(tmp_path / "bench.parquet")
    _df(spark, [(0, " ".join(WORDS[10:30]))]).write.parquet(bench)
    out = str(tmp_path / "verdicts")
    rc = main(["decont", "--corpus", corpus, "--benchmark", bench,
               "--output", out])
    assert rc == 0
    assert "1/2 docs contaminated" in capsys.readouterr().out
    got = {r["doc_id"]: r["is_clean"] for r in spark.read.parquet(out).collect()}
    assert got == {0: False, 1: True}

    out2 = str(tmp_path / "clean")
    rc = main(["decont", "--corpus", corpus, "--benchmark", bench,
               "--output", out2, "--clean-only"])
    assert rc == 0
    assert [r["doc_id"] for r in spark.read.parquet(out2).collect()] == [1]
