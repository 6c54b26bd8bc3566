"""Unigram LM quality scoring (functions/lm.py): exact hand-computed
probabilities, OOV floor, deterministic top_k ties, empty docs, and the
broadcast plan."""

import math

import pytest

from tetrex_spark.functions.lm import doc_logprob, unigram_model


def _df(spark, rows, schema="doc_id long, text string"):
    return spark.createDataFrame(rows, schema)


@pytest.fixture(scope="module")
def fit_docs(spark):
    # 10 tokens total: a x4, b x3, c x2, d x1
    return _df(spark, [(0, "a a b c"), (1, "a b d"), (2, "a b c")])


def test_model_probs(spark, fit_docs):
    m = {r["token"]: r for r in unigram_model(fit_docs).collect()}
    assert {t: r["cnt"] for t, r in m.items()} == {"a": 4, "b": 3, "c": 2, "d": 1}
    assert m["a"]["logp"] == pytest.approx(math.log(4 / 10))
    assert m["d"]["logp"] == pytest.approx(math.log(1 / 10))
    assert all(r["total"] == 10 for r in m.values())


def test_min_count_and_total_before_pruning(spark, fit_docs):
    m = {r["token"]: r for r in unigram_model(fit_docs, min_count=2).collect()}
    assert set(m) == {"a", "b", "c"}
    # d is dropped from the vocab but still counted in the denominator
    assert m["c"]["logp"] == pytest.approx(math.log(2 / 10))
    assert m["c"]["total"] == 10


def test_top_k_deterministic_ties(spark, fit_docs):
    # c and d would tie at cnt if we crafted it; here top_k=2 keeps the
    # two most frequent, and a tie at the boundary resolves by token asc
    docs = _df(spark, [(0, "x y z z")])  # x:1 y:1 z:2 — x/y tie for 2nd
    m = [r["token"] for r in unigram_model(docs, top_k=2).collect()]
    assert sorted(m) == ["x", "z"]


def test_doc_scores_exact(spark, fit_docs):
    model = unigram_model(fit_docs)
    scored = {
        r["doc_id"]: r
        for r in doc_logprob(
            _df(spark, [(10, "a b"), (11, "a zzz"), (12, "")]), model
        ).collect()
    }
    exp_ab = (math.log(0.4) + math.log(0.3)) / 2
    assert scored[10]["n_tokens"] == 2
    assert scored[10]["mean_logp"] == pytest.approx(exp_ab)
    assert scored[10]["perplexity"] == pytest.approx(math.exp(-exp_ab))
    # zzz is OOV: floor ln(0.5/10)
    exp_oov = (math.log(0.4) + math.log(0.05)) / 2
    assert scored[11]["mean_logp"] == pytest.approx(exp_oov)
    # empty doc keeps its row with null scores
    assert scored[12]["n_tokens"] == 0
    assert scored[12]["mean_logp"] is None
    assert scored[12]["perplexity"] is None


def test_junk_scores_worse(spark, fit_docs):
    """The point of the gate: fluent (in-distribution) text gets lower
    perplexity than junk."""
    model = unigram_model(fit_docs)
    s = {
        r["doc_id"]: r["perplexity"]
        for r in doc_logprob(
            _df(spark, [(0, "a a b a"), (1, "qq ww ee rr")]), model
        ).collect()
    }
    assert s[0] < s[1]


def test_partitioning_independent(spark, fit_docs):
    docs = _df(spark, [(i, f"a b tok{i % 5}") for i in range(40)])
    model = unigram_model(fit_docs)
    a = sorted(tuple(r) for r in doc_logprob(docs.repartition(1), model).collect())
    b = sorted(tuple(r) for r in doc_logprob(docs.repartition(9), model).collect())
    assert a == b


def test_scoring_plan_broadcasts_model(spark, fit_docs):
    model = unigram_model(fit_docs)
    docs = _df(spark, [(0, "a b c")])
    plan = (
        doc_logprob(docs, model)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin [token" in plan
    assert "SortMergeJoin [token" not in plan


def test_top_k_plan_is_take_ordered(spark, fit_docs):
    plan = (
        unigram_model(fit_docs, top_k=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


# -- importance_weights (DSIR-style) -----------------------------------------


def test_importance_weights_exact(spark):
    from tetrex_spark.functions.lm import importance_weights

    tgt = unigram_model(_df(spark, [(0, "a a b")]))       # a:2 b:1 /3
    bg = unigram_model(_df(spark, [(0, "a c c c")]))      # a:1 c:3 /4
    ft, fb = math.log(0.5 / 3), math.log(0.5 / 4)
    lr = {
        "a": math.log(2 / 3) - math.log(1 / 4),
        "b": math.log(1 / 3) - fb,
        "c": ft - math.log(3 / 4),
        "zz": ft - fb,
    }
    out = {
        r["doc_id"]: r
        for r in importance_weights(
            _df(spark, [(1, "a b c zz"), (2, "")]), tgt, bg
        ).collect()
    }
    assert out[1]["n_tokens"] == 4
    assert out[1]["mean_logratio"] == pytest.approx(
        sum(lr.values()) / 4
    )
    assert out[2]["n_tokens"] == 0
    assert out[2]["mean_logratio"] is None


def test_importance_weights_ranks_target_like_docs_higher(spark):
    from tetrex_spark.functions.lm import importance_weights

    tgt = unigram_model(_df(spark, [(0, "alpha beta gamma alpha beta")]))
    bg = unigram_model(
        _df(spark, [(0, "alpha beta gamma noise junk spam eggs ham")])
    )
    s = {
        r["doc_id"]: r["mean_logratio"]
        for r in importance_weights(
            _df(spark, [(1, "alpha beta alpha"), (2, "junk spam eggs")]),
            tgt,
            bg,
        ).collect()
    }
    assert s[1] > 0 > s[2]


def test_importance_weights_plan_broadcasts(spark):
    from tetrex_spark.functions.lm import importance_weights

    tgt = unigram_model(_df(spark, [(0, "a a b")]))
    bg = unigram_model(_df(spark, [(0, "a c")]))
    plan = (
        importance_weights(_df(spark, [(1, "a b")]), tgt, bg)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin [token" in plan
    # allowed sort-merges: the models' full-outer merge (model-sized,
    # bounded by top_k; full outer cannot broadcast) and the final
    # verdict join on 8-byte doc ids (AQE's call) — the corpus-side
    # token join must be the broadcast one
    assert plan.count("SortMergeJoin [token") == 1
    assert "FullOuter" in plan


# -- bigram_pmi (collocations) ------------------------------------------------


def test_bigram_pmi_exact(spark):
    from tetrex_spark.functions.lm import bigram_pmi

    # tokens: x:3 y:3 z:2 (n_uni 8); bigrams: (x,y):3 (y,z):2 (z,x):1
    # -> n_bi = 4 + 2 = 6
    docs = _df(spark, [(0, "x y z x y"), (1, "x y z")])
    out = {(r["tok_a"], r["tok_b"]): r
           for r in bigram_pmi(docs, min_count=1, top_k=10).collect()}
    assert out[("x", "y")]["cnt"] == 3
    assert out[("x", "y")]["pmi"] == pytest.approx(
        math.log((3 / 6) / ((3 / 8) * (3 / 8)))
    )
    assert out[("y", "z")]["cnt"] == 2
    assert ("z", "x") in out and out[("z", "x")]["cnt"] == 1


def test_bigram_pmi_min_count_and_order(spark):
    from tetrex_spark.functions.lm import bigram_pmi

    docs = _df(spark, [(0, "a b a b a b c d")])
    rows = bigram_pmi(docs, min_count=2, top_k=10).collect()
    assert [(r["tok_a"], r["tok_b"], r["cnt"]) for r in rows] == [
        ("a", "b", 3), ("b", "a", 2)
    ]
    top1 = bigram_pmi(docs, min_count=1, top_k=1).collect()
    assert (top1[0]["tok_a"], top1[0]["tok_b"]) == ("a", "b")


def test_bigram_pmi_collocation_beats_chance(spark):
    """A fused phrase ("new york") gets higher PMI than a chance pair of
    frequent tokens."""
    from tetrex_spark.functions.lm import bigram_pmi

    docs = _df(spark, [
        (0, "new york new york new york"),
        (1, "the cat the dog the bird the fish"),
    ])
    out = {(r["tok_a"], r["tok_b"]): r["pmi"]
           for r in bigram_pmi(docs, min_count=1, order_by="pmi").collect()}
    assert out[("new", "york")] > out[("the", "cat")]


def test_bigram_pmi_short_and_empty_docs(spark):
    from tetrex_spark.functions.lm import bigram_pmi

    docs = _df(spark, [(0, "solo"), (1, ""), (2, "a b")])
    rows = bigram_pmi(docs, min_count=1).collect()
    assert [(r["tok_a"], r["tok_b"]) for r in rows] == [("a", "b")]


def test_bigram_pmi_validation(spark):
    from tetrex_spark.functions.lm import bigram_pmi

    with pytest.raises(ValueError, match="order_by"):
        bigram_pmi(_df(spark, [(0, "a b")]), order_by="zipf")


def test_cli_lmscore_end_to_end(spark, tmp_path, capsys):
    from tetrex_spark.cli import main

    corpus = str(tmp_path / "corpus.parquet")
    _df(spark, [(0, "a a b c"), (1, "a b d"), (2, "zz yy")]).write.parquet(
        corpus
    )
    out = str(tmp_path / "scores")
    rc = main(["lmscore", "--corpus", corpus, "--output", out])
    assert rc == 0
    assert "Scored 3 docs" in capsys.readouterr().out
    got = spark.read.parquet(out)
    assert got.count() == 3
    assert set(got.columns) == {"doc_id", "n_tokens", "mean_logp", "perplexity"}
