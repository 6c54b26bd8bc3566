"""Deterministic splitting / sampling (functions/sampling.py).

The contract is reproducibility as a pure function of (key, salt):
cross-engine agreement with Python's hashlib, append stability under
corpus growth, nested-sample containment, and partitioning
independence. Counterpart of the reference's reproducible builds
(TetRex index = pure function of corpus + params, include/index.h).
"""

import hashlib

import pytest

from tetrex_spark.functions.sampling import (
    deterministic_split,
    hash_sample,
    hex_threshold,
)


def _py_split(key, fractions, salt=""):
    """Independent Python re-derivation of the split assignment."""
    d = hashlib.md5(f"{salt}:{key}".encode()).hexdigest()
    cum = 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        if d < hex_threshold(cum):
            return name
    return names[-1]


def _ids(spark, n, parts=4):
    return spark.range(0, n, 1, parts).withColumnRenamed("id", "doc_id")


def test_hex_threshold_bounds():
    assert hex_threshold(0.0) == "0" * 32
    assert hex_threshold(1.0) == "f" * 32
    assert hex_threshold(0.5) == "8" + "0" * 31
    with pytest.raises(ValueError):
        hex_threshold(-0.1)
    with pytest.raises(ValueError):
        hex_threshold(1.1)


def test_split_matches_hashlib(spark):
    """Spark's md5 CASE assignment == an independent hashlib
    re-derivation, for every row and a non-default salt."""
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    got = {
        r["doc_id"]: r["split"]
        for r in deterministic_split(_ids(spark, 300), fr, salt="s1").collect()
    }
    assert len(got) == 300
    for k, v in got.items():
        assert v == _py_split(k, fr, "s1")


def test_append_stable(spark):
    """Adding docs never reassigns existing ones: the split of the
    first 200 ids is the restriction of the split of 1000 ids."""
    small = {
        r["doc_id"]: r["split"]
        for r in deterministic_split(_ids(spark, 200)).collect()
    }
    big = {
        r["doc_id"]: r["split"]
        for r in deterministic_split(_ids(spark, 1000)).collect()
    }
    assert small == {k: big[k] for k in small}


def test_partitioning_independent(spark):
    """Same assignment at 1 partition and 16 partitions."""
    a = dict(
        deterministic_split(_ids(spark, 500, parts=1))
        .select("doc_id", "split").collect()
    )
    b = dict(
        deterministic_split(_ids(spark, 500, parts=16))
        .select("doc_id", "split").collect()
    )
    assert a == b


def test_nested_samples_compose(spark):
    """rate 0.1 ⊂ rate 0.3 at the same salt; disjoint-ish at a
    different salt (not a strict property — just not identical)."""
    ids10 = {r["doc_id"] for r in hash_sample(_ids(spark, 2000), 0.1).collect()}
    ids30 = {r["doc_id"] for r in hash_sample(_ids(spark, 2000), 0.3).collect()}
    assert ids10 <= ids30
    other = {
        r["doc_id"]
        for r in hash_sample(_ids(spark, 2000), 0.1, salt="x").collect()
    }
    assert other != ids10


def test_rate_accuracy(spark):
    """Observed rate within a loose binomial tolerance (md5 uniform:
    n=5000, p=0.2 -> sd ~ 28; allow 5 sd)."""
    n = hash_sample(_ids(spark, 5000), 0.2).count()
    assert abs(n - 1000) < 150


def test_split_fraction_validation(spark):
    with pytest.raises(ValueError):
        deterministic_split(_ids(spark, 10), {"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError):
        deterministic_split(_ids(spark, 10), {"a": 1.5, "b": -0.5})


def test_single_bucket_degenerate(spark):
    """A one-name split assigns everything to that name."""
    rows = deterministic_split(_ids(spark, 50), {"all": 1.0}).collect()
    assert {r["split"] for r in rows} == {"all"}


def test_split_plan_stays_in_scan(spark):
    """The CASE expression is pure JVM: no Python eval, no exchange in
    the plan (whole-stage codegen keeps it inside the scan project)."""
    plan = (
        deterministic_split(_ids(spark, 100))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan


# -- token_budget_sample -----------------------------------------------------


def _budget_corpus(spark):
    rows = []
    for i in range(60):
        lang = "en" if i % 2 == 0 else "de"
        rows.append((i, " ".join(f"w{i}x{j}" for j in range(i % 10 + 1)), lang))
    rows.append((100, "", "en"))  # zero-token doc
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _brute_keep(rows, budget, salt=""):
    """Reference implementation: exact per-group md5-ordered greedy."""
    import hashlib
    from collections import defaultdict

    by_g = defaultdict(list)
    for doc_id, text, lang in rows:
        n = len([t for t in text.split() if t])
        h = hashlib.md5(f"{salt}:{doc_id}".encode()).hexdigest()
        by_g[lang].append((h, doc_id, n))
    keep = {}
    for g, docs in by_g.items():
        cum = 0
        for h, doc_id, n in sorted(docs):
            keep[doc_id] = cum < budget
            cum += n
    return keep


def test_token_budget_matches_bruteforce(spark):
    from tetrex_spark.functions.sampling import token_budget_sample

    df = _budget_corpus(spark)
    rows = [(r["doc_id"], r["text"], r["lang"]) for r in df.collect()]
    for budget in (0, 37, 120, 10_000):
        got = {
            r["doc_id"]: r["keep"]
            for r in token_budget_sample(df, budget, salt="s1").collect()
        }
        exp = _brute_keep(rows, budget, salt="s1")
        assert got == exp, f"budget={budget}"


def test_token_budget_per_group_dict(spark):
    from tetrex_spark.functions.sampling import token_budget_sample

    df = _budget_corpus(spark)
    out = token_budget_sample(df, {"en": 10_000, "de": 0}).collect()
    langs = {r["doc_id"]: r["doc_id"] % 2 == 0 or r["doc_id"] == 100
             for r in out}
    for r in out:
        if langs[r["doc_id"]]:       # en: unlimited -> everything kept
            assert r["keep"] is True
        else:                        # de: zero budget -> nothing kept
            assert r["keep"] is False
    # a group missing from the dict gets budget 0
    out2 = token_budget_sample(df, {"en": 10_000}).collect()
    assert all(not r["keep"] for r in out2 if not langs[r["doc_id"]])


def test_token_budget_partitioning_and_binning_invariance(spark):
    from tetrex_spark.functions.sampling import token_budget_sample

    df = _budget_corpus(spark)
    a = sorted(tuple(r) for r in
               token_budget_sample(df.repartition(1), 80).collect())
    b = sorted(tuple(r) for r in
               token_budget_sample(df.repartition(13), 80).collect())
    c = sorted(tuple(r) for r in
               token_budget_sample(df, 80, bin_hex_digits=1).collect())
    assert a == b == c  # bin width is an execution detail, not semantics


def test_token_budget_zero_token_docs(spark):
    from tetrex_spark.functions.sampling import token_budget_sample

    df = _budget_corpus(spark)
    got = {r["doc_id"]: r for r in token_budget_sample(df, 10_000).collect()}
    assert got[100]["n_tokens"] == 0
    assert got[100]["keep"] is True  # budget open -> free to keep


def test_token_budget_validation(spark):
    from tetrex_spark.functions.sampling import token_budget_sample

    df = _budget_corpus(spark)
    import pytest as _pt
    with _pt.raises(ValueError, match="bin_hex_digits"):
        token_budget_sample(df, 10, bin_hex_digits=0)
    with _pt.raises(ValueError, match="non-negative"):
        token_budget_sample(df, -1)
    with _pt.raises(ValueError, match="non-negative"):
        token_budget_sample(df, {"en": -5})


def test_token_budget_null_group(spark):
    """Docs with a null group column must not vanish (null join keys
    match nothing) — they form their own group: budgeted under an int
    budget, zero-budget under a dict."""
    from tetrex_spark.functions.sampling import token_budget_sample

    df = spark.createDataFrame(
        [(0, "a b c", None), (1, "d e f", "en"), (2, "g h", None)],
        "doc_id long, text string, lang string",
    )
    out = token_budget_sample(df, 100).collect()
    assert {r["doc_id"] for r in out} == {0, 1, 2}
    assert all(r["keep"] for r in out)
    out2 = {r["doc_id"]: r["keep"]
            for r in token_budget_sample(df, {"en": 100}).collect()}
    assert out2 == {0: False, 1: True, 2: False}


def test_token_budget_plan_shape(spark):
    """Bulk path: scan -> broadcast verdict join -> project, NO
    sort-merge anywhere; the only hash exchange feeds the edge-bin
    window (pre-filtered to edge rows)."""
    from tetrex_spark.functions.sampling import token_budget_sample

    df = _budget_corpus(spark)
    plan = (
        token_budget_sample(df, 80)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("SortMergeJoin") == 0
    assert plan.count("BroadcastHashJoin") == 2  # bulk + edge verdict join
    assert plan.count("Window") == 1
