"""Unigram language-model quality scoring (CCNet-style, Wenzek et al.
2020): fit a unigram distribution on a reference corpus, then score
every document by its mean token log-probability / perplexity — the
cheap LM-quality gate a web-scale pipeline runs between the heuristic
quality filter and any neural scorer.

Scale shape:

- fitting is ONE groupBy(token) count with map-side combine,
  materialized once (localCheckpoint) because the total and the pruned
  model both read it; top_k selection is TakeOrderedAndProject (per-
  partition top-k, no global sort) with a deterministic tie-break, so
  the model stays broadcastable — web-crawl vocabularies are unbounded
  (typos, ids, junk), and the tail the cap drops is exactly the mass
  the OOV floor prices anyway;
- scoring explodes tokens (linear, stays on the executor), LEFT
  broadcast-joins the model — the corpus is never shuffled on token —
  and aggregates per doc with map-side combine;
- OOV tokens get the floor log p = ln(0.5 / total_fit_tokens), i.e.
  "rarer than anything retained", the standard additive-smoothing
  convention; everything is JVM-side (no Python in either pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.dedup import tokens_col

__all__ = ["unigram_model", "doc_logprob", "importance_weights", "bigram_pmi"]


def unigram_model(
    docs: DataFrame,
    *,
    top_k: int | None = 1_000_000,
    min_count: int = 1,
    text_col: str = "text",
) -> DataFrame:
    """(token, cnt, logp, total): the reference corpus's unigram
    distribution, log p = ln(cnt / total) with total counted BEFORE
    pruning (pruning changes which tokens are retained, not the
    prices — and the OOV floor needs the true total, which is why it
    rides along as a constant column). top_k keeps the most frequent
    tokens (ties broken by token string, so the model is identical at
    any parallelism); min_count drops hapax junk first. The counts
    table is materialized once: the model is a fit ARTIFACT — callers
    save or broadcast it, they don't refit per query."""
    counts = (
        docs.select(F.explode(tokens_col(text_col)).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    total = counts.agg(F.sum("cnt").alias("total"))
    model = counts
    if min_count > 1:
        model = model.filter(F.col("cnt") >= min_count)
    if top_k is not None:
        # orderBy + limit plans as TakeOrderedAndProject: per-partition
        # top-k then one bounded merge — never a full vocab sort
        model = model.orderBy(F.col("cnt").desc(), F.col("token").asc()).limit(
            top_k
        )
    return model.crossJoin(F.broadcast(total)).select(
        "token",
        "cnt",
        F.log(F.col("cnt") / F.col("total")).alias("logp"),
        "total",
    )


def doc_logprob(
    docs: DataFrame,
    model: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, n_tokens, mean_logp, perplexity): every document scored
    under `model` (a unigram_model frame). Docs with no tokens keep a
    row with n_tokens 0 and null scores — downstream gates decide, the
    scorer doesn't silently drop."""
    floor = model.select(
        F.log(F.lit(0.5) / F.max("total")).alias("__oov")
    )
    scored = (
        docs.select(
            F.col(id_col), F.explode(tokens_col(text_col)).alias("token")
        )
        .filter(F.col("token") != "")
        .join(F.broadcast(model.select("token", "logp")), "token", "left")
        .crossJoin(F.broadcast(floor))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.avg(F.coalesce(F.col("logp"), F.col("__oov"))).alias(
                "mean_logp"
            ),
        )
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            F.col("mean_logp"),
            F.exp(-F.col("mean_logp")).alias("perplexity"),
        )
    )


def importance_weights(
    docs: DataFrame,
    target_model: DataFrame,
    background_model: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, n_tokens, mean_logratio): DSIR-style importance weights
    (Xie et al. 2023) — per doc, the mean unigram log-likelihood ratio
    ln p_target(t) / ln p_background(t) between two unigram_model fits.
    Positive = looks like the target domain; rank or hash-threshold on
    it to resample a raw crawl toward a quality target (the selector
    behind "make CommonCrawl look like Wikipedia").

    Each side falls to its own OOV floor ln(0.5/total) when a token is
    missing from that model; a token in neither model contributes the
    constant floor difference. Same scale shape as doc_logprob: the two
    models full-outer-merge into ONE broadcast (token, logratio) map
    (bounded by the models' top_k), the corpus explodes tokens and
    LEFT-broadcast-joins it — never shuffled on token — and the per-doc
    mean aggregates with map-side combine. Docs with no tokens keep a
    null-scored row."""
    floors = (
        target_model.select(F.max("total").alias("__tt"))
        .crossJoin(background_model.select(F.max("total").alias("__tb")))
        .select(
            F.log(F.lit(0.5) / F.col("__tt")).alias("__ft"),
            F.log(F.lit(0.5) / F.col("__tb")).alias("__fb"),
        )
    )
    merged = (
        target_model.select("token", F.col("logp").alias("__lt"))
        .join(
            background_model.select("token", F.col("logp").alias("__lb")),
            "token",
            "full",
        )
        .crossJoin(F.broadcast(floors))
        .select(
            "token",
            (
                F.coalesce(F.col("__lt"), F.col("__ft"))
                - F.coalesce(F.col("__lb"), F.col("__fb"))
            ).alias("__lr"),
        )
    )
    scored = (
        docs.select(
            F.col(id_col), F.explode(tokens_col(text_col)).alias("token")
        )
        .filter(F.col("token") != "")
        .join(F.broadcast(merged), "token", "left")
        .crossJoin(F.broadcast(floors))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.avg(
                F.coalesce(F.col("__lr"), F.col("__ft") - F.col("__fb"))
            ).alias("mean_logratio"),
        )
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            F.col("mean_logratio"),
        )
    )


def bigram_pmi(
    docs: DataFrame,
    *,
    min_count: int = 5,
    top_k: int = 1000,
    order_by: str = "count",
    text_col: str = "text",
) -> DataFrame:
    """(tok_a, tok_b, cnt, pmi): adjacent-token collocations with
    pointwise mutual information ln(p(ab) / (p(a) p(b))) — phrase mining
    (Mikolov et al. 2013 §4's phrase score is a shifted variant), and
    the counting step a BPE-style vocab induction starts from.

    Scale shape: bigram emission is JVM-side (transform over window
    starts, exploded); the ONE heavy shuffle is the bigram groupBy
    count, map-side combined and pruned by min_count BEFORE the two
    unigram joins, which shuffle only surviving bigrams against the
    unigram count table; totals ride as broadcast scalars; top_k is
    TakeOrderedAndProject. order_by="count" (default) ranks by raw
    frequency — integer-deterministic across engines; "pmi" ranks by
    the float score (ties broken by tokens)."""
    if order_by not in ("count", "pmi"):
        raise ValueError(f"order_by must be 'count' or 'pmi', got {order_by!r}")
    toks = tokens_col(text_col)
    ne = F.filter(toks, lambda t: t != "")
    # Tokenize ONCE into a bound column: referencing the tokenizer
    # expression inside the bigram transform's lambda re-evaluated
    # split+regexp_replace PER BIGRAM (O(tokens^2) normalize work per
    # doc — this single entry measured ~28x on the emission scan). The
    # projection boundary survives CollapseProject because `__ts` is
    # non-cheap and multiply referenced.
    tok_docs = docs.select(ne.alias("__ts"))
    ts = F.col("__ts")
    pairs = F.when(
        F.size(ts) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(ts) - 1),
            lambda i: F.struct(
                F.element_at(ts, i).alias("tok_a"),
                F.element_at(ts, i + 1).alias("tok_b"),
            ),
        ),
    ).otherwise(F.expr("array()").cast("array<struct<tok_a:string,tok_b:string>>"))
    big = (
        tok_docs.select(F.explode(pairs).alias("p"))
        .select("p.tok_a", "p.tok_b")
        .groupBy("tok_a", "tok_b")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )
    uni = (
        tok_docs.select(F.explode(ts).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=True)  # totals + both joins read it
    )
    totals = uni.agg(F.sum("c").alias("n_uni"))
    # total bigram mass = sum over docs of max(n_tokens - 1, 0) — one
    # cheap scan-side aggregate (summing the pruned bigram table would
    # under-count by the min_count tail)
    n_bi = tok_docs.select(
        F.greatest(F.size(ts) - 1, F.lit(0)).alias("m")
    ).agg(F.sum("m").alias("n_bi"))
    scored = (
        big.join(uni.select(F.col("token").alias("tok_a"), F.col("c").alias("c_a")), "tok_a")
        .join(uni.select(F.col("token").alias("tok_b"), F.col("c").alias("c_b")), "tok_b")
        .crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(n_bi))
        .select(
            "tok_a",
            "tok_b",
            "cnt",
            F.log(
                (F.col("cnt") / F.col("n_bi"))
                / ((F.col("c_a") / F.col("n_uni")) * (F.col("c_b") / F.col("n_uni")))
            ).alias("pmi"),
        )
    )
    if order_by == "count":
        order = [F.col("cnt").desc(), F.col("tok_a").asc(), F.col("tok_b").asc()]
    else:
        order = [F.col("pmi").desc(), F.col("tok_a").asc(), F.col("tok_b").asc()]
    return scored.orderBy(*order).limit(top_k)
