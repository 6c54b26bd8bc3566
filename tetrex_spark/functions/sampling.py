"""Deterministic, append-stable dataset splitting and sampling.

The training-data counterpart of the reference's reproducible index
builds (TetRex builds are a pure function of corpus + params;
include/index.h:61-74 pins params in the index header): every split /
sample decision here is a pure function of (stable key, salt) — no RNG
state, no row order, no partitioning dependence. Adding documents to a
corpus never reassigns existing ones (the property random-number splits
lose the moment the row count changes), so train/test contamination
cannot creep in across crawls, and a 10^12-doc split is just a filter.

Mechanism: md5(salt ':' key) yields 128 uniform bits as 32 lowercase
hex chars IDENTICALLY in every engine (Spark, DuckDB, Python's
hashlib); a fraction f becomes the hex threshold floor(f * 2^128), and
lexicographic comparison of the digest against cumulative thresholds
assigns the bucket. Pure JVM column expressions — no UDF, no shuffle;
whole-stage codegen keeps it inside the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hex_threshold",
    "split_column",
    "deterministic_split",
    "hash_sample",
]


def hex_threshold(fraction: float) -> str:
    """floor(fraction * 2^128) as 32 lowercase hex chars — the value t
    such that P[md5_hex < t] = fraction for a uniform 128-bit digest."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return format(min(int(fraction * (1 << 128)), (1 << 128) - 1), "032x")


def _digest(key: Column, salt: str) -> Column:
    return F.md5(F.concat(F.lit(salt), F.lit(":"), key.cast("string")))


def split_column(
    key: Column, fractions: dict[str, float], salt: str = ""
) -> Column:
    """CASE expression assigning each row a split name by where
    md5(salt ':' key) falls among the cumulative fraction thresholds.
    Iteration order of `fractions` defines the threshold order (dicts
    preserve insertion order), so callers get a stable layout."""
    total = sum(fractions.values())
    if not 0.999999 <= total <= 1.000001:
        raise ValueError(f"fractions must sum to 1, got {total}")
    if any(f < 0 for f in fractions.values()):
        raise ValueError("fractions must be non-negative")
    d = _digest(key, salt)
    names = list(fractions)
    cum = 0.0
    expr = None
    # one chained CASE over ascending cumulative thresholds; the first
    # matching `digest < threshold` wins, the final name is the ELSE
    for name in names[:-1]:
        cum += fractions[name]
        c = d < F.lit(hex_threshold(cum))
        expr = F.when(c, F.lit(name)) if expr is None else expr.when(c, F.lit(name))
    return F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))


def deterministic_split(
    df: DataFrame,
    fractions: dict[str, float] | None = None,
    *,
    id_col: str = "doc_id",
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """df + `out_col`: append-stable train/val/test assignment (default
    80/10/10) keyed on md5(salt ':' id). Same id + same salt -> same
    split in every run, engine, partitioning, and corpus superset;
    change `salt` to draw an independent split."""
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    return df.withColumn(
        out_col, split_column(F.col(id_col), fractions, salt)
    )


def hash_sample(
    df: DataFrame, rate: float, *, id_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Deterministic ~`rate` downsample: keep rows whose digest falls
    below floor(rate * 2^128). Unlike DataFrame.sample this is a pure
    row predicate — reproducible across runs/partitionings, and nested
    samples compose (rate 0.1 ⊂ rate 0.2 at the same salt)."""
    return df.filter(
        _digest(F.col(id_col), salt) < F.lit(hex_threshold(rate))
    )


def token_budget_sample(
    df: DataFrame,
    budget: int | dict[str, int],
    *,
    by: str = "lang",
    salt: str = "",
    bin_hex_digits: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, n_tokens, keep): greedily fill a per-group token budget
    in deterministic md5 order — the "mix N billion tokens per language"
    step of a training-data pipeline, append-stable like everything in
    this module (a doc's keep verdict changes only if the budget or salt
    does, never because the corpus grew behind it in hash order... docs
    AHEAD of it in hash order can displace it — the budget is a quota,
    not a split).

    Keep rule: order each group by (md5(salt ':' id), id); a doc is kept
    iff the EXCLUSIVE prefix token sum before it is < its group's
    budget (C4-style greedy fill: the straddling doc is kept, so the
    realized total may overshoot by part of one document).

    Scale shape — the naive formulation is a per-group window cumsum,
    i.e. ONE reducer per language over 10^12 rows. Instead:

      1. bin docs by the digest's first `bin_hex_digits` hex chars
         (16^d bins, order-compatible with the full digest ordering);
      2. aggregate per-(group, bin) token sums — map-side combine, and
         the ONLY driver-side data: groups x 16^d rows (size 16^d so a
         bin ~ corpus/16^d rows; 4 -> 65536);
      3. the driver cumsums bins per group: bins strictly under budget
         keep wholesale, bins past it drop wholesale, and AT MOST ONE
         boundary bin per group resolves per-doc — a window over a
         single bin's rows, never the corpus.

    Zero-token docs are kept while the budget is open (they cost
    nothing) and dropped after — the same `before < budget` rule."""
    if bin_hex_digits < 1 or bin_hex_digits > 8:
        raise ValueError(f"bin_hex_digits must be 1..8, got {bin_hex_digits}")
    budgets = budget if isinstance(budget, dict) else None
    if budgets is not None and any(b < 0 for b in budgets.values()):
        raise ValueError("budgets must be non-negative")
    if budgets is None and budget < 0:
        raise ValueError("budget must be non-negative")

    from ..operators.dedup import tokens_col

    # null groups map to a sentinel: a null join key would match nothing
    # and silently DROP those docs from both output paths; as a group
    # they behave like any other unknown group (dict budgets: 0)
    base = df.select(
        F.col(id_col),
        F.coalesce(F.col(by).cast("string"), F.lit("\x00")).alias("__g"),
        _digest(F.col(id_col), salt).alias("__h"),
        F.size(F.filter(tokens_col(text_col), lambda t: t != ""))
        .cast("long")
        .alias("n_tokens"),
    ).withColumn(
        "__bin",
        F.conv(F.substring("__h", 1, bin_hex_digits), 16, 10).cast("long"),
    ).localCheckpoint(eager=False)
    # ^ lazy checkpoint, materialized by the bin-sum collect below: the
    # output join re-reads this ~60 B/row projection from storage
    # instead of re-running tokenize+md5 over the corpus a second time
    # (the tokenizer pass is the dominant per-row cost of both scans)

    # the ONLY driver-side data: one (token-sum) row per non-empty
    # (group, bin) — bounded by groups x 16^bin_hex_digits
    sums = base.groupBy("__g", "__bin").agg(F.sum("n_tokens").alias("s")).collect()
    per_group: dict = {}
    for r in sums:
        per_group.setdefault(r["__g"], []).append((r["__bin"], r["s"]))
    # cum is monotone non-decreasing along a group's sorted bins, so the
    # per-bin verdicts are always keep* [edge] drop* — ship ONE boundary
    # row per GROUP (edge bin, tokens before it, first non-keep bin)
    # instead of a groups x bins verdict table (the re-shipped verdict
    # frame was the entry's largest driver->executor transfer):
    #   keep  iff cut is null or bin < cut
    #   edge  iff bin == edge_bin
    #   drop  otherwise
    summaries = []  # (group, edge_bin | None, tokens-before-edge, cut | None)
    for g, bins in per_group.items():
        b_g = budgets.get(g, 0) if budgets is not None else budget
        cum = 0
        edge_bin = before_edge = cut = None
        for b, s in sorted(bins):
            if cum >= b_g:
                cut = b
                break
            if cum + s >= b_g:
                edge_bin, before_edge, cut = b, cum, b
                break
            cum += s
        summaries.append((g, edge_bin, before_edge or 0, cut))
    spark = df.sparkSession
    vdf = spark.createDataFrame(
        summaries, "__g string, __e long, __before long, __cut long"
    )
    joined = base.join(F.broadcast(vdf), ["__g"], "left")
    is_edge = F.col("__e").isNotNull() & (F.col("__bin") == F.col("__e"))

    # bulk path: verdict decided, NO shuffle — the corpus flows scan ->
    # broadcast join -> project
    bulk = joined.filter(~is_edge).select(
        F.col(id_col),
        F.col("n_tokens"),
        (F.col("__cut").isNull() | (F.col("__bin") < F.col("__cut"))).alias(
            "keep"
        ),
    )

    # edge path: at most ONE bin per group resolves per-doc; the window
    # sorts only those rows (a bin ~ corpus/16^bin_hex_digits docs)
    from pyspark.sql import Window

    w = (
        Window.partitionBy("__g", "__bin")
        .orderBy(F.col("__h").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    if budgets is not None:
        bcol = F.coalesce(
            F.create_map(
                *[x for g, b in budgets.items() for x in (F.lit(g), F.lit(b))]
            )[F.col("__g")],
            F.lit(0),
        )
    else:
        bcol = F.lit(budget)
    edge = joined.filter(is_edge).select(
        F.col(id_col),
        F.col("n_tokens"),
        (
            F.col("__before")
            + F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
            < bcol
        ).alias("keep"),
    )
    return bulk.unionByName(edge)
