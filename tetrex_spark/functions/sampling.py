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
