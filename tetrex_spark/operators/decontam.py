"""Benchmark decontamination: flag training documents that share token
n-grams with an evaluation/benchmark set.

The standard pre-training hygiene pass (Brown et al. 2020 §C "13-gram
overlap"; Chowdhery et al. 2022 §6): any training document containing a
long-enough verbatim token window from a benchmark is contaminated and
must be dropped before the benchmark can measure anything. The same
query class as TetRex's membership probes — "does this document contain
any indexed pattern?" (include/index_ibf.h probe loop) — with the
benchmark's n-grams as the pattern set.

Scale shape (the benchmark side is SMALL — eval sets are thousands of
rows; the docs side is the 100 TB corpus):

- both sides tokenize and window ENTIRELY JVM-side (split + transform +
  slice inside whole-stage codegen; no Python, no UDF);
- grams are xxhash64-compressed before the join, so the exploded corpus
  rows carry 8 bytes each, not ~80-byte 13-gram strings;
- the benchmark's distinct gram set is BROADCAST — the corpus is never
  shuffled; the only wide op is the final groupBy(doc_id) count, which
  combines map-side (hit rows are rare by construction);
- per-doc gram explosion is linear in token count and never leaves the
  executor before the broadcast semi-join prunes it.

A clean doc flagged by a 64-bit gram-hash collision needs a colliding
pair among (docs grams x benchmark grams), ~2^-64 per pair — the same
accepted bound as exact_dedup's digest argument; the DuckDB oracle
compares exact strings and the CORRECTNESS gate would surface any
collision on the fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import tokens_col

__all__ = ["decontaminate", "benchmark_gram_hashes"]


def _gram_hashes(text_col: str, n: int):
    """Distinct xxhash64 of every n-token window of the normalized text,
    as an array column — pure JVM (codegen), no Python.

    The token array is bound once through a single-element-array
    transform (same 'let' pattern as dedup.shingles_col): a lambda body
    re-evaluates captured outer expressions per element, so slicing the
    raw tokenizer expression inside the window lambda re-ran
    split+regexp_replace per window."""
    toks = tokens_col(text_col)

    def windows(ts):
        # sequence(1, stop) DESCENDS when stop < 1 (it would emit index
        # 0), so docs shorter than n tokens get an explicit empty list
        starts = F.when(
            F.size(ts) >= n, F.sequence(F.lit(1), F.size(ts) - (n - 1))
        ).otherwise(F.expr("array()").cast("array<int>"))
        return F.array_distinct(
            F.transform(
                starts,
                lambda i: F.xxhash64(F.array_join(F.slice(ts, i, n), " ")),
            )
        )

    return F.get(F.transform(F.array(toks), windows), 0)


def benchmark_gram_hashes(
    benchmark: DataFrame, *, n: int = 13, text_col: str = "text"
) -> DataFrame:
    """(gram) — the benchmark's distinct n-gram hash set, one column of
    int64. Kept as a DataFrame (not a collected set) so callers can
    persist it next to the eval suite and reuse it across corpus sweeps;
    decontaminate() broadcasts it."""
    return (
        benchmark.select(
            F.explode(_gram_hashes(text_col, n)).alias("gram")
        ).distinct()
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 13,
    min_hits: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """(id_col, n_hit_grams, is_clean): per training document, how many
    DISTINCT token n-grams it shares with the benchmark set, and the
    keep verdict (shared grams < min_hits).

    Documents shorter than n tokens have no grams and are clean by
    definition; benchmark rows shorter than n tokens contribute nothing.
    Raising min_hits tolerates incidental single-window collisions
    (boilerplate idioms) while still catching verbatim inclusions, which
    hit with every window they cover."""
    if n < 1 or min_hits < 1:
        raise ValueError(f"need n >= 1 and min_hits >= 1, got {n}, {min_hits}")
    bench = benchmark_gram_hashes(benchmark, n=n, text_col=bench_text_col)
    hits = (
        docs.select(
            F.col(id_col), F.explode(_gram_hashes(text_col, n)).alias("gram")
        )
        .join(F.broadcast(bench), "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hit_grams"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_hit_grams"), F.lit(0)).alias("n_hit_grams"),
            (F.coalesce(F.col("n_hit_grams"), F.lit(0)) < min_hits).alias(
                "is_clean"
            ),
        )
    )
