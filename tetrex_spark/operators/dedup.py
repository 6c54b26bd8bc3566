"""Deduplication operators for training-data pipelines — exact, MinHash
LSH, SimHash, and exact n-gram Jaccard.

Not present in the reference (TetRex answers membership, not similarity)
but required by the graft: the same shingle machinery that feeds the
Bloom index feeds these. Scale design:

  - candidate generation is 100% JVM expressions (split / transform /
    xxhash64 / min-agg): whole-stage-codegen, no Python in the hot path;
  - the only O(corpus) shuffles are groupBy(doc) over shingle hashes
    (map-side combined) and the band-bucket self-join, whose build side
    is (doc, band_hash) rows — tiny next to the corpus;
  - exact Jaccard verification touches only LSH candidate pairs, which
    is the filter-then-verify architecture of the reference
    (include/query.h:265-281) transplanted to similarity.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

NORM = "lower(trim(regexp_replace({c}, '\\\\s+', ' ')))"


def norm_col(c: str):
    """JVM-side normalization, equal to functions.text.normalize_series
    for already-single-spaced input (tested for agreement)."""
    return F.expr(NORM.format(c=c))


def tokens_col(c: str):
    return F.split(norm_col(c), " ")


def shingles_col(c: str, k: int):
    """Array of token k-shingle strings (JVM transform over slice)."""
    toks = tokens_col(c)
    return F.when(
        F.size(toks) < k, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(k - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        )
    )


# -- exact ---------------------------------------------------------------


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct normalized text with
    the kept (minimum) id and the duplicate count."""
    return (
        df.select(F.col(id_col), norm_col(text_col).alias("norm_text"))
        .groupBy("norm_text")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


# -- exact n-gram jaccard (the oracle-able base) ---------------------------


def jaccard_pairs_exact(
    df: DataFrame, k: int = 3, threshold: float = 0.8,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """All-pairs exact k-shingle Jaccard >= threshold via a shingle
    equi-join (scales as sum of shingle-bucket squares — use the LSH
    variant for big corpora; this one is the correctness oracle)."""
    ds = (
        df.select(F.col(id_col).alias("id"), F.explode(shingles_col(text_col, k)).alias("g"))
        .distinct()
    )
    sizes = ds.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    a, b = ds.alias("a"), ds.alias("b")
    inter = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n").alias("nb"))
    return (
        inter.join(sa, "id_a").join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


# -- minhash + LSH ----------------------------------------------------------


_SIG_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("sig", T.ArrayType(T.LongType(), False), False),
    ]
)

_MH_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def minhash_signatures(
    df: DataFrame, k: int = 3, num_perm: int = 64,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """(id, sig: array<long>[num_perm]) — numpy minhash inside mapInPandas.

    Each doc's signature is computed where the doc's row lives, so the
    shingle stream never shuffles at all (an earlier 64-column
    groupBy-min formulation also paid seconds of Janino codegen for the
    64-aggregate plan). Each permutation is an independent splitmix64
    re-mix of the kernel shingle hash: g_i(x) = splitmix64(x ^ seed_i).
    (A cheaper h1 + i*h2 double-hash is NOT sound here: minima across i
    track the lower envelope of lines, so the permutations are strongly
    correlated and band-match counts get fat tails — observed as whole
    near-dup pairs missed at jaccard 0.71.)
    Docs with fewer than k tokens have no shingles and emit no row."""
    from ..functions.text import normalize_series, token_shingle_hashes_series
    from ..kernel.hashing import splitmix64

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            text = normalize_series(pdf[text_col])
            sh, counts = token_shingle_hashes_series(text, k)
            valid = counts > 0
            if sh.size == 0 or not valid.any():
                continue
            seeds = splitmix64(
                np.arange(1, num_perm + 1, dtype=np.uint64) * _MH_GOLDEN
            )
            starts = np.zeros(len(counts), dtype=np.int64)
            np.cumsum(counts[:-1], out=starts[1:])
            vstarts = starts[valid]
            sig = np.empty((int(valid.sum()), num_perm), dtype=np.uint64)
            for i in range(num_perm):
                arr = splitmix64(sh ^ seeds[i])
                sig[:, i] = np.minimum.reduceat(arr, vstarts)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy()[valid],
                    "sig": list(sig.view(np.int64)),
                }
            )

    return df.select(id_col, text_col).mapInPandas(fn, _SIG_SCHEMA)


_SETS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("s", T.ArrayType(T.LongType(), False), False),
    ]
)


def _shingle_sets(
    df: DataFrame, k: int, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, sorted distinct k-shingle hashes) per doc with >= 1 shingle —
    one vectorized pass, computed where the doc lives (no shuffle)."""
    from ..functions.text import normalize_series, token_shingle_hashes_series

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            text = normalize_series(pdf[text_col])
            sh, counts = token_shingle_hashes_series(text, k)
            valid = counts > 0
            if sh.size == 0 or not valid.any():
                continue
            starts = np.zeros(len(counts), dtype=np.int64)
            np.cumsum(counts[:-1], out=starts[1:])
            ids = pdf[id_col].to_numpy()[valid]
            sets = [
                np.unique(sh[st : st + c]).view(np.int64)
                for st, c in zip(starts[valid], counts[valid])
            ]
            yield pd.DataFrame({"id": ids, "s": sets})

    return df.select(id_col, text_col).mapInPandas(fn, _SETS_SCHEMA)


def minhash_lsh_pairs(
    df: DataFrame, k: int = 3, num_perm: int = 128, bands: int = 32,
    threshold: float = 0.8, text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Near-duplicate pairs via banded MinHash LSH + exact-Jaccard verify.

    bands x rows = num_perm; a pair collides in some band w.p.
    1-(1-j^r)^b — at the default (32x4) recall is ~0.99985 for j>=0.7
    and ~1-5e-8 for j>=0.8, and the exact verify removes all false
    positives, so the output equals the exact all-pairs result with
    overwhelming (deterministic-given-seed) probability."""
    if num_perm % bands:
        raise ValueError("bands must divide num_perm")
    r = num_perm // bands
    sig = minhash_signatures(df, k, num_perm, text_col, id_col)
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(F.slice("sig", b * r + 1, r)).alias("bh"),
        )
        for b in range(bands)
    ]
    buckets = sig.select(
        "id", F.explode(F.array(*band_cols)).alias("bb")
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    x, y = buckets.alias("x"), buckets.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bh") == F.col("y.bh"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    # exact verify on candidates only (filter-then-verify). Each doc's
    # distinct-shingle-hash set is computed as a sorted array in the same
    # vectorized kernel pass the signatures use — zero shuffle, no
    # interpreted higher-order JVM shingle expressions (transform/slice/
    # concat_ws run ~1000x slower per shingle than the buffer hasher).
    # The (tiny) candidate-pair side is broadcast into two map-side joins
    # and jaccard is array_intersect arithmetic. Hash-collision risk is
    # ~n^2/2^64 — the tolerance minhash itself assumes. Web documents are
    # length-bounded, so a per-doc set array is executor-memory-safe.
    sets = _shingle_sets(df, k, text_col, id_col)
    sa = sets.select(F.col("id").alias("id_a"), F.col("s").alias("s_a"))
    sb = sets.select(F.col("id").alias("id_b"), F.col("s").alias("s_b"))
    inter = F.size(F.array_intersect("s_a", "s_b"))
    return (
        F.broadcast(cand).join(sa, "id_a").join(sb, "id_b")
        .withColumn(
            "jaccard",
            inter / (F.size("s_a") + F.size("s_b") - inter),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


# -- simhash -----------------------------------------------------------------


_SIMHASH_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("simhash", T.LongType(), False),
    ]
)


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash of token hashes (Charikar 2002), vectorized numpy
    inside mapInPandas: unpack token-hash bits -> signed column sums ->
    sign -> fingerprint."""
    from ..functions.text import normalize_series, token_shingle_hashes_series

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            text = normalize_series(pdf[text_col])
            hashes, counts = token_shingle_hashes_series(text, 1)
            bits = np.unpackbits(
                hashes.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
            ).astype(np.int32)  # (n_tokens, 64)
            signed = 2 * bits - 1
            out = np.zeros(len(pdf), dtype=np.uint64)
            off = 0
            for i, c in enumerate(counts):
                if c > 0:
                    s = signed[off : off + c].sum(axis=0)
                    out[i] = np.packbits(
                        (s > 0).astype(np.uint8), bitorder="little"
                    ).view(np.uint64)[0]
                off += c
            yield pd.DataFrame(
                {"id": pdf[id_col].to_numpy(), "simhash": out.view(np.int64)}
            )

    return df.select(id_col, text_col).mapInPandas(fn, _SIMHASH_SCHEMA)


def simhash_pairs(
    df: DataFrame, max_hamming: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Near-dup candidate pairs with hamming(simhash) <= max_hamming via
    4x16-bit band exact-match blocking + bit_count verify (both JVM)."""
    sh = simhash(df, text_col, id_col)
    bands = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright(F.col("simhash"), b * 16).bitwiseAND(F.lit(0xFFFF)).alias("chunk"),
        )
        for b in range(4)
    ]
    buckets = sh.select("id", "simhash", F.explode(F.array(*bands)).alias("bb")).select(
        "id", "simhash", F.col("bb.band").alias("band"), F.col("bb.chunk").alias("chunk")
    )
    x, y = buckets.alias("x"), buckets.alias("y")
    return (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.chunk") == F.col("y.chunk"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.bit_count(
                F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
