"""CMS-driven heavy-hitter identification — the candidate pass promised
by kernel/cms.py (north-rule addition, SURVEY.md §2.6).

The exact top-k token query (`__spark_entry__.q_heavy_hitters_exact`)
shuffles every distinct token; at web scale the distinct-token set is the
long tail CMS exists to avoid. This operator's shape:

  pass 1 (CMS build): one corpus scan -> per-task compact CMS partials
      (build_sketches machinery, map-side only) -> one merged global CMS
      on the driver (depth x width ints, KBs) + the exact token total N.
  pass 2 (candidate identification + exact verify, one scan): broadcast
      the CMS; per Arrow batch, probe the batch's DISTINCT tokens and emit
      (token, local_count) ONLY for tokens whose estimate clears phi*N.
      Because CMS never underestimates, every true heavy hitter is emitted
      from every batch it appears in, so the downstream groupBy-sum is its
      EXACT global count — and that shuffle carries candidates only, never
      the tail.

Guarantees (Cormode & Muthukrishnan 2005): no false negatives (estimate
>= true count); false positives are removed by the exact verify, so the
output is exactly {token : true_count * phi_den >= N * phi_num}. The
threshold is a rational phi_num/phi_den compared in integer arithmetic —
bit-identical across engines (no float ceil() edge cases vs the SQL
oracle).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernel import from_bytes
from .sketch_build import SketchSpec, build_sketches

_CAND_SCHEMA = T.StructType(
    [
        T.StructField("token", T.StringType(), False),
        T.StructField("local_cnt", T.LongType(), False),
    ]
)


def build_global_cms(
    df: DataFrame, *, width: int = 8192, depth: int = 5, text_col: str = "text"
) -> tuple[object, int]:
    """One corpus scan -> (merged global CountMinSketch, exact token total).

    Reuses the sketch-build partial/merge machinery with a constant bin:
    partials stay compact (unique key-count pairs) until they outgrow the
    dense table, and the shuffle moves only serialized payloads."""
    corpus = df.select(F.lit(0).alias("bin_id"), F.col(text_col).alias("text"))
    spec = SketchSpec(
        "hh_cms", "cms", "token", k=1, params={"width": width, "depth": depth}
    )
    rows = build_sketches(corpus, [spec]).collect()
    if not rows:
        return None, 0
    return from_bytes(bytes(rows[0]["payload"])), int(rows[0]["n_items"])


def heavy_hitters(
    df: DataFrame,
    phi_num: int = 1,
    phi_den: int = 50,
    *,
    width: int = 8192,
    depth: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """All tokens with exact count >= (phi_num/phi_den) * N, with their
    exact counts — identified by a CMS candidate pass, verified exactly.

    Choose width so eps*N = (e/width)*N is well below the phi*N threshold,
    or the candidate set degrades toward all distinct tokens (still
    correct, just less pruning)."""
    if phi_num <= 0 or phi_den <= 0:
        raise ValueError("phi must be a positive rational")
    cms, n_total = build_global_cms(df, width=width, depth=depth, text_col=text_col)
    spark = df.sparkSession
    if cms is None:
        return spark.createDataFrame([], "token string, cnt long")
    b_cms = spark.sparkContext.broadcast(cms.to_bytes())
    bar = n_total * phi_num  # candidates: est * phi_den >= N * phi_num

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..functions.text import _combine_shingles, normalize_series
        from ..kernel.hashing import hash_str_series

        local = from_bytes(b_cms.value)
        for pdf in batches:
            if pdf.empty:
                continue
            # tokenize in-process: the Arrow transfer carries one row per
            # DOC, not one per token (the exploded formulation shipped
            # O(total tokens) rows through the Python worker for the same
            # value_counts)
            toks = normalize_series(pdf[text_col]).str.split(" ").explode()
            toks = toks[toks != ""]
            vc = toks.value_counts()
            if vc.empty:
                continue
            uniq = vc.index.to_series(index=range(len(vc)))
            # same key derivation as the build side's 'token' source: each
            # unique token is a one-token doc through the shingle combiner
            keys, _ = _combine_shingles(
                hash_str_series(uniq), np.ones(len(uniq), dtype=np.int64), 1
            )
            est = local.estimate(keys)
            keep = est * phi_den >= bar
            if keep.any():
                yield pd.DataFrame(
                    {
                        "token": uniq.to_numpy()[keep],
                        "local_cnt": vc.to_numpy()[keep],
                    }
                )

    cand_counts = df.select(text_col).mapInPandas(probe, _CAND_SCHEMA)
    return (
        cand_counts.groupBy("token")
        .agg(F.sum("local_cnt").alias("cnt"))
        .filter(F.col("cnt") * phi_den >= F.lit(bar))
        .select("token", "cnt")
    )


def heavy_hitters_topk(
    df: DataFrame,
    k: int = 20,
    phi_num: int = 1,
    phi_den: int = 50,
    *,
    width: int = 8192,
    depth: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Exact top-k tokens (deterministic tie-break on the token), computed
    over the CMS-pruned candidate set instead of a full distinct-token
    shuffle. Equal to the exact full groupBy top-k WHENEVER the k-th true
    count clears the phi threshold (i.e. there are >= k heavy hitters) —
    the practical regime for head-token analytics; if fewer candidates
    than k survive, the tail of the ranking would be wrong, so we raise
    rather than silently return a short/incorrect list."""
    from pyspark.sql.window import Window

    hh = heavy_hitters(
        df, phi_num, phi_den, width=width, depth=depth, text_col=text_col
    )
    w = Window.orderBy(F.desc("cnt"), F.col("token"))
    ranked = hh.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
    # localCheckpoint (<= k rows), not cache(): the count() guard needs a
    # materialization, and an explicit cache left on the returned frame
    # accumulates executor storage across repeated calls; checkpoint
    # blocks are released when the frame is garbage-collected
    out = ranked.select("token", "cnt", "rank").localCheckpoint(eager=True)
    n = out.count()
    if n < k:
        raise ValueError(
            f"only {n} tokens clear phi={phi_num}/{phi_den}; "
            f"top-{k} would be truncated — lower phi"
        )
    return out
