"""Incremental (cross-corpus) exact dedup: gate a NEW crawl increment
against a FROZEN reference corpus without rescanning the reference.

The reference's core architecture — approximate-membership prefilter,
then exact verification of the survivors (IBF probe → bin re-scan,
/root/reference/include/index_ibf.h:88-99 + query verification) —
applied to the training-data problem it fits best: at 10^12 reference
docs you cannot afford an anti-join of every new crawl against the full
corpus, but a one-time membership index makes the recurring gate cost
proportional to the INCREMENT, not the corpus:

  build (once per corpus freeze):
    hash every doc's normalized text to (h, h2) = two independent
    xxhash64s, route to `n_buckets` by pmod(h), and write
      <dir>/hashes   (bucket, h, h2) distinct, PARTITIONED BY bucket
                     (16 B/doc — the corpus text is never stored)
      <dir>/blooms   one kernel BloomFilter per bucket, sized to the
                     bucket's own key count at `fpr`
                     (kernel/bloom.py — same sizing rule as the
                     reference's per-bin filters)
      <dir>/params.json  normalization + layout guard

  gate (per increment):
    1. hash + route the increment the same way: ONE shuffle of the
       increment only; the reference is untouched.
    2. cogrouped Bloom probe: each bucket's filter is deserialized once
       per task and probed vectorized against that bucket's increment
       rows. "Definitely new" rows (no Bloom hit — no false negatives)
       exit here, which at realistic dup rates is almost everything.
    3. confirm the survivors: semi-join on (bucket, h, h2) against the
       hashes table, read with an explicit bucket IN (...) partition
       filter so only candidate buckets' files are scanned. Bloom false
       positives die here, making the gate EXACT (up to the 2^-128
       double-hash collision, documented below).

  Scale knobs: `n_buckets` bounds per-task memory (a bucket's filter +
  its increment rows are held by one cogroup task — size n_buckets so a
  bucket's hashes ≈ tens of MB; 10^12 docs at fpr 1e-2 ≈ 1.2 TB of
  filter total, fine across 10k buckets / 1000 executors, never on one
  node). The only driver-side data is the candidate bucket-id list
  (bounded by n_buckets, a config — same justification as
  lsh_bucket_stats).

Equality is hash equality on (h, h2): 128 independent bits per
normalized text, so a false "duplicate" verdict needs a double xxhash64
collision (~2^-128) — the price of never storing corpus text in the
index. Within-increment duplicates are NOT collapsed here (both copies
are "new" if absent from the reference); compose with exact_dedup for
intra-increment dedup.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernel.bloom import BloomFilter, bloom_m_bits
from .dedup import norm_col

LAYOUT_VERSION = 1
NORM_VERSION = 1  # the norm_col / normalize_series convention

_BLOOM_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType()),
        T.StructField("m_bits", T.LongType()),
        T.StructField("n_hashes", T.IntegerType()),
        T.StructField("n_keys", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def _hashed(df: DataFrame, n_buckets: int, text_col: str, id_col: str) -> DataFrame:
    """(id, h, h2, bucket): two independent xxhash64s of the normalized
    text (the second seeded by a literal tag column), bucket routed by
    pmod(h). Pure JVM; stays inside the scan's codegen stage."""
    norm = norm_col(text_col)
    return df.select(
        F.col(id_col),
        F.xxhash64(norm).alias("h"),
        F.xxhash64(norm, F.lit("memb2")).alias("h2"),
        F.pmod(F.xxhash64(norm), F.lit(n_buckets)).cast("int").alias("bucket"),
    )


def build_membership_index(
    df: DataFrame,
    out_dir: str,
    *,
    n_buckets: int = 64,
    fpr: float = 0.01,
    n_hashes: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """Freeze `df` into a membership index at `out_dir` (see module
    doc). Returns {n_buckets, n_keys, mean_fill} stats. One shuffle of
    the 16 B/doc hash projection; the text column never leaves the
    scan stage."""
    hashes = (
        _hashed(df, n_buckets, text_col, id_col)
        .select("bucket", "h", "h2")
        .distinct()
    )
    hashes.write.mode("overwrite").partitionBy("bucket").parquet(
        f"{out_dir}/hashes"
    )
    stored = df.sparkSession.read.parquet(f"{out_dir}/hashes")

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = pdf["h"].to_numpy(dtype="int64").view(np.uint64)
        bf = BloomFilter(bloom_m_bits(len(keys), fpr), n_hashes)
        bf.update(keys)
        return pd.DataFrame(
            {
                "bucket": [int(pdf["bucket"].iat[0])],
                "m_bits": [bf.m_bits],
                "n_hashes": [n_hashes],
                "n_keys": [len(keys)],
                "payload": [bf.bits.tobytes()],
            }
        )

    blooms = stored.groupBy("bucket").applyInPandas(build, _BLOOM_SCHEMA)
    blooms.write.mode("overwrite").parquet(f"{out_dir}/blooms")

    stats = (
        df.sparkSession.read.parquet(f"{out_dir}/blooms")
        .agg(
            F.sum("n_keys").alias("n_keys"),
            F.count(F.lit(1)).alias("n_filled_buckets"),
        )
        .collect()[0]
    )
    params = {
        "_layout": LAYOUT_VERSION,
        "norm_version": NORM_VERSION,
        "n_buckets": n_buckets,
        "fpr": fpr,
        "n_hashes": n_hashes,
        "n_keys": int(stats["n_keys"] or 0),
    }
    with open(os.path.join(out_dir, "params.json"), "w") as f:
        json.dump(params, f, indent=2, sort_keys=True)
    return {
        "n_buckets": n_buckets,
        "n_keys": params["n_keys"],
        "n_filled_buckets": int(stats["n_filled_buckets"]),
    }


def _read_params(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "params.json")) as f:
        params = json.load(f)
    if params.get("_layout") != LAYOUT_VERSION:
        raise ValueError(
            f"membership index at {index_dir} has layout "
            f"{params.get('_layout')}, this version reads layout "
            f"{LAYOUT_VERSION} — rebuild the index"
        )
    if params.get("norm_version") != NORM_VERSION:
        raise ValueError(
            f"membership index at {index_dir} was built with text "
            f"normalization v{params.get('norm_version')}, this version "
            f"hashes v{NORM_VERSION} — probes would silently miss; "
            "rebuild the index"
        )
    return params


def incremental_exact_dedup(
    increment: DataFrame,
    index_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, is_new): for every increment row, whether its normalized
    text is ABSENT from the frozen reference corpus behind `index_dir`
    (see module doc for the probe → confirm plan). Exact: Bloom false
    positives are confirmed away against the stored hashes; false
    negatives are impossible."""
    spark = increment.sparkSession
    params = _read_params(index_dir)
    n_buckets = int(params["n_buckets"])

    inc = _hashed(increment, n_buckets, text_col, id_col)
    blooms = spark.read.parquet(f"{index_dir}/blooms")

    out_schema = T.StructType(
        [
            increment.schema[id_col],
            T.StructField("h", T.LongType()),
            T.StructField("h2", T.LongType()),
            T.StructField("bucket", T.IntegerType()),
            T.StructField("maybe_dup", T.BooleanType()),
        ]
    )

    def probe(inc_pdf: pd.DataFrame, bloom_pdf: pd.DataFrame) -> pd.DataFrame:
        if inc_pdf.empty:
            return pd.DataFrame(
                {
                    id_col: pd.Series(dtype=inc_pdf[id_col].dtype),
                    "h": pd.Series(dtype="int64"),
                    "h2": pd.Series(dtype="int64"),
                    "bucket": pd.Series(dtype="int32"),
                    "maybe_dup": pd.Series(dtype=bool),
                }
            )
        if bloom_pdf.empty:
            # reference has no keys in this bucket: definitely new
            hit = np.zeros(len(inc_pdf), dtype=bool)
        else:
            row = bloom_pdf.iloc[0]
            bf = BloomFilter(
                int(row["m_bits"]),
                int(row["n_hashes"]),
                bits=np.frombuffer(row["payload"], dtype=np.uint8),
            )
            hit = bf.contains(
                inc_pdf["h"].to_numpy(dtype="int64").view(np.uint64)
            )
        return pd.DataFrame(
            {
                id_col: inc_pdf[id_col],
                "h": inc_pdf["h"],
                "h2": inc_pdf["h2"],
                "bucket": inc_pdf["bucket"],
                "maybe_dup": hit,
            }
        )

    probed = (
        inc.groupBy("bucket")
        .cogroup(blooms.groupBy("bucket"))
        .applyInPandas(probe, out_schema)
        .localCheckpoint(eager=True)  # one pass; reused by 3 consumers
    )

    cand = probed.filter("maybe_dup")
    # candidate bucket list: bounded by n_buckets (a config), so the
    # collect is driver-tiny by construction — it buys a LITERAL
    # partition filter on the hashes read (real file pruning, which a
    # join key alone would only get via best-effort DPP).
    cand_buckets = [int(r["bucket"]) for r in cand.select("bucket").distinct().collect()]
    if cand_buckets:
        hashes = spark.read.parquet(f"{index_dir}/hashes").filter(
            F.col("bucket").isin(cand_buckets)
        )
        confirmed = cand.join(hashes, ["bucket", "h", "h2"], "left_semi")
    else:
        confirmed = cand.limit(0)
    dup_ids = confirmed.select(id_col)
    return (
        probed.select(id_col)
        .join(dup_ids.withColumn("__dup", F.lit(True)), id_col, "left")
        .select(F.col(id_col), F.coalesce(F.col("__dup"), F.lit(False)).alias("is_dup"))
        .select(F.col(id_col), (~F.col("is_dup")).alias("is_new"))
    )
