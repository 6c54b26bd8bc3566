"""Distributed sketch build + merge — the UDAF family of the north rule.

The reference's index build (populate_index,
/root/reference/include/index_ibf.h:101-131) buffers k-mers per bin (A1),
sizes the filter to the largest bin (A2, :133-139) and bulk-inserts (A3,
:88-99) — all single-process. The Spark-first re-expression:

  stage 1 (map side, NO shuffle of raw data):
      mapInPandas over corpus partitions; each task folds its rows into
      one partial sketch per (bin_id, spec) it sees, Arrow-batch at a
      time, fully numpy-vectorized. This is the map-side combine: the
      shuffle then moves only serialized payloads (KB), never shingles.
  stage 2 (merge tree):
      groupBy(bin_id, name) + applyInPandas merging payloads. When the
      task count is large an intermediate salted level caps the fan-in
      (the treeAggregate shape, but expressed on DataFrames so AQE still
      plans it).

Scale notes (100 TB / 1000 executors):
  - raw keys never shuffle; partial count = tasks x bins-per-task.
  - merge fan-in capped by `fanin` via a deterministic-enough salt
    (spark_partition_id); merge is associative+commutative so grouping
    layout cannot change results (property-tested).
  - skewed hosts don't skew this build: partials are per *task*, so a hot
    bin simply appears in more tasks; no repartition-by-bin is needed.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernel import REGISTRY, from_bytes
from ..functions.text import (
    char_kgram_hashes_series,
    corpus_text_series,
    token_shingle_hashes_series,
)

SKETCH_ROW_SCHEMA = T.StructType(
    [
        T.StructField("bin_id", T.IntegerType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("n_items", T.LongType(), False),
    ]
)

KEY_SOURCES = ("token_shingle", "char_kgram", "token")
VALUE_SOURCES = ("doc_length_chars", "doc_length_tokens")


@dataclass(frozen=True)
class SketchSpec:
    """One sketch to build: which kernel, over which derived keys/values."""

    name: str
    kind: str  # bloom | hll | cms | kll | tdigest
    source: str  # token_shingle | char_kgram | token | doc_length_*
    k: int = 3  # shingle/gram width (key sources only)
    params: dict = field(default_factory=dict)
    seed: int = 42

    def __post_init__(self):
        if self.kind not in REGISTRY:
            raise ValueError(f"unknown sketch kind {self.kind!r}")
        if self.source not in KEY_SOURCES + VALUE_SOURCES:
            raise ValueError(f"unknown source {self.source!r}")

    def make(self):
        return REGISTRY[self.kind](**self.params)

    def manifest_entry(self) -> dict:
        return {
            "name": self.name,
            "kind": self.kind,
            "source": self.source,
            "k": self.k,
            "params": self.params,
            "seed": self.seed,
        }


def _extract(spec: SketchSpec, text: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """(concatenated keys/values, per-doc counts) for one Arrow batch."""
    if spec.source == "token_shingle":
        return token_shingle_hashes_series(text, spec.k, spec.seed)
    if spec.source == "char_kgram":
        return char_kgram_hashes_series(text, spec.k, spec.seed)
    if spec.source == "token":
        return token_shingle_hashes_series(text, 1, spec.seed)
    if spec.source == "doc_length_chars":
        vals = text.str.len().fillna(0).to_numpy(dtype=np.float64)
        return vals, np.ones(len(text), dtype=np.int64)
    if spec.source == "doc_length_tokens":
        vals = text.str.split().str.len().fillna(0).to_numpy(dtype=np.float64)
        return vals, np.ones(len(text), dtype=np.int64)
    raise AssertionError(spec.source)


def _partial_builder(specs: list[SketchSpec], has_html: bool):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[tuple[int, str], object] = {}
        items: dict[tuple[int, str], int] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            text = corpus_text_series(
                pdf["text"], pdf["html"] if has_html and "html" in pdf else None
            )
            bins = pdf["bin_id"].to_numpy(dtype=np.int64)
            for spec in specs:
                keys, counts = _extract(spec, text)
                if keys.size == 0:
                    continue
                key_bins = np.repeat(bins, counts)
                order = np.argsort(key_bins, kind="stable")
                sorted_bins = key_bins[order]
                sorted_keys = keys[order]
                uniq, starts = np.unique(sorted_bins, return_index=True)
                bounds = np.append(starts, sorted_bins.size)
                for i, b in enumerate(uniq):
                    seg = sorted_keys[bounds[i] : bounds[i + 1]]
                    kk = (int(b), spec.name)
                    sk = acc.get(kk)
                    if sk is None:
                        sk = acc[kk] = spec.make()
                        items[kk] = 0
                    sk.update(seg)
                    items[kk] += seg.size
        if acc:
            yield pd.DataFrame(
                {
                    "bin_id": [k[0] for k in acc],
                    "name": [k[1] for k in acc],
                    "payload": [sk.to_bytes() for sk in acc.values()],
                    "n_items": [items[k] for k in acc],
                }
            )

    return fn


def _merger(pdf: pd.DataFrame) -> pd.DataFrame:
    sk = from_bytes(pdf["payload"].iloc[0])
    for blob in pdf["payload"].iloc[1:]:
        sk.merge(from_bytes(blob))
    return pd.DataFrame(
        {
            "bin_id": [pdf["bin_id"].iloc[0]],
            "name": [pdf["name"].iloc[0]],
            "payload": [sk.to_bytes()],
            "n_items": [int(pdf["n_items"].sum())],
        }
    )


def build_sketches(
    corpus: DataFrame,
    specs: list[SketchSpec],
    *,
    fanin: int = 64,
) -> DataFrame:
    """corpus (must carry bin_id, text[, html]) -> sketch rows
    (bin_id, name, payload, n_items), one row per (bin, spec).

    Two-level merge tree engages automatically when the input has more
    partitions than `fanin` — partial rows first combine within salted
    sub-groups, then per (bin, name)."""
    if "bin_id" not in corpus.columns:
        raise ValueError("corpus needs a bin_id column (sources.corpus.with_bin_id)")
    has_html = "html" in corpus.columns
    cols = ["bin_id", "text"] + (["html"] if has_html else [])
    partials = corpus.select(*cols).mapInPandas(
        _partial_builder(specs, has_html), SKETCH_ROW_SCHEMA
    )
    n_parts = corpus.rdd.getNumPartitions()
    if n_parts > fanin:
        salted = partials.withColumn(
            "salt", (F.spark_partition_id() % F.lit(fanin)).cast("int")
        )
        level1 = salted.groupBy("bin_id", "name", "salt").applyInPandas(
            lambda pdf: _merger(pdf.drop(columns=["salt"])),
            SKETCH_ROW_SCHEMA,
        )
        partials = level1
    return partials.groupBy("bin_id", "name").applyInPandas(_merger, SKETCH_ROW_SCHEMA)


# -- sizing (reference parity: find_largest_bin + compute_bitcount) ----------


def max_bin_cardinality(corpus: DataFrame, source: str, k: int) -> int:
    """Upper bound on per-bin key count for Bloom sizing, computed with
    pure JVM expressions (one cheap aggregate scan, no UDF) — the analog
    of find_largest_bin (/root/reference/include/index_ibf.h:133-139).
    Counts are pre-dedup (an overestimate of distinct keys, hence safe)."""
    html_text = (
        F.regexp_replace(F.decode(F.col("html"), "UTF-8"), "<[^>]*>", " ")
        if "html" in corpus.columns
        else F.lit(None)
    )
    text = F.coalesce(F.col("text"), html_text, F.lit(""))
    if source == "char_kgram":
        cnt = F.greatest(F.length(text) - F.lit(k - 1), F.lit(0))
    elif source in ("token_shingle", "token"):
        ntok = F.size(F.split(F.trim(text), r"\s+"))
        w = 1 if source == "token" else k
        cnt = F.greatest(ntok - F.lit(w - 1), F.lit(0))
    else:
        raise ValueError(f"not a key source: {source}")
    row = (
        corpus.groupBy("bin_id")
        .agg(F.sum(cnt).alias("n"))
        .agg(F.max("n").alias("mx"))
        .collect()[0]
    )
    return int(row["mx"] or 0)


def collect_sketches(sketch_df: DataFrame) -> dict[tuple[int, str], object]:
    """Driver-side: materialize sketch rows into kernel objects."""
    return {
        (r["bin_id"], r["name"]): from_bytes(bytes(r["payload"]))
        for r in sketch_df.collect()
    }
