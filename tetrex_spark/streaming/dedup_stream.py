"""Streaming ingestion dedup — the exact-dedup gate as a Structured
Streaming operator, for continuously-arriving web corpora.

The batch pipeline collapses exact duplicates by md5(normalized text)
(operators/dedup.exact_dedup / dup_groups). A streaming ingest needs the
same decision made incrementally with BOUNDED state: an unbounded
`dropDuplicates` would keep one state row per distinct document forever
(at web scale, the whole corpus in the state store). This operator uses
event-time watermarking over the crawl timestamp (`warc_ts` in the
canonical corpus shape), so the dedup state holds only the watermark
window — the standard Spark-native trade: an exact-duplicate re-crawled
AFTER the window re-enters the stream (and is then collapsed by the
periodic batch dedup, which owns cross-window duplicates).

Near-dup (MinHash/SimHash) streaming stays OUT of scope by design: its
blocking needs all-pairs context a watermark cannot bound; the
documented architecture is streaming exact-gate + periodic batch
near-dup over the accumulated store (lineage.CheckpointedDedup resumes
those batch jobs incrementally).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import norm_col


def streaming_exact_dedup(
    stream: DataFrame,
    *,
    text_col: str = "text",
    ts_col: str = "warc_ts",
    watermark: str = "24 hours",
) -> DataFrame:
    """First occurrence of each distinct normalized text within the
    watermark window; later copies are dropped. State is bounded by the
    watermark (dropDuplicatesWithinWatermark), so executor state-store
    size tracks the window's distinct-text count, not the corpus.

    Input must be a streaming DataFrame with an event-time `ts_col`.
    Output schema == input schema (a pass-through gate, composable with
    the stateless quality/PII gates tested in streaming)."""
    if not stream.isStreaming:
        raise ValueError("streaming_exact_dedup expects a streaming DataFrame")
    keyed = stream.withColumn("_dedup_grp", F.md5(norm_col(text_col)))
    return (
        keyed.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_dedup_grp"])
        .drop("_dedup_grp")
    )
