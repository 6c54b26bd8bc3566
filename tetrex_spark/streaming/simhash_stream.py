"""Streaming SimHash near-dup gate — a CUSTOM STATEFUL operator via
applyInPandasWithState (the one streaming shape foreachBatch cannot
express): per band-bucket state of previously-seen fingerprints, so a
newly-arriving document is paired against near-duplicates from EARLIER
micro-batches without re-scanning the store.

Shape:
  fingerprint stream (id, simhash)
    -> explode pigeonhole band keys (simhash_band_struct — the SAME
       JVM expressions the batch pair join blocks with, so streaming
       and batch agree on candidate generation)
    -> groupBy(band, bh).applyInPandasWithState:
         state = up to `max_per_key` (id, fp) pairs seen in this bucket;
         each new fingerprint is hamming-checked (vectorized popcount)
         against the stored ones AND the earlier arrivals of its own
         batch, emitting (id_a, id_b, hamming) for every hit.

Guarantees and bounds:
  - recall within state: deterministic pigeonhole — a pair at hamming <=
    max_hamming shares at least one untouched block combination, so some
    shared bucket emits it (hash collisions only ADD checks; the popcount
    verify removes them). Cross-band duplicate emissions are possible
    (same pair found via two bands) — dedupe downstream if exact-once
    pairs are needed (the batch path's `distinct` plays that role).
  - state per key is CAPPED at `max_per_key` fingerprints (oldest kept;
    overflow arrivals are not stored but ARE checked — against the stored
    state, against the FIRST `max_per_key` arrivals of their own chunk,
    and against their own 1024-row strip, so two overflow arrivals
    landing close together in one micro-batch chunk still pair with each
    other; overflow-vs-overflow beyond that window — across
    chunks/batches or past the in-chunk cap — is dropped, the streaming
    analog of the batch path's whole-bucket cap drops. The in-chunk cap
    also bounds per-batch COMPUTE at O(n_chunk * (max_per_key + 1024))
    popcounts, so a giant near-dup cluster cannot stall the stream
    inside one applyInPandasWithState call) and optionally expired by a
    processing-time timeout — both bounds echo the batch path's bucket
    caps and the watermark bound of streaming_exact_dedup. State is
    REWRITTEN only when membership changed (a full bucket seeing only
    overflow arrivals costs no state serialization).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.dedup import simhash_band_struct

PAIR_SCHEMA = T.StructType(
    [
        T.StructField("id_a", T.LongType(), False),
        T.StructField("id_b", T.LongType(), False),
        T.StructField("hamming", T.IntegerType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ids", T.ArrayType(T.LongType()), True),
        T.StructField("fps", T.ArrayType(T.LongType()), True),
    ]
)


def _bucket_fn(max_hamming: int, max_per_key: int, ttl_ms: int | None):
    from ..kernel.hashing import popcount64

    def _emit(a, b, d, frames):
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        frames.append(
            pd.DataFrame(
                {"id_a": lo, "id_b": hi, "hamming": d.astype(np.int32)}
            )
        )

    def fn(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            ids_list, fps_list = state.get
            ids = np.asarray(ids_list, dtype=np.int64)
            fps = np.asarray(fps_list, dtype=np.int64)
        else:
            ids = np.zeros(0, dtype=np.int64)
            fps = np.zeros(0, dtype=np.int64)
        def _pairs_between(aids, afps, bids, bfps):
            """Emit (a, b) cross pairs at hamming <= max_hamming — one
            bounded XOR-popcount matrix."""
            d = popcount64(
                np.bitwise_xor(
                    afps.view(np.uint64)[:, None], bfps.view(np.uint64)[None, :]
                )
            ).reshape(aids.size, bids.size)
            ai, bi = np.nonzero(
                (d <= max_hamming) & (aids[:, None] != bids[None, :])
            )
            if ai.size:
                _emit(aids[ai], bids[bi], d[ai, bi], frames)

        # strip width bounds the transient matrices at TILE x
        # max(TILE, max_per_key) int64 regardless of chunk size — a giant
        # near-dup cluster routing a 100k-row chunk into one bucket must
        # not allocate an O(n_chunk^2) matrix (the cap bounds STATE, not
        # arrivals)
        TILE = 1024
        frames: list[pd.DataFrame] = []
        changed = False
        for pdf in pdfs:
            if pdf.empty:
                continue
            # deterministic in-batch order (matches the batch id_a < id_b
            # canonical form)
            pdf = pdf.sort_values("id")
            nids = pdf["id"].to_numpy(np.int64)
            nfps = pdf["simhash"].to_numpy(np.int64)
            # `seen` (earlier arrivals of this chunk) is CAPPED at
            # max_per_key rows, so per-chunk compute is O(n_chunk *
            # (max_per_key + TILE)) popcounts, not O(n_chunk^2): a giant
            # near-dup cluster routing a 100k-row chunk into one bucket
            # pairs each arrival against the stored state, the first
            # max_per_key arrivals of the chunk, and its own strip —
            # overflow-vs-overflow beyond that window is dropped, the
            # same beyond-cap drop semantics the cross-chunk/batch path
            # already has (and the batch operator's whole-bucket cap).
            seen: list[tuple[np.ndarray, np.ndarray]] = []
            seen_rows = 0
            for s in range(0, nids.size, TILE):
                aids = nids[s : s + TILE]
                afps = nfps[s : s + TILE]
                # vs the state as of chunk start (bounded by max_per_key)
                if ids.size:
                    _pairs_between(aids, afps, ids, fps)
                # vs EARLIER arrivals of the same chunk — including
                # overflow arrivals that will never be stored (a capped
                # bucket still pairs its own batch's members, up to the
                # max_per_key seen-window above)
                for pids, pfps in seen:
                    _pairs_between(aids, afps, pids, pfps)
                # intra-strip upper triangle
                if aids.size > 1:
                    dnn = popcount64(
                        np.bitwise_xor(
                            afps.view(np.uint64)[:, None],
                            afps.view(np.uint64)[None, :],
                        )
                    ).reshape(aids.size, aids.size)
                    ii, jj = np.triu_indices(aids.size, k=1)
                    keep = (dnn[ii, jj] <= max_hamming) & (aids[ii] != aids[jj])
                    ii, jj = ii[keep], jj[keep]
                    if ii.size:
                        _emit(aids[ii], aids[jj], dnn[ii, jj], frames)
                seen_room = max_per_key - seen_rows
                if seen_room > 0:
                    seen.append((aids[:seen_room], afps[:seen_room]))
                    seen_rows += min(seen_room, aids.size)
            # store in arrival order while room remains (oldest kept)
            room = max_per_key - ids.size
            if room > 0 and nids.size:
                ids = np.concatenate([ids, nids[:room]])
                fps = np.concatenate([fps, nfps[:room]])
                changed = True
        # write state only when membership changed: a full bucket seeing
        # only overflow arrivals must not round-trip max_per_key rows
        # through Python lists every micro-batch for a no-op
        if changed:
            state.update((ids.tolist(), fps.tolist()))
        if ttl_ms is not None and (changed or state.exists):
            state.setTimeoutDuration(ttl_ms)
        if frames:
            yield pd.concat(frames, ignore_index=True).astype(
                {"id_a": "int64", "id_b": "int64", "hamming": "int32"}
            )

    return fn


def streaming_simhash_pairs(
    sh_stream: DataFrame,
    *,
    max_hamming: int = 3,
    n_blocks: int = 6,
    max_per_key: int = 512,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Near-dup pairs over a streaming fingerprint table (id, simhash):
    emits (id_a, id_b, hamming <= max_hamming) as soon as the second
    member arrives, including across micro-batches. Compose upstream
    with operators.dedup.simhash (stateless mapInPandas — streaming-
    safe) to run from raw text. Pass ttl_ms to expire idle bucket state
    (processing-time timeout)."""
    if not sh_stream.isStreaming:
        raise ValueError("streaming_simhash_pairs expects a streaming DataFrame")
    buckets = sh_stream.select(
        "id", "simhash",
        F.explode(simhash_band_struct(n_blocks, max_hamming)).alias("bb"),
    ).select("id", "simhash", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    timeout = "ProcessingTimeTimeout" if ttl_ms is not None else "NoTimeout"
    return buckets.groupBy("band", "bh").applyInPandasWithState(
        _bucket_fn(max_hamming, max_per_key, ttl_ms),
        PAIR_SCHEMA,
        _STATE_SCHEMA,
        "append",
        timeout,
    )
