"""D-gram (gapped-gram) index — the `tetrex track` analog.

The reference builds an auxiliary IBF over (3 chars, gap g, 3 chars)
grams for g in [min_gap, max_gap] (process_sequence,
/root/reference/include/dGramIndex.h:194-243; code formula :231-238;
driver src/dGramIndex.cpp:20-38) and probes it when the traversal crosses
a Gap node (update_gapped, include/otf_collector.h:216-245) — recovering
pruning power for motifs with bounded wildcard runs like 'w.{2}ld'.

Spark-first: one more Bloom sketch family built by the same partial/merge
machinery, one row per (bin, gap); the traversal probes the stacked
matrix per candidate gap length and ORs the resulting bin vectors.

Key formula: combine(h(left3), g, h(right3)) via position-weighted mixing
— computed identically by the vectorized build path and the driver-side
probe (same two-arity rule as every hash in this library).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..kernel.hashing import _POW, concat_ranges, hash_str, splitmix64
from ..functions.text import corpus_text_series
from ..kernel.bloom import bloom_m_bits
from ..operators.sketch_build import SketchSpec
from ..sources.sketch_store import BloomMatrix, read_manifest, read_sketch_rows

DGRAM_PREFIX = "dgram_bloom_g"
PAD = 3  # fixed 3+3 pads, like the reference (dGramIndex.h pad_ is fixed)


def combine_dgram(left_h: np.ndarray, gap: int, right_h: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        acc = (
            np.asarray(left_h, dtype=np.uint64) * _POW[1]
            + np.asarray(right_h, dtype=np.uint64) * _POW[2]
            + np.uint64(gap) * _POW[3]
        )
        return splitmix64(acc)


def dgram_key(left3: str, gap: int, right3: str, seed: int = 42) -> int:
    """Driver-side single-key probe hash (== build path, one code path)."""
    return int(
        combine_dgram(
            np.array([hash_str(left3, seed)], dtype=np.uint64),
            gap,
            np.array([hash_str(right3, seed)], dtype=np.uint64),
        )[0]
    )


def _doc_dgram_keys(
    grams: np.ndarray, counts: np.ndarray, gap: int
) -> np.ndarray:
    """Concatenated per-doc char-3-gram hashes -> d-gram keys for one gap,
    respecting document boundaries (no cross-doc pairs)."""
    counts_g = np.maximum(counts - PAD - gap, 0)
    if counts_g.sum() == 0:
        return np.zeros(0, dtype=np.uint64)
    starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
    keep = concat_ranges(starts, counts_g)
    left = grams[keep]
    right = grams[keep + PAD + gap]
    return combine_dgram(left, gap, right)


def build_dgram_index(
    corpus: DataFrame,
    path: str,
    *,
    n_bins: int = 64,
    min_gap: int = 3,
    max_gap: int = 21,
    fpr: float = 0.05,
    n_hashes: int = 3,
    bin_key=None,
    seed: int = 42,
) -> None:
    """Build gapped-gram Blooms (one sketch name per gap) into an index
    dir — appends to the dir's manifest if one exists (track runs after
    index, like the reference)."""
    import json
    import os

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from ..sources.corpus import with_bin_id

    # Guard against binning d-grams with a different modulus than the
    # existing index (same pattern as the tokenizer_version check in
    # read_manifest): a mismatched n_bins would AND mis-mapped bin vectors
    # into query paths — silent recall loss, not an error.
    manifest_path = f"{path}/manifest.json"
    manifest = {}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            manifest = json.load(f)
        if manifest.get("n_bins") not in (None, n_bins):
            raise ValueError(
                f"n_bins={n_bins} does not match the existing index manifest "
                f"(n_bins={manifest['n_bins']}) at {path}; pass n_bins="
                f"{manifest['n_bins']} (the CLI does this automatically)"
            )

    binned = (
        corpus
        if "bin_id" in corpus.columns
        else with_bin_id(corpus, n_bins, bin_key=bin_key)
    )
    # size by the largest bin's char count (upper bound on d-grams per gap)
    from ..operators.sketch_build import SKETCH_ROW_SCHEMA, max_bin_cardinality

    n_max = max_bin_cardinality(binned, "char_kgram", PAD)
    m_bits = bloom_m_bits(n_max, fpr)
    gaps = list(range(min_gap, max_gap + 1))

    from ..kernel import BloomFilter
    from ..kernel.hashing import hash_char_kgrams_series

    def partials(batches):
        acc: dict[tuple[int, int], BloomFilter] = {}
        items: dict[tuple[int, int], int] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            text = corpus_text_series(
                pdf["text"], pdf["html"] if "html" in pdf else None
            )
            bins = pdf["bin_id"].to_numpy(dtype=np.int64)
            grams, counts = hash_char_kgrams_series(text, PAD, seed)
            # group docs (not keys) by bin once, as in the main builder
            doc_order = np.argsort(bins, kind="stable")
            uniq, doc_firsts = np.unique(bins[doc_order], return_index=True)
            for gap in gaps:
                keys = _doc_dgram_keys(grams, counts, gap)
                if keys.size == 0:
                    continue
                counts_g = np.maximum(counts - PAD - gap, 0)
                key_starts = np.zeros(counts_g.size, dtype=np.int64)
                np.cumsum(counts_g[:-1], out=key_starts[1:])
                c_sorted = counts_g[doc_order]
                sk = keys[concat_ranges(key_starts[doc_order], c_sorted)]
                kcum = np.zeros(c_sorted.size + 1, dtype=np.int64)
                np.cumsum(c_sorted, out=kcum[1:])
                bounds = np.append(kcum[doc_firsts], sk.size)
                for i, b in enumerate(uniq):
                    seg = sk[bounds[i] : bounds[i + 1]]
                    if seg.size == 0:
                        continue
                    kk = (int(b), gap)
                    bf = acc.get(kk)
                    if bf is None:
                        bf = acc[kk] = BloomFilter(m_bits, n_hashes)
                        items[kk] = 0
                    bf.update(seg)
                    items[kk] += seg.size
        if acc:
            yield pd.DataFrame(
                {
                    "bin_id": [k[0] for k in acc],
                    "name": [f"{DGRAM_PREFIX}{k[1]}" for k in acc],
                    "payload": [bf.to_bytes() for bf in acc.values()],
                    "n_items": [items[k] for k in acc],
                }
            )

    cols = ["bin_id", "text"] + (["html"] if "html" in corpus.columns else [])
    rows = binned.select(*cols).mapInPandas(partials, SKETCH_ROW_SCHEMA)
    from ..operators.sketch_build import _merger

    merged = rows.groupBy("bin_id", "name").applyInPandas(_merger, SKETCH_ROW_SCHEMA)
    merged.write.mode("append").partitionBy("name").parquet(f"{path}/rows")

    if not manifest:
        from ..functions.text import TOKENIZER_VERSION

        manifest = {
            "format_version": 1,
            "tokenizer_version": TOKENIZER_VERSION,
            "n_bins": n_bins,
            "specs": [],
        }
    manifest["dgram"] = {
        "min_gap": min_gap,
        "max_gap": max_gap,
        "m_bits": m_bits,
        "n_hashes": n_hashes,
        "seed": seed,
    }
    with open(manifest_path, "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)


class DGramIndex:
    """Driver-side stacked d-gram Blooms: probe(left3, gap, right3) ->
    length-B bin vector; gaps outside [min_gap, max_gap] are
    unconstrained (all-ones), mirroring update_gapped's behavior."""

    def __init__(self, matrices: dict[int, BloomMatrix], n_bins: int,
                 min_gap: int, max_gap: int, seed: int = 42):
        self.matrices = matrices
        self.n_bins = n_bins
        self.min_gap = min_gap
        self.max_gap = max_gap
        self.seed = seed

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "DGramIndex | None":
        manifest = read_manifest(path)
        cfg = manifest.get("dgram")
        if not cfg:
            return None
        matrices = {}
        for gap in range(cfg["min_gap"], cfg["max_gap"] + 1):
            name = f"{DGRAM_PREFIX}{gap}"
            rows = [
                (r["bin_id"], bytes(r["payload"]))
                for r in read_sketch_rows(spark, path, name).collect()
            ]
            if rows:
                matrices[gap] = BloomMatrix.from_rows(rows, manifest["n_bins"])
        return cls(matrices, manifest["n_bins"], cfg["min_gap"], cfg["max_gap"],
                   cfg.get("seed", 42))

    def probe_gap(self, left3: str, gaps, right3: str) -> np.ndarray:
        """OR over candidate gap lengths; any out-of-range gap makes the
        whole probe unconstrained (cannot rule anything out)."""
        result = np.zeros(self.n_bins, dtype=bool)
        for g in gaps:
            if g < self.min_gap or g > self.max_gap or g not in self.matrices:
                return np.ones(self.n_bins, dtype=bool)
            result |= self.matrices[g].probe_one(dgram_key(left3, g, right3, self.seed))
        return result
