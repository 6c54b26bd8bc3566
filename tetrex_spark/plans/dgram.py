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
from pyspark.sql import DataFrame, SparkSession

from ..kernel.hashing import combine_dgram, hash_str
from ..kernel.bloom import bloom_m_bits
from ..operators.sketch_build import DGRAM_PAD, SketchSpec
from ..sources.sketch_store import BloomMatrix, read_manifest, read_sketch_rows

DGRAM_PREFIX = "dgram_bloom_g"
PAD = DGRAM_PAD  # fixed 3+3 pads, like the reference (dGramIndex.h pad_)


def dgram_key(left3: str, gap: int, right3: str, seed: int = 42) -> int:
    """Driver-side single-key probe hash (== build path, one code path:
    kernel.hashing.combine_dgram serves both)."""
    return int(
        combine_dgram(
            np.array([hash_str(left3, seed)], dtype=np.uint64),
            gap,
            np.array([hash_str(right3, seed)], dtype=np.uint64),
        )[0]
    )


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
    from ..operators.sketch_build import build_sketches, max_bin_cardinality

    n_max = max_bin_cardinality(binned, "char_kgram", PAD)
    m_bits = bloom_m_bits(n_max, fpr)
    # one SketchSpec per gap through the SHARED compact-partial builder:
    # partials ship unique keys while that beats the bitmap and spill to
    # dense past 2x (the bespoke builder here used to emit up to
    # bins x gaps DENSE bitmaps per task — 1,344 per task at 64x21); the
    # char-PAD-gram pass is computed once per batch and shared by every
    # gap spec via the _BatchDerived cache, and the two-level merge tree
    # caps fan-in exactly like the main build.
    specs = [
        SketchSpec(
            f"{DGRAM_PREFIX}{gap}", "bloom", "dgram", k=gap,
            params={"m_bits": m_bits, "n_hashes": n_hashes}, seed=seed,
        )
        for gap in range(min_gap, max_gap + 1)
    ]
    rows = build_sketches(binned, specs)
    rows.write.mode("append").partitionBy("name").parquet(f"{path}/rows")

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
