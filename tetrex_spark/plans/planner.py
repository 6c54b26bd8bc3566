"""MotifIndex — the end-to-end query planner tying build, traversal and
verification together. The Spark analog of `tetrex index` + `tetrex query`
(/root/reference/src/main.cpp:36-59, src/query.cpp:375-498):

  build:  corpus -> bin_id -> char-kgram Bloom per bin (sketch table +
          manifest, including the observed corpus alphabet — the closed
          alphabet TetRex gets for free from the 20-AA residue set).
  query:  normalize + trim -> postfix -> NFA (bounded unroll) ->
          traversal over the stacked Bloom matrix -> candidate bins ->
          isin-pruned corpus scan -> Arrow-batched regex verify ->
          (url, match, start, end) DataFrame.

The traversal runs on the driver exactly as in TetRex — the Bloom matrix
is tiny relative to the corpus (B x m bits), and this is the honest
reading of 'per-partition Bloom bins' in the north star: the *corpus*
never moves; only candidate bin ids cross back into the cluster as a
pushed-down predicate.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import normalize_query
from ..operators.sketch_build import SketchSpec, build_sketches, max_bin_cardinality
from ..operators.verify import (
    prune_to_bins,
    verify_conjunctive,
    verify_regex,
    verify_regex_many,
)
from ..sources.corpus import hot_hosts, with_bin_id
from ..sources.sketch_store import (
    BloomMatrix,
    read_manifest,
    write_sketch_table,
)
from ..kernel.bloom import bloom_m_bits
from .nfa import compile_nfa
from .rx import trim_regex
from .traverse import TraversalResult, collect

MOTIF_SKETCH_NAME = "char_bloom"


def corpus_alphabet(corpus: DataFrame) -> str:
    """Distinct characters of the normalized corpus — JVM-side aggregate
    (explode on a char split; runs once at build time, stored in the
    manifest). The query side expands '.' and negated classes over this
    closed alphabet, which is what makes dot-expansion sound AND finite."""
    norm = F.lower(F.coalesce(F.col("text"), F.decode(F.col("html"), "UTF-8"), F.lit("")))
    rows = (
        # per-doc array_distinct first: the explode then emits <= |alphabet|
        # rows per doc instead of one row per character of the corpus
        corpus.select(F.explode(F.array_distinct(F.split(norm, ""))).alias("c"))
        .filter(F.col("c") != "")
        .distinct()
        .collect()
    )
    chars = {r["c"] for r in rows}
    # normalization collapses all whitespace to single spaces
    chars = {(" " if c.isspace() else c) for c in chars}
    return "".join(sorted(chars))


def alphabet_and_sizing(binned: DataFrame, k: int) -> tuple[int, str]:
    """(max per-bin char-kgram count, corpus alphabet) in ONE aggregation
    job — the build used to pay two separate full corpus scans for the
    Bloom-sizing pre-pass (max_bin_cardinality) and the alphabet
    pre-pass (corpus_alphabet); at 100 TB each pre-pass is a full pass
    over the text column, so fusing them removes one.

    Shape: per row, project (bin_id, kgram count, distinct chars of the
    lowered tag-stripped text), posexplode the char array (<= |alphabet|
    rows per doc), attribute the count to pos==0 only, then ONE
    groupBy(bin_id) with map-side-combined partials (per-bin sum + char
    set, both tiny) and a final fold to (max, union). The alphabet is a
    sound closed set for dot-expansion: it covers every char the indexed
    (extracted, normalized) text can contain — a superset only ever adds
    candidate probes, which verify removes."""
    html_text = (
        F.regexp_replace(F.decode(F.col("html"), "UTF-8"), "<[^>]*>", " ")
        if "html" in binned.columns
        else F.lit(None)
    )
    text = F.coalesce(F.col("text"), html_text, F.lit(""))
    cnt = F.greatest(F.length(text) - F.lit(k - 1), F.lit(0))
    chars = F.array_distinct(F.split(F.lower(text), ""))
    ex = binned.select(
        "bin_id", cnt.alias("cnt"), F.posexplode(chars).alias("pos", "c")
    )
    row = (
        ex.groupBy("bin_id")
        .agg(
            F.sum(F.when(F.col("pos") == 0, F.col("cnt")).otherwise(0)).alias("n"),
            F.collect_set("c").alias("cs"),
        )
        .agg(
            F.max("n").alias("mx"),
            F.array_distinct(F.flatten(F.collect_list("cs"))).alias("alpha"),
        )
        .collect()[0]
    )
    chars_out = {c for c in (row["alpha"] or []) if c != ""}
    chars_out = {(" " if c.isspace() else c) for c in chars_out}
    return int(row["mx"] or 0), "".join(sorted(chars_out))


class MotifIndex:
    """Built index handle: manifest + driver-side Bloom matrix (+ the
    optional d-gram matrices from a `track` run)."""

    def __init__(self, bloom: BloomMatrix, manifest: dict, k: int, alphabet: str,
                 dgram=None):
        self.bloom = bloom
        self.manifest = manifest
        self.k = k
        self.alphabet = alphabet
        self.dgram = dgram

    # -- build ---------------------------------------------------------------

    @staticmethod
    def build(
        corpus: DataFrame,
        path: str,
        *,
        n_bins: int = 64,
        k: int = 3,
        fpr: float = 0.05,
        n_hashes: int = 3,
        bin_key=None,
        salt_hot_hosts: str | list[str] | None = None,
        n_salt: int = 8,
        hot_factor: float = 4.0,
    ) -> "MotifIndex":
        """`tetrex index` analog. Sizes the filters to the largest bin
        (include/index_ibf.h:133-139) via a JVM-only pre-pass.

        `salt_hot_hosts` wires the north-rule salted-repartitioning clause
        into the build itself: 'auto' detects hosts exceeding `hot_factor`
        x the mean bin load (sources.corpus.hot_hosts) and spreads each
        over `n_salt` salt-shards; an explicit host list skips detection
        (e.g. fed from lineage.skew_report). The salted assignment is
        RECORDED IN THE MANIFEST, so query()/query_all() recompute the
        identical bin ids with zero caller involvement — hit sets are
        unchanged (salted shards are ordinary bins; property-tested), only
        the hot host's verify scan stops concentrating in one bin. This is
        the recommended setting for skewed web corpora.

        A corpus that already carries bin_id (e.g. pre-salted via
        with_bin_id(salt_hot_hosts=...)) keeps its assignment — query()
        honors the same rule, so build and prune always agree."""
        if "bin_id" in corpus.columns:
            # the pre-assigned bin ids ARE the index layout; recording a
            # salt we never applied would make query() re-bin hot hosts
            # differently from the bins their kgrams were indexed under
            # (silent false negatives)
            if salt_hot_hosts:
                raise ValueError(
                    "salt_hot_hosts requires build() to assign bin_id "
                    "itself; either drop the corpus's bin_id column or "
                    "pre-salt via with_bin_id(salt_hot_hosts=...) and "
                    "query with the same pre-binned corpus"
                )
            salted: list[str] = []
            binned = corpus
        else:
            if salt_hot_hosts == "auto":
                salted = hot_hosts(corpus, n_bins, factor=hot_factor)
            else:
                salted = sorted(salt_hot_hosts) if salt_hot_hosts else []
            binned = with_bin_id(
                corpus, n_bins, bin_key=bin_key,
                salt_hot_hosts=salted or None, n_salt=n_salt,
            )
        # ONE fused pre-pass for Bloom sizing + the manifest alphabet
        # (was two separate full corpus scans)
        n_max, alphabet = alphabet_and_sizing(binned, k)
        m_bits = bloom_m_bits(n_max, fpr)
        spec = SketchSpec(
            MOTIF_SKETCH_NAME,
            "bloom",
            "char_kgram",
            k=k,
            params={"m_bits": m_bits, "n_hashes": n_hashes},
        )
        rows = build_sketches(binned, [spec])
        write_sketch_table(
            rows,
            path,
            [spec],
            n_bins,
            extra={
                "k": k, "fpr": fpr, "alphabet": alphabet,
                "salted_hosts": salted, "n_salt": n_salt,
            },
        )
        spark = corpus.sparkSession
        return MotifIndex.load(spark, path)

    @staticmethod
    def load(spark: SparkSession, path: str) -> "MotifIndex":
        from .dgram import DGramIndex

        manifest = read_manifest(path)
        bloom = BloomMatrix.load(spark, path, MOTIF_SKETCH_NAME)
        dgram = DGramIndex.load(spark, path)
        return MotifIndex(bloom, manifest, manifest["k"], manifest["alphabet"],
                          dgram=dgram)

    def _binned(self, corpus: DataFrame, n_bins: int, bin_key=None) -> DataFrame:
        """Bin assignment matching THIS index's manifest — including any
        recorded hot-host salting, so build, d-gram track and query prune
        always agree on bin ids."""
        if "bin_id" in corpus.columns:
            return corpus
        return with_bin_id(
            corpus, n_bins, bin_key=bin_key,
            salt_hot_hosts=self.manifest.get("salted_hosts") or None,
            n_salt=self.manifest.get("n_salt", 8),
        )

    def track(self, corpus: DataFrame, path: str, *, min_gap: int = 1,
              max_gap: int = 21, fpr: float = 0.05, bin_key=None) -> "MotifIndex":
        """`tetrex track` analog: add the gapped-gram sketch family to
        this index and reload (src/dGramIndex.cpp:20-38). The corpus is
        binned with the manifest's (possibly salted) assignment before the
        d-gram build so both sketch families prune identically."""
        from .dgram import build_dgram_index

        build_dgram_index(
            self._binned(corpus, self.manifest["n_bins"], bin_key), path,
            n_bins=self.manifest["n_bins"],
            min_gap=min_gap, max_gap=max_gap, fpr=fpr, bin_key=bin_key,
        )
        return MotifIndex.load(corpus.sparkSession, path)

    # -- plan ----------------------------------------------------------------

    def candidate_bins(self, pattern: str) -> TraversalResult:
        """regex -> candidate bin vector (stages P7/P8 -> F1-F3 -> A5-A8)."""
        trimmed = trim_regex(normalize_query(pattern))
        if not trimmed:
            ones = np.ones(self.bloom.n_bins, dtype=bool)
            return TraversalResult(ones, 0, 0, True)
        nfa = compile_nfa(trimmed, self.k, frozenset(self.alphabet))
        return collect(nfa, self.bloom, self.k, dgram=self.dgram)

    # -- execute ---------------------------------------------------------------

    def query(
        self,
        corpus: DataFrame,
        pattern: str,
        *,
        n_bins: int | None = None,
        bin_key=None,
    ) -> DataFrame:
        """Full pipeline -> matches (url, match, start, end).

        `corpus` may be the same DataFrame the index was built from or a
        re-read of the same table; bin assignment is recomputed with the
        same deterministic hash so ids line up."""
        n_bins = n_bins or self.manifest["n_bins"]
        res = self.candidate_bins(pattern)
        binned = self._binned(corpus, n_bins, bin_key)
        pruned = prune_to_bins(binned, res.bin_ids(), n_bins)
        return verify_regex(pruned, normalize_query(pattern))

    def query_many(
        self,
        corpus: DataFrame,
        patterns: dict[str, str] | list[str],
        *,
        n_bins: int | None = None,
        bin_key=None,
    ) -> DataFrame:
        """Batched multi-pattern query — the reference's TSV query-file
        path (S6, run_multiple_queries src/query.cpp:342-373) done
        Spark-first: every pattern's candidate bins come from the driver
        traversal (sub-ms each), the corpus is pruned ONCE to the union
        of candidate bins, and a single verify pass applies each pattern
        only to rows of its own bins. N patterns cost one scan instead
        of N sequential jobs. Returns (query_id, url, match, start,
        end)."""
        n_bins = n_bins or self.manifest["n_bins"]
        if not isinstance(patterns, dict):
            patterns = {p: p for p in patterns}
        spec: list[tuple[str, str, list[int] | None]] = []
        union: set[int] = set()
        full_scan = False
        for qid, pat in patterns.items():
            res = self.candidate_bins(pat)
            bins = res.bin_ids()
            if len(bins) >= self.bloom.n_bins:
                spec.append((qid, normalize_query(pat), None))
                full_scan = True
            else:
                spec.append((qid, normalize_query(pat), bins))
                union.update(bins)
        binned = self._binned(corpus, n_bins, bin_key)
        pruned = (
            binned
            if full_scan
            else prune_to_bins(binned, sorted(union), n_bins)
        )
        return verify_regex_many(pruned, spec)

    def query_all(
        self,
        corpus: DataFrame,
        patterns: list[str],
        *,
        n_bins: int | None = None,
        bin_key=None,
    ) -> DataFrame:
        """Conjunctive multi-motif (A5 + F11): candidate vectors AND-ed
        across queries (include/query.h:267), then one pruned scan where
        every pattern must match."""
        n_bins = n_bins or self.manifest["n_bins"]
        vec = np.ones(self.bloom.n_bins, dtype=bool)
        for p in patterns:
            vec &= self.candidate_bins(p).bins
        bin_ids = [int(i) for i in np.nonzero(vec)[0]]
        binned = self._binned(corpus, n_bins, bin_key)
        pruned = prune_to_bins(binned, bin_ids, n_bins)
        return verify_conjunctive(pruned, [normalize_query(p) for p in patterns])
