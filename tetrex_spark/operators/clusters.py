"""Connected components over near-duplicate pair lists — the step that
turns pairwise dedup output into per-document cluster assignments (one
canonical "keep" representative per cluster).

Algorithm: alternating large-star / small-star (Kiveris, Lattanzi,
Mirrokni, Rastogi, Vassilvitskii — "Connected Components in MapReduce
and Beyond", SoCC 2014): provably converges in O(log n) rounds to a
star forest rooted at each component's minimum node id, using only
groupBy(min) + self-join per round — no driver-side graph state, no
collect, so it runs at any scale the pair list itself fits. Each round
is persisted and localCheckpoint-ed to truncate the iterative lineage
(the classic iterative-Spark plan-explosion trap).

The reference has no clustering step (its outputs are per-query hit
lists, /root/reference/src/query.cpp-style scan-verify); this is
part of the training-pipeline extension (SURVEY §2.8): exact / minhash
/ simhash dedup all emit pairs, and a pipeline needs keep-lists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon_edges(pairs: DataFrame, a: str, b: str) -> DataFrame:
    """(src, dst) with src > dst, self-loops dropped, distinct."""
    return (
        pairs.select(
            F.greatest(F.col(a), F.col(b)).alias("src"),
            F.least(F.col(a), F.col(b)).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _large_star(e: DataFrame, *, dedup: bool = True) -> DataFrame:
    """For each node u: connect every strictly-larger neighbor to
    min(N(u) ∪ {u}). Preserves connectivity, strictly reduces large
    nodes' eccentricity.

    `dedup=False` skips the output distinct (duplicates are tolerated
    by _small_star and dedupped by its final distinct). The round loop
    does NOT use it: for clique-shaped components large-star's distinct
    collapses O(k^2) duplicate rows to O(k) before they reach
    small-star's shuffles — worth a dedicated exchange at scale.
    Output rows are canonical (src > dst, no self loops) either way."""
    sym = e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    mins = sym.groupBy("src").agg(F.min("dst").alias("mn"))
    m = F.least(F.col("mn"), F.col("src"))
    out = (
        sym.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), m.alias("dst"))
        .where(F.col("src") != F.col("dst"))
    )
    return out.distinct() if dedup else out


def _small_star(e: DataFrame, *, pre_canonical: bool = False) -> DataFrame:
    """Orient edges toward the larger endpoint; for each node u, hang u
    and all its smaller neighbors off min(N⁻(u) ∪ {u}).

    `pre_canonical=True` skips the canonicalize+distinct exchange when
    the caller guarantees the input is already canonical (src > dst, no
    self loops) — true for every _large_star output (it filters
    src != dst and emits dst > src pairs re-oriented). Duplicate rows
    are tolerated (the min aggregate is duplicate-insensitive and the
    final distinct dedups `moved`), though the round loop keeps
    large-star's distinct — see its docstring."""
    d = e if pre_canonical else _canon_edges(e, "src", "dst")
    mins = d.groupBy("src").agg(F.min("dst").alias("m"))
    moved = (
        d.join(mins, "src")
        .where(F.col("dst") != F.col("m"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )
    rehung = mins.select("src", F.col("m").alias("dst"))
    return (
        moved.union(rehung).where(F.col("src") != F.col("dst")).distinct()
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """(id, component) for every id appearing in `pairs`, where
    `component` is the minimum id reachable through the pair graph —
    i.e. the cluster's canonical representative. Deterministic.

    Terminates when a small-star round is a fixpoint (the edge set is a
    star forest rooted at component minima); the paper bounds rounds at
    O(log n). max_iter is a safety valve only."""
    def _sig(e: DataFrame) -> tuple:
        """(count, xor-fold of edge hashes) of a distinct edge set: one
        cheap aggregate instead of two exceptAll anti-join shuffles per
        round. Both rounds' sets are distinct by construction, so equal
        signatures mean equal sets up to a ~2^-64 xor collision — and a
        false positive merely ends one round early at an
        already-fixpoint-in-practice edge set. (bit_xor, not sum: sum
        of hashes overflows long under ANSI mode.)"""
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("src", "dst")).alias("h"),
        ).collect()[0]
        return (row.n, row.h)

    # lazy localCheckpoint: the _sig aggregate right after is the
    # materializing action, so each round costs exactly one job while
    # still truncating the iterative lineage (inputs that trip the AQE
    # checkpoint-replanning quirk are handled by the round loop's
    # re-wrap fallback below). No up-front _sig of the INPUT: real
    # near-dup edge lists are never already a small-star fixpoint, so
    # the initial signature job only ever confirmed "not converged" —
    # round 1's signature seeds the comparison instead (a genuinely
    # pre-converged input costs one extra no-op round, a non-converged
    # one saves a full action every call).
    edges = _canon_edges(pairs, id_a, id_b).localCheckpoint(eager=False)
    sig: tuple | None = None
    for _ in range(max_iter):
        try:
            new = _small_star(
                _large_star(edges), pre_canonical=True
            ).localCheckpoint(eager=False)
            new_sig = _sig(new)
        except Exception as ex:  # pragma: no cover - Spark-version quirk
            if "NoSuchElementException" not in str(ex):
                raise
            # Spark 4.1 AQE bug: when the checkpointed edge frame's
            # attributes descend from certain checkpointed-union inputs,
            # re-planning a derived localCheckpoint dies with
            # 'NoSuchElementException: key not found <attr>'. Re-wrap the
            # (already materialized) checkpoint through an RDD round-trip
            # to mint fresh attributes, then retry the round.
            edges = edges.sparkSession.createDataFrame(edges.rdd, edges.schema)
            new = _small_star(
                _large_star(edges), pre_canonical=True
            ).localCheckpoint(eager=False)
            new_sig = _sig(new)
        edges = new
        if new_sig == sig:
            break
        sig = new_sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    roots = edges.select(F.col("dst").alias("id")).distinct().select(
        "id", F.col("id").alias("component")
    )
    return edges.select(
        F.col("src").alias("id"), F.col("dst").alias("component")
    ).union(roots)


def dedup_keep_list(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """(id, component, keep): every document of `docs`, its near-dup
    cluster representative (itself when unpaired), and keep=1 iff it IS
    the representative — the materialized decision a training pipeline
    filters on."""
    comp = connected_components(pairs, id_a, id_b)
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(comp, "id", "left")
        .select(
            "id",
            F.coalesce("component", F.col("id")).alias("component"),
        )
        .withColumn(
            "keep", (F.col("component") == F.col("id")).cast("int")
        )
    )
