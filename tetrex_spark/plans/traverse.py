"""NFA x BloomMatrix traversal -> candidate-bin bitvector — driver-side
query planner, stage 3. Semantic port of the reference's OTFCollector
(/root/reference/include/otf_collector.h:341-393):

  - seed the START state with an all-ones path over B bins;
  - sweep nodes in topological order (single pass — the DAG property);
  - CHARS node: consume one char per member, roll the k-char window;
    when a window fills, probe the Bloom matrix and AND the path with the
    returned bin vector (:263-266 `path &= hits`), dropping dead paths
    (:383 `path_.none()`);
  - absorption (:162-213): states at the same node with the same last
    k-1 chars are merged by OR-ing their path vectors — the suffix is
    all that can influence future probes, so this is lossless and is
    what keeps the state count polynomial;
  - probe memoization (kmer_cache_, :54,260-276);
  - GAP: reset the window, keep the path (sound over-approximation of
    the reference's DIBF-checked gap, :216-245);
  - MATCH: OR the path into the result (:361-362).

A path that reaches MATCH having never filled a window contributes an
unconstrained (all-ones) vector — this implements for real the fallback
the reference left dead in validate_regex (src/query.cpp:159-164): motifs
with < k anchored literals degrade to a full scan instead of silently
losing recall.
"""

from __future__ import annotations

import numpy as np

from .nfa import NFA, Kind


class TraversalResult:
    def __init__(self, bins: np.ndarray, n_probes: int, n_cached: int, full_scan: bool):
        self.bins = bins  # (B,) bool — candidate bins
        self.n_probes = n_probes
        self.n_cached = n_cached
        self.full_scan = full_scan  # True when some accepting path was unconstrained

    def bin_ids(self) -> list[int]:
        return [int(i) for i in np.nonzero(self.bins)[0]]


MAX_STATES_PER_NODE = 4096


def collect(nfa: NFA, bloom, k: int) -> TraversalResult:
    """bloom: an object with probe_one(key)->bool[B] and n_bins (duck-typed
    so tests can swap in an exact inverted index)."""
    from ..functions.text import hash_char_kgram

    B = bloom.n_bins
    ones = np.ones(B, dtype=bool)
    result = np.zeros(B, dtype=bool)
    cache: dict[str, np.ndarray] = {}
    stats = {"probes": 0, "cached": 0}
    full_scan = False

    def probe(gram: str) -> np.ndarray:
        hit = cache.get(gram)
        if hit is None:
            stats["probes"] += 1
            hit = bloom.probe_one(hash_char_kgram(gram))
            cache[gram] = hit
        else:
            stats["cached"] += 1
        return hit

    # states[node] = {window(str of last <=k-1 chars, or full prefix if
    # shorter): (path bool[B], probed_any bool)}
    states: list[dict[str, tuple[np.ndarray, bool]]] = [dict() for _ in nfa.nodes]

    def absorb(node: int, window: str, path: np.ndarray, probed: bool) -> None:
        cur = states[node].get(window)
        if cur is None:
            states[node][window] = (path, probed)
        else:
            states[node][window] = (cur[0] | path, cur[1] and probed)

    order = nfa.topo_order()
    start = next(i for i in order if nfa.nodes[i].kind == Kind.START)
    states[start][""] = (ones.copy(), False)

    for u in order:
        node_states = states[u]
        if not node_states:
            continue
        if len(node_states) > MAX_STATES_PER_NODE:
            # safety valve: collapse to one unconstrained-window state
            merged = np.zeros(B, dtype=bool)
            any_probed = True
            for p, pr in node_states.values():
                merged |= p
                any_probed = any_probed and pr
            node_states = {"": (merged, any_probed)}
            states[u] = node_states
        for window, (path, probed) in node_states.items():
            for v in nfa.succ[u]:
                nd = nfa.nodes[v]
                if nd.kind == Kind.CHARS:
                    for c in nd.chars:
                        seq = window + c
                        if len(seq) == k:
                            hit = probe(seq)
                            new_path = path & hit
                            if not new_path.any():
                                continue  # dead path short-circuit
                            absorb(v, seq[1:], new_path, True)
                        else:
                            absorb(v, seq, path.copy(), probed)
                elif nd.kind == Kind.GAP:
                    absorb(v, "", path.copy(), probed)
                else:  # GHOST / SPLIT / MATCH — epsilon forward
                    if nd.kind == Kind.MATCH:
                        result |= path
                        if not probed:
                            full_scan = True
                    else:
                        absorb(v, window, path.copy(), probed)
        states[u] = {}  # free
    if full_scan:
        result = ones
    return TraversalResult(result, stats["probes"], stats["cached"], full_scan)


class ExactBinIndex:
    """Test oracle: exact per-bin k-gram sets with the BloomMatrix probe
    interface — lets property tests separate traversal errors from Bloom
    false positives."""

    def __init__(self, n_bins: int):
        self.n_bins = n_bins
        self.sets: list[set[int]] = [set() for _ in range(n_bins)]

    def add_doc(self, bin_id: int, keys: np.ndarray) -> None:
        self.sets[bin_id].update(int(x) for x in keys)

    def probe_one(self, key: int) -> np.ndarray:
        return np.array([key in s for s in self.sets], dtype=bool)
