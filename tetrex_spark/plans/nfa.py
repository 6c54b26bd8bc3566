"""Postfix -> NFA with bounded unrolling — driver-side query compiler,
stage 2. Semantic port of /root/reference/src/construct_nfa.cpp:78-335:

  - concat / union / optional fragments (:86-144)
  - Kleene '*' and '+' unrolled into k-1 linearized copies with early
    exits (:146-223) — only k-length windows matter, so repetitions
    beyond k-1 add no new k-grams; longer true matches contain the
    unrolled path's grams as substrings (superset property preserved).
  - '{m}' = m copies; '{m,n}' = m copies + (n-m) optional copies;
    '{0,n}' routes through kleene with max+1 (:225-262).
  - complexity detection (F6): a subgraph whose alternative-path count
    reaches the reference's thresholds (paths >= 15 per site, or running
    product >= 690,000 — /root/reference/src/construction_tools.cpp:163,171)
    is not expanded; it becomes one GAP node, which the traversal treats
    as a window reset (a sound over-approximation of the reference's
    DIBF-checked Gap splice, otf_collector.h:466-493).

Re-expression, not a translation: the reference copies built subgraphs by
bounded DFS (construct_nfa.cpp:4-76); we go postfix -> AST -> graph and
unroll by re-emitting the AST subtree, which yields the same graphs
without a copy routine. Character classes stay one CHARS node holding a
set instead of an alternation chain of single-char nodes (same language,
fewer nodes; the traversal forks per char exactly like Split chains do).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum

from .rx import Tok, Token, to_postfix

# reference thresholds, construction_tools.cpp:163,171
MAX_SITE_PATHS = 15
MAX_PATH_PRODUCT = 690_000


class Kind(Enum):
    START = "start"
    CHARS = "chars"  # consumes one char from its set
    GHOST = "ghost"  # epsilon join
    SPLIT = "split"  # epsilon fork
    GAP = "gap"  # window reset (collapsed pathological subgraph)
    MATCH = "match"


@dataclass
class Node:
    kind: Kind
    chars: frozenset = field(default_factory=frozenset)
    # GAP only: the set of possible consumed lengths of the collapsed
    # subtree (None = unbounded/unknown -> the traversal cannot probe the
    # d-gram index and treats the gap as unconstrained)
    gaps: frozenset | None = None


class NFA:
    """A DAG (quantifiers are unrolled) with a single START and MATCH."""

    def __init__(self):
        self.nodes: list[Node] = []
        self.succ: list[list[int]] = []

    def add(
        self, kind: Kind, chars: frozenset = frozenset(), gaps: frozenset | None = None
    ) -> int:
        self.nodes.append(Node(kind, chars, gaps))
        self.succ.append([])
        return len(self.nodes) - 1

    def link(self, u: int, v: int) -> None:
        self.succ[u].append(v)

    def topo_order(self) -> list[int]:
        """Kahn topological order (reference uses lemon::topologicalSort,
        otf_collector.h:328-339)."""
        indeg = [0] * len(self.nodes)
        for u in range(len(self.nodes)):
            for v in self.succ[u]:
                indeg[v] += 1
        stack = [u for u in range(len(self.nodes)) if indeg[u] == 0]
        order = []
        while stack:
            u = stack.pop()
            order.append(u)
            for v in self.succ[u]:
                indeg[v] -= 1
                if indeg[v] == 0:
                    stack.append(v)
        if len(order) != len(self.nodes):
            raise ValueError("NFA is not a DAG (unrolling failed)")
        return order

    def to_dot(self) -> str:
        """GraphViz debug sink — analog of print_graph
        (/root/reference/src/construction_tools.cpp:42-94)."""
        lines = ["digraph kgraph {"]
        for i, nd in enumerate(self.nodes):
            label = nd.kind.value
            if nd.kind == Kind.CHARS:
                label = "".join(sorted(nd.chars))[:12]
            lines.append(f'  n{i} [label="{i}:{label}"];')
        for u in range(len(self.nodes)):
            for v in self.succ[u]:
                lines.append(f"  n{u} -> n{v};")
        lines.append("}")
        return "\n".join(lines)


# -- AST ---------------------------------------------------------------------


@dataclass
class Ast:
    op: str  # chars | concat | union | opt | star | plus | repeat | gap
    chars: frozenset = field(default_factory=frozenset)
    negated: bool = False
    kids: list = field(default_factory=list)
    mn: int = 0
    mx: int = 0

    def n_paths(self, k: int) -> int:
        """Alternative-path count — the complexity measure of
        construction_tools.h:74-142 (Subgraph path algebra), capped to
        avoid bignum blowup."""
        CAP = 10**9
        if self.op in ("chars",):
            return min(len(self.chars) if self.chars else 1, CAP)
        if self.op == "gap":
            return 1
        if self.op == "concat":
            p = 1
            for kid in self.kids:
                p = min(p * kid.n_paths(k), CAP)
            return p
        if self.op == "union":
            return min(sum(kid.n_paths(k) for kid in self.kids), CAP)
        if self.op == "opt":
            return min(self.kids[0].n_paths(k) + 1, CAP)
        if self.op in ("star", "plus"):
            # unrolled to k-1 copies each optional
            base = self.kids[0].n_paths(k)
            p = 1
            for _ in range(k - 1):
                p = min(p * (base + 1), CAP)
            return p
        if self.op == "repeat":
            base = self.kids[0].n_paths(k)
            p = 1
            for _ in range(self.mn):
                p = min(p * base, CAP)
            for _ in range(self.mx - self.mn):
                p = min(p * (base + 1), CAP)
            return p
        raise AssertionError(self.op)

    def len_range(self) -> tuple[int, float]:
        """(min, max) chars a TRUE match of this subtree consumes — max
        may be inf (star/plus are unbounded in the real regex even though
        the index NFA unrolls them). Drives the Gap length set handed to
        the d-gram probe (detect_bad_graphs computes the same from its
        Subgraph length algebra, construction_tools.h:74-142)."""
        if self.op == "chars":
            return 1, 1
        if self.op == "gap":
            return 0, float("inf")
        if self.op == "concat":
            lo = hi = 0
            for kid in self.kids:
                klo, khi = kid.len_range()
                lo += klo
                hi += khi
            return lo, hi
        if self.op == "union":
            rs = [kid.len_range() for kid in self.kids]
            return min(r[0] for r in rs), max(r[1] for r in rs)
        if self.op == "opt":
            return 0, self.kids[0].len_range()[1]
        if self.op == "star":
            return 0, float("inf")
        if self.op == "plus":
            return self.kids[0].len_range()[0], float("inf")
        if self.op == "repeat":
            klo, khi = self.kids[0].len_range()
            return self.mn * klo, self.mx * khi
        raise AssertionError(self.op)


def _gap_set(ast: "Ast") -> frozenset | None:
    lo, hi = ast.len_range()
    if hi == float("inf") or hi - lo > 32:
        return None
    return frozenset(range(int(lo), int(hi) + 1))


def postfix_to_ast(postfix: list[Token], alphabet: frozenset) -> Ast:
    stack: list[Ast] = []
    for t in postfix:
        if t.type == Tok.CHAR:
            stack.append(Ast("chars", chars=frozenset(t.char.lower())))
        elif t.type == Tok.DOT:
            stack.append(Ast("chars", chars=alphabet))
        elif t.type == Tok.CLASS:
            members = frozenset(c.lower() for c in t.chars)
            if t.negated:
                # set difference vs the alphabet (utils.h:366-381)
                members = alphabet - members
                if not members:
                    raise ValueError("negated class covers entire alphabet")
            stack.append(Ast("chars", chars=members))
        elif t.type == Tok.CONCAT:
            b, a = stack.pop(), stack.pop()
            kids = (a.kids if a.op == "concat" else [a]) + (
                b.kids if b.op == "concat" else [b]
            )
            stack.append(Ast("concat", kids=kids))
        elif t.type == Tok.PIPE:
            b, a = stack.pop(), stack.pop()
            stack.append(Ast("union", kids=[a, b]))
        elif t.type == Tok.QUESTION:
            stack.append(Ast("opt", kids=[stack.pop()]))
        elif t.type == Tok.STAR:
            stack.append(Ast("star", kids=[stack.pop()]))
        elif t.type == Tok.PLUS:
            stack.append(Ast("plus", kids=[stack.pop()]))
        elif t.type == Tok.REPEAT:
            stack.append(Ast("repeat", kids=[stack.pop()], mn=t.min_count, mx=t.max_count))
        else:
            raise AssertionError(t.type)
    if len(stack) != 1:
        raise ValueError("malformed postfix expression")
    return stack[0]


# -- AST -> NFA with unrolling + gap collapse --------------------------------


def _emit(nfa: NFA, ast: Ast, k: int) -> tuple[int, int]:
    """Emit ast into nfa, returning (entry, exit) node ids.

    Complexity collapse happens at concat sites (_emit_site), matching
    the reference's detect_bad_graphs placement (concat_procedure,
    construct_nfa.cpp:86-97) — NOT at the root: a query like
    'data.{2,6}merge' has a huge global path product but only its middle
    needs to become a Gap; the literal runs around it must keep probing."""
    if ast.op != "concat" and ast.n_paths(k) >= MAX_PATH_PRODUCT:
        g = nfa.add(Kind.GAP, gaps=_gap_set(ast))
        return g, g
    if ast.op == "chars":
        u = nfa.add(Kind.CHARS, ast.chars)
        return u, u
    if ast.op == "gap":
        g = nfa.add(Kind.GAP)
        return g, g
    if ast.op == "concat":
        first_in = prev_out = None
        for kid in ast.kids:
            i, o = _emit_site(nfa, kid, k)
            if first_in is None:
                first_in = i
            else:
                nfa.link(prev_out, i)
            prev_out = o
        return first_in, prev_out
    if ast.op == "union":
        split = nfa.add(Kind.SPLIT)
        ghost = nfa.add(Kind.GHOST)
        for kid in ast.kids:
            i, o = _emit(nfa, kid, k)
            nfa.link(split, i)
            nfa.link(o, ghost)
        return split, ghost
    if ast.op == "opt":
        split = nfa.add(Kind.SPLIT)
        ghost = nfa.add(Kind.GHOST)
        i, o = _emit(nfa, ast.kids[0], k)
        nfa.link(split, i)
        nfa.link(split, ghost)
        nfa.link(o, ghost)
        return split, ghost
    if ast.op == "star":
        # equivalent to {0, k-1} (kleene_procedure, construct_nfa.cpp:146-193)
        return _emit(nfa, Ast("repeat", kids=ast.kids, mn=0, mx=k - 1), k)
    if ast.op == "plus":
        # equivalent to {1, k-1} (plus_procedure, :196-223)
        return _emit(nfa, Ast("repeat", kids=ast.kids, mn=1, mx=max(1, k - 1)), k)
    if ast.op == "repeat":
        kid = ast.kids[0]
        if ast.mn == 0 and ast.mx == 0:
            g = nfa.add(Kind.GHOST)
            return g, g
        entry = exit_ = None
        for _ in range(ast.mn):
            i, o = _emit(nfa, kid, k)
            if entry is None:
                entry = i
            else:
                nfa.link(exit_, i)
            exit_ = o
        for _ in range(ast.mx - ast.mn):
            i, o = _emit(nfa, Ast("opt", kids=[kid]), k)
            if entry is None:
                entry = i
            else:
                nfa.link(exit_, i)
            exit_ = o
        return entry, exit_
    raise AssertionError(ast.op)


def _emit_site(nfa: NFA, ast: Ast, k: int) -> tuple[int, int]:
    """Concat-site complexity guard: collapse a kid whose own path count
    hits the per-site threshold (detect_bad_graphs,
    construction_tools.cpp:161-180)."""
    if ast.n_paths(k) >= MAX_SITE_PATHS and ast.op in ("star", "plus", "repeat", "union", "opt"):
        g = nfa.add(Kind.GAP, gaps=_gap_set(ast))
        return g, g
    return _emit(nfa, ast, k)


def compile_nfa(pattern: str, k: int, alphabet: frozenset) -> NFA:
    """pattern (already trimmed & normalized) -> DAG NFA with START/MATCH."""
    ast = postfix_to_ast(to_postfix(pattern), alphabet)
    nfa = NFA()
    start = nfa.add(Kind.START)
    i, o = _emit(nfa, ast, k)
    match = nfa.add(Kind.MATCH)
    nfa.link(start, i)
    nfa.link(o, match)
    return nfa
