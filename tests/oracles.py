"""Pure-Python reference oracles for the iterative algorithms.

Independent re-implementations over edge lists (no Spark), mirroring the
reference-test strategy of one behavioral spec checked against multiple
engines (GraphImporterTestBase.java:15-234). PageRank matches the engine's
exact update rule (dangling mass redistributed uniformly); CC/LP replicate
min-label / most-frequent-min-tie semantics precisely.
"""

from __future__ import annotations

from collections import Counter, defaultdict


def pagerank_oracle(
    edges: list[tuple[int, int]],
    vertices: set[int],
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 40,
) -> dict[int, float]:
    n = len(vertices)
    out_nbrs: dict[int, list[int]] = defaultdict(list)
    for s, d in set(edges):
        out_nbrs[s].append(d)
    ranks = {v: 1.0 / n for v in vertices}
    for _ in range(max_iter):
        contrib: dict[int, float] = defaultdict(float)
        dangling_mass = 0.0
        for v in vertices:
            nbrs = out_nbrs.get(v)
            if not nbrs:
                dangling_mass += ranks[v]
            else:
                share = ranks[v] / len(nbrs)
                for d in nbrs:
                    contrib[d] += share
        base = (1.0 - damping) / n + damping * dangling_mass / n
        new_ranks = {v: base + damping * contrib.get(v, 0.0) for v in vertices}
        delta = sum(abs(new_ranks[v] - ranks[v]) for v in vertices)
        ranks = new_ranks
        if delta < tol:
            break
    return ranks


def components_oracle(
    edges: list[tuple[int, int]], vertices: set[int]
) -> dict[int, int]:
    """Exact connected components; label = min vid in component (BFS)."""
    nbrs: dict[int, set[int]] = defaultdict(set)
    for s, d in edges:
        if s != d:
            nbrs[s].add(d)
            nbrs[d].add(s)
    label: dict[int, int] = {}
    for v in sorted(vertices):
        if v in label:
            continue
        stack, seen = [v], {v}
        while stack:
            u = stack.pop()
            for w in nbrs.get(u, ()):
                if w not in seen:
                    seen.add(w)
                    stack.append(w)
        for u in seen:
            label[u] = min(label.get(u, v), v)
    return label


def label_propagation_oracle(
    edges: list[tuple[int, int]],
    vertices: set[int],
    max_iter: int = 20,
) -> dict[int, int]:
    """Synchronous LPA, most-frequent neighbor label, min tie-break —
    byte-for-byte the engine's semantics incl. the plateau stop."""
    nbrs: dict[int, set[int]] = defaultdict(set)
    for s, d in edges:
        if s != d:
            nbrs[s].add(d)
            nbrs[d].add(s)
    labels = {v: v for v in vertices}
    prev_changed = None
    for it in range(max_iter):
        new_labels = {}
        for v in vertices:
            if not nbrs.get(v):
                new_labels[v] = labels[v]
                continue
            freq = Counter(labels[u] for u in nbrs[v])
            best = min(freq.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            new_labels[v] = best
        changed = sum(1 for v in vertices if new_labels[v] != labels[v])
        labels = new_labels
        if changed == 0:
            break
        if prev_changed is not None and changed >= prev_changed and it >= 4:
            break
        prev_changed = changed
    return labels


def triangle_oracle(edges: list[tuple[int, int]]) -> int:
    und = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    nbrs: dict[int, set[int]] = defaultdict(set)
    for a, b in und:
        nbrs[a].add(b)
        nbrs[b].add(a)
    count = 0
    for a, b in und:
        count += len([c for c in nbrs[a] & nbrs[b] if c > b])
    return count

def ppr_oracle(
    edges: list[tuple[int, int]],
    vertices: set[int],
    seeds: set[int],
    damping: float = 0.85,
    max_iter: int = 5,
) -> dict[int, float]:
    """Personalized PageRank, fixed iterations: teleport and dangling mass
    land on the uniform seed distribution."""
    seeds = set(seeds) & set(vertices)
    p = {v: (1.0 / len(seeds) if v in seeds else 0.0) for v in vertices}
    out_nbrs: dict[int, list[int]] = defaultdict(list)
    for s, d in set(edges):
        out_nbrs[s].append(d)
    ranks = dict(p)
    for _ in range(max_iter):
        contrib: dict[int, float] = defaultdict(float)
        dangling_mass = 0.0
        for v in vertices:
            nbrs = out_nbrs.get(v)
            if not nbrs:
                dangling_mass += ranks[v]
            else:
                share = ranks[v] / len(nbrs)
                for d in nbrs:
                    contrib[d] += share
        ranks = {
            v: (1.0 - damping) * p[v]
            + damping * (dangling_mass * p[v] + contrib.get(v, 0.0))
            for v in vertices
        }
    return ranks


def bfs_oracle(
    edges: list[tuple[int, int]],
    seeds: set[int],
    max_depth: int,
    directed: bool = True,
) -> dict[int, int]:
    """Level-by-level BFS: min hop distance from any seed, capped."""
    adj: dict[int, set[int]] = defaultdict(set)
    for s, d in set(edges):
        adj[s].add(d)
        if not directed and s != d:
            adj[d].add(s)
    depth = {v: 0 for v in seeds}
    frontier = set(seeds)
    for lvl in range(1, max_depth + 1):
        nxt = {d for v in frontier for d in adj.get(v, ()) if d not in depth}
        for v in nxt:
            depth[v] = lvl
        frontier = nxt
        if not frontier:
            break
    return depth


def cocitation_oracle(
    edges: list[tuple[int, int]],
    min_common: int = 2,
    max_out_degree: int | None = None,
) -> dict[tuple[int, int], int]:
    """Count of shared in-neighbors per (a<b) pair, with the hub cap."""
    outs: dict[int, set[int]] = defaultdict(set)
    for s, d in set(edges):
        outs[s].add(d)
    counts: Counter = Counter()
    for s, ds in outs.items():
        if max_out_degree is not None and len(ds) > max_out_degree:
            continue
        ds = sorted(ds)
        for i, a in enumerate(ds):
            for b in ds[i + 1:]:
                counts[(a, b)] += 1
    return {p: c for p, c in counts.items() if c >= min_common}


def scc_oracle(
    edges: list[tuple[int, int]], vertices: set[int]
) -> dict[int, int]:
    """Iterative Tarjan; scc id = min member vid."""
    adj: dict[int, list[int]] = defaultdict(list)
    for s, d in set(edges):
        if s != d:
            adj[s].append(d)
    index: dict[int, int] = {}
    low: dict[int, int] = {}
    on_stack: set[int] = set()
    stack: list[int] = []
    counter = [0]
    comp: dict[int, int] = {}

    for root in sorted(vertices):
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            advanced = False
            nbrs = adj.get(v, [])
            while pi < len(nbrs):
                w = nbrs[pi]
                pi += 1
                if w not in index:
                    work[-1] = (v, pi)
                    work.append((w, 0))
                    advanced = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work.pop()
            if low[v] == index[v]:
                members = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    members.append(w)
                    if w == v:
                        break
                m = min(members)
                for w in members:
                    comp[w] = m
            if work:
                pv, _ = work[-1]
                low[pv] = min(low[pv], low[v])
    return comp
