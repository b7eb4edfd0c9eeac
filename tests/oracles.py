"""In-test oracles: numpy power-iteration PageRank, union-find WCC,
brute-force triangles, synchronous label propagation.

These mirror the reference's test strategy — the analytics clients carry
their own invariant asserts (`test/test1_deg_dist_WG400.c:230`,
`test/test2_jtcc_WG400.c:279`) — but as executable small-scale oracles.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np


def pagerank_oracle(
    edges: list[tuple[int, int]],
    vertices: list[int] | None = None,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
) -> dict[int, float]:
    """Dense power iteration with dangling redistribution — the engine's
    exact semantics (kernels/pagerank.py docstring)."""
    vs = sorted(vertices if vertices is not None else {v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(vs)}
    n = len(vs)
    out_deg = Counter(s for s, _ in edges)
    r = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        mass = np.zeros(n)
        for s, d in edges:
            mass[idx[d]] += r[idx[s]] / out_deg[s]
        dangling = sum(r[idx[v]] for v in vs if out_deg[v] == 0)
        r_new = (1.0 - damping) / n + damping * (mass + dangling / n)
        delta = np.max(np.abs(r_new - r))
        r = r_new
        if delta < tol:
            break
    return {v: float(r[idx[v]]) for v in vs}


def wcc_oracle(
    edges: list[tuple[int, int]], vertices: list[int] | None = None
) -> dict[int, int]:
    """Union-find; component label = min vertex id (reference convention,
    `test/test2_jtcc_WG400.c:78-87`)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges:
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    vs = set(vertices if vertices is not None else [])
    vs.update(v for e in edges for v in e)
    return {v: find(v) for v in vs}


def _triangle_set(edges: list[tuple[int, int]]) -> set[tuple[int, int, int]]:
    und = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    adj: dict[int, set[int]] = defaultdict(set)
    for s, d in und:
        adj[s].add(d)
        adj[d].add(s)
    tris: set[tuple[int, int, int]] = set()
    for u, v in und:
        for w in adj[u] & adj[v]:
            tris.add(tuple(sorted((u, v, w))))  # type: ignore[arg-type]
    return tris


def triangles_oracle(edges: list[tuple[int, int]]) -> int:
    """Brute-force undirected triangle count (dedup + de-orient first)."""
    return len(_triangle_set(edges))


def triangles_per_vertex_oracle(edges: list[tuple[int, int]]) -> dict[int, int]:
    per: dict[int, int] = defaultdict(int)
    for tri in _triangle_set(edges):
        for v in tri:
            per[v] += 1
    return dict(per)


def label_propagation_oracle(
    edges: list[tuple[int, int]], max_iter: int = 20
) -> dict[int, int]:
    """Synchronous LP on the undirected graph; vote = neighbor labels plus
    own label; winner = highest count, ties broken by min label."""
    adj: dict[int, set[int]] = defaultdict(set)
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    labels = {v: v for v in adj}
    for _ in range(max_iter):
        new = {}
        for v in adj:
            votes = Counter(labels[u] for u in adj[v])
            votes[labels[v]] += 1
            best = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        if new == labels:
            break
        labels = new
    return labels
