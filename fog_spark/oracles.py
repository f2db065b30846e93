"""Pure-NumPy reference implementations of the §2.8 golden recurrences.

These pin the reference's exact semantics — including its quirks — so the
Spark engine can be tested to allclose(1e-6)/exact without running the
C++ reference:

- FOG-mode PageRank accumulates into the previous rank and applies the
  (1-d) term PER IN-EDGE (reference: application/pagerank.hpp:62-77,
  102-106; gather is `+=` only, attr never reset between iterations).
  Self-loops participate (GLOBAL scatter has no self-loop filter,
  fogsrc/cpu_thread.cpp:509-534).
- TARGET-engine traversals (BFS/SSSP/CC) skip self-loops
  (fogsrc/cpu_thread.cpp:236-240).
- SSSP uses an epsilon=1e-3 improvement guard (headers/types.hpp:17-19,
  application/sssp.hpp:95-106).
- BFS unreached sentinel is 4294967295 (application/bfs.hpp:48).

All functions take an (m,2) int64 edge array + vertex count n.
"""

from __future__ import annotations

import numpy as np

UNREACHED = 4294967295


def out_degrees(edges: np.ndarray, n: int) -> np.ndarray:
    return np.bincount(edges[:, 0], minlength=n).astype(np.int64)


def pagerank_fog(edges: np.ndarray, n: int, niters: int = 10, d: float = 0.85) -> np.ndarray:
    """FOG-mode accumulating PageRank: rank_k = rank_{k-1} + sum_in(d*r/deg + (1-d))."""
    deg = out_degrees(edges, n).astype(np.float64)
    rank = np.ones(n, dtype=np.float64)
    src, dst = edges[:, 0], edges[:, 1]
    for _ in range(niters):
        msg = d * rank[src] / deg[src] + (1.0 - d)
        incoming = np.zeros(n, dtype=np.float64)
        np.add.at(incoming, dst, msg)
        rank = rank + incoming
    return rank


def pagerank_standard(
    edges: np.ndarray, n: int, d: float = 0.85, tol: float = 1e-6, max_iters: int = 200
) -> tuple[np.ndarray, int]:
    """Normalized PageRank with uniform dangling redistribution, to tol."""
    deg = out_degrees(edges, n).astype(np.float64)
    rank = np.full(n, 1.0 / n)
    src, dst = edges[:, 0], edges[:, 1]
    dangling = deg == 0
    for it in range(1, max_iters + 1):
        contrib = np.zeros(n)
        np.add.at(contrib, dst, rank[src] / deg[src])
        new = (1.0 - d) / n + d * (contrib + rank[dangling].sum() / n)
        delta = np.abs(new - rank).max()
        rank = new
        if delta < tol:
            return rank, it
    return rank, max_iters


def pagerank_personalized(
    edges: np.ndarray,
    n: int,
    seeds: list[int],
    d: float = 0.85,
    tol: float = 1e-6,
    max_iters: int = 200,
) -> tuple[np.ndarray, int]:
    """PPR: teleport AND dangling mass concentrated on the seed set."""
    deg = out_degrees(edges, n).astype(np.float64)
    tele = np.zeros(n)
    tele[np.asarray(seeds)] = 1.0 / len(seeds)
    rank = tele.copy()
    src, dst = edges[:, 0], edges[:, 1]
    dangling = deg == 0
    for it in range(1, max_iters + 1):
        contrib = np.zeros(n)
        np.add.at(contrib, dst, rank[src] / deg[src])
        new = (1.0 - d + d * rank[dangling].sum()) * tele + d * contrib
        delta = np.abs(new - rank).max()
        rank = new
        if delta < tol:
            return rank, it
    return rank, max_iters


def wcc(edges: np.ndarray, n: int) -> np.ndarray:
    """min-vertex-id label per weakly-connected component (union-find)."""
    parent = np.arange(n, dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, t in edges:
        rs, rt = find(int(s)), find(int(t))
        if rs != rt:
            parent[max(rs, rt)] = min(rs, rt)
    return np.asarray([find(i) for i in range(n)], dtype=np.int64)


def bfs(edges: np.ndarray, n: int, root: int = 0) -> np.ndarray:
    """Directed BFS levels along out-edges; self-loops skipped (TARGET rule)."""
    e = edges[edges[:, 0] != edges[:, 1]]
    level = np.full(n, UNREACHED, dtype=np.int64)
    level[root] = 0
    frontier = {root}
    adj: dict[int, list[int]] = {}
    for s, t in e:
        adj.setdefault(int(s), []).append(int(t))
    cur = 0
    while frontier:
        nxt = set()
        for u in frontier:
            for v in adj.get(u, ()):
                if level[v] > cur + 1:
                    level[v] = cur + 1
                    nxt.add(v)
        frontier, cur = nxt, cur + 1
    return level


def sssp_fog(
    edges: np.ndarray, weights: np.ndarray, n: int, source: int = 0, eps: float = 1e-3
) -> tuple[np.ndarray, np.ndarray]:
    """Bellman-Ford with FOG's epsilon guard: absorb iff new < old AND |new-old| > eps.

    Deterministic tie-break: among equal-improving relaxations in one
    round, take the smallest (dist, pred) pair — mirrors the engine's
    min(struct(dist, pred)) gather.
    """
    mask = edges[:, 0] != edges[:, 1]
    e, w = edges[mask], weights[mask]
    dist = np.full(n, np.inf)
    pred = np.full(n, -1, dtype=np.int64)
    dist[source] = 0.0
    active = {source}
    while active:
        best: dict[int, tuple[float, int]] = {}
        for (s, t), wt in zip(e, w):
            s, t = int(s), int(t)
            if s in active and np.isfinite(dist[s]):
                cand = (dist[s] + wt, s)
                if t not in best or cand < best[t]:
                    best[t] = cand
        nxt = set()
        for t, (dv, pv) in best.items():
            if dv < dist[t] and abs(dv - dist[t]) > eps:
                dist[t], pred[t] = dv, pv
                nxt.add(t)
        active = nxt
    return dist, pred


def lpa(edges: np.ndarray, n: int, max_iters: int = 20) -> np.ndarray:
    """Synchronous label propagation over the symmetrized graph.

    label_k(v) = most frequent label among neighbors (ties -> smallest
    label); isolated vertices keep their own id. Stops at fixed point or
    max_iters.
    """
    sym = np.concatenate([edges, edges[:, ::-1]])
    sym = sym[sym[:, 0] != sym[:, 1]]
    sym = np.unique(sym, axis=0)
    labels = np.arange(n, dtype=np.int64)
    adj: dict[int, list[int]] = {}
    for s, t in sym:
        adj.setdefault(int(s), []).append(int(t))
    for _ in range(max_iters):
        new = labels.copy()
        for v, nbrs in adj.items():
            counts: dict[int, int] = {}
            for u in nbrs:
                counts[labels[u]] = counts.get(labels[u], 0) + 1
            best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            new[v] = best
        if np.array_equal(new, labels):
            break
        labels = new
    return labels


def triangles(edges: np.ndarray, n: int) -> tuple[np.ndarray, int]:
    """Exact per-vertex and total triangle counts on the simple undirected graph."""
    und = set()
    for s, t in edges:
        s, t = int(s), int(t)
        if s != t:
            und.add((min(s, t), max(s, t)))
    nbrs: dict[int, set[int]] = {i: set() for i in range(n)}
    for a, b in und:
        nbrs[a].add(b)
        nbrs[b].add(a)
    per = np.zeros(n, dtype=np.int64)
    total = 0
    for a, b in und:  # a < b; counting c > b visits each triangle exactly once
        for c in nbrs[a] & nbrs[b]:
            if c > b:
                per[a] += 1
                per[b] += 1
                per[c] += 1
                total += 1
    return per, total


def spmv(edges: np.ndarray, weights: np.ndarray, n: int) -> np.ndarray:
    """One iteration: y(v) = sum_{u->v} x(u) * w(u,v) with x=1 (application/spmv.hpp:86-90)."""
    y = np.zeros(n)
    np.add.at(y, edges[:, 1], 1.0 * weights)
    return y


def scc(edges: np.ndarray, n: int) -> np.ndarray:
    """min-vertex-id label per strongly-connected component (iterative Tarjan)."""
    adj: dict[int, list[int]] = {}
    for s, t in edges:
        if s != t:
            adj.setdefault(int(s), []).append(int(t))
    index = np.full(n, -1, dtype=np.int64)
    low = np.zeros(n, dtype=np.int64)
    on_stack = np.zeros(n, dtype=bool)
    comp = np.full(n, -1, dtype=np.int64)
    stack: list[int] = []
    counter = [0]
    comps: list[list[int]] = []

    for root in range(n):
        if index[root] != -1:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack[v] = True
            advanced = False
            nbrs = adj.get(v, [])
            while pi < len(nbrs):
                w = nbrs[pi]
                pi += 1
                if index[w] == -1:
                    work[-1] = (v, pi)
                    work.append((w, 0))
                    advanced = True
                    break
                if on_stack[w]:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work.pop()
            if low[v] == index[v]:
                c = []
                while True:
                    w = stack.pop()
                    on_stack[w] = False
                    c.append(w)
                    if w == v:
                        break
                comps.append(c)
            if work:
                p, _ = work[-1]
                low[p] = min(low[p], low[v])
    for c in comps:
        m = min(c)
        for v in c:
            comp[v] = m
    return comp


def k_core(edges: np.ndarray, n: int, k: int, rounds: int | None = None) -> dict[int, int]:
    """{id: degree} after the k-core peel (undirected, dedup, no self
    loops); ``rounds`` limits the peel depth like algorithms/kcore."""
    und = {(int(a), int(b)) for a, b in edges if a != b}
    und |= {(b, a) for a, b in und}
    alive = set(range(n))
    m = 0
    while True:
        deg: dict[int, int] = {}
        for a, b in und:
            if a in alive and b in alive:
                deg[a] = deg.get(a, 0) + 1
        survivors = {v: d for v, d in deg.items() if d >= k}
        m += 1
        done = m >= rounds if rounds is not None else set(survivors) == alive
        alive = set(survivors)
        if done or not alive:
            return survivors


def hits(edges: np.ndarray, n: int, niters: int = 10) -> tuple[np.ndarray, np.ndarray]:
    """(authority, hub) after niters update+L2-normalize rounds."""
    a, h = np.ones(n), np.ones(n)
    src, dst = edges[:, 0], edges[:, 1]
    for _ in range(niters):
        a_raw = np.zeros(n)
        np.add.at(a_raw, dst, h[src])
        nrm = np.sqrt((a_raw * a_raw).sum())
        a = a_raw / (nrm if nrm > 0 else 1.0)
        h_raw = np.zeros(n)
        np.add.at(h_raw, src, a[dst])
        nrm = np.sqrt((h_raw * h_raw).sum())
        h = h_raw / (nrm if nrm > 0 else 1.0)
    return a, h


def pagerank_weighted(
    edges: np.ndarray,
    weights: np.ndarray,
    n: int,
    d: float = 0.85,
    tol: float = 1e-6,
    max_iters: int = 200,
) -> tuple[np.ndarray, int]:
    """Edge-weight-proportional PageRank; dangling uniform."""
    src, dst = edges[:, 0], edges[:, 1]
    keep = weights > 0
    src, dst, w = src[keep], dst[keep], weights[keep].astype(np.float64)
    wsum = np.zeros(n)
    np.add.at(wsum, src, w)
    p = w / wsum[src]
    dangling = wsum == 0
    rank = np.full(n, 1.0 / n)
    for it in range(1, max_iters + 1):
        contrib = np.zeros(n)
        np.add.at(contrib, dst, rank[src] * p)
        new = (1.0 - d) / n + d * (contrib + rank[dangling].sum() / n)
        delta = np.abs(new - rank).max()
        rank = new
        if delta < tol:
            return rank, it
    return rank, max_iters


def msf_kruskal(edges: np.ndarray, weights: np.ndarray) -> set[tuple[int, int, float]]:
    """Minimum spanning forest via Kruskal + union-find, on the SAME
    canonical form the Spark engine uses: a < b, min weight per
    unordered pair, edges totally ordered by (w, a, b). Returns the
    forest edge set {(a, b, w)} — unique under the total order."""
    canon: dict[tuple[int, int], float] = {}
    for (s, d), w in zip(edges.tolist(), weights.tolist()):
        if s == d:
            continue
        a, b = (s, d) if s < d else (d, s)
        k = (a, b)
        if k not in canon or w < canon[k]:
            canon[k] = w
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out: set[tuple[int, int, float]] = set()
    for (a, b), w in sorted(canon.items(), key=lambda kv: (kv[1], kv[0])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            out.add((a, b, w))
    return out


def topo_levels(edges: np.ndarray, n: int) -> dict[int, tuple[int, int]]:
    """{id: (component, level)} — SCC condensation + longest-path layer.

    level(c) = longest path (in super-edges) ending at c in the
    condensation DAG; vertices restricted to those appearing in any
    edge (the Spark engine's vertex universe)."""
    comp = scc(edges, n)
    verts = sorted({int(v) for e in edges for v in e}) if len(edges) else []
    cedges = sorted(
        {
            (int(comp[s]), int(comp[t]))
            for s, t in edges
            if s != t and comp[s] != comp[t]
        }
    )
    level = {int(comp[v]): 0 for v in verts}
    changed = True
    while changed:
        changed = False
        for a, b in cedges:
            if level[a] + 1 > level[b]:
                level[b] = level[a] + 1
                changed = True
    return {v: (int(comp[v]), level[int(comp[v])]) for v in verts}


def bowtie(edges: np.ndarray, n: int) -> dict[int, str]:
    """{id: region} per Broder et al. 2000 — CORE = largest SCC (ties:
    smallest min-label), IN reaches it, OUT is reached from it, TUBE =
    IN-reachable AND OUT-reaching remainder, TENDRIL = exactly one of
    those, DISC = neither. Vertices restricted to edge endpoints."""
    comp = scc(edges, n)
    verts = sorted({int(v) for e in edges for v in e}) if len(edges) else []
    sizes: dict[int, int] = {}
    for v in verts:
        sizes[int(comp[v])] = sizes.get(int(comp[v]), 0) + 1
    core_lbl = min(sizes, key=lambda c: (-sizes[c], c))
    fadj: dict[int, list[int]] = {}
    radj: dict[int, list[int]] = {}
    for s, t in edges:
        if s != t:
            fadj.setdefault(int(s), []).append(int(t))
            radj.setdefault(int(t), []).append(int(s))

    def reach(seeds: set[int], adj: dict[int, list[int]]) -> set[int]:
        vis, work = set(seeds), list(seeds)
        while work:
            v = work.pop()
            for w in adj.get(v, []):
                if w not in vis:
                    vis.add(w)
                    work.append(w)
        return vis

    core = {v for v in verts if int(comp[v]) == core_lbl}
    fwd = reach(core, fadj)
    bwd = reach(core, radj)
    inn, outt = bwd - core, fwd - core
    from_in = reach(inn, fadj) if inn else set()
    to_out = reach(outt, radj) if outt else set()
    out: dict[int, str] = {}
    for v in verts:
        if v in core:
            out[v] = "CORE"
        elif v in bwd:
            out[v] = "IN"
        elif v in fwd:
            out[v] = "OUT"
        elif v in from_in and v in to_out:
            out[v] = "TUBE"
        elif v in from_in or v in to_out:
            out[v] = "TENDRIL"
        else:
            out[v] = "DISC"
    return out
