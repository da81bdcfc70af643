"""Float64 NumPy oracle reproducing the reference's exact numeric semantics.

This is a clean-room re-statement of the *behavior* of the reference
implementation (/root/reference/ws_pagerank.py:121-178 power method,
/root/reference/pagerank.py:18-74 loader), verified against the README golden
transcript for data/small.csv.gz (/root/reference/README.md:416-499):
scores 2.1634 / 1.6664 / 1.2402 / 0.45712 / 0.35619 / 0.32078 in 75 iterations.

Semantics (SURVEY.md §1.3):
  v  = indicator(query) / sum(...)      (L1 normalize; make_personalization_vector)
  v  = v / ||v||_2                      (power_method re-normalizes, ws:139)
  x0 = ones(n) / sqrt(n)
  a[i] = 1 iff out-row i of P is all zeros (dangling)
  repeat: beta = alpha * (x . a) + (1 - alpha)
          x    = beta * v + alpha * P^T x
          stop when ||x - x_prev||_2 < epsilon
The iterate is never re-normalized, so the fixed point is a *scaled* PageRank
vector (scores do not sum to 1).

Loader quirks mirrored (pagerank.py:36-67):
  - regex drop: skip edge when src or dst matches ``.*((/$)|(/.*/)).*``
  - max_nnz keeps the first max_nnz+1 rows (off-by-one included)
  - filter_ratio: keep edge iff indeg(dst) < ratio * n where n is the
    post-regex pre-filter vertex count; vertices are NOT removed
  - edge weight = multiplicity / outdeg(src)  (duplicate COO entries sum)

Pure NumPy float64 — no torch, no Spark. Used as the correctness contract for
every Spark test in this repo.
"""

from __future__ import annotations

import re
from collections import defaultdict
from dataclasses import dataclass, field

import numpy as np

URL_DROP_RE = re.compile(r".*((/$)|(/.*/)).*")


@dataclass
class OracleGraph:
    """COO graph in reference semantics: P[s, t] = multiplicity / outdeg(s)."""

    url_dict: dict[str, int] = field(default_factory=dict)
    src: np.ndarray = None  # int64 row indices
    dst: np.ndarray = None  # int64 col indices
    w: np.ndarray = None  # float64, duplicates already summed
    n: int = 0

    @property
    def index_dict(self) -> dict[int, str]:
        return {v: k for k, v in self.url_dict.items()}


def load_edges(
    rows: list[tuple[str, str]],
    max_nnz: int | None = None,
    filter_ratio: float | None = None,
) -> OracleGraph:
    """rows = [(source, target), ...] — same pipeline as WebGraph.__init__."""
    g = OracleGraph()
    indices: list[list[int]] = []
    target_counts: dict[int, int] = defaultdict(int)

    def url_to_index(url: str) -> int:
        if url not in g.url_dict:
            g.url_dict[url] = len(g.url_dict)
        return g.url_dict[url]

    for i, (source, target) in enumerate(rows):
        if max_nnz is not None and i > max_nnz:
            break
        if URL_DROP_RE.match(source) or URL_DROP_RE.match(target):
            continue
        s = url_to_index(source)
        t = url_to_index(target)
        target_counts[t] += 1
        indices.append([s, t])

    n = len(g.url_dict)
    if filter_ratio is not None:
        indices = [
            (s, t) for s, t in indices if target_counts[t] < filter_ratio * n
        ]

    # weight = multiplicity / outdeg(src), duplicates summed (== torch COO
    # accumulation over run-length 1/outdeg values on sorted input)
    out_rows: dict[int, int] = defaultdict(int)
    for s, _ in indices:
        out_rows[s] += 1
    coo: dict[tuple[int, int], float] = defaultdict(float)
    for s, t in indices:
        coo[(s, t)] += 1.0 / out_rows[s]

    keys = sorted(coo)
    g.src = np.array([k[0] for k in keys], dtype=np.int64)
    g.dst = np.array([k[1] for k in keys], dtype=np.int64)
    g.w = np.array([coo[k] for k in keys], dtype=np.float64)
    g.n = n
    return g


def url_satisfies_query(url: str, query: str) -> bool:
    """Reference predicate semantics (pagerank.py:188-229 incl. doctests)."""
    satisfies = False
    terms = query.split()
    num_terms = 0
    for term in terms:
        if term[0] != "-":
            num_terms += 1
            if term in url:
                satisfies = True
    if num_terms == 0:
        satisfies = True
    for term in terms:
        if term[0] == "-" and term[1:] in url:
            return False
    return satisfies


def make_personalization_vector(g: OracleGraph, query: str | None = None) -> np.ndarray:
    n = g.n
    if query is None:
        v = np.ones(n, dtype=np.float64)
    else:
        v = np.zeros(n, dtype=np.float64)
        inv = g.index_dict
        for i in range(n):
            if url_satisfies_query(inv[i], query):
                v[i] = 1.0
    s = v.sum()
    assert s > 0
    return v / s


def power_method(
    g: OracleGraph,
    v: np.ndarray | None = None,
    alpha: float = 0.85,
    max_iterations: int = 1000,
    epsilon: float = 1e-6,
) -> tuple[np.ndarray, int, list[float]]:
    """Returns (x, iterations_run, residual_history)."""
    n = g.n
    if v is None:
        v = np.full(n, 1.0 / n, dtype=np.float64)
    v = v / np.linalg.norm(v)

    x = np.full(n, 1.0 / np.sqrt(n), dtype=np.float64)

    # dangling indicator: out-row sum == 0
    row_sum = np.zeros(n, dtype=np.float64)
    np.add.at(row_sum, g.src, g.w)
    a = (row_sum == 0.0).astype(np.float64)

    residuals: list[float] = []
    iters = 0
    for _ in range(max_iterations):
        iters += 1
        xprev = x
        beta = alpha * float(xprev @ a) + (1.0 - alpha)
        # P^T x : contribs[t] += w(s,t) * x[s]
        contrib = np.bincount(g.dst, weights=g.w * xprev[g.src], minlength=n)
        x = beta * v + alpha * contrib
        residual = float(np.linalg.norm(x - xprev))
        residuals.append(residual)
        if residual < epsilon:
            break
    return x, iters, residuals


def pagerank_by_url(
    rows: list[tuple[str, str]],
    pv_query: str | None = None,
    alpha: float = 0.85,
    max_iterations: int = 1000,
    epsilon: float = 1e-6,
    filter_ratio: float | None = None,
) -> dict[str, float]:
    """End-to-end: edge rows -> {url: score}. Per-url comparison is the test
    contract (vertex-id assignment order is permutation-equivariant)."""
    g = load_edges(rows, filter_ratio=filter_ratio)
    v = make_personalization_vector(g, pv_query) if pv_query is not None else None
    x, _, _ = power_method(
        g, v, alpha=alpha, max_iterations=max_iterations, epsilon=epsilon
    )
    inv = g.index_dict
    return {inv[i]: float(x[i]) for i in range(g.n)}


# --- pure-python oracles for the other graph algorithms -------------------

def connected_components_oracle(edge_rows: list[tuple[str, str]]) -> dict[str, str]:
    """Weakly-connected components via union-find; label = min url (lexicographic
    on the representative chosen as min by union ordering). Returns
    {url: component_label_url} where the label is the lexicographically
    smallest url in the component (matches the engine's min-label semantics)."""
    parent: dict[str, str] = {}

    def find(u: str) -> str:
        while parent[u] != u:
            parent[u] = parent[parent[u]]
            u = parent[u]
        return u

    def union(u: str, w: str) -> None:
        ru, rw = find(u), find(w)
        if ru != rw:
            parent[max(ru, rw)] = min(ru, rw)

    for s, t in edge_rows:
        for u in (s, t):
            if u not in parent:
                parent[u] = u
        union(s, t)
    return {u: find(u) for u in parent}


def triangle_count_oracle(edge_rows: list[tuple[str, str]]) -> int:
    """Undirected distinct-triangle count (self-loops dropped, edges deduped)."""
    adj: dict[str, set[str]] = defaultdict(set)
    for s, t in edge_rows:
        if s == t:
            continue
        adj[s].add(t)
        adj[t].add(s)
    count = 0
    for u in adj:
        for w in adj[u]:
            if w <= u:
                continue
            count += sum(1 for z in adj[u] & adj[w] if z > w)
    return count


def label_propagation_oracle(
    edge_rows: list[tuple[str, str]], max_iters: int = 20
) -> dict[str, str]:
    """Synchronous LPA, undirected, deterministic: each vertex adopts the most
    frequent neighbor label, ties broken by min label; keeps own label if no
    neighbors. Engine must implement identical semantics."""
    adj: dict[str, set[str]] = defaultdict(set)
    for s, t in edge_rows:
        if s == t:
            continue
        adj[s].add(t)
        adj[t].add(s)
    labels = {u: u for u in adj}
    for _ in range(max_iters):
        new_labels = {}
        for u in adj:
            counts: dict[str, int] = defaultdict(int)
            for w in adj[u]:
                counts[labels[w]] += 1
            if not counts:
                new_labels[u] = labels[u]
                continue
            # deterministic: max count, then MIN label
            maxc = max(counts.values())
            new_labels[u] = min(l for l, c in counts.items() if c == maxc)
        if new_labels == labels:
            break
        labels = new_labels
    return labels


def hits_oracle(
    edge_rows: list[tuple[str, str]], iters: int = 3
) -> dict[str, tuple[float, float]]:
    """Kleinberg HITS over the engine's link structure (regex drop +
    duplicate-edge collapse; self-loops kept, matching the weighted edge
    table build_graph produces): h0 = 1/sqrt(n); per iteration
    a = norm2(A^T h), h = norm2(A a). Returns url -> (authority, hub)."""
    pairs = sorted(
        {
            (s, t)
            for s, t in edge_rows
            if not URL_DROP_RE.match(s) and not URL_DROP_RE.match(t)
        }
    )
    urls = sorted({u for p in pairs for u in p})
    idx = {u: i for i, u in enumerate(urls)}
    n = len(urls)
    src = np.array([idx[s] for s, _ in pairs], dtype=np.int64)
    dst = np.array([idx[t] for _, t in pairs], dtype=np.int64)
    h = np.full(n, 1.0 / np.sqrt(n), dtype=np.float64)
    a = np.zeros(n, dtype=np.float64)
    for _ in range(iters):
        a_raw = np.zeros(n, dtype=np.float64)
        np.add.at(a_raw, dst, h[src])
        na = np.linalg.norm(a_raw)
        a = a_raw / na if na > 0 else a_raw
        h_raw = np.zeros(n, dtype=np.float64)
        np.add.at(h_raw, src, a[dst])
        nh = np.linalg.norm(h_raw)
        h = h_raw / nh if nh > 0 else h_raw
    return {u: (float(a[idx[u]]), float(h[idx[u]])) for u in urls}


def k_core_oracle(
    edge_rows: list[tuple[str, str]], k: int
) -> dict[str, int]:
    """Textbook peeling over the engine's undirected structure (regex drop,
    duplicate collapse, self-loops removed). Returns url -> core degree for
    vertices in the k-core."""
    pairs = {
        tuple(sorted((s, t)))
        for s, t in edge_rows
        if s != t and not URL_DROP_RE.match(s) and not URL_DROP_RE.match(t)
    }
    adj: dict[str, set[str]] = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    changed = True
    while changed:
        changed = False
        for u in [u for u, nb in adj.items() if len(nb) < k]:
            for v in adj[u]:
                adj[v].discard(u)
            del adj[u]
            changed = True
    return {u: len(nb) for u, nb in adj.items()}


def scc_oracle(edge_rows: list[tuple[str, str]]) -> dict[str, str]:
    """Strongly connected components via iterative Tarjan; returns
    {url: scc_label_url} where the label is the lexicographically smallest
    url in the SCC (matches the engine's min-member semantics).
    Vertices = all edge endpoints; self-loops are singletons (the engine
    drops them before phase work, which cannot merge anything)."""
    adj: dict[str, list[str]] = {}
    for s, t in edge_rows:
        adj.setdefault(s, [])
        adj.setdefault(t, [])
        if s != t:
            adj[s].append(t)

    index: dict[str, int] = {}
    low: dict[str, int] = {}
    on_stack: set[str] = set()
    stack: list[str] = []
    label: dict[str, str] = {}
    counter = [0]

    def strongconnect(root: str) -> None:
        work = [(root, 0)]
        while work:
            v, pi = work.pop()
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if w not in index:
                    work.append((v, i + 1))
                    work.append((w, 0))
                    recurse = True
                    break
                elif w in on_stack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    label[w] = m
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[v])

    for v in adj:
        if v not in index:
            strongconnect(v)
    return label


def bowtie_oracle(edge_rows: list[tuple[str, str]]) -> dict[str, str]:
    """Broder bow-tie classes from scc_oracle: CORE = largest SCC (ties:
    min label), IN = reaches CORE, OUT = reached from CORE, OTHER = rest."""
    scc = scc_oracle(edge_rows)
    sizes: dict[str, int] = {}
    for lbl in scc.values():
        sizes[lbl] = sizes.get(lbl, 0) + 1
    core_id = min(sizes, key=lambda x: (-sizes[x], x))
    core = {u for u, lbl in scc.items() if lbl == core_id}

    fwd: dict[str, set[str]] = {u: set() for u in scc}
    bwd: dict[str, set[str]] = {u: set() for u in scc}
    for s, t in edge_rows:
        if s != t:
            fwd[s].add(t)
            bwd[t].add(s)

    def closure(seeds: set[str], nbrs: dict[str, set[str]]) -> set[str]:
        seen = set(seeds)
        frontier = list(seeds)
        while frontier:
            nxt = []
            for u in frontier:
                for w in nbrs[u]:
                    if w not in seen:
                        seen.add(w)
                        nxt.append(w)
            frontier = nxt
        return seen

    reaches = closure(core, bwd)
    reached = closure(core, fwd)
    out: dict[str, str] = {}
    for u in scc:
        if u in core:
            out[u] = "CORE"
        elif u in reaches:
            out[u] = "IN"
        elif u in reached:
            out[u] = "OUT"
        else:
            out[u] = "OTHER"
    return out


def bfs_oracle(
    edge_rows: list[tuple[str, str]],
    seeds: set[str],
    direction: str = "forward",
) -> dict[str, int]:
    """Hop distances from the seed set over the directed graph (reversed
    when direction='backward'); unreachable vertices are absent."""
    adj: dict[str, set[str]] = {}
    for s, t in edge_rows:
        adj.setdefault(s, set())
        adj.setdefault(t, set())
        if s != t:
            if direction == "forward":
                adj[s].add(t)
            else:
                adj[t].add(s)
    dist = {u: 0 for u in seeds if u in adj}
    frontier = list(dist)
    d = 0
    while frontier:
        d += 1
        nxt = []
        for u in frontier:
            for w in adj[u]:
                if w not in dist:
                    dist[w] = d
                    nxt.append(w)
        frontier = nxt
    return dist


def _und_adj(edge_rows: list[tuple[str, str]]) -> dict[str, set[str]]:
    adj: dict[str, set[str]] = {}
    for s, t in edge_rows:
        adj.setdefault(s, set())
        adj.setdefault(t, set())
        if s != t:
            adj[s].add(t)
            adj[t].add(s)
    return adj


def clustering_oracle(edge_rows: list[tuple[str, str]]) -> dict[str, float]:
    """Local clustering coefficient over the deduplicated undirected graph;
    0.0 for degree < 2."""
    adj = _und_adj(edge_rows)
    out = {}
    for u, nb in adj.items():
        d = len(nb)
        if d < 2:
            out[u] = 0.0
            continue
        links = 0
        nbl = list(nb)
        for i in range(d):
            for j in range(i + 1, d):
                if nbl[j] in adj[nbl[i]]:
                    links += 1
        out[u] = 2.0 * links / (d * (d - 1))
    return out


def reciprocity_oracle(edge_rows: list[tuple[str, str]]) -> float:
    e = {(s, t) for s, t in edge_rows if s != t}
    if not e:
        return 0.0
    return sum(1 for s, t in e if (t, s) in e) / len(e)


def degree_histogram_oracle(
    edge_rows: list[tuple[str, str]], direction: str = "out"
) -> dict[int, int]:
    e = {(s, t) for s, t in edge_rows if s != t}
    verts = {x for st in edge_rows for x in st}
    deg = {u: 0 for u in verts}
    for s, t in e:
        if direction in ("out", "total"):
            deg[s] += 1
        if direction in ("in", "total"):
            deg[t] += 1
    hist: dict[int, int] = {}
    for d in deg.values():
        hist[d] = hist.get(d, 0) + 1
    return hist


def common_neighbors_oracle(
    edge_rows: list[tuple[str, str]],
    max_center_degree: int | None = None,
) -> dict[tuple[str, str], tuple[int, float]]:
    """{(a, b): (common, jaccard)} for non-adjacent pairs a < b with at
    least one shared neighbor; centers above the degree cap generate no
    wedges (and are excluded from the common count), but jaccard uses the
    uncapped neighborhood sizes — mirrors operators/linkpred.py."""
    adj = _und_adj(edge_rows)
    out: dict[tuple[str, str], int] = {}
    for w, nb in adj.items():
        if max_center_degree is not None and len(nb) > max_center_degree:
            continue
        nbl = sorted(nb)
        for i in range(len(nbl)):
            for j in range(i + 1, len(nbl)):
                a, b = nbl[i], nbl[j]
                if b in adj[a]:
                    continue
                out[(a, b)] = out.get((a, b), 0) + 1
    return {
        p: (c, c / (len(adj[p[0]]) + len(adj[p[1]]) - c))
        for p, c in out.items()
    }
