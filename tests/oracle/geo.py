"""Single-node NumPy oracle reimplementing the reference's normative
geometric semantics (SURVEY.md §5 item 1) in deliberately naive, loop-heavy
style — independent of the engine's vectorized kernels so agreement is
meaningful.

Semantics sources (re-derived, not copied):
  * build_knn_graph: /root/reference/geoIR/geo/graph.py:24-87
  * Index.search cosine/mix/geodesic: /root/reference/geoIR/retrieval/index.py:109-194
  * personalized_pagerank: /root/reference/geoIR/geo/graph_rerank.py:16-67
  * PPR eval pipeline: /root/reference/geoIR/eval/metrics.py:55-92
  * soft_knn_graph / heat_kernel_distances: /root/reference/geoIR/geo/differentiable.py:19-211
  * forman_ricci_weighted: /root/reference/geoIR/geo/curvature.py:14-68
"""

from __future__ import annotations

import heapq
import math

import numpy as np


def knn_graph_edges(emb: np.ndarray, k: int, metric: str = "cosine") -> dict[tuple[int, int], float]:
    """Undirected weighted kNN edges {(u<v): weight}. Naive per-node loop."""
    n = emb.shape[0]
    edges: dict[tuple[int, int], float] = {}
    for i in range(n):
        if metric == "cosine":
            sims = emb @ emb[i]
            order = np.argsort(-sims, kind="stable")
            dists = 1.0 - sims
        else:
            dists = np.linalg.norm(emb - emb[i], axis=1)
            order = np.argsort(dists, kind="stable")
        cnt = 0
        for j in order:
            if j == i:
                continue
            e = (min(i, int(j)), max(i, int(j)))
            edges.setdefault(e, float(dists[j]))
            cnt += 1
            if cnt == k:
                break
    return edges


def cosine_topk(emb: np.ndarray, q: np.ndarray, k: int) -> list[int]:
    """Reference tie-break: stable ascending argsort reversed -> larger
    index first on ties (index.py:166)."""
    sims = emb @ q
    return [int(i) for i in np.argsort(sims, kind="stable")[-k:][::-1]]


def geodesic_search(
    emb: np.ndarray,
    q: np.ndarray,
    edges: dict[tuple[int, int], float],
    k: int,
    search_k: int,
    connect_k: int,
) -> list[tuple[int, float]]:
    """Strategy C (index.py:171-189), ties pinned (dist asc, doc asc)."""
    sims = emb @ q
    cand = [int(i) for i in np.argsort(sims, kind="stable")[-search_k:][::-1]]
    cset = set(cand)
    adj: dict[int, list[tuple[int, float]]] = {c: [] for c in cand}
    for (u, v), w in edges.items():
        if u in cset and v in cset:
            adj[u].append((v, w))
            adj[v].append((u, w))
    Q = -1
    adj[Q] = []
    for i in cand[:connect_k]:
        w = 1.0 - float(emb[i] @ q)
        adj[Q].append((i, w))
    dist: dict[int, float] = {}
    heap: list[tuple[float, int]] = [(0.0, Q)]
    seen: set[int] = set()
    while heap:
        d, u = heapq.heappop(heap)
        if u in seen:
            continue
        seen.add(u)
        dist[u] = d
        for v, w in adj[u]:
            if v not in seen:
                heapq.heappush(heap, (d + w, v))
    dist.pop(Q, None)
    ordered = sorted(dist.items(), key=lambda t: (t[1], t[0]))
    return ordered[:k]


def personalized_pagerank(A: np.ndarray, prior: np.ndarray, alpha: float = 0.2, iters: int = 20) -> np.ndarray:
    deg = A.sum(axis=1)[:, None]
    A_norm = A / (deg + 1e-12)
    p = prior / prior.sum()
    for _ in range(iters):
        p = (1 - alpha) * prior + alpha * (A_norm.T @ p)
    return p


def ppr_pipeline(
    emb: np.ndarray, q: np.ndarray, cand: list[int], adjacency: str = "cosine"
) -> tuple[list[int], np.ndarray]:
    """eval/metrics.py:74-86 shape over an explicit candidate list."""
    sub = emb[cand]
    sims = sub @ q
    if adjacency == "cosine":
        A = np.clip(sub @ sub.T, 0.0, None)
        np.fill_diagonal(A, 0.0)
    else:
        raise NotImplementedError
    prior = np.clip(sims, 1e-6, None)
    prior = prior / prior.sum()
    p = personalized_pagerank(A, prior)
    return cand, p


def heat_kernel_distances(A: np.ndarray, t: float = 1.0, steps: int = 10, normalize: bool = True) -> np.ndarray:
    B = A.shape[0]
    A_sym = (A + A.T) / 2
    degrees = A_sym.sum(axis=-1)
    D = np.diag(degrees)
    L = D - A_sym
    if normalize:
        Dsi = np.diag(1.0 / np.sqrt(degrees + 1e-8))
        L = Dsi @ L @ Dsi
    I = np.eye(B)
    K = I.copy()
    P = I.copy()
    for s in range(1, steps + 1):
        P = P @ (-t * L) / s
        K = K + P
    out = np.zeros((B, B))
    for i in range(B):
        for j in range(B):
            diff = K[i] - K[j]
            out[i, j] = float(np.linalg.norm(diff) ** 2)
    return out


def soft_knn_graph(emb: np.ndarray, k: int = 8, gamma: float | None = None):
    N = emb.shape[0]
    D2 = np.zeros((N, N))
    for i in range(N):
        for j in range(N):
            d = emb[i] - emb[j]
            D2[i, j] = float(d @ d)
    if gamma is None:
        sigma2 = np.quantile(D2[D2 > 0], 0.2)
        gamma = sigma2 / math.log(k)
    Z = -D2 / gamma
    for i in range(N):
        Z[i, i] = -np.inf
    P = np.zeros((N, N))
    for i in range(N):
        row = Z[i] - Z[i].max()
        e = np.exp(row)
        P[i] = e / e.sum()
    tau = k / P.sum(axis=-1, keepdims=True)
    A = P * tau
    if k < N - 1:
        thresh = np.sort(A, axis=-1)[:, -k][:, None]
        A = np.where(A >= thresh, A, 0.0)
    A = (A + A.T) / 2
    row_sum = A.sum(axis=-1, keepdims=True) + 1e-8
    A = A * (k / row_sum)
    W = A * D2
    return W, A


def forman_ricci_weighted(edges: dict[tuple[int, int], float]) -> dict[tuple[int, int], float]:
    """Per-edge loop following the reference formula literally."""
    nbrs: dict[int, dict[int, float]] = {}
    for (u, v), w in edges.items():
        nbrs.setdefault(u, {})[v] = w
        nbrs.setdefault(v, {})[u] = w
    strengths = {n: sum(ws.values()) for n, ws in nbrs.items()}
    out: dict[tuple[int, int], float] = {}
    for (u, v), w_uv in edges.items():
        if w_uv == 0:
            continue
        w_u, w_v = strengths[u], strengths[v]
        if w_u == 0 or w_v == 0:
            continue
        term1 = w_uv * ((1 / w_u) + (1 / w_v))
        sum_u = sum(
            w_uv / np.sqrt(w_uv * w_ue) for nb, w_ue in nbrs[u].items() if nb != v
        )
        sum_v = sum(
            w_uv / np.sqrt(w_uv * w_ve) for nb, w_ve in nbrs[v].items() if nb != u
        )
        out[(u, v)] = float(term1 - sum_u - sum_v)
    return out


def forman_ricci_differentiable(A: np.ndarray, eps: float = 1e-9) -> np.ndarray:
    """Tensorized Forman (differentiable.py:214-278), naive triple loop."""
    A_sym = (A + A.T) / 2
    B = A_sym.shape[0]
    deg = A_sym.sum(axis=-1)
    out = np.zeros((B, B))
    for i in range(B):
        for j in range(B):
            t1 = A_sym[i, j] * (1.0 / (deg[i] + eps) + 1.0 / (deg[j] + eps))
            tri = 0.0
            for k in range(B):
                num = A_sym[i, k] * A_sym[j, k]
                tri += num / np.sqrt(A_sym[i, j] * num + eps)
            out[i, j] = t1 - tri
    return out


def info_nce_geo(d_pos: np.ndarray, d_neg: np.ndarray, temperature: float = 0.07) -> float:
    """losses.py:43-90: CE over [-d_pos/t | -d_neg/t] with target column 0."""
    losses = []
    for b in range(len(d_pos)):
        logits = np.concatenate(([-d_pos[b] / temperature], -d_neg[b] / temperature))
        p = np.exp(logits - logits.max())
        p = p / p.sum()
        losses.append(-np.log(p[0]))
    return float(np.mean(losses))


def hinge_curvature_loss(kappa: np.ndarray, kappa_target: float = 0.0) -> float:
    """losses.py:96-120 quadratic hinge."""
    vals = []
    for k in np.ravel(kappa):
        d = max(kappa_target - k, 0.0)
        vals.append(d * d)
    return float(np.mean(vals))


def graph_distribution_metrics(A: np.ndarray) -> dict[str, float]:
    A_norm = A / (A.sum(axis=-1, keepdims=True) + 1e-12)
    entropy = float((-(A_norm * np.log(A_norm + 1e-12)).sum(axis=-1)).mean())
    eff_degree = float(1.0 / (A_norm**2).sum(axis=-1).mean())
    return {"entropy": entropy, "effective_degree": eff_degree}
