"""Exact 1-Wasserstein (optimal transport) for tiny integer instances.

Support for exact Ollivier-Ricci curvature (operators/curvature.py):
each graph edge needs W1 between two probability measures supported on
~k+1 nodes each. The reference delegates this to the optional
GraphRicciCurvature package and silently falls back to Forman-Ricci when
it is absent (/root/reference/geoIR/geo/curvature.py:117-142) — which is
what happens in its own published environment. Here the transport problem
is solved exactly, with no external solver:

* masses are scaled to INTEGERS (the alpha-lazy uniform measure has
  rational masses; the scale is the lcm of the denominators), and the
  ground costs are integer hop distances, so the transportation LP is
  fully integral — successive shortest paths terminates at the true
  optimum with no floating-point ambiguity;
* the solver returns the transport plan AND node potentials; by LP
  duality (f(x) + g(y) <= C(x,y) with equality on shipping arcs,
  objective equality), `verify_certificate` proves optimality of a
  returned value independently of how the solver got it. The pytest gate
  checks the certificate on randomized instances plus a brute-force
  enumeration twin for tiny supports, so correctness does not rest on
  trusting the solver implementation.

Complexity per instance: <= m+n augmentations, each a Bellman-Ford over
an (m+n)-node dense residual graph — microseconds at the k-NN-graph
support sizes this engine feeds it (m, n <= k+2).
"""

from __future__ import annotations

import numpy as np

_INF = np.iinfo(np.int64).max // 4


def w1_exact_int(
    mu: np.ndarray, nu: np.ndarray, cost: np.ndarray
) -> tuple[int, np.ndarray, np.ndarray, np.ndarray]:
    """Exact min-cost transport between integer measures.

    mu (m,), nu (n,): non-negative int64 with equal sums; cost (m, n):
    non-negative int64. Returns (total_cost, plan, f, g) where plan is the
    optimal transport (m, n) int64 matrix and (f, g) are integer dual
    potentials satisfying f[i] + g[j] <= cost[i, j] everywhere and
    equality wherever plan > 0.
    """
    mu_a = np.asarray(mu, dtype=np.int64)
    nu_a = np.asarray(nu, dtype=np.int64)
    cost_a = np.asarray(cost, dtype=np.int64)
    if mu_a.sum() != nu_a.sum():
        raise ValueError("mu and nu must have equal total mass")
    if (mu_a < 0).any() or (nu_a < 0).any() or (cost_a < 0).any():
        raise ValueError("masses and costs must be non-negative")
    m, n = cost_a.shape
    # hot inner loops run on plain Python ints/lists: the instances are
    # tiny (m, n <= ~2k), where per-call NumPy dispatch overhead dominates
    # any vectorization win by an order of magnitude
    mu_l = mu_a.tolist()
    nu_l = nu_a.tolist()
    cost_l = cost_a.tolist()
    plan = [[0] * n for _ in range(m)]
    row_sent = [0] * m  # mass shipped out of each source
    col_recv = [0] * n  # mass shipped into each sink
    # node potentials: p[0:m] sources, p[m:m+n] sinks (Johnson-style, kept
    # so reduced costs stay >= 0 across augmentations; integers throughout)
    p = [0] * (m + n)

    while True:
        rem_mu = [mu_l[i] - row_sent[i] for i in range(m)]
        if not any(rem_mu):
            break
        rem_nu = [nu_l[j] - col_recv[j] for j in range(n)]
        # Dijkstra from all sources with remaining supply over the residual
        # graph: forward arcs i -> m+j (cap inf) with reduced cost
        # c_ij - p_i + p_{m+j}; backward arcs m+j -> i (cap plan_ij) with
        # the negated reduced cost. Dijkstra is valid because the potential
        # fold below keeps every residual reduced cost >= 0 (the invariant
        # the LP-duality certificate in the tests independently confirms);
        # linear-scan min selection beats a heap at these sizes.
        dist = [_INF] * (m + n)
        parent = [-1] * (m + n)
        done = [False] * (m + n)
        for i in range(m):
            if rem_mu[i] > 0:
                dist[i] = 0
        while True:
            a = -1
            best = _INF
            for b in range(m + n):
                if not done[b] and dist[b] < best:
                    best = dist[b]
                    a = b
            if a < 0:
                break
            done[a] = True
            da = dist[a]
            if a < m:
                ci = cost_l[a]
                base = da - p[a]
                for j in range(n):
                    t = m + j
                    if not done[t]:
                        nd = base + ci[j] + p[t]
                        if nd < dist[t]:
                            dist[t] = nd
                            parent[t] = a
            else:
                j = a - m
                if col_recv[j] > 0:
                    base = da - p[a]
                    for i in range(m):
                        if not done[i] and plan[i][j] > 0:
                            nd = base - cost_l[i][j] + p[i]
                            if nd < dist[i]:
                                dist[i] = nd
                                parent[i] = a
        j_best = -1
        best_d = _INF
        for j in range(n):
            if rem_nu[j] > 0 and dist[m + j] < best_d:
                best_d = dist[m + j]
                j_best = j
        if j_best < 0:
            raise RuntimeError("no augmenting path; inconsistent instance")
        # walk the path back, find bottleneck
        path: list[tuple[int, int, bool]] = []  # (i, j, forward)
        node = m + j_best
        bottleneck = rem_nu[j_best]
        while parent[node] != -1:
            prev = parent[node]
            if node >= m:  # forward arc prev(i) -> node(j)
                path.append((prev, node - m, True))
            else:  # backward arc prev(m+j) -> node(i)
                b = plan[node][prev - m]
                if b < bottleneck:
                    bottleneck = b
                path.append((node, prev - m, False))
            node = prev
        if rem_mu[node] < bottleneck:
            bottleneck = rem_mu[node]
        for i, j, forward in path:
            if forward:
                plan[i][j] += bottleneck
                row_sent[i] += bottleneck
                col_recv[j] += bottleneck
            else:
                plan[i][j] -= bottleneck
                row_sent[i] -= bottleneck
                col_recv[j] -= bottleneck
        # the source end of the path ships the bottleneck out; the sink end
        # receives it — net effect tracked arc-by-arc above (each backward
        # arc cancels its forward counterpart's row/col contribution)
        # fold shortest-path distances into the potentials, capped at the
        # augmenting sink's distance (standard SSP update: keeps every
        # residual reduced cost >= 0, including arcs touching nodes the
        # search did not reach this round).
        # (reduced cost here is c - p_a + p_b, so distances SUBTRACT)
        cap = dist[m + j_best]
        for a in range(m + n):
            da = dist[a]
            p[a] -= da if da < cap else cap

    plan_a = np.array(plan, dtype=np.int64)
    f = np.array(p[:m], dtype=np.int64)
    g = -np.array(p[m : m + n], dtype=np.int64)
    # SSP guarantees f[i] + g[j] == cost on shipping arcs and <= elsewhere
    total = int((plan_a * cost_a).sum())
    return total, plan_a, f, g


def verify_certificate(
    mu: np.ndarray,
    nu: np.ndarray,
    cost: np.ndarray,
    total: int,
    plan: np.ndarray,
    f: np.ndarray,
    g: np.ndarray,
) -> bool:
    """Independent optimality proof: primal feasible + dual feasible +
    complementary slackness + objective equality (all integer exact)."""
    mu = np.asarray(mu, dtype=np.int64)
    nu = np.asarray(nu, dtype=np.int64)
    cost = np.asarray(cost, dtype=np.int64)
    plan = np.asarray(plan, dtype=np.int64)
    if (plan < 0).any():
        return False
    if not (plan.sum(axis=1) == mu).all() or not (plan.sum(axis=0) == nu).all():
        return False
    slack = cost - f[:, None] - g[None, :]
    if (slack < 0).any():
        return False
    if (plan[slack != 0] != 0).any():
        return False
    if int((plan * cost).sum()) != total:
        return False
    # objective equality (implied by CS, asserted anyway)
    dual = int((f * mu).sum() + (g * nu).sum())
    return dual == total


def w1_bruteforce_int(mu: np.ndarray, nu: np.ndarray, cost: np.ndarray) -> int:
    """Exponential-time exact twin for tests (tiny instances only):
    depth-first over all integer transport plans, memoized on remaining
    demands. Independent of the SSP implementation."""
    mu = tuple(int(x) for x in mu)
    nu = tuple(int(x) for x in nu)
    cost = np.asarray(cost, dtype=np.int64)
    from functools import lru_cache

    n = len(nu)

    @lru_cache(maxsize=None)
    def best(i: int, rem: tuple[int, ...]) -> int:
        if i == len(mu):
            return 0 if all(r == 0 for r in rem) else int(_INF)
        supply = mu[i]

        # enumerate all splits of `supply` across the n sinks bounded by rem
        def rec(j: int, left: int, acc: int, rem_l: list[int]) -> int:
            if acc >= out[0]:
                return out[0]
            if j == n - 1:
                if left > rem_l[j]:
                    return out[0]
                sub = best(i + 1, tuple(
                    r - (left if jj == j else 0) for jj, r in enumerate(rem_l)
                ))
                if sub >= _INF:
                    return out[0]
                out[0] = min(out[0], acc + left * int(cost[i, j]) + sub)
                return out[0]
            for take in range(min(left, rem_l[j]) + 1):
                rem2 = list(rem_l)
                rem2[j] -= take
                rec(j + 1, left - take,
                    acc + take * int(cost[i, j]), rem2)
            return out[0]

        out = [int(_INF)]
        rec(0, supply, 0, list(rem))
        return out[0]

    return best(0, nu)
