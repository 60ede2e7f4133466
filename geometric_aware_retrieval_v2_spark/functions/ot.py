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
    mu = np.asarray(mu, dtype=np.int64).copy()
    nu = np.asarray(nu, dtype=np.int64).copy()
    cost = np.asarray(cost, dtype=np.int64)
    if mu.sum() != nu.sum():
        raise ValueError("mu and nu must have equal total mass")
    if (mu < 0).any() or (nu < 0).any() or (cost < 0).any():
        raise ValueError("masses and costs must be non-negative")
    m, n = cost.shape
    plan = np.zeros((m, n), dtype=np.int64)
    # node potentials: p[0:m] sources, p[m:m+n] sinks (Johnson-style, kept
    # so reduced costs stay >= 0 across augmentations; integers throughout)
    p = np.zeros(m + n, dtype=np.int64)

    while True:
        rem_mu = mu - plan.sum(axis=1)
        rem_nu = nu - plan.sum(axis=0)
        if rem_mu.sum() == 0:
            break
        # Bellman-Ford from all sources with remaining supply over the
        # residual graph: forward arcs (i -> m+j) cost c_ij - p_i + p_mj
        # (cap inf), backward arcs (m+j -> i) cost -(c_ij) + p_mj - p_i
        # reversed... expressed directly below on raw costs with
        # potentials folded in.
        dist = np.full(m + n, _INF, dtype=np.int64)
        parent = np.full(m + n, -1, dtype=np.int64)
        dist[:m][rem_mu > 0] = 0
        for _ in range(m + n):
            changed = False
            # forward arcs i -> m+j (always available)
            for i in range(m):
                if dist[i] >= _INF:
                    continue
                rc = cost[i] - p[i] + p[m : m + n]  # reduced costs row
                nd = dist[i] + rc
                upd = nd < dist[m : m + n]
                if upd.any():
                    dist[m : m + n][upd] = nd[upd]
                    parent[m : m + n][upd] = i
                    changed = True
            # backward arcs m+j -> i (only where plan > 0)
            for j in range(n):
                if dist[m + j] >= _INF:
                    continue
                hasflow = plan[:, j] > 0
                if not hasflow.any():
                    continue
                rc = -(cost[:, j] - p[:m] + p[m + j])
                nd = dist[m + j] + rc
                upd = hasflow & (nd < dist[:m])
                if upd.any():
                    dist[:m][upd] = nd[upd]
                    parent[:m][upd] = m + j
                    changed = True
            if not changed:
                break
        sinks = np.where((rem_nu > 0) & (dist[m : m + n] < _INF))[0]
        if len(sinks) == 0:
            raise RuntimeError("no augmenting path; inconsistent instance")
        j_best = sinks[np.argmin(dist[m + sinks])]
        # walk the path back, find bottleneck
        path: list[tuple[int, int]] = []  # (i, j) arcs with direction sign
        node = m + j_best
        bottleneck = rem_nu[j_best]
        while parent[node] != -1:
            prev = int(parent[node])
            if node >= m:  # forward arc prev(i) -> node(j)
                path.append((prev, node - m))
            else:  # backward arc prev(m+j) -> node(i)
                bottleneck = min(bottleneck, plan[node, prev - m])
                path.append((node, prev - m))
            node = prev
        bottleneck = min(bottleneck, rem_mu[node])
        # apply: forward arcs +delta, backward arcs -delta, in path order
        node2 = m + j_best
        idx = 0
        while parent[node2] != -1:
            prev = int(parent[node2])
            i, j = path[idx]
            if node2 >= m:
                plan[i, j] += bottleneck
            else:
                plan[i, j] -= bottleneck
            idx += 1
            node2 = prev
        # fold shortest-path distances into the potentials, capped at the
        # augmenting sink's distance (standard SSP update: keeps every
        # residual reduced cost >= 0, including arcs touching nodes the
        # search did not reach this round)
        # (reduced cost here is c - p_a + p_b, so distances SUBTRACT)
        p -= np.minimum(dist, dist[m + j_best])

    f = p[:m].copy()
    g = -p[m : m + n].copy()
    # normalize so the dual objective matches exactly: SSP guarantees
    # f[i] + g[j] == cost on shipping arcs and <= elsewhere already
    total = int((plan * cost).sum())
    return total, plan, f, g


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
