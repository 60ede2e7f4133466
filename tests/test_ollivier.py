"""Exact Ollivier-Ricci curvature: solver certificates + graph anchors.

The reference's ricci_ollivier delegates to the optional
GraphRicciCurvature package and falls back to Forman when absent
(/root/reference/geoIR/geo/curvature.py:117-142). This engine implements
the canonical definition exactly (operators/curvature.py), so the tests
must not trust the solver: every randomized instance is checked against
BOTH an independent brute-force enumeration and an LP-duality
certificate, and the Spark operator is checked against hand-derived
closed-form values and a from-scratch pure-Python recomputation.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import pytest

from geometric_aware_retrieval_v2_spark.functions.ot import (
    verify_certificate,
    w1_bruteforce_int,
    w1_exact_int,
)


def _rand_instance(rng: np.random.Generator):
    m = int(rng.integers(1, 5))
    n = int(rng.integers(1, 5))
    mu = rng.integers(0, 6, size=m).astype(np.int64)
    nu = rng.integers(0, 6, size=n).astype(np.int64)
    # equalize totals by topping up the last entry
    tm, tn = mu.sum(), nu.sum()
    if tm < tn:
        mu[-1] += tn - tm
    else:
        nu[-1] += tm - tn
    cost = rng.integers(0, 6, size=(m, n)).astype(np.int64)
    return mu, nu, cost


def test_w1_matches_bruteforce_and_certifies():
    rng = np.random.default_rng(20260819)
    for trial in range(200):
        mu, nu, cost = _rand_instance(rng)
        total, plan, f, g = w1_exact_int(mu, nu, cost)
        assert total == w1_bruteforce_int(mu, nu, cost), (mu, nu, cost)
        assert verify_certificate(mu, nu, cost, total, plan, f, g)


def test_w1_degenerate_cases():
    # identical measures: zero cost
    mu = np.array([3, 2], dtype=np.int64)
    cost = np.array([[0, 1], [1, 0]], dtype=np.int64)
    total, plan, f, g = w1_exact_int(mu, mu, cost)
    assert total == 0
    assert verify_certificate(mu, mu, cost, total, plan, f, g)
    # single atom to single atom
    total, plan, f, g = w1_exact_int(
        np.array([5]), np.array([5]), np.array([[7]])
    )
    assert total == 35
    # unequal mass rejected
    with pytest.raises(ValueError):
        w1_exact_int(np.array([1]), np.array([2]), np.array([[1]]))


def test_certificate_rejects_suboptimal():
    mu = np.array([2, 0], dtype=np.int64)
    nu = np.array([0, 2], dtype=np.int64)
    cost = np.array([[5, 1], [0, 9]], dtype=np.int64)
    total, plan, f, g = w1_exact_int(mu, nu, cost)
    assert total == 2
    # a feasible but suboptimal plan must NOT certify with any potentials
    bad_plan = np.array([[0, 2], [0, 0]], dtype=np.int64)
    assert not verify_certificate(mu, nu, cost, 2, bad_plan * 0, f, g)
    assert not verify_certificate(mu, nu, cost, 18, bad_plan * 9, f, g)


# ---------------------------------------------------------------------------
# Spark operator anchors — kappa values derived by hand in comments
# ---------------------------------------------------------------------------


def _kappa_map(spark, edge_list, alpha=0.5):
    from geometric_aware_retrieval_v2_spark.operators.curvature import (
        ollivier_curvature,
    )

    edges = spark.createDataFrame(
        [(int(a), int(b), 1.0) for a, b in edge_list],
        "src long, dst long, weight double",
    )
    rows = ollivier_curvature(edges, alpha=alpha).collect()
    assert len(rows) == len(edge_list)
    return {(r.src, r.dst): r.kappa for r in rows}


def test_ollivier_closed_form_anchors(spark):
    # single edge u-v: m_u == m_v (both {u: .5, v: .5}) -> W1 = 0, kappa 1
    assert _kappa_map(spark, [(0, 1)]) == {(0, 1): 1.0}

    # path 0-1-2, edge (0,1): m_0 = {0:.5, 1:.5},
    # m_1 = {1:.5, 0:.25, 2:.25}; ship 0.25 from 0 to 2 at d=2 -> W1 = .5
    km = _kappa_map(spark, [(0, 1), (1, 2)])
    assert km[(0, 1)] == pytest.approx(0.5)
    assert km[(1, 2)] == pytest.approx(0.5)

    # triangle: m_u = {u:.5, v:.25, w:.25}, m_v symmetric; ship 0.25
    # u->v at d=1 -> W1 = .25, kappa .75 on every edge
    km = _kappa_map(spark, [(0, 1), (0, 2), (1, 2)])
    assert set(km.values()) == {0.75}

    # 6-cycle: W1 = 1 exactly (dual witness f = 3,2,1,0 along the path
    # a-u-v-b is 1-Lipschitz and attains 1) -> kappa 0
    c6 = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (0, 5)]
    km = _kappa_map(spark, c6)
    assert set(km.values()) == {0.0}

    # star center c=0, leaves 1,2,3; edge (0,1):
    # m_0 = {0:.5, 1:1/6, 2:1/6, 3:1/6}, m_1 = {1:.5, 0:.5}
    # optimal: keep 1/6 at leaf, 1/3 c->leaf (d1), leaves 2,3 -> c (d1)
    # W1 = 1/3 + 1/6 + 1/6 = 2/3 -> kappa = 1/3
    km = _kappa_map(spark, [(0, 1), (0, 2), (0, 3)])
    assert all(v == pytest.approx(1 / 3, abs=1e-6) for v in km.values())


def test_ollivier_alpha_zero_complete_graph(spark):
    # K4 at alpha=0: m_u uniform on N(u); on K_n the measures overlap on
    # the n-2 common neighbors (1/3 each kept in place) and the remaining
    # 1/3 ships u<->v at d=1 -> W1 = 1/3, kappa = 2/3
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    km = _kappa_map(spark, k4, alpha=0.0)
    assert all(v == pytest.approx(2 / 3, abs=1e-6) for v in km.values())


def _python_ollivier(edge_list, alpha):
    """From-scratch recomputation: adjacency dicts + brute-force W1 over
    TRUE hop distances (BFS on the whole graph, no locality shortcut) —
    independently validates both the cost-matrix locality argument and
    the Spark plumbing."""
    from collections import deque

    adj: dict[int, set[int]] = {}
    for a, b in edge_list:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    def bfs(s):
        dist = {s: 0}
        q = deque([s])
        while q:
            x = q.popleft()
            for y in adj[x]:
                if y not in dist:
                    dist[y] = dist[x] + 1
                    q.append(y)
        return dist

    dists = {n: bfs(n) for n in adj}
    out = {}
    for a, b in edge_list:
        sa = [a, *sorted(adj[a])]
        sb = [b, *sorted(adj[b])]
        da, db = len(adj[a]), len(adj[b])
        al = Fraction(alpha)
        mass_a = [al] + [(1 - al) / da] * da
        mass_b = [al] + [(1 - al) / db] * db
        from math import lcm

        scale = lcm(*(fr.denominator for fr in mass_a + mass_b))
        mu = np.array([int(fr * scale) for fr in mass_a], dtype=np.int64)
        nu = np.array([int(fr * scale) for fr in mass_b], dtype=np.int64)
        cost = np.array(
            [[dists[x][y] for y in sb] for x in sa], dtype=np.int64
        )
        total = w1_bruteforce_int(mu, nu, cost)
        out[(a, b)] = round(1.0 - total / scale / dists[a][b], 6)
    return out


def test_ollivier_spark_matches_independent_python(spark):
    # random sparse graph, small enough for the brute-force twin
    rng = np.random.default_rng(7)
    edges = set()
    for n in range(1, 16):
        # chain guarantees connectivity; extra random chords add cycles
        edges.add((n - 1, n))
    for _ in range(10):
        a, b = sorted(rng.integers(0, 16, size=2).tolist())
        if a != b:
            edges.add((a, b))
    edge_list = sorted(edges)
    got = _kappa_map(spark, edge_list)
    want = _python_ollivier(edge_list, 0.5)
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9), k


def test_ollivier_partition_invariance_on_knn_graph(spark):
    from geometric_aware_retrieval_v2_spark.operators.curvature import (
        ollivier_curvature,
    )
    from geometric_aware_retrieval_v2_spark.operators.knn import knn_edges

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    edges = knn_edges(emb, k=4, metric="cosine", n_blocks=4)
    base = {
        (r.src, r.dst): r.kappa for r in ollivier_curvature(edges).collect()
    }
    again = {
        (r.src, r.dst): r.kappa
        for r in ollivier_curvature(edges.repartition(13)).collect()
    }
    assert base == again
    assert len(base) == edges.count()
    # theoretical bounds for hop metric: W1 <= 3 -> kappa in [-2, 1]
    assert all(-2.0 <= v <= 1.0 for v in base.values())


def test_alpha_small_rational_contract(spark):
    """alpha=0.1 snaps to exactly 1/10 (raw Fraction(float) denominators
    of ~2^55 would overflow the int64 transport scale silently); a float
    that is not a small rational is rejected."""
    from geometric_aware_retrieval_v2_spark.operators.curvature import (
        ollivier_curvature,
    )
    from geometric_aware_retrieval_v2_spark.operators.knn import knn_edges

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    edges = knn_edges(emb.limit(30), k=4, metric="cosine", n_blocks=2)
    rows = ollivier_curvature(edges, alpha=0.1).collect()
    assert rows and all(-2.0 <= r.kappa <= 1.0 for r in rows)
    with pytest.raises(ValueError, match="small rational"):
        ollivier_curvature(edges, alpha=0.12345678901234567).collect()
