"""Trainer + autodiff: gradient correctness (central differences), forward
parity with the gated NumPy transcriptions, reference loop semantics, and
the Spark data-parallel equivalence (SURVEY.md §2a row 31)."""

from __future__ import annotations

import numpy as np
import pytest

from geometric_aware_retrieval_v2_spark.functions import autodiff as ad
from geometric_aware_retrieval_v2_spark.functions.geoformulas import (
    forman_ricci_differentiable_np,
    info_nce_geo_np,
    ricci_loss_np,
)
from geometric_aware_retrieval_v2_spark.operators.rerank import (
    heat_kernel_distances_np,
    soft_knn_graph_np,
)
from geometric_aware_retrieval_v2_spark.plans.trainer import (
    Adam,
    LinearHashEncoder,
    Trainer,
    TrainerConfig,
    _batch_grad,
    epoch_batches,
    geometric_loss_ad,
    heat_kernel_distances_ad,
    soft_knn_graph_ad,
    train_geometric_spark,
    triplet_margin_loss_ad,
)

RNG = np.random.default_rng(7)
B, N, D = 4, 2, 8


def _unit(x):
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _rand_batch():
    """L2-normalised rows — the regime the encoder actually emits. (With
    raw gaussians the Forman hinge reads ~1e12 and central differences
    lose ~1e2 absolute precision to cancellation; the gradient itself is
    verified scale-free by the directional test below.)"""
    q = _unit(RNG.standard_normal((B, D)))
    p = _unit(q + 0.1 * RNG.standard_normal((B, D)))
    n = _unit(RNG.standard_normal((B * N, D)))
    return q, p, n


def _loss_of(q, p, n, gamma=0.2, lam=0.1):
    loss, _ = geometric_loss_ad(
        ad.Var(q),
        ad.Var(p),
        ad.Var(n),
        k_graph=5,
        gamma=gamma,
        lambda_ricci=lam,
        heat_steps=3,
    )
    return loss


# ------------------------------------------------------------- gradients


def test_geometric_loss_gradcheck_central_difference():
    """dL/dq through the FULL chain (soft-kNN softmax + tau-fix + topk +
    symmetrize + renorm + W=A*D2 + Laplacian + 3-step heat Taylor +
    InfoNCE + Forman hinge) vs central differences."""
    q, p, n = _rand_batch()
    qv = ad.Var(q)
    loss, _ = geometric_loss_ad(
        qv, ad.Var(p), ad.Var(n), k_graph=5, gamma=0.2, lambda_ricci=0.1,
        heat_steps=3,
    )
    ad.backward(loss)
    got = qv.grad
    h = 1e-6
    idx = [(i, j) for i in range(B) for j in range(0, D, 3)]
    for i, j in idx:
        qp, qm = q.copy(), q.copy()
        qp[i, j] += h
        qm[i, j] -= h
        num = (float(_loss_of(qp, p, n).v) - float(_loss_of(qm, p, n).v)) / (2 * h)
        assert abs(num - got[i, j]) <= 1e-6 + 1e-4 * abs(num), (i, j, num, got[i, j])
    # scale-free directional check: the quotient converges to the tape's
    # directional derivative as h shrinks
    rng = np.random.default_rng(3)
    d = rng.standard_normal(q.shape)
    d /= np.linalg.norm(d)
    ana = float((got * d).sum())
    num = (float(_loss_of(q + 1e-6 * d, p, n).v)
           - float(_loss_of(q - 1e-6 * d, p, n).v)) / 2e-6
    assert abs(num - ana) <= 1e-6 + 1e-6 * abs(ana), (num, ana)


def test_encoder_chain_gradcheck():
    """dL/dW through the l2-normalised linear head in mono mode (gradients
    reach W via all three embedding roles)."""
    cfg = TrainerConfig(
        batch_size=B, geodesic=True, lambda_ricci=0.1, k_graph=5, heat_steps=3
    )
    enc = LinearHashEncoder(dim=10, mode="mono", seed=3)
    phi_q = RNG.standard_normal((B, 10))
    phi_p = RNG.standard_normal((B, 10))
    phi_n = RNG.standard_normal((B, 10))
    grad, _ = _batch_grad(
        phi_q, phi_p, phi_n, enc.Wq, enc.Wd, "mono", cfg, gamma=0.2
    )

    def loss_at(w):
        wv = ad.Var(w)

        def enc_rows(phi):
            e0 = ad.matmul(ad.Var(phi), ad.transpose(wv))
            nrm2 = ad.vsum(ad.mul(e0, e0), axis=1, keepdims=True)
            return ad.div(e0, ad.sqrt(nrm2 + 1e-12))

        loss, _ = geometric_loss_ad(
            enc_rows(phi_q), enc_rows(phi_p), enc_rows(phi_n),
            k_graph=5, gamma=0.2, lambda_ricci=0.1, heat_steps=3,
        )
        return float(loss.v)

    h = 1e-6
    for i, j in [(0, 0), (3, 7), (9, 2), (5, 5), (2, 8)]:
        wp, wm = enc.Wq.copy(), enc.Wq.copy()
        wp[i, j] += h
        wm[i, j] -= h
        num = (loss_at(wp) - loss_at(wm)) / (2 * h)
        assert abs(num - grad[i, j]) <= 1e-6 + 1e-4 * abs(num)


def test_triplet_margin_gradcheck():
    q, p, n = _rand_batch()
    n = n[:B]
    qv = ad.Var(q)
    loss = triplet_margin_loss_ad(qv, ad.Var(p), ad.Var(n))
    ad.backward(loss)
    h = 1e-6
    for i, j in [(0, 0), (1, 3), (3, 7)]:
        qp, qm = q.copy(), q.copy()
        qp[i, j] += h
        qm[i, j] -= h
        num = (
            float(triplet_margin_loss_ad(ad.Var(qp), ad.Var(p), ad.Var(n)).v)
            - float(triplet_margin_loss_ad(ad.Var(qm), ad.Var(p), ad.Var(n)).v)
        ) / (2 * h)
        assert abs(num - qv.grad[i, j]) <= 1e-6 + 1e-4 * abs(num)


# -------------------------------------------------------- forward parity


def test_forward_parity_with_gated_transcriptions():
    """The tape's forward values equal the forward-only NumPy
    transcriptions that the driver gates already pin."""
    q, p, n = _rand_batch()
    all_e = np.concatenate([q, p, n], axis=0)
    k = min(5, all_e.shape[0] - 1)

    a_np, w_np = soft_knn_graph_np(all_e, k=k, gamma=0.2)
    a_ad, w_ad, _ = soft_knn_graph_ad(ad.Var(all_e), k=k, gamma=0.2)
    np.testing.assert_array_equal(a_ad.v, a_np)
    np.testing.assert_array_equal(w_ad.v, w_np)

    d_np = heat_kernel_distances_np(w_np, t=1.0, steps=3)
    d_ad = heat_kernel_distances_ad(ad.Var(w_np), t=1.0, steps=3)
    np.testing.assert_allclose(d_ad.v, d_np, atol=1e-9)

    loss, metrics = geometric_loss_ad(
        ad.Var(q), ad.Var(p), ad.Var(n),
        k_graph=5, gamma=0.2, lambda_ricci=0.1, heat_steps=3,
    )
    b = q.shape[0]
    rows = np.arange(b)
    d_pos = d_np[rows, b + rows]
    d_neg = d_np[rows.repeat(N).reshape(b, N), (2 * b + np.arange(b * N)).reshape(b, N)]
    want_info = info_nce_geo_np(d_pos, d_neg, temperature=0.07)
    kappa = forman_ricci_differentiable_np(w_np)
    want_ricci = ricci_loss_np(kappa, 0.0)
    assert abs(metrics["loss_info"] - want_info) < 1e-9
    assert abs(metrics["loss_ricci"] - want_ricci) < 1e-9
    assert abs(float(loss.v) - (want_info + 0.1 * want_ricci)) < 1e-9


# ------------------------------------------------------- loop semantics


def _toy_triplets(m=24):
    rng = np.random.default_rng(11)
    out = []
    for i in range(m):
        topic = ["apple fruit sweet", "car engine fast"][i % 2]
        other = ["car engine fast", "apple fruit sweet"][i % 2]
        out.append(
            (
                f"{topic} q{rng.integers(100)}",
                f"{topic} pos{rng.integers(100)}",
                f"{other} neg{rng.integers(100)}",
            )
        )
    return out


def test_trainer_geometric_loss_decreases():
    cfg = TrainerConfig(
        epochs=6, batch_size=8, lr=5e-3, geodesic=True,
        lambda_ricci=0.1, k_graph=5, heat_steps=3, seed=1,
    )
    enc = LinearHashEncoder(dim=32, mode="mono", seed=1)
    t = Trainer(enc, cfg)
    t.train(_toy_triplets())
    first = np.mean(t.history["loss"][:3])
    last = np.mean(t.history["loss"][-3:])
    assert last < first, (first, last)


def test_trainer_classic_mode_warns_and_decreases():
    cfg = TrainerConfig(epochs=8, batch_size=8, lr=5e-3, seed=2)
    assert cfg.is_classic_mode
    enc = LinearHashEncoder(dim=32, mode="mono", seed=2)
    t = Trainer(enc, cfg)
    with pytest.warns(UserWarning, match="classic mode"):
        t.train(_toy_triplets())
    assert np.mean(t.history["loss"][-3:]) < np.mean(t.history["loss"][:3])


def test_classic_dispatch_wins_over_geodesic_flag():
    """Reference dispatch order: is_classic_mode (both lambdas zero) is
    checked BEFORE the geometric loop ever consults config.geodesic
    (reference trainer.py:37-39) — so geodesic=True with zero lambdas
    still trains the triplet fallback, and the warning matches the loss
    that actually ran."""
    cfg = TrainerConfig(
        epochs=1, batch_size=8, lr=1e-3, geodesic=True, seed=3,
        k_graph=5, heat_steps=3,
    )
    assert cfg.is_classic_mode
    enc = LinearHashEncoder(dim=16, mode="mono", seed=3)
    t = Trainer(enc, cfg)
    with pytest.warns(UserWarning, match="classic mode"):
        t.train(_toy_triplets(8))
    # triplet path: loss == loss_nce and no ricci term ever recorded
    assert t.history["loss"] == t.history["loss_nce"]
    assert all(v == 0.0 for v in t.history["loss_ricci"])


def test_train_twice_resets_history():
    """A second train() call reports means over ITS batches only."""
    cfg = TrainerConfig(
        epochs=1, batch_size=8, lr=1e-3, geodesic=True,
        lambda_ricci=0.1, k_graph=5, heat_steps=3, seed=4,
    )
    t = Trainer(LinearHashEncoder(dim=16, mode="mono", seed=4), cfg)
    t.train(_toy_triplets(16))
    assert len(t.history["loss"]) == 2  # 16/8 batches
    t.train(_toy_triplets(8))
    assert len(t.history["loss"]) == 1  # fresh, not 3


def test_ragged_negatives_raise():
    """negs not a multiple of b must raise like the reference's .view,
    not silently drop rows from the logits while keeping them in the
    graph."""
    q, p, _ = _rand_batch()
    bad_negs = _unit(RNG.standard_normal((B * N + 1, D)))
    with pytest.raises(ValueError, match="multiple of the batch size"):
        geometric_loss_ad(ad.Var(q), ad.Var(p), ad.Var(bad_negs), k_graph=5)


def test_auto_gamma_sample_cap_matches_transcription():
    """gamma=None past the sample cap subsamples the leading block exactly
    like soft_knn_graph_np, so the tape's forward stays bit-equal to the
    gated semantics at any n."""
    e = _unit(np.random.default_rng(12).standard_normal((30, D)))
    a_np, w_np = soft_knn_graph_np(e, k=5, gamma=None, sample_cap=20)
    a_ad, w_ad, _ = soft_knn_graph_ad(ad.Var(e), k=5, gamma=None, sample_cap=20)
    np.testing.assert_array_equal(a_ad.v, a_np)
    np.testing.assert_array_equal(w_ad.v, w_np)


def test_encode_is_the_trained_function():
    """Inference-time encode() equals the training-time forward bitwise
    (same normalisation form), for both towers."""
    from geometric_aware_retrieval_v2_spark.plans.trainer import _encode_var

    enc = LinearHashEncoder(dim=16, mode="dual", seed=6)
    texts = ["apple fruit", "car engine", "apple pie"]
    phi = enc.features(texts)
    np.testing.assert_array_equal(
        enc.encode(texts, is_query=True), _encode_var(phi, ad.Var(enc.Wq)).v
    )
    np.testing.assert_array_equal(
        enc.encode(texts, is_query=False), _encode_var(phi, ad.Var(enc.Wd)).v
    )


def test_trainer_deterministic_and_history_keys():
    cfg = TrainerConfig(
        epochs=2, batch_size=8, lr=1e-3, geodesic=True,
        lambda_ricci=0.1, k_graph=5, heat_steps=3, seed=5,
    )
    outs = []
    for _ in range(2):
        enc = LinearHashEncoder(dim=16, mode="dual", seed=5)
        res = Trainer(enc, cfg).train(_toy_triplets(16))
        outs.append((res, enc.Wq.copy(), enc.Wd.copy()))
    assert set(outs[0][0]) == {"loss", "loss_nce", "loss_ricci", "loss_forman"}
    assert outs[0][0] == outs[1][0]
    np.testing.assert_array_equal(outs[0][1], outs[1][1])
    # dual mode: only the query tower trains (trainer.py:70)
    np.testing.assert_array_equal(
        outs[0][2], LinearHashEncoder(dim=16, mode="dual", seed=5).Wd
    )
    assert not np.array_equal(
        outs[0][1], LinearHashEncoder(dim=16, mode="dual", seed=5).Wq
    )


def test_trainer_config_validators():
    with pytest.raises(ValueError, match="k_graph"):
        TrainerConfig(k_graph=4)
    with pytest.raises(ValueError, match="non-negative"):
        TrainerConfig(lambda_ricci=-0.1)
    with pytest.raises(ValueError, match="positive"):
        TrainerConfig(lr=0.0)
    with pytest.raises(ValueError, match="ricci_backend"):
        TrainerConfig(ricci_backend="bogus")
    with pytest.warns(UserWarning, match="unusually high"):
        TrainerConfig(lr=0.5)
    with pytest.warns(UserWarning, match="computationally expensive"):
        TrainerConfig(k_graph=101)


def test_epoch_batches_cover_all_and_keep_partial():
    rng = np.random.default_rng(0)
    batches = epoch_batches(10, 4, rng)
    assert [len(b) for b in batches] == [4, 4, 2]
    assert sorted(np.concatenate(batches).tolist()) == list(range(10))


def test_adam_matches_reference_formula():
    opt = Adam((2,), lr=0.1)
    w = np.array([1.0, -1.0])
    g = np.array([0.5, -0.25])
    w1 = opt.step(w, g)
    # first step: m_hat = g, u_hat = g^2 -> w - lr * g/(|g|+eps) = w -/+ lr
    np.testing.assert_allclose(w1, [1.0 - 0.1 * (0.5 / (0.5 + 1e-8)),
                                    -1.0 + 0.1 * (0.25 / (0.25 + 1e-8))])


# --------------------------------------------------------- spark parity


def test_spark_data_parallel_equals_sequential(spark):
    trips = _toy_triplets(16)
    cfg = TrainerConfig(
        epochs=1, batch_size=4, lr=1e-3, geodesic=True,
        lambda_ricci=0.1, k_graph=5, heat_steps=3, seed=9,
    )
    enc_seq = LinearHashEncoder(dim=16, mode="dual", seed=9)
    res_seq = Trainer(enc_seq, cfg).train(trips)
    enc_par, res_par = train_geometric_spark(
        spark, trips, cfg, dim=16, mode="dual", grad_groups=1
    )
    np.testing.assert_array_equal(enc_par.Wq, enc_seq.Wq)
    for k in res_seq:
        assert abs(res_seq[k] - res_par[k]) < 1e-12, k

    # G=4: one synchronous large-batch step per epoch, same math, one update
    enc_g4, _ = train_geometric_spark(
        spark, trips, cfg, dim=16, mode="dual", grad_groups=4
    )
    assert not np.array_equal(enc_g4.Wq, LinearHashEncoder(16, "dual", 9).Wq)


def test_spark_grad_group_reduction_matches_local_mean(spark):
    """grad_groups=G is pinned to its exact contract, not just 'weights
    moved': the G per-batch gradients (computed executor-side) are averaged
    and fed to ONE Adam step per group. Recompute that loop driver-side
    from the same epoch_batches order and assert the final weights are
    bit-identical."""
    from geometric_aware_retrieval_v2_spark.functions.hashing import embed_text

    trips = _toy_triplets(16)
    cfg = TrainerConfig(
        epochs=2, batch_size=4, lr=1e-3, geodesic=True,
        lambda_ricci=0.1, k_graph=5, heat_steps=3, seed=9,
    )
    enc_g2, _ = train_geometric_spark(
        spark, trips, cfg, dim=16, mode="dual", grad_groups=2
    )

    enc = LinearHashEncoder(dim=16, mode="dual", seed=9)
    phi_q = np.stack([embed_text(q, 16) for q, _, _ in trips])
    phi_p = np.stack([embed_text(p, 16) for _, p, _ in trips])
    phi_n = np.stack([embed_text(n, 16) for _, _, n in trips])
    rng = np.random.default_rng(cfg.seed)
    opt = Adam(enc.Wq.shape, cfg.lr)
    for epoch in range(cfg.epochs):
        gamma = max(0.05, 0.2 * 0.95**epoch)
        batches = epoch_batches(len(trips), cfg.batch_size, rng)
        for g0 in range(0, len(batches), 2):
            grads = np.stack(
                [
                    _batch_grad(
                        phi_q[idx], phi_p[idx], phi_n[idx],
                        enc.Wq, enc.Wd, enc.mode, cfg, gamma,
                    )[0]
                    for idx in batches[g0 : g0 + 2]
                ]
            )
            enc.Wq = opt.step(enc.Wq, grads.mean(axis=0))
    np.testing.assert_array_equal(enc_g2.Wq, enc.Wq)
