"""Geometric fine-tuning trainer — SURVEY.md §2a row 31, made real.

Re-derives the reference's training stack
(/root/reference/geoIR/training/trainer.py:24-150,
/root/reference/geoIR/geo/differentiable.py:19-403,
/root/reference/geoIR/losses.py:43-120) without torch: the forward math is
the same literal pipeline the engine already gates (soft-kNN graph, heat
kernel, InfoNCE-geo, Forman regulariser), and gradients come from the tape
in functions/autodiff.py, pinned by central-difference tests.

Reference-faithfulness notes (behavior observed, not copied):

  * The reference's geometric branch cannot execute as written: it passes
    ``gamma=gamma`` to ``geometric_loss_end_to_end`` (trainer.py:112-120),
    whose signature has no ``gamma`` parameter (differentiable.py:281-292)
    — a TypeError — and then calls ``.item()`` on the plain float it
    stores in ``metrics['loss_info']`` (trainer.py:141). This module
    implements the evident intent: the epoch-scheduled temperature
    ``gamma = max(0.05, 0.2 * 0.95**epoch)`` (trainer.py:89) feeds the
    soft-kNN softmax, and history records plain floats.
  * ``geometric_loss_end_to_end`` builds the graph with the DEFAULT return
    of ``soft_knn_graph`` — which is the distance-weighted matrix
    ``W = A * D2`` (differentiable.py:104,140), not the adjacency ``A``.
    Both the heat kernel and the Forman regulariser therefore run on
    ``W``; this module does the same.
  * The Forman term uses the formula the reference DOCUMENTS
    (differentiable.py:238: sum_k w_ik*w_jk / sqrt(w_ij*w_ik*w_jk + eps)),
    matching functions/geoformulas.py and its parity tests. The torch code
    itself indexes ``A_ik = A.unsqueeze(2)`` (differentiable.py:261),
    which broadcasts w_ij where w_ik is documented — a slip this engine
    does not reproduce.
  * Classic mode (``is_classic_mode``: both lambdas zero,
    config.py:70-73) in the reference requires sentence-transformers and
    otherwise warns and returns ``{}`` (trainer.py:41-48). That package
    is unavailable here, so classic mode trains the same linear-head
    encoder with the triplet-margin loss the reference uses as its own
    in-loop fallback (trainer.py:129-135: ``F.triplet_margin_loss``,
    margin 1.0, p=2, pairwise-distance eps 1e-6 added inside the norm) —
    a UserWarning documents the substitution.
  * Only query-encoder parameters are optimised
    (``Adam(encoder.q_model.parameters())``, trainer.py:70): in dual mode
    the doc-side embeddings are constants; in mono mode the two towers
    share weights, so gradients flow through all three embedding roles.

Scale: one optimisation step is inherently sequential state (Adam moments
+ weights), but the per-step gradient is data-parallel. The Spark path
computes per-batch gradients executor-side (one Arrow group per batch,
``applyInPandas``) and reduces them on the driver, which holds the tiny
parameter matrix (d*d doubles). ``grad_groups=1`` is bit-identical to the
local sequential loop (pytest-asserted); larger groups are synchronous
data-parallel SGD — the standard large-batch equivalence.
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass
from typing import Sequence

import numpy as np

from ..config import VALID_CURVATURE_BACKENDS, validate_geo_params
from ..functions import autodiff as ad
from ..functions.hashing import embed_text

# ---------------------------------------------------------------- config


@dataclass
class TrainerConfig:
    """Reference TrainerConfig (geoIR/core/config.py:20-78) as a dataclass.

    Adds the fields the reference reads via getattr with defaults
    (heat_time/heat_steps, trainer.py:118-119) plus the engine's seed."""

    epochs: int = 1
    batch_size: int = 16
    lr: float = 2e-5
    verbose: bool = False
    k_graph: int = 10
    geodesic: bool = False
    lambda_ricci: float = 0.0
    lambda_forman: float = 0.0
    kappa_target: float = 0.0
    ricci_backend: str = "ricci_ollivier"
    heat_time: float = 1.0
    heat_steps: int = 5
    temperature: float = 0.07
    seed: int = 0

    def __post_init__(self) -> None:
        validate_geo_params(self.k_graph, self.lambda_ricci, self.lambda_forman)
        if self.ricci_backend not in VALID_CURVATURE_BACKENDS:
            raise ValueError(
                f"ricci_backend must be one of {VALID_CURVATURE_BACKENDS}, "
                f"got '{self.ricci_backend}'"
            )
        if self.lr <= 0:
            raise ValueError("Learning rate must be positive")
        if self.lr > 0.1:
            warnings.warn(
                f"Learning rate {self.lr} is unusually high, "
                "consider values < 0.01"
            )

    @property
    def is_classic_mode(self) -> bool:
        """True if no geometric regularization is applied (config.py:70-73)."""
        return self.lambda_ricci == 0 and self.lambda_forman == 0

    @property
    def is_geometric_mode(self) -> bool:
        return not self.is_classic_mode


# --------------------------------------------------------------- encoder


class LinearHashEncoder:
    """Trainable stand-in for the reference's HF dual encoder
    (geoIR/retrieval/encoder.py): a linear head over the engine's
    deterministic hashing features, ``e = l2norm(W @ phi(text))``.

    ``mode='dual'`` keeps separate query/doc matrices (only the query
    tower is optimised, matching trainer.py:70); ``mode='mono'`` shares
    one matrix. Init is identity plus small seeded noise so training has
    a non-degenerate starting point but stays reproducible."""

    def __init__(self, dim: int = 64, mode: str = "dual", seed: int = 0):
        if mode not in ("dual", "mono"):
            raise ValueError("mode must be 'dual' or 'mono'")
        self.dim = dim
        self.mode = mode
        rng = np.random.default_rng(seed)
        self.Wq = np.eye(dim) + 0.01 * rng.standard_normal((dim, dim))
        self.Wd = (
            self.Wq.copy()
            if mode == "mono"
            else np.eye(dim) + 0.01 * rng.standard_normal((dim, dim))
        )

    def features(self, texts: Sequence[str]) -> np.ndarray:
        return np.stack([embed_text(t, self.dim) for t in texts])

    def encode(self, texts: Sequence[str], is_query: bool) -> np.ndarray:
        w = self.Wq if (is_query or self.mode == "mono") else self.Wd
        return _encode_np(self.features(texts), w)


def _encode_np(phi: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Value twin of _encode_var: inference-time encode() and the dual-mode
    constant doc towers use EXACTLY the function the gradient was trained
    through (same sqrt(||e||^2 + 1e-12) normalisation, same association)."""
    e0 = phi @ w.T
    return e0 / np.sqrt(np.sum(e0 * e0, axis=1, keepdims=True) + 1e-12)


def _encode_var(phi: np.ndarray, w: ad.Var) -> ad.Var:
    """phi (m,d) constant -> l2-normalised rows of phi @ W^T, on the tape."""
    e0 = ad.matmul(ad.Var(phi), ad.transpose(w))
    nrm2 = ad.vsum(ad.mul(e0, e0), axis=1, keepdims=True)
    return ad.div(e0, ad.sqrt(nrm2 + 1e-12))


# ------------------------------------------------- loss graph (autodiff)


def soft_knn_graph_ad(
    e: ad.Var, k: int, gamma: float | None = None, sample_cap: int = 2000
) -> tuple[ad.Var, ad.Var, float]:
    """differentiable.py:19-140 on the tape -> (A, W=A*D2, gamma_used).

    gamma auto-calibration replicates soft_knn_graph_np EXACTLY — P20 of
    positive squared distances / ln k, subsampled to the leading
    sample_cap x sample_cap block past n=2000 like the transcription
    (rerank.py soft_knn_graph_np) — and is a constant w.r.t. gradients,
    exactly like the reference's ``with torch.no_grad()`` block
    (differentiable.py:64-76)."""
    n = e.v.shape[0]
    sq = ad.vsum(ad.mul(e, e), axis=1, keepdims=True)
    d2 = ad.relu(sq + ad.transpose(sq) - 2.0 * ad.matmul(e, ad.transpose(e)))
    if gamma is None:
        if n <= sample_cap:
            vals = d2.v[np.triu_indices(n, 1)]
        else:
            sub = d2.v[:sample_cap, :sample_cap]
            vals = sub[np.triu_indices(sample_cap, 1)]
        pos = vals[vals > 0]
        p20 = np.percentile(pos, 20) if pos.size else 1.0
        gamma = max(float(p20 / np.log(max(k, 2))), 1e-12)
    # -D2/gamma as a true division so values stay bit-identical to the
    # gated forward transcription (multiplying by 1/gamma rounds differently)
    p = ad.row_softmax_masked_diag(ad.div(-d2, ad.Var(gamma)))
    a1 = p * (k / ad.vsum(p, axis=1, keepdims=True))
    a2 = ad.topk_keep(a1, k) if k < n - 1 else a1
    a3 = 0.5 * (a2 + ad.transpose(a2))
    a = a3 * (k / (ad.vsum(a3, axis=1, keepdims=True) + 1e-8))
    return a, ad.mul(a, d2), gamma


def heat_kernel_distances_ad(
    a: ad.Var, t: float = 1.0, steps: int = 10, normalize: bool = True
) -> ad.Var:
    """differentiable.py:143-211 on the tape. Distances via the quadratic
    form ||K_i||^2 + ||K_j||^2 - 2 K K^T (value-equal to the reference's
    ||K_i - K_j||^2 and with the identical gradient)."""
    n = a.v.shape[0]
    a_sym = 0.5 * (a + ad.transpose(a))
    deg = ad.vsum(a_sym, axis=1)
    lap = ad.diag_embed(deg) - a_sym
    if normalize:
        dinv = ad.diag_embed(1.0 / ad.sqrt(deg + 1e-8))
        lap = ad.matmul(ad.matmul(dinv, lap), dinv)
    eye = ad.Var(np.eye(n))
    k_t, term = eye, eye
    lap_t = lap * (-t)  # same float association as the np transcription:
    for s in range(1, steps + 1):  # term = term @ (-t*L) / s
        term = ad.div(ad.matmul(term, lap_t), ad.Var(float(s)))
        k_t = k_t + term
    kk = ad.vsum(ad.mul(k_t, k_t), axis=1, keepdims=True)
    return kk + ad.transpose(kk) - 2.0 * ad.matmul(k_t, ad.transpose(k_t))


def forman_ricci_ad(a: ad.Var, eps: float = 1e-9) -> ad.Var:
    """functions/geoformulas.forman_ricci_differentiable_np on the tape
    (the documented formula; see module docstring on the reference's
    indexing slip)."""
    a_sym = 0.5 * (a + ad.transpose(a))
    deg = ad.vsum(a_sym, axis=1, keepdims=True)
    term1 = ad.mul(a_sym, 1.0 / (deg + eps) + 1.0 / (ad.transpose(deg) + eps))
    w_ik = ad.expand_dims(a_sym, 1)  # (n,1,n): [i,j,k] -> A[i,k]
    w_jk = ad.expand_dims(a_sym, 0)  # (1,n,n): [i,j,k] -> A[j,k]
    w_ij = ad.expand_dims(a_sym, 2)  # (n,n,1): [i,j,k] -> A[i,j]
    num = ad.mul(w_ik, w_jk)
    tri = ad.vsum(ad.div(num, ad.sqrt(ad.mul(w_ij, num) + eps)), axis=2)
    return term1 - tri


def geometric_loss_ad(
    q: ad.Var,
    p: ad.Var,
    negs: ad.Var,
    *,
    k_graph: int = 10,
    gamma: float | None = None,
    temperature: float = 0.07,
    lambda_ricci: float = 0.1,
    kappa_target: float = 0.0,
    heat_time: float = 1.0,
    heat_steps: int = 5,
) -> tuple[ad.Var, dict]:
    """differentiable.py:281-403 on the tape -> (scalar loss, metrics).

    q/p: (B,D); negs: (B*N, D) laid out query-major like the reference's
    ``neg_embeddings.view(B*N, D)`` (differentiable.py:346,362-368)."""
    b = q.v.shape[0]
    if negs.v.shape[0] % b != 0:
        # the reference's .view(B*N, D) raises on a ragged negative set;
        # silently flooring would train a different objective (leftover
        # rows would join the graph but never the logits)
        raise ValueError(
            f"negs rows ({negs.v.shape[0]}) must be a multiple of the "
            f"batch size ({b})"
        )
    n_neg = negs.v.shape[0] // b
    all_e = concat_rows([q, p, negs])
    total = all_e.v.shape[0]
    _, w_graph, gamma_used = soft_knn_graph_ad(
        all_e, k=min(k_graph, total - 1), gamma=gamma
    )
    d_geo = heat_kernel_distances_ad(w_graph, t=heat_time, steps=heat_steps)
    rows = np.arange(b)
    d_pos = ad.gather(d_geo, rows, b + rows)  # (B,)
    neg_rows = np.repeat(rows, n_neg).reshape(b, n_neg)
    neg_cols = (2 * b + np.arange(b * n_neg)).reshape(b, n_neg)
    d_neg = ad.gather(d_geo, neg_rows, neg_cols)  # (B,N)
    logits = ad.concat(
        [
            ad.expand_dims(d_pos * (-1.0 / temperature), 1),
            d_neg * (-1.0 / temperature),
        ],
        axis=1,
    )
    lse = ad.logsumexp_rows(logits)
    first = ad.gather(logits, np.arange(b), np.zeros(b, dtype=int))
    loss_info = ad.vmean(lse - first)

    if lambda_ricci > 0:
        kappa = forman_ricci_ad(w_graph)
        loss_ricci = ad.vmean(ad.square(ad.relu(kappa_target - kappa)))
        mean_curvature = float(kappa.v.mean())
        loss_total = loss_info + lambda_ricci * loss_ricci
        ricci_val = float(loss_ricci.v)
    else:
        loss_total = loss_info
        ricci_val, mean_curvature = 0.0, 0.0

    metrics = {
        "loss_info": float(loss_info.v),
        "loss_ricci": ricci_val,
        "loss_total": float(loss_total.v),
        "mean_curvature": mean_curvature,
        "mean_d_pos": float(d_pos.v.mean()),
        "mean_d_neg": float(d_neg.v.mean()),
        "graph_density": float((w_graph.v > 0).mean()),
        "gamma_used": gamma_used,
    }
    return loss_total, metrics


def triplet_margin_loss_ad(
    q: ad.Var, p: ad.Var, n: ad.Var, margin: float = 1.0
) -> ad.Var:
    """torch.nn.functional.triplet_margin_loss defaults (trainer.py:131):
    margin 1.0, p=2, and the 1e-6 pairwise-distance eps torch adds INSIDE
    the difference vector before taking the norm."""

    def dist(x: ad.Var, y: ad.Var) -> ad.Var:
        d = x - y + 1e-6
        return ad.sqrt(ad.vsum(ad.mul(d, d), axis=1))

    return ad.vmean(ad.relu(dist(q, p) - dist(q, n) + margin))


def concat_rows(parts: list[ad.Var]) -> ad.Var:
    """Row-wise (axis=0) concat via the axis-parameterised concat op."""
    return ad.concat(parts, axis=0)


# ------------------------------------------------------------------ Adam


class Adam:
    """torch.optim.Adam defaults: betas (0.9, 0.999), eps 1e-8 (added
    outside the square root), bias-corrected first/second moments."""

    def __init__(self, shape: tuple[int, ...], lr: float):
        self.lr = lr
        self.m = np.zeros(shape)
        self.u = np.zeros(shape)
        self.t = 0

    def step(self, w: np.ndarray, grad: np.ndarray) -> np.ndarray:
        self.t += 1
        self.m = 0.9 * self.m + 0.1 * grad
        self.u = 0.999 * self.u + 0.001 * grad * grad
        m_hat = self.m / (1.0 - 0.9**self.t)
        u_hat = self.u / (1.0 - 0.999**self.t)
        return w - self.lr * m_hat / (np.sqrt(u_hat) + 1e-8)


# ------------------------------------------------------------- batching


def epoch_batches(
    n: int, batch_size: int, rng: np.random.Generator
) -> list[np.ndarray]:
    """DataLoader(shuffle=True, drop_last=False) semantics: one permutation
    per epoch, consecutive chunks, final partial chunk kept."""
    perm = rng.permutation(n)
    return [perm[i : i + batch_size] for i in range(0, n, batch_size)]


def _batch_grad(
    phi_q: np.ndarray,
    phi_p: np.ndarray,
    phi_n: np.ndarray,
    wq: np.ndarray,
    wd: np.ndarray,
    mode: str,
    cfg: TrainerConfig,
    gamma: float,
) -> tuple[np.ndarray, dict]:
    """Gradient of the per-batch loss w.r.t. the query matrix, plus the
    history metrics. Pure function of (features, weights, config) so it
    runs identically on the driver and inside executors."""
    w_var = ad.Var(wq)
    q = _encode_var(phi_q, w_var)
    if mode == "mono":
        p = _encode_var(phi_p, w_var)
        n = _encode_var(phi_n, w_var)
    else:  # doc tower is a constant in dual mode (only q_model optimised)
        p, n = ad.Var(_encode_np(phi_p, wd)), ad.Var(_encode_np(phi_n, wd))
    # the reference's per-batch loss choice inside the GEOMETRIC loop keys
    # on config.geodesic (trainer.py:108-135), but classic mode (both
    # lambdas zero) never reaches that loop at all (dispatch at
    # trainer.py:37-39) — so the geometric loss runs only when both hold
    if cfg.is_geometric_mode and cfg.geodesic:
        loss, metrics = geometric_loss_ad(
            q,
            p,
            n,
            k_graph=cfg.k_graph,
            gamma=gamma,
            temperature=cfg.temperature,
            lambda_ricci=cfg.lambda_ricci,
            kappa_target=cfg.kappa_target,
            heat_time=cfg.heat_time,
            heat_steps=cfg.heat_steps,
        )
        hist = {
            "loss": metrics["loss_total"],
            "loss_nce": metrics["loss_info"],
            "loss_ricci": metrics["loss_ricci"],
            "loss_forman": 0.0,  # trainer.py:124 — not wired in the reference
        }
    else:
        loss = triplet_margin_loss_ad(q, p, n)
        val = float(loss.v)
        hist = {"loss": val, "loss_nce": val, "loss_ricci": 0.0, "loss_forman": 0.0}
    ad.backward(loss)
    return w_var.grad.copy(), hist


# ---------------------------------------------------------------- Trainer


class Trainer:
    """Unified trainer (trainer.py:24-150 semantics, linear-head encoder).

    ``train(triplets)`` takes (query, positive, negative) text triples and
    returns the reference's history means:
    ``{loss, loss_nce, loss_ricci, loss_forman}``."""

    def __init__(self, encoder: LinearHashEncoder, config: TrainerConfig):
        self.encoder = encoder
        self.config = config
        self.history: dict[str, list[float]] = {
            "loss": [],
            "loss_nce": [],
            "loss_ricci": [],
            "loss_forman": [],
        }

    def train(self, triplets: Sequence[tuple[str, str, str]]) -> dict[str, float]:
        cfg = self.config
        # fresh history per call: the returned summary means must describe
        # THIS run, not every run this Trainer ever did
        self.history = {k: [] for k in self.history}
        if cfg.is_classic_mode:
            warnings.warn(
                "classic mode: sentence-transformers is unavailable; "
                "fine-tuning the linear-head encoder with the reference's "
                "in-loop triplet-margin fallback instead (trainer.py:129-135)."
            )
        queries, pos_docs, neg_docs = zip(*triplets)
        phi_q = self.encoder.features(queries)
        phi_p = self.encoder.features(pos_docs)
        phi_n = self.encoder.features(neg_docs)
        rng = np.random.default_rng(cfg.seed)
        opt = Adam(self.encoder.Wq.shape, cfg.lr)
        for epoch in range(cfg.epochs):
            gamma = max(0.05, 0.2 * 0.95**epoch)  # trainer.py:89
            if cfg.verbose:
                print(f"--- Epoch {epoch + 1}/{cfg.epochs} ---")
                print(f"  - Soft-kNN temperature: {gamma:.4f}")
            batches = epoch_batches(len(triplets), cfg.batch_size, rng)
            for idx in batches:
                grad, hist = _batch_grad(
                    phi_q[idx],
                    phi_p[idx],
                    phi_n[idx],
                    self.encoder.Wq,
                    self.encoder.Wd,
                    self.encoder.mode,
                    cfg,
                    gamma,
                )
                self.encoder.Wq = opt.step(self.encoder.Wq, grad)
                if self.encoder.mode == "mono":
                    self.encoder.Wd = self.encoder.Wq
                for k, v in hist.items():
                    self.history[k].append(v)
            if cfg.verbose:
                ep = np.mean(self.history["loss"][-len(batches):])
                print(f"  - Epoch Loss: {ep:.4f}")
        return {k: float(np.mean(v)) if v else 0.0 for k, v in self.history.items()}


# ------------------------------------------------------------ driver gate


def geometric_loss_metrics(
    spark,
    emb,
    b: int = 8,
    n_neg: int = 1,
    *,
    k_graph: int = 10,
    gamma: float = 0.2,
    temperature: float = 0.07,
    lambda_ricci: float = 0.1,
    kappa_target: float = 0.0,
    heat_time: float = 1.0,
    heat_steps: int = 5,
):
    """One forward pass of the geometric training loss over a deterministic
    batch drawn from an embeddings table: vec_id b / B+b / 2B+b play the
    query / positive / negative roles (the reference's node layout,
    differentiable.py:342-347). Rows are L2-normalised first — the regime
    the encoder emits. Returns a single-row DataFrame of the loss metrics,
    hash-gated against a DuckDB oracle that re-derives the whole pipeline
    relationally (oracles.geo_loss_sql): soft-kNN softmax + tau-fix + top-k
    + W=A*D2, a 5-step heat-kernel Taylor expansion, the InfoNCE
    cross-entropy, and the dense Forman hinge. gamma is the epoch-0 value
    of the trainer's schedule (trainer.py:89).

    Gate encoding: the bounded metrics (loss_info, mean_d_pos, mean_d_neg,
    graph_density — all O(1)) are rounded to 9 dp. The Forman-hinge
    metrics are unbounded (the dense hinge's eps-floored denominators put
    loss_ricci at ~1e11 on real data), where 9-dp ABSOLUTE rounding sits
    far below the ulp of a differently-ordered double sum — so those are
    gated as round(log10(|x|), 9), which pins ~9 SIGNIFICANT digits and
    absorbs the ~1e-13 relative summation-order noise between NumPy and
    SQL. mean_curvature is strictly negative in this regime (the eps-floor
    triangle terms dominate), hence log10(-x)."""
    import pandas as pd
    from pyspark.sql import functions as F

    total = b * (2 + n_neg)
    nodes = emb.filter(F.col("vec_id") < total).select("vec_id", "v")

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id")
        e = np.stack(pdf["v"].to_numpy()).astype(np.float64)
        e = e / np.linalg.norm(e, axis=1, keepdims=True)
        loss, m = geometric_loss_ad(
            ad.Var(e[:b]),
            ad.Var(e[b : 2 * b]),
            ad.Var(e[2 * b :]),
            k_graph=k_graph,
            gamma=gamma,
            temperature=temperature,
            lambda_ricci=lambda_ricci,
            kappa_target=kappa_target,
            heat_time=heat_time,
            heat_steps=heat_steps,
        )
        return pd.DataFrame(
            [
                {
                    "loss_info": m["loss_info"],
                    "loss_ricci": m["loss_ricci"],
                    "loss_total": m["loss_total"],
                    "mean_d_pos": m["mean_d_pos"],
                    "mean_d_neg": m["mean_d_neg"],
                    "mean_curvature": m["mean_curvature"],
                    "graph_density": m["graph_density"],
                }
            ]
        )

    raw = nodes.groupBy(F.lit(0).alias("g")).applyInPandas(
        kernel,
        schema="loss_info double, loss_ricci double, loss_total double, "
        "mean_d_pos double, mean_d_neg double, mean_curvature double, "
        "graph_density double",
    )
    return raw.select(
        F.round(F.col("loss_info"), 9).alias("loss_info"),
        F.round(F.log10(F.col("loss_ricci")), 9).alias("loss_ricci_log10"),
        F.round(F.log10(F.col("loss_total")), 9).alias("loss_total_log10"),
        F.round(F.col("mean_d_pos"), 9).alias("mean_d_pos"),
        F.round(F.col("mean_d_neg"), 9).alias("mean_d_neg"),
        F.round(F.log10(-F.col("mean_curvature")), 9).alias(
            "neg_mean_curvature_log10"
        ),
        F.round(F.col("graph_density"), 9).alias("graph_density"),
    )


# ------------------------------------------------- Spark data-parallel path


def train_geometric_spark(
    spark,
    triplets: Sequence[tuple[str, str, str]],
    config: TrainerConfig,
    *,
    dim: int = 64,
    mode: str = "dual",
    grad_groups: int = 1,
) -> tuple[LinearHashEncoder, dict[str, float]]:
    """Synchronous data-parallel trainer: per-batch gradients computed
    executor-side (one Arrow group per batch via applyInPandas), averaged
    and Adam-stepped on the driver.

    ``grad_groups=1`` reproduces the sequential Trainer bit-for-bit (one
    batch per step, identical batch order — pytest-asserted). Larger
    values average G consecutive batches' gradients into one update:
    classic synchronous SGD, the shape that scales to a 1000-executor
    cluster (each step ships one d*d gradient per batch back to the
    driver; features stay distributed)."""
    import pandas as pd
    from pyspark.sql import functions as F

    cfg = config
    if cfg.is_classic_mode:
        # same substitution (and warning) as Trainer.train: classic mode
        # trains the triplet-margin fallback, here data-parallel
        warnings.warn(
            "classic mode: sentence-transformers is unavailable; "
            "fine-tuning the linear-head encoder with the reference's "
            "in-loop triplet-margin fallback instead (trainer.py:129-135)."
        )
    encoder = LinearHashEncoder(dim=dim, mode=mode, seed=cfg.seed)
    queries, pos_docs, neg_docs = zip(*triplets)

    # featurize Spark-side with the gated hashing encoder (one job, cached)
    tri_df = spark.createDataFrame(
        [(i, q, p, n) for i, (q, p, n) in enumerate(triplets)],
        "tid long, q string, p string, n string",
    )

    def featurize(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "tid": pdf["tid"],
                    "phi_q": [embed_text(t, dim).tolist() for t in pdf["q"]],
                    "phi_p": [embed_text(t, dim).tolist() for t in pdf["p"]],
                    "phi_n": [embed_text(t, dim).tolist() for t in pdf["n"]],
                }
            )

    feats = tri_df.mapInPandas(
        featurize,
        schema="tid long, phi_q array<double>, phi_p array<double>, "
        "phi_n array<double>",
    ).cache()
    feats.count()

    rng = np.random.default_rng(cfg.seed)
    opt = Adam(encoder.Wq.shape, cfg.lr)
    history: dict[str, list[float]] = {
        "loss": [],
        "loss_nce": [],
        "loss_ricci": [],
        "loss_forman": [],
    }
    sc = spark.sparkContext
    for epoch in range(cfg.epochs):
        gamma = max(0.05, 0.2 * 0.95**epoch)
        batches = epoch_batches(len(triplets), cfg.batch_size, rng)
        for g0 in range(0, len(batches), grad_groups):
            group = batches[g0 : g0 + grad_groups]
            assign = spark.createDataFrame(
                [
                    (int(tid), bi, pos)
                    for bi, idx in enumerate(group)
                    for pos, tid in enumerate(idx.tolist())
                ],
                "tid long, batch_id int, pos int",
            )
            step_df = feats.join(F.broadcast(assign), "tid")
            bc = sc.broadcast(
                (encoder.Wq, encoder.Wd, encoder.mode, cfg, gamma)
            )

            def grad_of_batch(pdf: pd.DataFrame) -> pd.DataFrame:
                wq, wd, enc_mode, c, gam = bc.value
                pdf = pdf.sort_values("pos")
                gq = np.stack(pdf["phi_q"].to_numpy())
                gp = np.stack(pdf["phi_p"].to_numpy())
                gn = np.stack(pdf["phi_n"].to_numpy())
                grad, hist = _batch_grad(gq, gp, gn, wq, wd, enc_mode, c, gam)
                return pd.DataFrame(
                    {
                        "batch_id": [int(pdf["batch_id"].iloc[0])],
                        "grad": [grad.ravel().tolist()],
                        "loss": [hist["loss"]],
                        "loss_nce": [hist["loss_nce"]],
                        "loss_ricci": [hist["loss_ricci"]],
                    }
                )

            rows = (
                step_df.groupBy("batch_id")
                .applyInPandas(
                    grad_of_batch,
                    schema="batch_id int, grad array<double>, loss double, "
                    "loss_nce double, loss_ricci double",
                )
                .collect()
            )
            bc.unpersist()
            rows.sort(key=lambda r: r["batch_id"])
            grads = np.stack(
                [np.array(r["grad"]).reshape(encoder.Wq.shape) for r in rows]
            )
            encoder.Wq = opt.step(encoder.Wq, grads.mean(axis=0))
            if encoder.mode == "mono":
                encoder.Wd = encoder.Wq
            for r in rows:
                history["loss"].append(r["loss"])
                history["loss_nce"].append(r["loss_nce"])
                history["loss_ricci"].append(r["loss_ricci"])
                history["loss_forman"].append(0.0)
    feats.unpersist()
    summary = {k: float(np.mean(v)) if v else 0.0 for k, v in history.items()}
    return encoder, summary
