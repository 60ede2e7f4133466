"""Forward-only NumPy transcriptions of the reference's differentiable
formulas (SURVEY.md §2a rows 20, 30). Training/autograd is a non-goal (no
torch in this environment); these exist so the engine can compute the same
values inside grouped kernels and so parity tests can pin the math.

Sources re-derived from:
  * forman_ricci_differentiable: /root/reference/geoIR/geo/differentiable.py:214-278
  * info_nce_geo / ricci_loss / forman_loss: /root/reference/geoIR/losses.py:43-120
"""

from __future__ import annotations

import numpy as np


def forman_ricci_differentiable_np(
    A: np.ndarray, eps: float = 1e-9, k_chunk: int = 256
) -> np.ndarray:
    """Dense tensorized Forman curvature per edge:
    kappa_ij = w_ij*(1/deg_i + 1/deg_j) - sum_k (w_ik*w_jk)/sqrt(w_ij*w_ik*w_jk + eps).

    The (B,B,B) triangle broadcast is chunked over k so group memory stays
    bounded for candidate sets beyond ~500 (SURVEY.md §7 risk 6)."""
    A_sym = 0.5 * (A + A.T)
    deg = A_sym.sum(axis=-1, keepdims=True)
    term1 = A_sym * (1.0 / (deg + eps) + 1.0 / (deg.T + eps))
    B = A_sym.shape[0]
    tri = np.zeros_like(A_sym)
    w_ij = A_sym[:, :, None]
    for lo in range(0, B, k_chunk):
        hi = min(lo + k_chunk, B)
        num = A_sym[:, None, lo:hi] * A_sym[None, :, lo:hi]  # w_ik * w_jk
        den = np.sqrt(w_ij * num + eps)
        tri += (num / den).sum(axis=2)
    return term1 - tri


def info_nce_geo_np(
    d_pos: np.ndarray, d_neg: np.ndarray, temperature: float = 0.07
) -> float:
    """L = mean over batch of CE(logits=[-d_pos/t, -d_neg/t], target=0)."""
    if d_pos.ndim != 1:
        raise ValueError("d_pos must be a 1-D array (B,)")
    if d_neg.ndim != 2 or d_neg.shape[0] != d_pos.shape[0]:
        raise ValueError("d_neg must have shape (B, N) matching d_pos batch size")
    logits = np.concatenate([(-d_pos / temperature)[:, None], -d_neg / temperature], axis=1)
    m = logits.max(axis=1, keepdims=True)
    lse = m[:, 0] + np.log(np.exp(logits - m).sum(axis=1))
    return float(np.mean(lse - logits[:, 0]))


def ricci_loss_np(kappa: np.ndarray, kappa_target: float = 0.0) -> float:
    """Quadratic hinge below the curvature target."""
    diff = np.clip(kappa_target - kappa, 0.0, None)
    return float(np.mean(diff**2))


forman_loss_np = ricci_loss_np  # same hinge, Forman inputs (losses.py:104-120)
