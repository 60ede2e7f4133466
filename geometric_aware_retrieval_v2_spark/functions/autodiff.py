"""Minimal reverse-mode automatic differentiation over NumPy float64.

The reference's training stack differentiates its geometric loss with
torch autograd (/root/reference/geoIR/training/trainer.py:69-138,
/root/reference/geoIR/geo/differentiable.py). Torch is not available in
this environment, so this module supplies the one thing the forward-only
transcriptions in functions/geoformulas.py lack: exact gradients. It is a
deliberately small tape — only the operators the geometric loss pipeline
needs — not a general framework:

  * elementwise + - * / sqrt exp log relu with NumPy broadcasting
    (backward un-broadcasts by summing over expanded axes),
  * 2-D matmul / transpose / reductions (sum, mean) over any axes,
  * diag_embed, fancy-index gather (scatter-add backward), concat,
  * row-softmax with a masked diagonal and row-logsumexp as fused
    primitives (their closed-form VJPs are both cheaper and numerically
    safer than composing exp/sum/div nodes),
  * hard top-k keep: the threshold is data-dependent but, exactly as in
    torch (`torch.where(A >= thresh, A, 0)` — differentiable.py:94-96),
    gradients flow only through the kept entries; the comparison itself
    contributes nothing.

Everything is float64. Gradient correctness is pinned by central-difference
checks in tests/test_trainer.py over the full composed loss, which
exercises every op in one chain.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np

Array = np.ndarray


def _unbroadcast(g: Array, shape: tuple[int, ...]) -> Array:
    """Reduce gradient ``g`` back to ``shape`` after NumPy broadcasting."""
    if g.shape == shape:
        return g
    # sum leading axes NumPy prepended
    while g.ndim > len(shape):
        g = g.sum(axis=0)
    # sum axes that were broadcast from 1
    for ax, n in enumerate(shape):
        if n == 1 and g.shape[ax] != 1:
            g = g.sum(axis=ax, keepdims=True)
    return g


class Var:
    """A node in the tape: value + parents + vector-Jacobian product."""

    __slots__ = ("v", "parents", "vjp", "grad")

    def __init__(
        self,
        v: Array | float,
        parents: Sequence["Var"] = (),
        vjp: Callable[[Array], tuple[Array, ...]] | None = None,
    ):
        self.v = np.asarray(v, dtype=np.float64)
        self.parents = tuple(parents)
        self.vjp = vjp
        self.grad: Array | None = None

    # -- operator sugar (auto-wraps plain arrays/scalars as constants) ----
    def __add__(self, o):
        return add(self, _wrap(o))

    def __radd__(self, o):
        return add(_wrap(o), self)

    def __sub__(self, o):
        return sub(self, _wrap(o))

    def __rsub__(self, o):
        return sub(_wrap(o), self)

    def __mul__(self, o):
        return mul(self, _wrap(o))

    def __rmul__(self, o):
        return mul(_wrap(o), self)

    def __truediv__(self, o):
        return div(self, _wrap(o))

    def __rtruediv__(self, o):
        return div(_wrap(o), self)

    def __matmul__(self, o):
        return matmul(self, _wrap(o))

    def __neg__(self):
        return mul(self, Var(-1.0))

    @property
    def T(self) -> "Var":
        return transpose(self)

    @property
    def shape(self) -> tuple[int, ...]:
        return self.v.shape


def _wrap(x) -> Var:
    return x if isinstance(x, Var) else Var(x)


# ------------------------------------------------------------------ ops


def add(a: Var, b: Var) -> Var:
    return Var(
        a.v + b.v,
        (a, b),
        lambda g: (_unbroadcast(g, a.v.shape), _unbroadcast(g, b.v.shape)),
    )


def sub(a: Var, b: Var) -> Var:
    return Var(
        a.v - b.v,
        (a, b),
        lambda g: (_unbroadcast(g, a.v.shape), _unbroadcast(-g, b.v.shape)),
    )


def mul(a: Var, b: Var) -> Var:
    return Var(
        a.v * b.v,
        (a, b),
        lambda g: (
            _unbroadcast(g * b.v, a.v.shape),
            _unbroadcast(g * a.v, b.v.shape),
        ),
    )


def div(a: Var, b: Var) -> Var:
    return Var(
        a.v / b.v,
        (a, b),
        lambda g: (
            _unbroadcast(g / b.v, a.v.shape),
            _unbroadcast(-g * a.v / (b.v * b.v), b.v.shape),
        ),
    )


def matmul(a: Var, b: Var) -> Var:
    return Var(
        a.v @ b.v,
        (a, b),
        lambda g: (g @ b.v.T, a.v.T @ g),
    )


def transpose(a: Var) -> Var:
    return Var(a.v.T, (a,), lambda g: (g.T,))


def vsum(a: Var, axis=None, keepdims: bool = False) -> Var:
    def back(g: Array) -> tuple[Array, ...]:
        if axis is None:
            return (np.broadcast_to(g, a.v.shape).copy(),)
        gg = g if keepdims else np.expand_dims(g, axis)
        return (np.broadcast_to(gg, a.v.shape).copy(),)

    return Var(a.v.sum(axis=axis, keepdims=keepdims), (a,), back)


def vmean(a: Var, axis=None, keepdims: bool = False) -> Var:
    n = a.v.size if axis is None else a.v.shape[axis]

    def back(g: Array) -> tuple[Array, ...]:
        if axis is None:
            return (np.broadcast_to(g / n, a.v.shape).copy(),)
        gg = g if keepdims else np.expand_dims(g, axis)
        return (np.broadcast_to(gg / n, a.v.shape).copy(),)

    return Var(a.v.mean(axis=axis, keepdims=keepdims), (a,), back)


def sqrt(a: Var) -> Var:
    r = np.sqrt(a.v)
    return Var(r, (a,), lambda g: (g * 0.5 / r,))


def exp(a: Var) -> Var:
    r = np.exp(a.v)
    return Var(r, (a,), lambda g: (g * r,))


def log(a: Var) -> Var:
    return Var(np.log(a.v), (a,), lambda g: (g / a.v,))


def relu(a: Var) -> Var:
    mask = (a.v > 0).astype(np.float64)
    return Var(a.v * mask, (a,), lambda g: (g * mask,))


def square(a: Var) -> Var:
    return mul(a, a)


def expand_dims(a: Var, axis: int) -> Var:
    """Insert a length-1 axis (for 3-D triangle broadcasts); backward squeezes."""
    return Var(np.expand_dims(a.v, axis), (a,), lambda g: (np.squeeze(g, axis=axis),))


def diag_embed(vec: Var) -> Var:
    """(n,) -> (n,n) diagonal matrix; backward extracts the diagonal."""
    return Var(np.diag(vec.v), (vec,), lambda g: (np.diagonal(g).copy(),))


def gather(a: Var, rows: Array, cols: Array) -> Var:
    """a[rows, cols] with scatter-add backward. rows/cols broadcastable
    integer arrays; result has their broadcast shape."""
    rows = np.asarray(rows)
    cols = np.asarray(cols)

    def back(g: Array) -> tuple[Array, ...]:
        out = np.zeros_like(a.v)
        np.add.at(out, (rows, cols), g)
        return (out,)

    return Var(a.v[rows, cols], (a,), back)


def concat(parts: Sequence[Var], axis: int = 1) -> Var:
    sizes = [p.v.shape[axis] for p in parts]
    splits = np.cumsum(sizes)[:-1]

    def back(g: Array) -> tuple[Array, ...]:
        return tuple(np.split(g, splits, axis=axis))

    return Var(np.concatenate([p.v for p in parts], axis=axis), tuple(parts), back)


def row_softmax_masked_diag(z: Var) -> Var:
    """Row softmax of a square matrix with the diagonal masked to -inf
    (differentiable.py:82-86). Fused primitive: P_ii = 0 exactly, and the
    VJP is dZ = P * (g - sum(g*P, axis=1, keepdims=True))."""
    zv = z.v.copy()
    np.fill_diagonal(zv, -np.inf)
    m = zv.max(axis=1, keepdims=True)
    e = np.exp(zv - m)
    p = e / e.sum(axis=1, keepdims=True)

    def back(g: Array) -> tuple[Array, ...]:
        dot = (g * p).sum(axis=1, keepdims=True)
        dz = p * (g - dot)
        # diagonal entries of z never influence the output
        np.fill_diagonal(dz, 0.0)
        return (dz,)

    return Var(p, (z,), back)


def logsumexp_rows(a: Var) -> Var:
    """Row-wise logsumexp (B, C) -> (B,); backward is the row softmax."""
    m = a.v.max(axis=1, keepdims=True)
    e = np.exp(a.v - m)
    s = e.sum(axis=1, keepdims=True)
    out = (m + np.log(s))[:, 0]
    soft = e / s

    def back(g: Array) -> tuple[Array, ...]:
        return (g[:, None] * soft,)

    return Var(out, (a,), back)


def topk_keep(a: Var, k: int) -> Var:
    """Zero all but each row's k largest entries (>= the k-th largest,
    ties kept — exactly torch's `where(A >= thresh, A, 0)` semantics,
    differentiable.py:94-96). Gradient flows through kept entries only;
    the threshold comparison contributes nothing (in torch the topk
    threshold's gradient path is dead because it appears only inside the
    `where` condition)."""
    n = a.v.shape[1]
    kth = np.partition(a.v, n - k, axis=1)[:, n - k]
    mask = (a.v >= kth[:, None]).astype(np.float64)
    return Var(a.v * mask, (a,), lambda g: (g * mask,))


# ------------------------------------------------------------- backward


def backward(root: Var) -> None:
    """Reverse-mode sweep from a scalar root; fills .grad on every node."""
    if root.v.size != 1:
        raise ValueError("backward() requires a scalar root")
    order: list[Var] = []
    seen: set[int] = set()
    stack: list[tuple[Var, bool]] = [(root, False)]
    while stack:
        node, processed = stack.pop()
        if processed:
            order.append(node)
            continue
        if id(node) in seen:
            continue
        seen.add(id(node))
        stack.append((node, True))
        for p in node.parents:
            if id(p) not in seen:
                stack.append((p, False))
    for node in order:
        node.grad = np.zeros_like(node.v)
    root.grad = np.ones_like(root.v)
    for node in reversed(order):
        if node.vjp is None or node.grad is None:
            continue
        grads = node.vjp(node.grad)
        for parent, g in zip(node.parents, grads):
            if parent.grad is None:
                parent.grad = np.zeros_like(parent.v)
            parent.grad = parent.grad + g
