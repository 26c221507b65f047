"""Conjugate gradient under `lax.fori_loop` (SURVEY.md section 3 "CG
solver": fixed 10 iterations, x0 = 0).

Operands are flat fp32 vectors on the data-parallel path, or parameter
PYTREES on the tensor-parallel path (parallel/tensor.py), where each
device holds only its shard of some leaves — there `vdot` must be the
axis-aware inner product (psum over 'model' for sharded leaves). The
FVP callee handles any cross-shard reduction of Fv itself (pmean inside
fvp), so the CG recurrences are collective-free beyond `vdot`
(SURVEY.md section 5.2).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _axpy(a, x, y):
    """y + a * x, leafwise (works for flat vectors and pytrees)."""
    return jax.tree.map(lambda xx, yy: yy + a * xx, x, y)


def conjugate_gradient(fvp, g, iters: int, eps: float = 1e-12,
                       vdot=None):
    """Solve F x = g. Returns (x, final residual r, residual norm^2).

    The caller can get the curvature x^T F x WITHOUT an extra FVP call:
    F x = g - r exactly (CG invariant), so x^T F x = x.g - x.r.
    """
    if vdot is None:
        vdot = jnp.dot

    def body(_, state):
        x, r, p, rdotr = state
        z = fvp(p)
        alpha = rdotr / (vdot(p, z) + eps)
        x = _axpy(alpha, p, x)
        r = _axpy(-alpha, z, r)
        new_rdotr = vdot(r, r)
        p = _axpy(new_rdotr / (rdotr + eps), p, r)
        return (x, r, p, new_rdotr)

    x0 = jax.tree.map(jnp.zeros_like, g)
    init = (x0, g, g, vdot(g, g))
    x, r, _, rdotr = jax.lax.fori_loop(0, iters, body, init)
    return x, r, rdotr
