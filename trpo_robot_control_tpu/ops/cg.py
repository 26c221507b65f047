"""Conjugate gradient on flat fp32 vectors under `lax.fori_loop`
(SURVEY.md section 3 "CG solver": fixed 10 iterations, x0 = 0).

The FVP callee handles any cross-shard reduction (pmean inside fvp), so
with replicated vectors the CG recurrences themselves are collective-free
— zero host round-trips per iteration (SURVEY.md section 5.2).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def conjugate_gradient(fvp, g, iters: int, eps: float = 1e-12):
    """Solve F x = g. Returns (x, final residual r, residual norm^2).

    The caller can get the curvature x^T F x WITHOUT an extra FVP call:
    F x = g - r exactly (CG invariant), so x^T F x = x.g - x.r.
    """

    def body(_, state):
        x, r, p, rdotr = state
        z = fvp(p)
        alpha = rdotr / (jnp.dot(p, z) + eps)
        x = x + alpha * p
        r = r - alpha * z
        new_rdotr = jnp.dot(r, r)
        p = r + (new_rdotr / (rdotr + eps)) * p
        return (x, r, p, new_rdotr)

    x0 = jnp.zeros_like(g)
    init = (x0, g, g, jnp.dot(g, g))
    x, r, _, rdotr = jax.lax.fori_loop(0, iters, body, init)
    return x, r, rdotr
