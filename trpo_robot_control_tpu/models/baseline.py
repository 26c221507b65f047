"""Linear-feature value baseline, fit fully on-device (SURVEY.md section 3
"Value baseline"): ridge regression on phi(s, t) = [obs, obs^2, t/T,
(t/T)^2, (t/T)^3, 1], solved with a Cholesky factorisation — no host
round-trip. Feature layout matches oracle/trpo.py:baseline_features.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def n_features(obs_dim: int) -> int:
    return 2 * obs_dim + 4


def features(obs, horizon: int):
    """obs (N, T, do) -> phi (N, T, F)."""
    N, T, do = obs.shape
    t = (jnp.arange(T, dtype=obs.dtype) / horizon)[None, :, None]
    t = jnp.broadcast_to(t, (N, T, 1))
    return jnp.concatenate(
        [obs, obs ** 2, t, t ** 2, t ** 3, jnp.ones_like(t)], axis=-1)


def predict(w, phi):
    return phi @ w


def fit(phi_flat, targets_flat, reg: float):
    """Solve (phi^T phi + reg I) w = phi^T y with Cholesky.

    With data sharding, pass pre-reduced (psum'd) A and b via fit_normal
    instead — see trpo/update.py.
    """
    A = phi_flat.T @ phi_flat + reg * jnp.eye(phi_flat.shape[-1],
                                              dtype=phi_flat.dtype)
    b = phi_flat.T @ targets_flat
    return fit_normal(A, b)


def fit_normal(A, b, eps: float = 1e-20):
    """Cholesky solve with Jacobi (diagonal) preconditioning: the normal
    equations square the feature matrix's condition number, which at fp32
    loses digits on the polynomial time features — rescaling by
    D^-1/2 A D^-1/2 recovers them. Exact-arithmetic solution unchanged."""
    d = jnp.sqrt(jnp.diagonal(A) + eps)
    A_s = A / (d[:, None] * d[None, :])
    L = jnp.linalg.cholesky(A_s)
    y = jax.scipy.linalg.cho_solve((L, True), b / d)
    return y / d
