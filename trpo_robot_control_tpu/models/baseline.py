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


def fit_normal(A, b, eps: float = 1e-20, rel_floor: float = 1e-6):
    """Solve the (ridge-regularised) normal equations robustly at fp32.

    The normal equations square the feature matrix's condition number;
    on near-converged policies cond(A) reaches ~1e8 — past the fp32
    Cholesky cliff (observed: NaN weights that then poison GAE targets
    and freeze training). Method:

    1. Jacobi scaling D^-1/2 A D^-1/2 (exact-arithmetic no-op);
    2. eigendecomposition solve with a RELATIVE eigenvalue floor —
       directions with lambda < rel_floor * lambda_max are dropped
       (pseudo-inverse); they are near-null of Phi^T Phi and contribute
       ~nothing to predictions, which is what parity tests compare.

    F is small (2*obs_dim + 4), so eigh costs microseconds.
    """
    d = jnp.sqrt(jnp.diagonal(A) + eps)
    A_s = A / (d[:, None] * d[None, :])
    lam, Q = jnp.linalg.eigh(A_s)
    inv = jnp.where(lam > rel_floor * lam[-1], 1.0 / lam, 0.0)
    w_s = Q @ (inv * (Q.T @ (b / d)))
    w = w_s / d
    # belt-and-braces: a non-finite fit degrades to a zero baseline for
    # one iteration instead of permanently poisoning the GAE targets
    return jnp.where(jnp.isfinite(w), w, 0.0)
