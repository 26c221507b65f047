"""Fisher-vector products on flat parameter vectors (SURVEY.md section 4.4).

Two mathematically equal forms at theta = theta_old:

- `make_gn_fvp`: Gauss-Newton form F v = (1/B) sum_b J_b^T M J_b v with
  J = d(mu, logstd)/dtheta and M = diag(1/sigma^2, 2I) — ONE forward-mode
  plus ONE reverse-mode pass, no double backward. This is the hot path the
  Pallas kernel fuses (ops/pallas/) and what the reference offloads to
  its accelerator.
- `make_kl_fvp`: direct KL-Hessian jvp(grad(KL)) — the correctness twin.

Both add `damping * v` and optionally `lax.pmean` over a mesh axis, which
is the ONLY collective needed per CG iteration (SURVEY.md section 5.2).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from ..models import policy


def _maybe_pmean(x, axis_name):
    return jax.lax.pmean(x, axis_name) if axis_name else x


def make_gn_fvp(params, unravel, obs, damping: float, axis_name=None):
    """obs: (B, do) local shard. Returns fvp(v_flat) -> flat damped Fv.

    `jax.linearize` caches the forward activations ONCE per update, so
    each of the ~cg_iters+1 FVP calls is purely linear matvec work (the
    reference streams exactly this linearised pipeline through its
    accelerator — SURVEY.md section 5.2).
    """
    B = obs.shape[0]
    inv_var = jnp.exp(-2.0 * params["logstd"])

    def dist_fn(p):
        return policy.dist(p, obs)

    _, jvp_fn = jax.linearize(dist_fn, params)
    _, vjp_fn = jax.vjp(dist_fn, params)

    def fvp(v_flat):
        tangent = unravel(v_flat)
        dmu, dlogstd = jvp_fn(tangent)
        u_mu = dmu * inv_var / B
        # logstd is shared across the batch: the per-sample factor 2 and
        # the batch sum / B cancel (see oracle/trpo.py:make_fvp).
        u_logstd = 2.0 * dlogstd
        (gv,) = vjp_fn((u_mu, u_logstd))
        gv_flat, _ = ravel_pytree(gv)
        gv_flat = _maybe_pmean(gv_flat, axis_name)
        return gv_flat + damping * v_flat

    return fvp


def make_kl_fvp(params, unravel, obs, damping: float, axis_name=None):
    """Reference FVP: jvp of grad of mean KL(old || new) at new = old."""
    mu_old, logstd_old = policy.dist(params, obs)
    mu_old = jax.lax.stop_gradient(mu_old)
    logstd_old = jax.lax.stop_gradient(logstd_old)

    def kl_fn(p):
        mu, logstd = policy.dist(p, obs)
        return policy.kl(mu_old, logstd_old, mu, logstd)

    grad_fn = jax.grad(kl_fn)

    def fvp(v_flat):
        tangent = unravel(v_flat)
        _, hv = jax.jvp(grad_fn, (params,), (tangent,))
        hv_flat, _ = ravel_pytree(hv)
        hv_flat = _maybe_pmean(hv_flat, axis_name)
        return hv_flat + damping * v_flat

    return fvp
