"""KL-constrained backtracking line search, fully on-device via
`lax.while_loop` (SURVEY.md section 3 "KL line search", section 9 hard-part 3).

Accept the first exponent k with surrogate improvement AND mean KL <= delta;
if none accepts in K steps, keep theta_old (accepted = -1).

theta may be a flat fp32 vector (data-parallel path) or a parameter
PYTREE (tensor-parallel path, parallel/tensor.py) — all arithmetic is
leafwise.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def line_search(eval_fn, theta_old, full_step, surr_old, delta: float,
                steps: int, backtrack: float):
    """eval_fn(theta) -> (surrogate, kl). All on-device.

    Returns (theta_new, accepted_k, kl_at_accept, surr_at_accept).
    """

    def cond(state):
        k, done, *_ = state
        return jnp.logical_and(k < steps, jnp.logical_not(done))

    def body(state):
        k, done, theta, kl_a, surr_a = state
        coef = jnp.power(backtrack, k.astype(jnp.float32))
        cand = jax.tree.map(lambda t0, s: t0 + coef * s,
                            theta_old, full_step)
        surr, kl = eval_fn(cand)
        ok = jnp.logical_and(surr > surr_old, kl <= delta)
        theta = jax.tree.map(lambda c, t: jnp.where(ok, c, t), cand, theta)
        kl_a = jnp.where(ok, kl, kl_a)
        surr_a = jnp.where(ok, surr, surr_a)
        return (k + 1, ok, theta, kl_a, surr_a)

    init = (jnp.asarray(0, jnp.int32), jnp.asarray(False), theta_old,
            jnp.asarray(0.0, jnp.float32),
            jnp.asarray(surr_old, jnp.float32))
    k, done, theta, kl_a, surr_a = jax.lax.while_loop(cond, body, init)
    accepted = jnp.where(done, k - 1, -1)
    return theta, accepted, kl_a, surr_a
