"""Generalised Advantage Estimation as a reverse `lax.scan` (SURVEY.md
section 3 "GAE estimator"): time-major scan over the horizon, batched over
envs — the whole (N, T) batch in one scan, no Python loops.

Termination: `dones` (N, T) marks steps whose POST-step state ended the
episode (early success termination with auto-reset, and always t = T-1 —
no bootstrap past a done flag). When `dones` is None, episodes are
fixed-horizon with termination only at t = T-1, matching
oracle/trpo.py:gae exactly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def gae(rewards, values, gamma: float, lam: float, dones=None):
    """rewards/values (N, T) [, dones (N, T)] -> raw advantages (N, T)."""
    N, T = rewards.shape
    if dones is None:
        nonterm = jnp.broadcast_to(
            jnp.ones(T, rewards.dtype).at[-1].set(0.0), (N, T))
    else:
        nonterm = 1.0 - dones.astype(rewards.dtype)

    def body(carry, xs):
        next_v, next_a = carry
        r, v, nt = xs
        delta = r + gamma * next_v * nt - v
        a = delta + gamma * lam * nt * next_a
        return (v, a), a

    zeros = jnp.zeros(N, rewards.dtype)
    xs = (rewards.T, values.T, nonterm.T)
    _, adv_t = jax.lax.scan(body, (zeros, zeros), xs, reverse=True)
    return adv_t.T


def returns_to_go(rewards, gamma: float, dones=None):
    """Discounted returns-to-go (diagnostics), same termination rule."""
    N, T = rewards.shape
    if dones is None:
        nonterm = jnp.broadcast_to(
            jnp.ones(T, rewards.dtype).at[-1].set(0.0), (N, T))
    else:
        nonterm = 1.0 - dones.astype(rewards.dtype)

    def body(carry, xs):
        r, nt = xs
        g = r + gamma * nt * carry
        return g, g

    _, ret_t = jax.lax.scan(body, jnp.zeros(N, rewards.dtype),
                            (rewards.T, nonterm.T), reverse=True)
    return ret_t.T
