"""Generalised Advantage Estimation as a reverse `lax.scan` (SURVEY.md
section 3 "GAE estimator"): time-major scan over the horizon, batched over
envs — the whole (N, T) batch in one scan, no Python loops.

Episodes are fixed-horizon with termination at t = T-1 (no bootstrap),
matching oracle/trpo.py:gae.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def gae(rewards, values, gamma: float, lam: float):
    """rewards/values (N, T) -> raw advantages (N, T)."""
    N, T = rewards.shape
    nonterm = jnp.ones(T, rewards.dtype).at[-1].set(0.0)

    def body(carry, xs):
        next_v, next_a = carry
        r, v, nt = xs
        delta = r + gamma * next_v * nt - v
        a = delta + gamma * lam * nt * next_a
        return (v, a), a

    zeros = jnp.zeros(N, rewards.dtype)
    xs = (rewards.T, values.T, nonterm)
    _, adv_t = jax.lax.scan(body, (zeros, zeros), xs, reverse=True)
    return adv_t.T


def returns_to_go(rewards, gamma: float):
    """Discounted returns-to-go (diagnostics), same termination rule."""
    def body(carry, r):
        g = r + gamma * carry
        return g, g

    _, ret_t = jax.lax.scan(body, jnp.zeros(rewards.shape[0],
                                            rewards.dtype),
                            rewards.T, reverse=True)
    return ret_t.T
