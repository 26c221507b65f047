"""Gaussian tanh-MLP policy (SURVEY.md section 3: "Gaussian-MLP policy").

Parameters are a flat dict {W0,b0,...,Wk,bk,logstd} with the SAME keys as
the fp64 oracle (oracle/net.py), so `jax.flatten_util.ravel_pytree` —
which flattens dicts in sorted-key order — produces vectors directly
comparable to the oracle's `net.flatten`.

Mean head in fp32; matmuls sized (B, hidden) ride the MXU when B is large.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

LOG2PI = math.log(2.0 * math.pi)


def init_params(key, obs_dim, act_dim, hidden, logstd_init):
    """Same family as oracle init (scaled Gaussian, small final layer)."""
    assert len(hidden) < 9, "sorted-key flattening assumes < 10 layers"
    sizes = [obs_dim] + list(hidden) + [act_dim]
    params = {}
    n_layers = len(sizes) - 1
    keys = jax.random.split(key, n_layers)
    for i in range(n_layers):
        scale = 1.0 / math.sqrt(sizes[i])
        if i == n_layers - 1:
            scale *= 0.01
        params[f"W{i}"] = scale * jax.random.normal(
            keys[i], (sizes[i], sizes[i + 1]), jnp.float32)
        params[f"b{i}"] = jnp.zeros(sizes[i + 1], jnp.float32)
    params["logstd"] = jnp.full(act_dim, logstd_init, jnp.float32)
    return params


def n_layers(params):
    return sum(1 for k in params if k.startswith("W"))


def mean_net(params, obs):
    """obs (..., do) -> mu (..., da). tanh MLP, linear head."""
    h = obs
    L = n_layers(params)
    for i in range(L - 1):
        h = jnp.tanh(h @ params[f"W{i}"] + params[f"b{i}"])
    return h @ params[f"W{L-1}"] + params[f"b{L-1}"]


def dist(params, obs):
    """-> (mu, logstd) with logstd broadcast over the batch."""
    return mean_net(params, obs), params["logstd"]


def sample(params, obs, key):
    mu, logstd = dist(params, obs)
    return mu + jnp.exp(logstd) * jax.random.normal(key, mu.shape, mu.dtype)


def log_prob(mu, logstd, actions):
    z = (actions - mu) * jnp.exp(-logstd)
    return -0.5 * jnp.sum(z ** 2 + 2.0 * logstd + LOG2PI, axis=-1)


def kl(mu_old, logstd_old, mu_new, logstd_new):
    """Mean over batch of KL(old || new), diagonal Gaussians
    (SURVEY.md section 4.4 closed form)."""
    var_old = jnp.exp(2.0 * logstd_old)
    var_new = jnp.exp(2.0 * logstd_new)
    per_dim = (logstd_new - logstd_old
               + (var_old + (mu_old - mu_new) ** 2) / (2.0 * var_new) - 0.5)
    return jnp.mean(jnp.sum(per_dim, axis=-1))


def entropy(logstd):
    return jnp.sum(logstd + 0.5 * (1.0 + LOG2PI))
