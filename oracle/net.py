"""fp64 NumPy Gaussian-MLP policy network: forward, VJP, JVP.

Parameters live in a flat dict {W0,b0,...,Wk,bk,logstd}. Flattening order
is SORTED KEY ORDER with row-major raveling, which matches what
``jax.flatten_util.ravel_pytree`` produces for the same dict on the JAX
side — step directions are therefore comparable vector-to-vector.
"""
from __future__ import annotations

import numpy as np

LOG2PI = float(np.log(2.0 * np.pi))


def init_params(rng: np.random.RandomState, obs_dim, act_dim, hidden,
                logstd_init):
    """He-style init scaled for tanh; final layer small (0.01x)."""
    assert len(hidden) < 9, "sorted-key flattening assumes < 10 layers"
    sizes = [obs_dim] + list(hidden) + [act_dim]
    params = {}
    n_layers = len(sizes) - 1
    for i in range(n_layers):
        fan_in = sizes[i]
        scale = np.sqrt(1.0 / fan_in)
        if i == n_layers - 1:
            scale *= 0.01
        params[f"W{i}"] = rng.standard_normal((sizes[i], sizes[i + 1])) * scale
        params[f"b{i}"] = np.zeros(sizes[i + 1])
    params["logstd"] = np.full(act_dim, float(logstd_init))
    return params


def n_layers(params):
    return sum(1 for k in params if k.startswith("W"))


def forward(params, obs):
    """obs (B, do) -> (mu (B, da), logstd (da,), cache for vjp/jvp)."""
    h = obs
    cache = [h]
    L = n_layers(params)
    for i in range(L - 1):
        h = np.tanh(h @ params[f"W{i}"] + params[f"b{i}"])
        cache.append(h)
    mu = h @ params[f"W{L-1}"] + params[f"b{L-1}"]
    return mu, params["logstd"], cache


def vjp(params, cache, dmu, dlogstd):
    """Backprop: cotangents (dmu (B,da), dlogstd (da,)) -> grad dict."""
    L = n_layers(params)
    grads = {"logstd": np.asarray(dlogstd, dtype=np.float64)}
    g = dmu                                   # gradient flowing backward
    grads[f"W{L-1}"] = cache[L - 1].T @ g
    grads[f"b{L-1}"] = g.sum(axis=0)
    g = g @ params[f"W{L-1}"].T
    for i in range(L - 2, -1, -1):
        g = g * (1.0 - cache[i + 1] ** 2)     # through tanh
        grads[f"W{i}"] = cache[i].T @ g
        grads[f"b{i}"] = g.sum(axis=0)
        if i > 0:
            g = g @ params[f"W{i}"].T
    return grads


def jvp(params, cache, tangents):
    """Forward-mode: param tangents -> (dmu (B,da), dlogstd (da,))."""
    L = n_layers(params)
    h = cache[0]
    dh = np.zeros_like(h)
    for i in range(L - 1):
        da_pre = dh @ params[f"W{i}"] + h @ tangents[f"W{i}"] + tangents[f"b{i}"]
        h_next = cache[i + 1]
        dh = (1.0 - h_next ** 2) * da_pre
        h = h_next
    dmu = dh @ params[f"W{L-1}"] + h @ tangents[f"W{L-1}"] + tangents[f"b{L-1}"]
    return dmu, tangents["logstd"]


# ------------------------------------------------------------ flattening
def flatten(tree):
    """Sorted-key, row-major flatten — mirrors jax ravel_pytree on dicts."""
    return np.concatenate([np.asarray(tree[k], dtype=np.float64).ravel()
                           for k in sorted(tree)])


def unflatten_like(params, vec):
    out = {}
    i = 0
    for k in sorted(params):
        size = params[k].size
        out[k] = vec[i:i + size].reshape(params[k].shape)
        i += size
    assert i == vec.size
    return out


# ------------------------------------------------------- gaussian policy
def log_prob(mu, logstd, actions):
    z = (actions - mu) / np.exp(logstd)
    return -0.5 * np.sum(z ** 2 + 2.0 * logstd + LOG2PI, axis=-1)


def kl(mu_old, logstd_old, mu_new, logstd_new):
    """Mean KL(old || new) over the batch."""
    var_old = np.exp(2.0 * logstd_old)
    var_new = np.exp(2.0 * logstd_new)
    per_dim = (logstd_new - logstd_old
               + (var_old + (mu_old - mu_new) ** 2) / (2.0 * var_new) - 0.5)
    return float(np.mean(np.sum(per_dim, axis=-1)))


def entropy(logstd):
    return float(np.sum(logstd + 0.5 * (1.0 + LOG2PI)))
