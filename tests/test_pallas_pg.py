"""Interpret-mode equivalence of the fused surrogate-gradient kernel
(ops/pallas/pg_kernel.py) against its twin
models/policy.py:surrogate_grad_ff — which is itself checked against
jax.grad (test_ff_baseline.py), so this chain pins the kernel to the
autodiff ground truth. Compiled on-chip check: scripts/tpu_checks.py.

fp32 mode is exact to reassociation (<= 1e-5 rel). bf16 mode
additionally rounds the WEIGHTS to bf16 for the in-kernel matmuls
(the XLA twin keeps fp32 weights in interpret mode, but on the real
MXU DEFAULT precision rounds fp32 operands to bf16 anyway, so the
compiled twin carries the same noise) — bounded at the storage-rounding
scale, like the twin's own bf16-vs-fp32 bound in test_ff_baseline.py.
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from trpo_robot_control_tpu.models import policy
from trpo_robot_control_tpu.ops.pallas.pg_kernel import (
    pallas_surrogate_grad_ff, pg_tiles)


def _params(key, do, da, h=64):
    ks = jax.random.split(key, 6)
    return {
        "W0": 0.3 * jax.random.normal(ks[0], (do, h)),
        "b0": 0.1 * jax.random.normal(ks[1], (h,)),
        "W1": 0.3 * jax.random.normal(ks[2], (h, h)),
        "b1": 0.1 * jax.random.normal(ks[3], (h,)),
        "W2": 0.3 * jax.random.normal(ks[4], (h, da)),
        "b2": 0.1 * jax.random.normal(ks[5], (da,)),
        "logstd": -0.5 * jnp.ones((da,)),
    }


def _batch(key, T, do, da, N):
    ks = jax.random.split(key, 3)
    obs = jax.random.normal(ks[0], (T, do, N), jnp.float32)
    act = 0.5 * jax.random.normal(ks[1], (T, da, N), jnp.float32)
    adv = jax.random.normal(ks[2], (T, N), jnp.float32)
    return obs, act, adv


@pytest.mark.parametrize("T,do,da,N,bn,tc", [
    (8, 27, 7, 512, None, None),      # 7-DoF dims, auto tiles
    (12, 27, 7, 768, 128, 4),        # multi lane-tile, multi chunk
    (10, 9, 2, 256, None, 5),        # planar dims, odd chunk
    (5, 27, 7, 256, None, None),     # tc = 5 (odd), single tile
])
def test_pg_kernel_matches_twin_fp32(T, do, da, N, bn, tc):
    key = jax.random.PRNGKey(T * 1000 + N)
    params = _params(key, do, da)
    obs, act, adv = _batch(key, T, do, da, N)
    g1, mu1, lp1 = policy.surrogate_grad_ff(params, obs, act, adv)
    g2, mu2, lp2 = pallas_surrogate_grad_ff(params, obs, act, adv,
                                            block_n=bn, t_chunk=tc,
                                            interpret=True)
    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu2),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(lp1), np.asarray(lp2),
                               atol=1e-4)
    for k in g1:
        scale = float(jnp.max(jnp.abs(g1[k]))) + 1e-12
        np.testing.assert_allclose(np.asarray(g2[k]) / scale,
                                   np.asarray(g1[k]) / scale,
                                   atol=1e-5, err_msg=k)


def test_pg_kernel_bf16_bounded():
    """bf16 storage mode: kernel vs the bf16 twin within the
    storage-rounding scale (weights rounded once more than the
    interpret twin — the compiled twin rounds them too)."""
    key = jax.random.PRNGKey(7)
    T, do, da, N = 8, 27, 7, 512
    params = _params(key, do, da)
    obs, act, adv = _batch(key, T, do, da, N)
    o16, a16 = obs.astype(jnp.bfloat16), act.astype(jnp.bfloat16)
    g1, mu1, lp1 = policy.surrogate_grad_ff(params, o16, a16, adv,
                                            store_dtype=jnp.bfloat16)
    g2, mu2, lp2 = pallas_surrogate_grad_ff(params, o16, a16, adv,
                                            interpret=True)
    # mu through 3 bf16-weight matmuls: O(2^-8) absolute at |mu| ~ 1
    assert float(jnp.max(jnp.abs(mu1.astype(jnp.float32) - mu2))) < 0.1
    # logp = -0.5 sum z^2: bf16 noise on mu scales with |logp| — bound
    # relative (observed ~2%)
    lp_err = float(jnp.max(jnp.abs(lp1.astype(jnp.float32) - lp2)))
    assert lp_err < 0.04 * float(jnp.max(jnp.abs(lp1))), lp_err
    for k in g1:
        scale = float(jnp.max(jnp.abs(g1[k]))) + 1e-12
        err = float(jnp.max(jnp.abs(
            g1[k].astype(jnp.float32) - g2[k]))) / scale
        assert err < 5e-2, (k, err)


def test_pg_kernel_inside_update_fp32():
    """surrgrad_impl='pallas' (interpret) inside the full trpo_update
    equals the 'xla' twin path at c3-small in fp32 storage mode: same
    accepted exponent, near-identical parameters."""
    from trpo_robot_control_tpu.configs import C3_FRANKA7
    from trpo_robot_control_tpu.envs import arm
    from trpo_robot_control_tpu.trpo.train import init_state
    from trpo_robot_control_tpu.trpo.update import trpo_update

    base = C3_FRANKA7.replace(
        n_envs=256, horizon=24,
        trpo=dataclasses.replace(C3_FRANKA7.trpo, ff_store_dtype="f32",
                                 surrgrad_impl="xla"))
    cfgk = base.replace(
        trpo=dataclasses.replace(base.trpo, surrgrad_impl="pallas"))
    state = init_state(base, seed=0)
    batch = jax.jit(lambda p, k: arm.rollout(base, p, policy.sample, k))(
        state.params, jax.random.PRNGKey(2))
    # hand the update the ff views the fused kernels would emit
    batch = dict(batch,
                 obs_ff=jnp.transpose(batch["obs"], (1, 2, 0)),
                 actions_ff=jnp.transpose(batch["actions"], (1, 2, 0)))
    p1, w1, s1 = jax.jit(
        lambda p, w, b: trpo_update(base, p, w, b))(
        state.params, state.w, batch)
    p2, w2, s2 = jax.jit(
        lambda p, w, b: trpo_update(cfgk, p, w, b))(
        state.params, state.w, batch)
    assert int(s1["accepted"]) == int(s2["accepted"])
    np.testing.assert_allclose(float(s1["surr"]), float(s2["surr"]),
                               rtol=1e-4, atol=1e-7)
    for name in p1:
        np.testing.assert_allclose(np.asarray(p1[name]),
                                   np.asarray(p2[name]),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("hidden", [(48, 40), (33, 57)])
def test_pg_kernel_padded_hidden_widths(hidden):
    """Non-64 (and non-multiple-of-8) hidden widths exercise the
    _round8 padding on every layer boundary: block-diag zero rows,
    tanh(0) pad activations, and the fold-outside index arithmetic.
    Exact vs the twin in fp32."""
    key = jax.random.PRNGKey(11)
    T, do, da, N = 8, 27, 7, 512
    ks = jax.random.split(key, 6)
    h0, h1 = hidden
    params = {
        "W0": 0.3 * jax.random.normal(ks[0], (do, h0)),
        "b0": 0.1 * jax.random.normal(ks[1], (h0,)),
        "W1": 0.3 * jax.random.normal(ks[2], (h0, h1)),
        "b1": 0.1 * jax.random.normal(ks[3], (h1,)),
        "W2": 0.3 * jax.random.normal(ks[4], (h1, da)),
        "b2": 0.1 * jax.random.normal(ks[5], (da,)),
        "logstd": -0.5 * jnp.ones((da,)),
    }
    obs, act, adv = _batch(key, T, do, da, N)
    g1, mu1, lp1 = policy.surrogate_grad_ff(params, obs, act, adv)
    g2, mu2, lp2 = pallas_surrogate_grad_ff(params, obs, act, adv,
                                            interpret=True)
    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu2),
                               atol=1e-5)
    for k in g1:
        scale = float(jnp.max(jnp.abs(g1[k]))) + 1e-12
        np.testing.assert_allclose(np.asarray(g2[k]) / scale,
                                   np.asarray(g1[k]) / scale,
                                   atol=1e-5, err_msg=k)


def test_pg_tiles_fallback():
    """Unalignable env counts report (0, _) and the update resolver
    falls back to the XLA twin rather than asserting."""
    bn, _ = pg_tiles(16, 100)     # N = 100: no 128-multiple half
    assert bn == 0
    bn, tc = pg_tiles(200, 4096)  # c3 shapes
    assert bn == 1024 and 4096 % (2 * bn) == 0 and 200 % tc == 0
