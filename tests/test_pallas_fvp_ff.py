"""Interpret-mode equivalence of the ff-native Gauss-Newton FVP kernel
(ops/pallas/fvp_ff_kernel.py) against ops/fvp.py:make_gn_fvp on the
flattened subsample — the same twin the batch-major kernel is pinned
to (test_pallas_fvp), which is itself checked against the explicit
dense Fisher (test_oracle). Compiled on-chip: scripts/tpu_checks.py.
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from trpo_robot_control_tpu.models.policy import init_params
from trpo_robot_control_tpu.ops.fvp import make_gn_fvp
from trpo_robot_control_tpu.ops.pallas.fvp_ff_kernel import (
    make_pallas_gn_fvp_ff)


def _setup(T, do, da, N, seed=0):
    params = init_params(jax.random.PRNGKey(seed), do, da, (64, 64),
                         -0.5)
    theta, unravel = ravel_pytree(params)
    obs_ff = jax.random.normal(jax.random.PRNGKey(seed + 1),
                               (T, do, N), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(seed + 2), theta.shape)
    return params, unravel, obs_ff, v


@pytest.mark.parametrize("T,do,da,N,bn,tc", [
    (8, 27, 7, 512, None, None),
    (12, 27, 7, 768, 128, 4),     # multi lane-tile, multi chunk
    (25, 24, 7, 512, None, 5),    # c3's strided T' = 25 (odd)
    (10, 9, 2, 256, None, None),  # planar dims
])
def test_fvp_ff_matches_twin_fp32(T, do, da, N, bn, tc):
    params, unravel, obs_ff, v = _setup(T, do, da, N)
    obs_flat = jnp.transpose(obs_ff, (0, 2, 1)).reshape(-1, do)
    f_twin = make_gn_fvp(params, unravel, obs_flat, 0.1)
    f_kern = make_pallas_gn_fvp_ff(params, unravel, obs_ff, 0.1,
                                   block_n=bn, t_chunk=tc,
                                   interpret=True)
    r1, r2 = f_twin(v), f_kern(v)
    err = float(jnp.max(jnp.abs(r1 - r2)) / jnp.max(jnp.abs(r1)))
    assert err < 1e-5, err


def test_fvp_ff_padded_hidden_widths():
    """Non-multiple-of-8 hidden widths through the in-kernel recompute
    + tangent + reverse pipeline (same padding contract as the pg
    kernel's test). Exact vs the twin in fp32."""
    key = jax.random.PRNGKey(12)
    T, do, da, N = 8, 27, 7, 512
    ks = jax.random.split(key, 6)
    h0, h1 = 33, 57
    params = {
        "W0": 0.3 * jax.random.normal(ks[0], (do, h0)),
        "b0": 0.1 * jax.random.normal(ks[1], (h0,)),
        "W1": 0.3 * jax.random.normal(ks[2], (h0, h1)),
        "b1": 0.1 * jax.random.normal(ks[3], (h1,)),
        "W2": 0.3 * jax.random.normal(ks[4], (h1, da)),
        "b2": 0.1 * jax.random.normal(ks[5], (da,)),
        "logstd": -0.5 * jnp.ones((da,)),
    }
    theta, unravel = ravel_pytree(params)
    obs_ff = jax.random.normal(ks[0], (T, do, N), jnp.float32)
    v = jax.random.normal(ks[1], theta.shape)
    obs_flat = jnp.transpose(obs_ff, (0, 2, 1)).reshape(-1, do)
    r1 = make_gn_fvp(params, unravel, obs_flat, 0.1)(v)
    r2 = make_pallas_gn_fvp_ff(params, unravel, obs_ff, 0.1,
                               interpret=True)(v)
    err = float(jnp.max(jnp.abs(r1 - r2)) / jnp.max(jnp.abs(r1)))
    assert err < 1e-5, err


def test_fvp_ff_bf16_bounded():
    """bf16 storage: direction error bounded, cosine ~1 (the CG
    consumer only needs the direction; tolerances mirror the
    batch-major kernel's bf16 mode in test_pallas_fvp)."""
    params, unravel, obs_ff, v = _setup(8, 27, 7, 512)
    o16 = obs_ff.astype(jnp.bfloat16)
    obs_flat = o16.astype(jnp.float32).transpose(0, 2, 1) \
        .reshape(-1, 27)
    f_twin = make_gn_fvp(params, unravel, obs_flat, 0.1)
    f_kern = make_pallas_gn_fvp_ff(params, unravel, o16, 0.1,
                                   interpret=True)
    r1, r2 = f_twin(v), f_kern(v)
    rel = float(jnp.max(jnp.abs(r1 - r2)) / jnp.max(jnp.abs(r1)))
    cos = float(jnp.dot(r1, r2)
                / (jnp.linalg.norm(r1) * jnp.linalg.norm(r2)))
    assert rel < 2e-2, rel
    assert cos > 0.9999, cos


def test_fvp_ff_under_shard_map_equals_unsharded():
    """The ff-native FVP composes with shard_map + pmean: per shard the
    kernel consumes the LOCAL strided subsample, and the psum'd update
    equals the unsharded one (the strided env sets union to the global
    set — same invariance as the batch-major kernel, test_sharding)."""
    from trpo_robot_control_tpu.configs import C1_REACHER2
    from trpo_robot_control_tpu.envs import arm
    from trpo_robot_control_tpu.models import policy
    from trpo_robot_control_tpu.parallel.mesh import (make_mesh,
                                                      make_sharded_update,
                                                      shard_batch)
    from trpo_robot_control_tpu.trpo.train import init_state
    from trpo_robot_control_tpu.trpo.update import trpo_update

    assert len(jax.devices()) == 8, "conftest should fake 8 CPU devices"
    mesh = make_mesh(n_data=8)
    cfg = C1_REACHER2.replace(
        n_envs=2048, horizon=8,
        trpo=dataclasses.replace(C1_REACHER2.trpo, fvp_impl="pallas",
                                 fvp_subsample=8, ff_store_dtype="f32"))
    state = init_state(cfg, seed=0)
    batch = jax.jit(lambda p, k: arm.rollout(cfg, p, policy.sample, k))(
        state.params, jax.random.PRNGKey(6))
    batch = dict(batch,
                 obs_ff=jnp.transpose(batch["obs"], (1, 2, 0)),
                 actions_ff=jnp.transpose(batch["actions"], (1, 2, 0)))
    p1, _, s1 = jax.jit(lambda p, w, b: trpo_update(cfg, p, w, b))(
        state.params, state.w, batch)
    p2, _, s2 = make_sharded_update(cfg, mesh,
                                    batch_keys=tuple(batch))(
        state.params, state.w, shard_batch(mesh, batch))
    th1, _ = ravel_pytree(p1)
    th2, _ = ravel_pytree(p2)
    np.testing.assert_allclose(np.asarray(th1), np.asarray(th2),
                               rtol=2e-3, atol=2e-4)
    assert int(s1["accepted"]) == int(s2["accepted"])


def test_fvp_ff_inside_update_fp32():
    """The ff-native FVP engages inside trpo_update (fvp_impl='pallas',
    ff batch, fvp_subsample stride) and matches the XLA-fvp update:
    same accepted exponent, near-identical parameters."""
    from trpo_robot_control_tpu.configs import C3_FRANKA7
    from trpo_robot_control_tpu.envs import arm
    from trpo_robot_control_tpu.models import policy
    from trpo_robot_control_tpu.trpo.train import init_state
    from trpo_robot_control_tpu.trpo.update import trpo_update

    base = C3_FRANKA7.replace(
        n_envs=256, horizon=24,
        trpo=dataclasses.replace(C3_FRANKA7.trpo, ff_store_dtype="f32",
                                 fvp_impl="xla", fvp_subsample=8))
    cfgk = base.replace(
        trpo=dataclasses.replace(base.trpo, fvp_impl="pallas"))
    state = init_state(base, seed=0)
    batch = jax.jit(lambda p, k: arm.rollout(base, p, policy.sample, k))(
        state.params, jax.random.PRNGKey(4))
    batch = dict(batch,
                 obs_ff=jnp.transpose(batch["obs"], (1, 2, 0)),
                 actions_ff=jnp.transpose(batch["actions"], (1, 2, 0)))
    p1, _, s1 = jax.jit(lambda p, w, b: trpo_update(base, p, w, b))(
        state.params, state.w, batch)
    p2, _, s2 = jax.jit(lambda p, w, b: trpo_update(cfgk, p, w, b))(
        state.params, state.w, batch)
    assert int(s1["accepted"]) == int(s2["accepted"])
    for name in p1:
        np.testing.assert_allclose(np.asarray(p1[name]),
                                   np.asarray(p2[name]),
                                   rtol=1e-4, atol=1e-5)
