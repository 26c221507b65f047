"""Fused 3-D rollout kernel vs its twins: component math == generic RNEA
path (which is itself validated against the fp64 oracle and MuJoCo), and
Pallas kernel == jnp twin in interpret mode."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from trpo_robot_control_tpu.configs import (C3_FRANKA7,
                                            C4_FRANKA7_OBSTACLE)
from trpo_robot_control_tpu.envs import arm
from trpo_robot_control_tpu.models import policy
from trpo_robot_control_tpu.ops.pallas.rollout3d_kernel import (
    pallas_rollout3d, rollout3d_reference)


def _setup(cfg, N, seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    params = policy.init_params(k1, cfg.obs_dim, cfg.arm.n_joints,
                                cfg.trpo.hidden, cfg.trpo.logstd_init)
    state0 = arm.reset(cfg, k2, N)
    eps = jax.random.normal(k3, (cfg.horizon, N, cfg.arm.n_joints))
    return params, state0, eps


def _rnea_path_rollout(cfg, params, state0, eps):
    sigma = jnp.exp(params["logstd"])

    def body(state, eps_t):
        o = arm.observe(cfg, state)
        mu = policy.mean_net(params, o)
        a = mu + sigma * eps_t
        state2, r = arm.step(cfg, state, a)
        return state2, (o, a, r)

    _, (obs, act, rew) = jax.lax.scan(body, state0, eps)
    return dict(obs=jnp.swapaxes(obs, 0, 1),
                actions=jnp.swapaxes(act, 0, 1),
                rewards=jnp.swapaxes(rew, 0, 1))


@pytest.mark.parametrize("cfg", [
    C3_FRANKA7.replace(horizon=8),
    C4_FRANKA7_OBSTACLE.replace(horizon=8),     # exercises obstacle cost
])
def test_component_math_matches_rnea_path(cfg):
    N = 8
    params, state0, eps = _setup(cfg, N)
    ref = jax.jit(lambda: _rnea_path_rollout(cfg, params, state0, eps))()
    ff = jax.jit(lambda: rollout3d_reference(cfg, params, state0.q,
                                             state0.qd, state0.tgt,
                                             eps))()
    np.testing.assert_allclose(np.asarray(ff["obs"]),
                               np.asarray(ref["obs"]), atol=5e-4)
    np.testing.assert_allclose(np.asarray(ff["actions"]),
                               np.asarray(ref["actions"]), atol=5e-4)
    np.testing.assert_allclose(np.asarray(ff["rewards"]),
                               np.asarray(ref["rewards"]), atol=2e-3)


def test_pallas3d_kernel_matches_reference_interpret():
    cfg = C3_FRANKA7.replace(horizon=5)
    N = 128
    params, state0, eps = _setup(cfg, N)
    ref = jax.jit(lambda: rollout3d_reference(cfg, params, state0.q,
                                              state0.qd, state0.tgt,
                                              eps))()
    pal = pallas_rollout3d(cfg, params, 0, n_envs=N, eps=eps,
                           block_b=128, interpret=True, q0=state0.q,
                           qd0=state0.qd, tgt=state0.tgt)
    for k in ("obs", "actions", "rewards"):
        np.testing.assert_allclose(np.asarray(pal[k]),
                                   np.asarray(ref[k]), atol=1e-5,
                                   err_msg=k)


def test_pallas3d_kernel_pack2_and_bf16_interpret():
    """CI coverage for the production 3-D kernel modes (VERDICT r3
    missing #1): block_b=256 activates the pair-packed MLP and
    store_dtype=bf16 exercises kernel emission — the c3-c5 shipped
    configuration, previously only tested compiled on-TPU."""
    from trpo_robot_control_tpu.ops.pallas.rollout_kernel import pack2_ok
    cfg = C3_FRANKA7.replace(horizon=5)
    N = 256
    assert pack2_ok(cfg, 256), "c3 shapes must activate pack2 at bb=256"
    params, state0, eps = _setup(cfg, N)
    ref = jax.jit(lambda: rollout3d_reference(cfg, params, state0.q,
                                              state0.qd, state0.tgt,
                                              eps))()
    kw = dict(n_envs=N, eps=eps, block_b=256, interpret=True,
              q0=state0.q, qd0=state0.qd, tgt=state0.tgt)
    pal = pallas_rollout3d(cfg, params, 0, **kw)
    for k in ("obs", "actions", "rewards"):
        np.testing.assert_allclose(np.asarray(pal[k]),
                                   np.asarray(ref[k]), atol=1e-5,
                                   err_msg=k)
    # bf16 emission: same in-kernel fp32 trajectory, rounded once at the
    # store -> bitwise equal to the fp32 run rounded to bf16
    pal16 = pallas_rollout3d(cfg, params, 0, store_dtype=jnp.bfloat16,
                             **kw)
    assert pal16["obs_ff"].dtype == jnp.bfloat16
    assert pal16["actions_ff"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(pal16["obs_ff"]),
        np.asarray(pal["obs_ff"].astype(jnp.bfloat16)))
    np.testing.assert_array_equal(
        np.asarray(pal16["actions_ff"]),
        np.asarray(pal["actions_ff"].astype(jnp.bfloat16)))
    assert pal16["rewards"].dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(pal16["rewards"]),
                                  np.asarray(pal["rewards"]))


def test_pallas3d_chunked_matches_unchunked_interpret():
    """The T-chunked grid (round 4: state carried in VMEM scratch
    across sequential chunk steps so wide tiles fit) must reproduce the
    unchunked kernel bit-for-bit in eps mode — chunk boundaries only
    add exact-trig refreshes, which the tolerance absorbs. Covers the
    multi-task carry (tgt mutated by the track family across chunk
    boundaries)."""
    from trpo_robot_control_tpu.configs import C5_MULTITASK
    cfg = C5_MULTITASK.replace(horizon=8)
    N = 128
    params, state0, eps = _setup(cfg, N)
    kw = dict(n_envs=N, eps=eps, block_b=128, interpret=True,
              q0=state0.q, qd0=state0.qd, tgt=state0.tgt,
              task=state0.task)
    ref = pallas_rollout3d(cfg, params, 0, **kw)
    chk = pallas_rollout3d(cfg, params, 0, t_chunk=4, **kw)
    for k in ("obs", "actions", "rewards"):
        np.testing.assert_allclose(np.asarray(chk[k]),
                                   np.asarray(ref[k]), atol=2e-5,
                                   err_msg=k)


def test_auto_tile3d_choices():
    """Tile/chunk selection: wide chunked tiles for the big shipped
    configs, unchunked fallbacks for terminating/small cases."""
    from trpo_robot_control_tpu.configs import (C3_FRANKA7, C5_MULTITASK)
    from trpo_robot_control_tpu.ops.pallas.rollout3d_kernel import (
        auto_tile3d)
    bb, tc = auto_tile3d(C3_FRANKA7, C3_FRANKA7.n_envs)
    assert bb == 512 and tc is not None and C3_FRANKA7.horizon % tc == 0
    assert tc % 8 == 0                  # no extra trig refreshes
    bb, tc = auto_tile3d(C5_MULTITASK, C5_MULTITASK.n_envs)
    assert bb == 512 and tc is not None
    # terminating: unchunked (in-kernel resets keep the per-step kernel)
    bb, tc = auto_tile3d(C3_FRANKA7.replace(done_dist=0.05), 4096)
    assert tc is None
    # tiny env counts: single small tile, no chunking
    bb, tc = auto_tile3d(C3_FRANKA7.replace(horizon=8), 64)
    assert bb == 64 and tc is None


def test_multitask_component_math_matches_rnea_path():
    """c5: reach/track/push families + task one-hot through the 3-D
    feature-first math vs the generic path."""
    from trpo_robot_control_tpu.configs import C5_MULTITASK
    cfg = C5_MULTITASK.replace(horizon=6)
    N = 12
    params, state0, eps = _setup(cfg, N)
    assert len(set(np.asarray(state0.task))) == 3   # all families present
    ref = jax.jit(lambda: _rnea_path_rollout(cfg, params, state0, eps))()
    ff = jax.jit(lambda: rollout3d_reference(
        cfg, params, state0.q, state0.qd, state0.tgt, eps,
        task=state0.task))()
    np.testing.assert_allclose(np.asarray(ff["obs"]),
                               np.asarray(ref["obs"]), atol=5e-4)
    np.testing.assert_allclose(np.asarray(ff["rewards"]),
                               np.asarray(ref["rewards"]), atol=2e-3)


def test_multitask_pallas_kernel_interpret():
    from trpo_robot_control_tpu.configs import C5_MULTITASK
    cfg = C5_MULTITASK.replace(horizon=4)
    N = 128
    params, state0, eps = _setup(cfg, N)
    ref = jax.jit(lambda: rollout3d_reference(
        cfg, params, state0.q, state0.qd, state0.tgt, eps,
        task=state0.task))()
    pal = pallas_rollout3d(cfg, params, 0, n_envs=N, eps=eps,
                           block_b=128, interpret=True, q0=state0.q,
                           qd0=state0.qd, tgt=state0.tgt,
                           task=state0.task)
    for k in ("obs", "actions", "rewards"):
        np.testing.assert_allclose(np.asarray(pal[k]),
                                   np.asarray(ref[k]), atol=1e-5,
                                   err_msg=k)
