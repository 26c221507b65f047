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
