"""Multi-task env family (config 5: reach / track / push) and the
obstacle cost (config 4) through the standard path, plus a debug-checks
(jax_debug_nans) training smoke (SURVEY.md section 7 "race detection /
sanitizers" row).
"""
import numpy as np

import jax
import jax.numpy as jnp

from trpo_robot_control_tpu.configs import (C4_FRANKA7_OBSTACLE,
                                            C5_MULTITASK, planar_arm)
from trpo_robot_control_tpu.envs import arm
from trpo_robot_control_tpu.trpo.train import train
from trpo_robot_control_tpu.utils.profiling import debug_checks

C5_SMALL = C5_MULTITASK.replace(
    arm=planar_arm(3), n_envs=24, horizon=12,
    cost=C5_MULTITASK.cost.__class__(ctrl_weight=0.01))
C4_SMALL = C4_FRANKA7_OBSTACLE.replace(n_envs=8, horizon=6)


def test_multitask_obs_has_task_onehot():
    assert C5_SMALL.obs_dim == C5_SMALL.arm.obs_dim + 3
    state = arm.reset(C5_SMALL, jax.random.PRNGKey(0), 24)
    obs = arm.observe(C5_SMALL, state)
    assert obs.shape == (24, C5_SMALL.obs_dim)
    onehot = np.asarray(obs[:, -3:])
    np.testing.assert_allclose(onehot.sum(axis=1), 1.0)
    assert set(np.asarray(state.task)) <= {0, 1, 2}
    # with 24 envs all three families should appear
    assert len(set(np.asarray(state.task))) == 3


def test_track_task_moves_target():
    state = arm.reset(C5_SMALL, jax.random.PRNGKey(1), 24)
    state2, _ = arm.step(C5_SMALL, state,
                         jnp.zeros((24, C5_SMALL.arm.n_joints)))
    moved = np.linalg.norm(np.asarray(state2.tgt - state.tgt), axis=1)
    task = np.asarray(state.task)
    assert (moved[task == 1] > 1e-6).all()      # track targets orbit
    assert (moved[task != 1] < 1e-9).all()      # others static


def test_push_task_penalises_velocity_mismatch():
    state = arm.reset(C5_SMALL, jax.random.PRNGKey(2), 24)
    # same physical state, tasks forced to reach vs push
    s_reach = state._replace(task=jnp.zeros(24, jnp.int32))
    s_push = state._replace(task=jnp.full(24, 2, jnp.int32))
    a = jnp.zeros((24, C5_SMALL.arm.n_joints))
    _, r_reach = arm.step(C5_SMALL, s_reach, a)
    _, r_push = arm.step(C5_SMALL, s_push, a)
    # zero torque on a near-static arm violates the push velocity target
    assert float(jnp.mean(r_push)) < float(jnp.mean(r_reach))


def test_obstacle_cost_active():
    state = arm.reset(C4_SMALL, jax.random.PRNGKey(3), 8)
    a = jnp.zeros((8, 7))
    _, r_with = arm.step(C4_SMALL, state, a)
    no_obs = C4_SMALL.replace(
        cost=C4_SMALL.cost.__class__(ctrl_weight=C4_SMALL.cost.ctrl_weight,
                                     obstacle_weight=0.0))
    _, r_without = arm.step(no_obs, state, a)
    # penalty can only decrease reward
    assert float(jnp.max(np.asarray(r_with - r_without))) <= 1e-9


def test_multitask_training_runs_with_debug_checks():
    with debug_checks():
        _, hist = train(C5_SMALL, n_iters=3, seed=0)
    assert all(np.isfinite(h["mean_return"]) for h in hist)
