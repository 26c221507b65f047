"""Parity for the c4/c5 feature set (SURVEY.md section 4.8 extended to
all five driver configs): with the oracle env now covering the obstacle
penalty and the track/push goal families in fp64, the engine's update
must match the oracle's on shared batches for obstacle (c4-small) and
multi-task (c5-small) configs — same contract as tests/test_parity.py.
The two ROLLOUT paths must also agree on the reward function itself,
checked by re-scoring an oracle batch through the engine's env.step.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from oracle import net as onet
from oracle.trpo import OracleEnv, collect_rollouts
from oracle.trpo import trpo_update as oracle_update
from trpo_robot_control_tpu.configs import (C4_FRANKA7_OBSTACLE,
                                            C5_MULTITASK)
from trpo_robot_control_tpu.trpo.update import trpo_update as jax_update

import dataclasses

# parity compares EXACT math (stride-1 FVP, exact line search); the
# driver configs' Fisher / line-search subsamples are separate,
# separately-bounded estimator changes (tests/test_fvp_subsample.py,
# tests/test_ls_subsample.py)
C4 = C4_FRANKA7_OBSTACLE.replace(
    n_envs=12, horizon=20,
    trpo=dataclasses.replace(C4_FRANKA7_OBSTACLE.trpo, fvp_subsample=1,
                             fvp_env_subsample=1,
                             ls_subsample=1))
C5 = C5_MULTITASK.replace(
    n_envs=18, horizon=20,
    trpo=dataclasses.replace(C5_MULTITASK.trpo, fvp_subsample=1,
                             fvp_env_subsample=1,
                             ls_subsample=1))


def _setup(cfg, seed=0):
    rng = np.random.RandomState(seed)
    env = OracleEnv(cfg)
    params = onet.init_params(rng, cfg.obs_dim, cfg.arm.n_joints,
                              cfg.trpo.hidden, cfg.trpo.logstd_init)
    batch = collect_rollouts(cfg, env, params, rng)
    return env, params, batch


def _to_jax(d):
    return {k: jnp.asarray(v, jnp.float32) for k, v in d.items()}


def cosine(a, b):
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))


@pytest.mark.parametrize("cfg", [C4, C5], ids=["c4_obstacle",
                                               "c5_multitask"])
def test_update_parity_c4c5(cfg):
    env, params_o, batch = _setup(cfg)
    w0 = np.zeros(2 * cfg.obs_dim + 4)

    new_o, w_o, st_o = oracle_update(cfg, params_o, w0.copy(), batch)
    upd = jax.jit(lambda p, w, b: jax_update(cfg, p, w, b,
                                             return_directions=True))
    new_j, w_j, st_j = upd(_to_jax(params_o),
                           jnp.asarray(w0, jnp.float32), _to_jax(batch))

    x_j = np.asarray(st_j["x"], np.float64)
    assert cosine(x_j, st_o["x"]) > 0.999
    np.testing.assert_allclose(float(st_j["beta"]), st_o["beta"],
                               rtol=2e-3)
    assert int(st_j["accepted"]) == st_o["accepted"]


@pytest.mark.parametrize("cfg", [C4, C5], ids=["c4_obstacle",
                                               "c5_multitask"])
def test_reward_parity_c4c5(cfg):
    """The engine env's reward (obstacle / track / push terms) must
    reproduce the oracle's: replay the oracle's initial state + actions
    through envs/arm.py:step and compare rewards step for step."""
    from trpo_robot_control_tpu.envs import arm
    rng = np.random.RandomState(1)
    env = OracleEnv(cfg)
    n = cfg.arm.n_joints
    N, T = 8, 10
    q, qd, tgt = env.reset(rng, N)
    acts = 2.0 * rng.standard_normal((T, N, n))

    # oracle trajectory
    rew_o = np.zeros((T, N))
    qo, qdo, tgto = q.copy(), qd.copy(), tgt.copy()
    for t in range(T):
        qo, qdo, tgto, rew_o[t] = env.step(qo, qdo, tgto, acts[t])

    # engine trajectory from the same state/actions/tasks
    task = (jnp.asarray(env.task) if cfg.n_tasks > 1
            else jnp.zeros(N, jnp.int32))
    state = arm.EnvState(q=jnp.asarray(q, jnp.float32),
                         qd=jnp.asarray(qd, jnp.float32),
                         tgt=jnp.asarray(tgt, jnp.float32),
                         task=task)

    @jax.jit
    def run(state, acts):
        def body(s, a):
            s2, r = arm.step(cfg, s, a)
            return s2, r
        return jax.lax.scan(body, state, acts)

    _, rew_j = run(state, jnp.asarray(acts, jnp.float32))
    np.testing.assert_allclose(np.asarray(rew_j), rew_o,
                               rtol=2e-4, atol=2e-4)
