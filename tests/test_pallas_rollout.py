"""Fused planar rollout kernel vs its twins (SURVEY.md section 6.3):

1. feature-first closed-form dynamics (rollout_reference) == the generic
   RNEA path (envs/arm.py) given identical initial states and noise;
2. the Pallas kernel (interpret mode) == rollout_reference;
3. PRNG production mode: deterministic per seed, sane statistics.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from trpo_robot_control_tpu.configs import C1_REACHER2, C2_REACHER3
from trpo_robot_control_tpu.envs import arm
from trpo_robot_control_tpu.models import policy
from trpo_robot_control_tpu.ops.pallas.rollout_kernel import (
    pallas_rollout, rollout_reference)


def _setup(cfg, N, seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    params = policy.init_params(k1, cfg.obs_dim, cfg.arm.n_joints,
                                cfg.trpo.hidden, cfg.trpo.logstd_init)
    state0 = arm.reset(cfg, k2, N)
    eps = jax.random.normal(k3, (cfg.horizon, N, cfg.arm.n_joints))
    return params, state0, eps


def _rnea_path_rollout(cfg, params, state0, eps):
    """Standard-path rollout (generic RNEA dynamics) with FIXED noise."""
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


@pytest.mark.parametrize("cfg,N", [(C1_REACHER2.replace(horizon=20), 16),
                                   (C2_REACHER3.replace(horizon=15), 8)])
def test_feature_first_math_matches_rnea_path(cfg, N):
    params, state0, eps = _setup(cfg, N)
    ref = jax.jit(lambda: _rnea_path_rollout(cfg, params, state0, eps))()
    ff = jax.jit(lambda: rollout_reference(cfg, params, state0.q,
                                           state0.qd, state0.tgt, eps))()
    # closed-form planar vs RNEA: same math, different op order (fp32);
    # trajectories compound, so horizons here are short
    np.testing.assert_allclose(np.asarray(ff["obs"]),
                               np.asarray(ref["obs"]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(ff["actions"]),
                               np.asarray(ref["actions"]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(ff["rewards"]),
                               np.asarray(ref["rewards"]), atol=5e-4)


def test_pallas_kernel_matches_reference_interpret():
    cfg = C2_REACHER3.replace(horizon=10)
    N = 256
    params, state0, eps = _setup(cfg, N)
    ref = jax.jit(lambda: rollout_reference(cfg, params, state0.q,
                                            state0.qd, state0.tgt, eps))()
    pal = pallas_rollout(cfg, params, 0, n_envs=N, eps=eps, block_b=128,
                         interpret=True, q0=state0.q, qd0=state0.qd,
                         tgt=state0.tgt)
    for k in ("obs", "actions", "rewards"):
        np.testing.assert_allclose(np.asarray(pal[k]), np.asarray(ref[k]),
                                   atol=1e-5, err_msg=k)


@pytest.mark.tpu
@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="pltpu.prng_seed has no CPU lowering; "
                           "run on TPU (scripts/tpu_checks.py)")
def test_pallas_prng_mode_deterministic_and_sane():
    cfg = C1_REACHER2.replace(horizon=10)
    N = 128
    params, state0, _ = _setup(cfg, N)
    kw = dict(n_envs=N, block_b=128, interpret=False, q0=state0.q,
              qd0=state0.qd, tgt=state0.tgt)
    a = pallas_rollout(cfg, params, 7, **kw)
    b = pallas_rollout(cfg, params, 7, **kw)
    np.testing.assert_array_equal(np.asarray(a["actions"]),
                                  np.asarray(b["actions"]))
    # action noise statistics: actions - mu should be ~N(0, sigma^2)
    ref = rollout_reference(cfg, params, state0.q, state0.qd, state0.tgt,
                            jnp.zeros((cfg.horizon, N, 2)))
    # same states only at t=0; just sanity-check overall spread + finiteness
    assert np.isfinite(np.asarray(a["obs"])).all()
    spread = np.std(np.asarray(a["actions"]))
    assert 0.05 < spread < 5.0, spread
