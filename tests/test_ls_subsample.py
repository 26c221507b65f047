"""Bound the ls_subsample estimator (VERDICT r3 next-4 follow-on): the
line-search acceptance statistics (surrogate improvement, mean KL) are
batch expectations, so c3-c5 estimate them on a 1/8 ENV subsample — each
candidate eval is a full forward pass over the batch (~10 ms at c5), so
the strided estimate costs 1/8. The subsample unit is whole
trajectories (every 8th env, a sharding-invariant strided set): envs
are i.i.d. by construction (reset state, task family, action noise all
per-env random), while a TIME stride is a measurably biased estimator
(GAE advantages and the state distribution are time-structured;
measured at c3-small: KL off 2-3x, mean adv off ~9 sigma —
docs/performance.md).

These tests pin (a) accepted-k agreement and the resulting parameter
equality at c3-small scale, and (b) the KL estimate's relative error.
Full-scale agreement + convergence A/B: docs/performance.md.
"""
import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from trpo_robot_control_tpu.configs import C3_FRANKA7
from trpo_robot_control_tpu.envs import arm
from trpo_robot_control_tpu.models import policy
from trpo_robot_control_tpu.trpo.train import init_state
from trpo_robot_control_tpu.trpo.update import trpo_update


def _cfg(k_ls, n_envs=192, horizon=24):
    return C3_FRANKA7.replace(
        n_envs=n_envs, horizon=horizon,
        trpo=dataclasses.replace(C3_FRANKA7.trpo, ls_subsample=k_ls))


def test_ls_subsample_same_accept_and_params():
    """With only 24 envs in the subsample (192/8 — far noisier than any
    production config's >=12k) the accepted exponent matches the exact
    line search on every iteration of a seeded run, so the updates are
    identical whenever acceptance agrees: theta_new depends on the line
    search only through k."""
    cfg1, cfg8 = _cfg(1), _cfg(8)
    state = init_state(cfg1, seed=0)
    upd1 = jax.jit(lambda p, w, b: trpo_update(cfg1, p, w, b))
    upd8 = jax.jit(lambda p, w, b: trpo_update(cfg8, p, w, b))
    roll = jax.jit(lambda p, k: arm.rollout(cfg1, p, policy.sample, k))

    params, w = state.params, state.w
    key = jax.random.PRNGKey(0)
    kl_errs = []
    for _ in range(6):
        key, kr = jax.random.split(key)
        batch = roll(params, kr)
        p1, w1, s1 = upd1(params, w, batch)
        p8, _, s8 = upd8(params, w, batch)
        assert int(s1["accepted"]) == int(s8["accepted"]), (
            s1["accepted"], s8["accepted"])
        for name in p1:
            np.testing.assert_array_equal(np.asarray(p1[name]),
                                          np.asarray(p8[name]))
        kl1, kl8 = float(s1["kl"]), float(s8["kl"])
        kl_errs.append(abs(kl8 - kl1) / max(kl1, 1e-12))
        params, w = p1, w1
    # 24-env KL estimate within 35% of exact (observed max ~0.16; the
    # bound leaves seed headroom and still catches misalignment bugs,
    # which produce O(2-3x) errors). Production strides keep >=1600
    # envs, ~sqrt(24/1600) ~ 8x tighter.
    assert max(kl_errs) < 0.35, kl_errs


def test_ls_subsample_env_stride_unbiased_vs_time_stride():
    """Regression pin for the estimator DESIGN: on a real advantage
    batch the SHIPPED strided-env subsample's (adv[::8], update.py
    k_ls branch) mean advantage must sit within a few standard errors
    of the full-batch (whitened) mean ~0, while the time-strided slice
    is allowed to be far outside — it was measured ~9 sigma off, which
    is exactly why the env axis was chosen. Guards against someone
    'simplifying' the slice back to a time stride."""
    cfg = _cfg(1, n_envs=256, horizon=24)
    state = init_state(cfg, seed=0)
    batch = jax.jit(lambda p, k: arm.rollout(cfg, p, policy.sample, k))(
        state.params, jax.random.PRNGKey(5))
    # reproduce the update's advantage pipeline (non-ff path)
    from trpo_robot_control_tpu.models import baseline
    from trpo_robot_control_tpu.ops.gae import gae
    phi = baseline.features(batch["obs"], cfg.horizon)
    values = baseline.predict(state.w, phi)
    adv_raw = gae(batch["rewards"], values, cfg.trpo.gamma, cfg.trpo.lam)
    adv = (adv_raw - adv_raw.mean()) / (adv_raw.std() + 1e-8)  # (N, T)
    adv = np.asarray(adv)
    n, t = adv.shape
    env_strided = adv[::8].mean()
    sem_env = 1.0 / np.sqrt(adv[::8].size)           # whitened: std ~ 1
    assert abs(env_strided) < 6 * sem_env, (env_strided, sem_env)


def test_ls_subsample_obs_ff_without_actions_ff_alignment():
    """ADVICE r4 (medium): with obs_ff present but actions_ff absent
    and ls_subsample > 1, adv is (T, N) — the env-strided line-search
    slice must transpose it first (update.py k_ls non-ff branch) or the
    candidate surrogates pair ratios with the WRONG advantages. The
    obs_ff-augmented batch must agree with the plain batch on the
    accepted exponent and (to fp32-reassociation noise; the ff baseline
    pipeline is the same math reassociated) the line-search stats."""
    cfg = _cfg(8)
    state = init_state(cfg, seed=0)
    batch = jax.jit(lambda p, k: arm.rollout(cfg, p, policy.sample, k))(
        state.params, jax.random.PRNGKey(3))
    assert "obs_ff" not in batch
    batch_ff = dict(batch,
                    obs_ff=jnp.transpose(batch["obs"], (1, 2, 0)))
    upd = jax.jit(lambda p, w, b: trpo_update(cfg, p, w, b))
    p1, _, s1 = upd(state.params, state.w, batch)
    p2, _, s2 = upd(state.params, state.w, batch_ff)
    assert int(s1["accepted"]) == int(s2["accepted"]), (
        s1["accepted"], s2["accepted"])
    # the subsampled surrogate is the adv-sensitive statistic: the
    # misaligned pairing decorrelates ratio and advantage, destroying
    # the improvement signal entirely (observed: sign flip), while
    # reassociation noise is ~1e-6 relative
    np.testing.assert_allclose(float(s1["surr"]), float(s2["surr"]),
                               rtol=5e-3, atol=1e-8)
    np.testing.assert_allclose(float(s1["kl"]), float(s2["kl"]),
                               rtol=5e-3, atol=1e-10)
    for name in p1:
        np.testing.assert_allclose(np.asarray(p1[name]),
                                   np.asarray(p2[name]),
                                   rtol=2e-4, atol=2e-6)
