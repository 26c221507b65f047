"""Early episode termination with done flags + auto-reset (SURVEY.md
section 2 L4 "episode reset/termination").

Semantics: dones (N,T) marks steps whose POST-step state ended the
episode (success: |p_ee - p_tgt| < done_dist, and always t = T-1). The
env auto-resets, so every buffer slot is a valid sample; GAE breaks
trajectories at the done flags. Oracle and engine implement identical
update math — parity is enforced on a shared batch below.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from oracle import net as onet
from oracle.trpo import (OracleEnv, collect_rollouts, gae as ogae,
                         trpo_update as oracle_update)
from trpo_robot_control_tpu.configs import C1_REACHER2
from trpo_robot_control_tpu.envs import arm
from trpo_robot_control_tpu.models import policy as jpolicy
from trpo_robot_control_tpu.ops.gae import gae as jgae
from trpo_robot_control_tpu.trpo.update import trpo_update as jax_update

CFG = C1_REACHER2.replace(n_envs=24, horizon=30, done_dist=0.25)


def _episode_split_gae(r, v, dones, gamma, lam):
    """Brute-force per-episode GAE: split one env's row at done flags,
    run textbook GAE on each episode independently (terminal at its own
    end), and stitch back."""
    T = r.shape[0]
    adv = np.zeros(T)
    start = 0
    for t in range(T):
        if dones[t] > 0.5 or t == T - 1:
            rs, vs = r[start:t + 1], v[start:t + 1]
            L = t + 1 - start
            a = np.zeros(L)
            next_a, next_v = 0.0, 0.0
            for k in range(L - 1, -1, -1):
                nonterm = 0.0 if k == L - 1 else 1.0
                delta = rs[k] + gamma * next_v * nonterm - vs[k]
                next_a = delta + gamma * lam * nonterm * next_a
                a[k] = next_a
                next_v = vs[k]
            adv[start:t + 1] = a
            start = t + 1
    return adv


def test_gae_dones_brute_force():
    rng = np.random.RandomState(0)
    N, T = 5, 23
    r = rng.standard_normal((N, T))
    v = rng.standard_normal((N, T))
    dones = (rng.uniform(size=(N, T)) < 0.15).astype(np.float64)
    dones[:, -1] = 1.0
    a_j = np.asarray(jgae(jnp.asarray(r, jnp.float32),
                          jnp.asarray(v, jnp.float32), 0.99, 0.95,
                          dones=jnp.asarray(dones, jnp.float32)))
    for i in range(N):
        expect = _episode_split_gae(r[i], v[i], dones[i], 0.99, 0.95)
        np.testing.assert_allclose(a_j[i], expect, atol=1e-4)


def test_gae_dones_matches_oracle():
    rng = np.random.RandomState(1)
    N, T = 6, 17
    r = rng.standard_normal((N, T))
    v = rng.standard_normal((N, T))
    dones = (rng.uniform(size=(N, T)) < 0.2).astype(np.float64)
    dones[:, -1] = 1.0
    a_o = ogae(r, v, 0.99, 0.95, dones=dones)
    a_j = np.asarray(jgae(jnp.asarray(r, jnp.float32),
                          jnp.asarray(v, jnp.float32), 0.99, 0.95,
                          dones=jnp.asarray(dones, jnp.float32)))
    np.testing.assert_allclose(a_j, a_o, atol=1e-5)


def test_oracle_collect_terminates_and_resets():
    rng = np.random.RandomState(2)
    env = OracleEnv(CFG)
    params = onet.init_params(rng, CFG.arm.obs_dim, CFG.arm.n_joints,
                              CFG.trpo.hidden, CFG.trpo.logstd_init)
    batch = collect_rollouts(CFG, env, params, rng)
    dones = batch["dones"]
    assert dones.shape == (CFG.n_envs, CFG.horizon)
    assert np.all(dones[:, -1] == 1.0)
    # generous done_dist: some EARLY termination must occur
    assert dones[:, :-1].sum() > 0


def test_engine_rollout_emits_dones_and_resets():
    key = jax.random.PRNGKey(0)
    params = jpolicy.init_params(key, CFG.arm.obs_dim, CFG.arm.n_joints,
                                 CFG.trpo.hidden, CFG.trpo.logstd_init)
    fn = arm.make_rollout_fn(CFG)
    batch = jax.jit(lambda p, k: fn(p, k))(params, jax.random.PRNGKey(3))
    dones = np.asarray(batch["dones"])
    assert dones.shape == (CFG.n_envs, CFG.horizon)
    assert np.all(dones[:, -1] == 1.0)
    assert dones[:, :-1].sum() > 0
    # after an early done the env must have been reset: the target-delta
    # component of the NEXT obs jumps (fresh target), far beyond one dt
    obs = np.asarray(batch["obs"])
    n = CFG.arm.n_joints
    tgt_delta = obs[..., 3 * n:3 * n + 3]
    early = np.argwhere(dones[:, :-1] > 0.5)
    assert len(early) > 0
    jumps = [np.linalg.norm(tgt_delta[i, t + 1] - tgt_delta[i, t])
             for i, t in early]
    assert np.median(jumps) > 0.05, np.median(jumps)


@pytest.mark.parametrize("seed", [0, 1])
def test_termination_update_parity(seed):
    """Oracle and engine produce the same natural-gradient update on a
    shared early-termination batch (SURVEY.md section 4.8 contract)."""
    rng = np.random.RandomState(seed)
    env = OracleEnv(CFG)
    params_o = onet.init_params(rng, CFG.arm.obs_dim, CFG.arm.n_joints,
                                CFG.trpo.hidden, CFG.trpo.logstd_init)
    batch = collect_rollouts(CFG, env, params_o, rng)
    assert batch["dones"][:, :-1].sum() > 0
    w0 = np.zeros(2 * CFG.arm.obs_dim + 4)
    _, _, st_o = oracle_update(CFG, params_o, w0, batch)

    params_j = {k: jnp.asarray(v, jnp.float32) for k, v in params_o.items()}
    batch_j = {k: jnp.asarray(v, jnp.float32) for k, v in batch.items()}
    _, _, st_j = jax.jit(lambda p, w, b: jax_update(
        CFG, p, w, b, return_directions=True))(
        params_j, jnp.asarray(w0, jnp.float32), batch_j)

    x_j = np.asarray(st_j["x"], np.float64)
    cos = float(x_j @ st_o["x"] /
                (np.linalg.norm(x_j) * np.linalg.norm(st_o["x"]) + 1e-30))
    assert cos > 0.999, cos
    beta_rel = abs(float(st_j["beta"]) - st_o["beta"]) / st_o["beta"]
    assert beta_rel < 2e-3, beta_rel
    assert int(st_j["accepted"]) == st_o["accepted"]


def test_termination_training_improves():
    """A config with early termination trains end-to-end (engine)."""
    from trpo_robot_control_tpu.trpo.train import train
    cfg = C1_REACHER2.replace(n_envs=32, horizon=40, done_dist=0.1)
    _, hist = train(cfg, n_iters=8, seed=0)
    first, last = hist[0]["mean_return"], hist[-1]["mean_return"]
    assert np.isfinite(last)
    assert last > first, (first, last)