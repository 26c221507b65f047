"""Feature-first baseline pipeline (models/baseline.py:features_ff +
the obs_ff path in trpo/update.py): identical results to the standard
layout up to fp32 reassociation. The fused rollout kernels emit obs_ff
natively; here it is synthesised by transposing a scan-path batch."""
import numpy as np

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from trpo_robot_control_tpu.configs import C1_REACHER2
from trpo_robot_control_tpu.envs import arm
from trpo_robot_control_tpu.models import baseline, policy
from trpo_robot_control_tpu.trpo.train import init_state
from trpo_robot_control_tpu.trpo.update import trpo_update

CFG = C1_REACHER2.replace(n_envs=32, horizon=20)


def test_features_ff_matches_features():
    obs = jax.random.normal(jax.random.PRNGKey(0), (8, 20, 9))
    phi = baseline.features(obs, CFG.horizon)            # (N, T, F)
    phi_ff = baseline.features_ff(jnp.transpose(obs, (1, 2, 0)),
                                  CFG.horizon)           # (T, F, N)
    np.testing.assert_allclose(np.asarray(jnp.transpose(phi_ff,
                                                        (2, 0, 1))),
                               np.asarray(phi), rtol=1e-6, atol=1e-7)


def test_update_with_obs_ff_matches_standard():
    state = init_state(CFG, seed=0)
    batch = jax.jit(lambda p, k: arm.rollout(CFG, p, policy.sample, k))(
        state.params, jax.random.PRNGKey(42))
    p1, w1, st1 = jax.jit(lambda p, w, b: trpo_update(CFG, p, w, b))(
        state.params, state.w, batch)

    batch_ff = dict(batch)
    batch_ff["obs_ff"] = jnp.transpose(batch["obs"], (1, 2, 0))
    batch_ff["actions_ff"] = jnp.transpose(batch["actions"], (1, 2, 0))
    p2, w2, st2 = jax.jit(lambda p, w, b: trpo_update(CFG, p, w, b))(
        state.params, state.w, batch_ff)

    th1, _ = ravel_pytree(p1)
    th2, _ = ravel_pytree(p2)
    np.testing.assert_allclose(np.asarray(th1), np.asarray(th2),
                               rtol=2e-3, atol=2e-4)
    assert int(st1["accepted"]) == int(st2["accepted"])
    np.testing.assert_allclose(float(st1["beta"]), float(st2["beta"]),
                               rtol=2e-3)
    # baseline weights in prediction space (same freedom as test_parity)
    phi = np.asarray(baseline.features(batch["obs"], CFG.horizon))
    v1 = phi @ np.asarray(w1)
    v2 = phi @ np.asarray(w2)
    scale = np.abs(v1).mean() + 1e-6
    assert np.abs(v1 - v2).max() / scale < 2e-2
