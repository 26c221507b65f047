"""Native C++ CPU backend vs the fp64 NumPy oracle (SURVEY.md section 3
"CPU compute implementation" row): shared batches, same flat parameter
layout — the update must agree to fp64 tolerances, and a short training
loop through the native backend must improve return.
"""
import shutil

import numpy as np
import pytest

if shutil.which("g++") is None:
    pytest.skip("no C++ toolchain", allow_module_level=True)

import native
from oracle import net as onet
from oracle.trpo import OracleEnv, collect_rollouts, trpo_update
from trpo_robot_control_tpu.configs import C1_REACHER2

CFG = C1_REACHER2.replace(n_envs=16, horizon=25)


def _params(seed=0):
    rng = np.random.RandomState(seed)
    return onet.init_params(rng, CFG.arm.obs_dim, CFG.arm.n_joints,
                            CFG.trpo.hidden, CFG.trpo.logstd_init), rng


def test_native_update_matches_oracle():
    params, rng = _params()
    env = OracleEnv(CFG)
    batch = collect_rollouts(CFG, env, params, rng)
    w0 = np.zeros(2 * CFG.arm.obs_dim + 4)

    new_o, w_o, st_o = trpo_update(CFG, params, w0.copy(), batch)

    flat = onet.flatten(params)
    flat_n, w_n, st_n = native.update(CFG, flat.copy(), w0.copy(), batch)

    # fp64 vs fp64, same math, possibly different summation order
    np.testing.assert_allclose(st_n["beta"], st_o["beta"], rtol=1e-9)
    assert st_n["accepted"] == st_o["accepted"]
    np.testing.assert_allclose(st_n["kl"], st_o["kl"], rtol=1e-8,
                               atol=1e-12)
    np.testing.assert_allclose(flat_n, onet.flatten(new_o), rtol=1e-8,
                               atol=1e-10)
    np.testing.assert_allclose(w_n, w_o, rtol=1e-6, atol=1e-8)


def test_native_rollout_statistics():
    params, _ = _params(1)
    flat = onet.flatten(params)
    batch = native.rollout(CFG, flat, seed=123)
    assert np.isfinite(batch["obs"]).all()
    assert np.isfinite(batch["rewards"]).all()
    assert (batch["rewards"] <= 0).all()          # negative quadratic cost
    # cos/sin observation channels bounded
    n = CFG.arm.n_joints
    assert np.abs(batch["obs"][..., :2 * n]).max() <= 1.0 + 1e-12
    # determinism
    batch2 = native.rollout(CFG, flat, seed=123)
    np.testing.assert_array_equal(batch["obs"], batch2["obs"])


def test_native_training_improves():
    params, _ = _params(2)
    flat = onet.flatten(params)
    w = np.zeros(2 * CFG.arm.obs_dim + 4)
    returns = []
    for it in range(10):
        batch = native.rollout(CFG, flat, seed=1000 + it)
        flat, w, st = native.update(CFG, flat, w, batch)
        returns.append(st["mean_return"])
        assert st["kl"] <= CFG.trpo.delta + 1e-9
    assert np.mean(returns[-3:]) > np.mean(returns[:3]), returns
