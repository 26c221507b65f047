"""Golden-run regression for the oracle (SURVEY.md section 6.1): the
oracle IS the parity contract, so its own seeded trajectory is pinned.
Any change to oracle math, env constants, or RNG consumption order shows
up here as a bit-level diff. Regenerate deliberately with
tests/golden/README instructions if the contract is intentionally
changed.
"""
import os

import numpy as np

from oracle.trpo import train
from trpo_robot_control_tpu.configs import C1_REACHER2

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "oracle_c1_seed0.npz")
GOLDEN_ENGINE = os.path.join(os.path.dirname(__file__), "golden",
                             "engine_c1_seed0.npz")


def test_oracle_matches_golden_run():
    cfg = C1_REACHER2.replace(n_envs=24, horizon=30)
    params, hist = train(cfg, n_iters=8, seed=0)
    g = np.load(GOLDEN)
    np.testing.assert_allclose([h["beta"] for h in hist], g["beta"],
                               rtol=1e-12)
    np.testing.assert_array_equal([h["accepted"] for h in hist],
                                  g["accepted"])
    np.testing.assert_allclose([h["kl"] for h in hist], g["kl"],
                               rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose([h["mean_return"] for h in hist],
                               g["mean_return"], rtol=1e-12)
    np.testing.assert_allclose(params["logstd"], g["logstd"], rtol=1e-12)


def test_engine_matches_golden_run():
    """Seeded JAX-engine training curve pinned the same way (VERDICT r1
    item 9: the loose improvement-ratio convergence test would pass a
    materially worse engine; this would not). fp32 + XLA-version
    tolerance instead of the oracle's fp64 bit tolerance; regenerate via
    tests/golden/README.md when the engine contract changes on purpose."""
    from trpo_robot_control_tpu.trpo.train import train as engine_train
    cfg = C1_REACHER2.replace(n_envs=24, horizon=30)
    state, hist = engine_train(cfg, n_iters=8, seed=0)
    g = np.load(GOLDEN_ENGINE)
    np.testing.assert_array_equal([h["accepted"] for h in hist],
                                  g["accepted"])
    np.testing.assert_allclose([h["beta"] for h in hist], g["beta"],
                               rtol=1e-4)
    np.testing.assert_allclose([h["kl"] for h in hist], g["kl"],
                               rtol=1e-3, atol=1e-8)
    np.testing.assert_allclose([h["mean_return"] for h in hist],
                               g["mean_return"], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(state.params["logstd"]),
                               g["logstd"], rtol=1e-4)
