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
