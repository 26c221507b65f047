"""End-to-end JAX engine training tests (SURVEY.md section 6.5) on the CPU
backend with small configs: return improves, KL constraint respected,
checkpoint/resume is bit-deterministic.
"""
import numpy as np
import pytest

import jax

from trpo_robot_control_tpu.configs import C1_REACHER2
from trpo_robot_control_tpu.trpo.train import (init_state, make_train_step,
                                               train)
from trpo_robot_control_tpu.utils.checkpoint import (load_checkpoint,
                                                     save_checkpoint)

CFG = C1_REACHER2.replace(n_envs=32, horizon=40)


def test_training_improves_return():
    _, hist = train(CFG, n_iters=12, seed=0)
    first = np.mean([h["mean_return"] for h in hist[:3]])
    last = np.mean([h["mean_return"] for h in hist[-3:]])
    assert last > first, (first, last)
    accepted = [h for h in hist if h["accepted"] >= 0]
    assert len(accepted) >= len(hist) - 2     # almost every step accepted
    assert all(h["kl"] <= CFG.trpo.delta + 1e-6 for h in accepted)


@pytest.mark.slow
def test_long_training_no_linesearch_stall():
    """Regression: near-converged policies drive cond(Phi^T Phi) past the
    fp32 Cholesky cliff; a NaN baseline fit used to freeze the line
    search permanently (accepted = -1 forever). The eigh-based solve
    (models/baseline.py:fit_normal) must keep every step accepted."""
    cfg = C1_REACHER2.replace(n_envs=64, horizon=40)
    _, hist = train(cfg, n_iters=60, seed=0)
    rejects = [h for h in hist if h["accepted"] < 0]
    assert not rejects, f"{len(rejects)} rejected steps"
    assert all(np.isfinite(h["beta"]) for h in hist)
    first = np.mean([h["mean_return"] for h in hist[:5]])
    last = np.mean([h["mean_return"] for h in hist[-5:]])
    assert last > first


def test_checkpoint_resume_deterministic(tmp_path):
    # donate=False so states stay readable for checkpoints mid-run
    step = make_train_step(CFG, donate=False)
    state = init_state(CFG, seed=1)
    for _ in range(3):
        state, _ = step(state)
    path = save_checkpoint(str(tmp_path), CFG, state)

    state_a, _ = step(state)
    restored = load_checkpoint(path, CFG)
    state_b, _ = step(restored)

    flat_a = jax.tree_util.tree_leaves(state_a.params)
    flat_b = jax.tree_util.tree_leaves(state_b.params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(state_a.key),
                                  np.asarray(state_b.key))


def test_config_hash_mismatch_rejected(tmp_path):
    state = init_state(CFG, seed=2)
    path = save_checkpoint(str(tmp_path), CFG, state)
    other = CFG.replace(horizon=CFG.horizon + 1)
    try:
        load_checkpoint(path, other)
        raise AssertionError("expected ValueError on config hash mismatch")
    except ValueError:
        pass
