"""Interpret-mode equivalence of the fused baseline-moments kernel
against its jnp twin models/baseline.py:normal_eq_ff (SURVEY.md section
6.3 "every Pallas kernel has a pure-jnp twin"). Compiled-on-TPU checks:
scripts/tpu_checks.py.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from trpo_robot_control_tpu.models import baseline
from trpo_robot_control_tpu.ops.pallas.moments_kernel import (
    moments_tiles, pallas_baseline_moments)


def _batch(T, do, N, seed=0, dtype=jnp.float32):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    obs = jax.random.normal(k1, (T, do, N), jnp.float32).astype(dtype)
    y = 5.0 * jax.random.normal(k2, (T, N), jnp.float32)
    return obs, y


@pytest.mark.parametrize("T,do,N,bn,tc", [
    (16, 24, 256, 128, 8),     # c3-like dims, explicit tiles
    (16, 27, 256, 256, 4),     # c5-like obs dim (multi-task one-hot)
    (10, 11, 128, None, None), # odd obs dim, T with tc=5, auto tiles
    (16, 24, 384, None, None), # N = 3 * 128 (non-power-of-2 tile)
])
def test_moments_matches_twin_fp32(T, do, N, bn, tc):
    obs, y = _batch(T, do, N)
    A_t, b_t = baseline.normal_eq_ff(obs, y, horizon=T)
    A_k, b_k = pallas_baseline_moments(obs, y, horizon=T, block_n=bn,
                                       t_chunk=tc, interpret=True)
    # same math, different reassociation (per-tile MXU accumulation vs
    # one einsum) — fp32 accumulate both sides
    np.testing.assert_allclose(np.asarray(A_k), np.asarray(A_t),
                               rtol=2e-5, atol=2e-3)
    np.testing.assert_allclose(np.asarray(b_k), np.asarray(b_t),
                               rtol=2e-5, atol=2e-3)
    # the A_tt block is assembled identically outside both paths
    np.testing.assert_array_equal(np.asarray(A_k)[2 * do:, 2 * do:],
                                  np.asarray(A_t)[2 * do:, 2 * do:])


def test_moments_bf16_storage_bounded():
    """bf16 storage mode: the kernel additionally rounds tau inside the
    C block (~2^-8 relative, same order as the obs/y storage rounding
    normal_eq_ff already takes). Bound both paths against an exact fp32
    reference on the same data."""
    T, do, N = 16, 24, 512
    obs32, y = _batch(T, do, N, seed=3)
    obs16 = obs32.astype(jnp.bfloat16)
    A_ref, b_ref = baseline.normal_eq_ff(obs32, y, horizon=T)
    A_t, b_t = baseline.normal_eq_ff(obs16, y, horizon=T)
    A_k, b_k = pallas_baseline_moments(obs16, y, horizon=T,
                                       interpret=True)

    def rel(x, ref):
        return np.max(np.abs(np.asarray(x) - np.asarray(ref))) \
            / np.max(np.abs(np.asarray(ref)))

    # kernel error vs exact within 2x the twin's own bf16 rounding error
    assert rel(A_k, A_ref) < 2 * max(rel(A_t, A_ref), 1e-3), (
        rel(A_k, A_ref), rel(A_t, A_ref))
    assert rel(b_k, b_ref) < 2 * max(rel(b_t, b_ref), 1e-3), (
        rel(b_k, b_ref), rel(b_t, b_ref))


def test_moments_fit_agrees_end_to_end():
    """The fitted baseline through kernel moments matches the twin's on
    the quantity the update actually consumes: the PREDICTIONS (raw
    weights can differ along phi's near-null directions, where bf16
    moment noise is amplified by conditioning but predictions move
    ~nothing — the same argument fit_normal's rel_floor rests on)."""
    T, do, N = 16, 24, 256
    obs, y = _batch(T, do, N, seed=7, dtype=jnp.bfloat16)
    reg = 1e-3

    def fit(A, b):
        A = A + reg * jnp.eye(A.shape[0], dtype=A.dtype)
        return baseline.fit_normal(A, b)

    w_t = fit(*baseline.normal_eq_ff(obs, y, horizon=T))
    w_k = fit(*pallas_baseline_moments(obs, y, horizon=T,
                                       interpret=True))
    v_t = np.asarray(baseline.values_ff(w_t, obs, T, tn=True))
    v_k = np.asarray(baseline.values_ff(w_k, obs, T, tn=True))
    scale = max(np.abs(v_t).max(), 1e-6)
    assert np.max(np.abs(v_k - v_t)) / scale < 5e-3, (
        np.max(np.abs(v_k - v_t)), scale)


def test_moments_tiles_fallback():
    """N without a 128-multiple divisor reports bn=0 (caller falls back
    to the XLA twin)."""
    assert moments_tiles(16, 100)[0] == 0
    assert moments_tiles(16, 256) == (128, 8) or \
        moments_tiles(16, 256)[0] in (128, 256)
    bn, tc = moments_tiles(200, 65536)
    assert bn == 2048 and tc == 8
    assert moments_tiles(25, 4096)[1] == 5
