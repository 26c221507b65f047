"""Pallas TPU kernel: fused value-baseline normal-equation moments.

The ff baseline fit needs the Gram/cross moments of the feature vector
phi = [obs, obs^2, t, t^2, t^3, 1] against itself and the regression
targets y (models/baseline.py:normal_eq_ff). The XLA form materialises
v = [obs, obs^2, y] as a (T, 2do+1, N) concat (1.4 GB at c5) and then
reads it twice more (G and C einsums) — measured 10.5 ms at c5 against
a 0.93 ms one-HBM-pass floor, and per-block dots without the concat are
no better (9.0 ms: XLA shares no reads between dots;
scripts/probe_baseline_block.py). This kernel reads obs_ff ONCE.

Key trick: ONE extended Gram delivers every moment. Per timestep the
kernel builds, in VMEM,

    v_ext(t) = [obs_t; obs_t^2; y_t; tau_t * 1]   (2do+5 rows, bn lanes)

where tau_t = (t/h, (t/h)^2, (t/h)^3, 1) broadcasts over the lane
(batch) dimension, and accumulates Gram += v_ext v_ext^T with a
lanes-contracting MXU pass. Blocks of the (2do+5, 2do+5) result:

    [:F2, :F2]      = G   (v-Gram of [obs, obs^2, y] — A data blocks + b)
    [:F2, F2:]      = C   (sum_t rowsum_n(v_t) outer tau_t — A time-cross
                           blocks + b's tau part)
    [F2:, F2:]      = (discarded; the exact fp32 N * tau^T tau is
                       assembled outside, keeping A_tt's conditioning
                       bit-identical to normal_eq_ff)

2do+5 = 59 rows for the 7-DoF configs — under the 64-sublane pad the
extra tau rows are FREE relative to the plain v-Gram. The grid is
(N tiles, T chunks); grid steps are sequential per core, so the Gram
accumulates in VMEM scratch across the whole grid (zeroed at the first
step, emitted at the last — the fvp_kernel pattern). The accumulator
ROTATES over n_acc slots (acc[t % n_acc]) because a single accumulator
chains every MXU pass behind the previous dot's ~175-cycle latency
(scripts/probe_mxu_lanes.py); rotation overlaps them.

Storage dtypes: obs_ff arrives in trpo.ff_store_dtype (bf16 on c3-c5);
y and tau join v_ext in the SAME dtype so the Gram stays one full-width
MXU stream, and every contraction accumulates fp32. Relative to
normal_eq_ff this additionally rounds tau inside C to bf16 (~0.4%,
the same order as the obs/y storage rounding already bounded there);
A_tt stays exact fp32 (assembled outside). Bounds:
tests/test_pallas_moments.py.

Correctness twin: models/baseline.py:normal_eq_ff — equality is
enforced by tests/test_pallas_moments.py in interpret mode (CI) and by
scripts/tpu_checks.py compiled on-chip.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.baseline import _time_features


def _largest_divisor(n, cap, multiple):
    """Largest d <= cap with n % d == 0 and d % multiple == 0 (or 0)."""
    d = min(cap, n)
    d -= d % multiple
    while d >= multiple:
        if n % d == 0:
            return d
        d -= multiple
    return 0


def moments_tiles(T: int, N: int, block_n=None, t_chunk=None):
    """Pick (bn, tc) for pallas_baseline_moments, or (0, _) when N has
    no lane-aligned divisor (caller falls back to the XLA twin)."""
    bn = block_n or _largest_divisor(N, 2048, 128)
    tc = t_chunk or _largest_divisor(T, 8, 1) or 1
    return bn, tc


def _moments_kernel(tc, n_acc, *refs):
    """refs: obs (tc, do, bn), y (tc, 1, bn), tau (tc, 4, 1) -> gram
    (R, R) f32, with acc scratch (n_acc, R, R) f32; R = 2do + 5.

    y and tau ride 3-D blocks so the time chunk sits on the LEADING
    dim: Mosaic constrains only the last two block dims (divisible by
    (8, 128) or equal to the array dims), which tc generally is not."""
    obs_ref, y_ref, tau_ref, out_ref, acc_ref = refs
    i, j = pl.program_id(0), pl.program_id(1)
    ni, nj = pl.num_programs(0), pl.num_programs(1)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    bn = obs_ref.shape[-1]
    for t in range(tc):                       # static unroll
        ot = obs_ref[t]                       # (do, bn)
        yt = y_ref[t]                         # (1, bn)
        taut = tau_ref[t]                     # (4, 1)
        v = jnp.concatenate(
            [ot, ot * ot, yt,
             jnp.broadcast_to(taut, (4, bn)).astype(ot.dtype)], axis=0)
        # fp32 mode: HIGHEST matches the twin's full-precision passes
        # (Mosaic's DEFAULT rounds fp32 operands to bf16 — see
        # normal_eq_ff). bf16 mode must stay DEFAULT: Mosaic rejects
        # an fp32 contract_precision on bf16 operands ("Bad lhs type"),
        # and a bf16 operand stream is already exact per pass.
        prec = (jax.lax.Precision.HIGHEST if v.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)
        acc_ref[t % n_acc] += jax.lax.dot_general(
            v, v, (((1,), (1,)), ((), ())),
            precision=prec,
            preferred_element_type=jnp.float32)

    @pl.when(jnp.logical_and(i == ni - 1, j == nj - 1))
    def _emit():
        out_ref[:] = jnp.sum(acc_ref[:], axis=0)


def pallas_baseline_moments(obs_ff, targets_tn, horizon: int,
                            block_n=None, t_chunk=None,
                            interpret: bool = False):
    """Fused (A, b) for the ridge fit — drop-in for
    models/baseline.py:normal_eq_ff (same feature order, same exact
    fp32 A_tt block). obs_ff (T, do, N) in the storage dtype,
    targets_tn (T, N) fp32."""
    T, do, N = obs_ff.shape
    bn, tc = moments_tiles(T, N, block_n, t_chunk)
    assert bn and N % bn == 0 and T % tc == 0, (
        "pallas_baseline_moments needs a lane-aligned env tile; use "
        f"normal_eq_ff instead (T={T}, N={N}, bn={bn}, tc={tc})")
    dt = obs_ff.dtype
    f32 = jnp.float32
    F2 = 2 * do + 1
    R = F2 + 4

    tau = _time_features(T, horizon, f32)                  # (T, 4)
    tau_3d = tau.astype(dt)[:, :, None]                    # (T, 4, 1)
    y = targets_tn.astype(dt)[:, None, :]                  # (T, 1, N)

    n_acc = min(8, tc)
    grid = (N // bn, T // tc)
    gram = pl.pallas_call(
        functools.partial(_moments_kernel, tc, n_acc),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tc, do, bn), lambda i, j: (j, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, 1, bn), lambda i, j: (j, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, 4, 1), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, R), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, R), f32),
        scratch_shapes=[pltpu.VMEM((n_acc, R, R), f32)],
        interpret=interpret,
    )(obs_ff, y, tau_3d)

    # assembly — identical structure to normal_eq_ff: data blocks and C
    # from the extended Gram, A_tt exact fp32
    C = gram[:F2, F2:]                                     # (F2, 4)
    A_tt = N * (tau.T @ tau)
    F = 2 * do + 4
    A = jnp.zeros((F, F), f32)
    A = A.at[:2 * do, :2 * do].set(gram[:2 * do, :2 * do])
    A = A.at[:2 * do, 2 * do:].set(C[:2 * do])
    A = A.at[2 * do:, :2 * do].set(C[:2 * do].T)
    A = A.at[2 * do:, 2 * do:].set(A_tt)
    b = jnp.concatenate([gram[:2 * do, 2 * do], C[2 * do]])
    return A, b
