"""Pallas TPU kernel: fused surrogate policy gradient at theta_old.

This fuses the engine's largest update-side block (the reference's
"policy backward" half of the accelerated pipeline — SURVEY.md section 3
"MaxJ DFE kernel(s)": the DFE streamed the MLP forward AND backward over
the batch; our FVP kernel covers the curvature matvec, this kernel
covers the policy-gradient backward). At theta_old the likelihood ratio
is identically 1, so the surrogate gradient has the closed form

    u      = adv * (a - mu) * inv_var / B          (d logp / d mu)
    gW_l   = h_{l-1} u_l^T   (backprop through the tanh MLP)
    glogstd_j = mean_b[ adv * (z_j^2 - 1) ],  z = (a - mu)/sigma

(models/policy.py:surrogate_grad_ff — the correctness twin). The XLA
form materialises the (T, h, N) hidden activations to HBM, re-reads
them for the three gW contractions, and streams five full-batch
matmuls through separate HBM passes — measured 2.8 ms at c3 /
~36 ms at c5, the single largest attributed update-side term
(docs/performance.md, scripts/ablate_c5_update.py). This kernel reads
obs/act/adv ONCE and keeps every intermediate — activations, mu,
cotangents — in VMEM; only mu and logp_old (needed later by the line
search) are written back.

LAYOUT: consumes the rollout kernels' native feature-first (T, d, N)
batch directly — no relayout. Envs stream through the LANE dimension;
the two halves of each 2*bn lane block are folded onto sublanes
(rollout_kernel.py:_policy_ff_pack2's move) against trace-time
block-diagonal weights, so every matmul streams bn lanes for 2*bn
samples with 128-wide stationary operands. The per-layer gradient
accumulators use the moments kernel's tricks: a ones-row appended to
the activation operand makes ONE lanes-contracting dot deliver gW and
gb together; the layer-2 dot's rhs is widened with the logstd
integrand (stationary cols 16 -> 32, free) so glogstd rides the same
pass; and accumulators ROTATE over n_acc slots so consecutive
timesteps' dots overlap instead of chaining on the ~175-cycle matmul
latency (scripts/probe_mxu_lanes.py).

Grid: (N/(2bn) lane tiles, T/tc time chunks), tc timesteps statically
unrolled per step. Accumulators persist in VMEM scratch across the
whole grid (zeroed at the first step, emitted at the last); mu/logp
blocks are written every step.

Storage dtypes: obs/act arrive in trpo.ff_store_dtype (bf16 on c3-c5).
Matmul operands stay in that dtype with fp32 accumulation, and the
backward cotangent is rounded to it between layers — the same rounding
points as the twin's store_dtype path. mu and logp_old are emitted
fp32. fp32 mode is exact vs the twin in interpret mode; bf16 mode is
bounded (tests/test_pallas_pg.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models import policy as policy_mod

LOG2PI = 1.8378770664093453


def _round8(x: int) -> int:
    return ((x + 7) // 8) * 8


def _bd_pad(a, in_pad, out_pad):
    """Padded block_diag(a, a): (m, n) -> (2*in_pad, 2*out_pad) with a
    at [:m, :n] and [in_pad:in_pad+m, out_pad:out_pad+n]."""
    m, n = a.shape
    z = jnp.zeros((2 * in_pad, 2 * out_pad), a.dtype)
    return z.at[:m, :n].set(a).at[in_pad:in_pad + m,
                                  out_pad:out_pad + n].set(a)


def _col2(v, pad):
    """(d,) -> (2*(d+pad), 1) column with v twice, pad rows zero."""
    d = v.shape[0]
    z = jnp.zeros((2 * (d + pad), 1), v.dtype)
    return z.at[:d, 0].set(v).at[d + pad:d + pad + d, 0].set(v)


def pg_tiles(T: int, N: int, block_n=None, t_chunk=None):
    """Pick (bn, tc): bn lanes per packed half (the kernel loads 2*bn
    lanes per block), tc unrolled timesteps. (0, _) when N has no
    aligned tile (caller falls back to the XLA twin)."""
    from .moments_kernel import _largest_divisor
    half = _largest_divisor(N // 2, 1024, 128) if N % 256 == 0 else 0
    bn = block_n or half
    tc = t_chunk or _largest_divisor(T, 8, 1) or 1
    return bn, tc


def tiles_ok(T: int, N: int, params) -> bool:
    """Single eligibility predicate for the lane-packed ff kernels
    (this one and fvp_ff_kernel): an aligned (bn, tc) tile exists AND
    every layer width fits the 64-column pack2 fold. The kernels
    re-assert the same conditions; update.py's resolvers call this to
    fall back to the XLA twins instead of tripping those asserts."""
    bn, tc = pg_tiles(T, N)
    if not (bn and N % (2 * bn) == 0 and T % tc == 0):
        return False
    L = policy_mod.n_layers(params) - 1
    widths = [params["W0"].shape[0], params[f"W{L}"].shape[1]] \
        + [params[f"W{l}"].shape[1] for l in range(L)]
    return max(widths) <= 64


def _fold2(m, pad, cdtype):
    """(r, 2*bn) -> (2*(r+pad), bn): lane halves onto sublane blocks
    (concat, not DUS — Mosaic has no in-kernel DUS when compiled)."""
    half = m.shape[1] // 2
    parts = [m[:, :half]]
    if pad:
        z = jnp.zeros((pad, half), m.dtype)
        parts.append(z)
    parts.append(m[:, half:])
    if pad:
        parts.append(z)
    return jnp.concatenate(parts, axis=0).astype(cdtype)


def _pg_kernel(L, tc, n_acc, do, da, cdtype, *refs):
    """refs (inputs): obs (tc, do, 2bn), act (tc, da, 2bn),
    adv (tc, 1, 2bn) f32, Wf[0..L] = bd(W_l) (2in_p, 2out_p) for the
    forward's dim-0 contraction (W^T h without a transpose — the
    rollout kernels' move), Wr[1..L] = bd(W_l^T) (2out_p, 2in_p) for
    the backward's dim-0 contraction (W ct), bcol[0..L],
    ivcol (2dap, 1) f32, maskcol (2dap, 1) f32, binv (1, 1) f32 SMEM;
    (outputs): mu (tc, da, 2bn) f32, logp (tc, 1, 2bn) f32,
    M[0..L] packed gradient mats f32;
    (scratch): acc[l] (n_acc, rows_l, cols_l) f32."""
    it = iter(refs)
    obs_ref, act_ref, adv_ref = next(it), next(it), next(it)
    Wf = [next(it) for _ in range(L + 1)]
    Wr = [next(it) for _ in range(L)]          # layers 1..L
    bcol = [next(it) for _ in range(L + 1)]
    ivcol = next(it)
    maskcol = next(it)
    binv = next(it)
    mu_ref, logp_ref = next(it), next(it)
    M = [next(it) for _ in range(L + 1)]
    acc = [next(it) for _ in range(L + 1)]

    i, j = pl.program_id(0), pl.program_id(1)
    ni, nj = pl.num_programs(0), pl.num_programs(1)
    dop = _round8(do)
    dap = _round8(da)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _zero():
        for r in acc:
            r[:] = jnp.zeros_like(r)

    bn = obs_ref.shape[-1] // 2
    ones_row = jnp.ones((1, bn), cdtype)
    f32 = jnp.float32

    def dot(a, b):
        return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    def dot_lanes(a, b):
        return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                   preferred_element_type=f32)

    for t in range(tc):                        # static unroll
        x2 = _fold2(obs_ref[t], dop - do, cdtype)       # (2dop, bn)
        a2 = _fold2(act_ref[t], dap - da, cdtype)       # (2dap, bn)
        adv_t = adv_ref[t].astype(f32)                  # (1, 2bn)
        adv2 = jnp.concatenate([adv_t[:, :bn], adv_t[:, bn:]],
                               axis=0)                  # (2, bn)

        # forward: dim-0 contraction of bd(W) (2in, 2out) with
        # h (2in, bn) computes W^T h with W stored untransposed
        hs2 = []
        h = x2
        for l in range(L):
            z = dot(Wf[l][:], h) + bcol[l][:]
            h = jnp.tanh(z).astype(cdtype)
            hs2.append(h)
        mu2 = dot(Wf[L][:], hs2[L - 1]) + bcol[L][:]    # (2dap, bn) f32

        # per-sample stats (fp32, VPU): z^2*iv, logp, cotangents
        diff = a2.astype(f32) - mu2                     # pad rows 0
        sq_iv = diff * diff * ivcol[:]
        # emit only the batch-dependent -0.5*sum_j z_j^2; the caller
        # subtracts the constant (sum logstd + 0.5*da*log 2pi) outside
        s_top = jnp.sum(sq_iv[:dap], axis=0, keepdims=True)
        s_bot = jnp.sum(sq_iv[dap:], axis=0, keepdims=True)
        logp_ref[t] = -0.5 * jnp.concatenate([s_top, s_bot], axis=1)

        # mu out: unfold (2dap, bn) -> (da, 2bn)
        mu_ref[t] = jnp.concatenate([mu2[:da], mu2[dap:dap + da]],
                                    axis=1)

        # cotangent u = adv/B * diff * iv  (pad rows stay 0)
        advB = adv2 * binv[0, 0]                        # (2, bn)
        adv_rows = jnp.concatenate(
            [jnp.broadcast_to(advB[:1], (dap, bn)),
             jnp.broadcast_to(advB[1:], (dap, bn))], axis=0)
        u = adv_rows * diff * ivcol[:]                  # (2dap, bn) f32
        # logstd integrand: adv/B * (z^2 - 1) on real rows
        dls = adv_rows * (sq_iv - maskcol[:])           # (2dap, bn)

        # layer L accumulator: lhs [h_{L-1}; 1], rhs [u | dls] widened
        lhsL = jnp.concatenate([hs2[L - 1], ones_row], axis=0)
        rhsL = jnp.concatenate([u, dls], axis=0).astype(cdtype)
        acc[L][t % n_acc] += dot_lanes(lhsL, rhsL)

        # backward through hidden layers: Wr[l] = bd(W_{l+1}^T), so the
        # dim-0 contraction with g (2out, bn) computes W ct
        g = u.astype(cdtype)
        for l in range(L - 1, -1, -1):
            th = hs2[l].astype(f32)
            g = (dot(Wr[l][:], g) * (1.0 - th * th)).astype(cdtype)
            lhs = jnp.concatenate([x2 if l == 0 else hs2[l - 1],
                                   ones_row], axis=0)
            acc[l][t % n_acc] += dot_lanes(lhs, g)

    @pl.when(jnp.logical_and(i == ni - 1, j == nj - 1))
    def _emit():
        for l in range(L + 1):
            M[l][:] = jnp.sum(acc[l][:], axis=0)


def pallas_surrogate_grad_ff(params, obs_ff, act_ff, adv_ff,
                             block_n=None, t_chunk=None,
                             interpret: bool = False):
    """Drop-in for models/policy.py:surrogate_grad_ff (same returns:
    (g_tree, mu_ff (T, da, N) f32, logp_old (T, N) f32)). obs_ff/act_ff
    in the storage dtype (their dtype is the kernel's stream dtype),
    adv_ff (T, N) fp32."""
    L = policy_mod.n_layers(params) - 1
    assert L >= 1
    T, do, N = obs_ff.shape
    da = act_ff.shape[1]
    B = T * N
    bn, tc = pg_tiles(T, N, block_n, t_chunk)
    assert bn and N % (2 * bn) == 0 and T % tc == 0, (
        "pallas_surrogate_grad_ff needs N %% (2*bn) == 0 and T %% tc "
        f"== 0; got T={T}, N={N}, bn={bn}, tc={tc} — use the XLA twin")
    cdtype = obs_ff.dtype
    f32 = jnp.float32
    dop, dap = _round8(do), _round8(da)
    hidden = [params[f"W{l}"].shape[1] for l in range(L)]
    assert max([do, da] + hidden) <= 64, "pack2 fold needs widths <= 64"
    hp = [_round8(h) for h in hidden]

    # padded half-widths per layer l: (in, out)
    dims = [(dop if l == 0 else hp[l - 1],
             hp[l] if l < L else dap) for l in range(L + 1)]

    logstd = params["logstd"]
    inv_var = jnp.exp(-2.0 * logstd)
    # fwd: bd(W) contracted over dim 0; bwd: bd(W^T) (layers 1..L)
    Wf = [_bd_pad(params[f"W{l}"].astype(cdtype),
                  dims[l][0], dims[l][1]) for l in range(L + 1)]
    Wr = [_bd_pad(params[f"W{l}"].T.astype(cdtype),
                  dims[l][1], dims[l][0]) for l in range(1, L + 1)]
    bcol = [_col2(params[f"b{l}"].astype(f32),
                  dims[l][1] - params[f"b{l}"].shape[0])
            for l in range(L + 1)]
    ivcol = _col2(inv_var.astype(f32), dap - da)
    maskcol = _col2(jnp.ones((da,), f32), dap - da)
    binv = jnp.array([[1.0 / B]], dtype=f32)

    grid = (N // (2 * bn), T // tc)

    def batch_spec(d):
        return pl.BlockSpec((tc, d, 2 * bn), lambda i, j: (j, 0, i),
                            memory_space=pltpu.VMEM)

    def full_spec(shape):
        return pl.BlockSpec(shape, lambda i, j: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    n_acc = min(8, tc)
    # packed gradient mats: rows = 2*in_pad + 1 (ones row), cols =
    # 2*out_pad (layer L: widened to 4*dap for the logstd block)
    M_shapes = [(2 * dims[l][0] + 1,
                 2 * dims[l][1] * (2 if l == L else 1))
                for l in range(L + 1)]

    in_specs = (
        [batch_spec(do), batch_spec(da),
         pl.BlockSpec((tc, 1, 2 * bn), lambda i, j: (j, 0, i),
                      memory_space=pltpu.VMEM)]
        + [full_spec(w.shape) for w in Wf]
        + [full_spec(w.shape) for w in Wr]
        + [full_spec(b.shape) for b in bcol]
        + [full_spec(ivcol.shape), full_spec(maskcol.shape),
           pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                        memory_space=pltpu.SMEM)]
    )
    out_specs = (
        [batch_spec(da),
         pl.BlockSpec((tc, 1, 2 * bn), lambda i, j: (j, 0, i),
                      memory_space=pltpu.VMEM)]
        + [full_spec(s) for s in M_shapes]
    )
    out_shape = (
        [jax.ShapeDtypeStruct((T, da, N), f32),
         jax.ShapeDtypeStruct((T, 1, N), f32)]
        + [jax.ShapeDtypeStruct(s, f32) for s in M_shapes]
    )
    scratch = [pltpu.VMEM((n_acc,) + s, f32) for s in M_shapes]

    kernel = functools.partial(_pg_kernel, L, tc, n_acc, do, da,
                               cdtype)
    outs = pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, scratch_shapes=scratch,
        interpret=interpret,
    )(obs_ff, act_ff, adv_ff[:, None, :].astype(f32),
      *Wf, *Wr, *bcol, ivcol, maskcol, binv)

    mu = outs[0]
    logp = outs[1][:, 0, :] - (jnp.sum(logstd) + 0.5 * da * LOG2PI)
    Ms = outs[2:]

    g = {}
    for l in range(L + 1):
        ip, op = dims[l]
        m = do if l == 0 else hidden[l - 1]
        n = da if l == L else hidden[l]
        Mp = Ms[l]
        # fold the two packed halves; transpose back to (in, out)
        gW = Mp[:m, :n] + Mp[ip:ip + m, op:op + n]
        g[f"W{l}"] = gW
        g[f"b{l}"] = Mp[2 * ip, :n] + Mp[2 * ip, op:op + n]
    # layer-L rhs was [u | dls]: logstd block sits in cols 2*dap:
    MpL = Ms[L]
    ipL, opL = dims[L]
    base = 2 * opL
    g["logstd"] = (MpL[2 * ipL, base:base + da]
                   + MpL[2 * ipL, base + opL:base + opL + da])
    return g, mu, logp
