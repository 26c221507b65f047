"""Pallas TPU kernel: Gauss-Newton FVP consuming the feature-first
layout directly, with in-kernel activation recompute.

The batch-major FVP kernel (fvp_kernel.py) needs obs as (B', do) rows,
so the ff update path pays a (T', do, N) -> (B', do) minor-dim
transpose per update (measured 5.1 ms at c5 — probed three
alternatives in round 4, all worse) and re-reads the precomputed
(B', h) fp32 activations from HBM on every one of the ~cg_iters+1
calls (~0.8 GB/call at c5). This kernel removes both costs:

- it consumes the strided obs_ff subsample (T', do, N) AS STORED (no
  relayout, storage dtype reads), streaming envs through the LANE
  dimension with lane halves folded onto sublanes against block-
  diagonal weights (pg_kernel.py's layout — see there for the MXU
  accounting), and
- it RECOMPUTES the two hidden activations in-kernel per call (2 extra
  latency-overlapped matmul passes) instead of materialising them:
  per call HBM drops from (do + 2h) rows fp32 to do rows in the
  storage dtype (~10x at c5), and the once-per-update activation
  precompute disappears entirely.

Math per sample (identical to fvp_kernel.py / ops/fvp.py:make_gn_fvp):
forward-mode tangent dmu = J_mu v through the tanh MLP, Fisher scaling
u = dmu * inv_var / B, reverse accumulation of J^T u. The logstd block
is analytic (2 * dlogstd, batch-independent) and handled outside; the
ones-row trick folds gb into each gW dot; accumulators rotate over
n_acc slots (pg_kernel.py).

Correctness twin: ops/fvp.py:make_gn_fvp on the flattened subsample —
fp32 exact in interpret mode, bf16 bounded (weights join the stream in
the storage dtype); tests/test_pallas_fvp_ff.py, compiled check in
scripts/tpu_checks.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.flatten_util import ravel_pytree

from ...models import policy as policy_mod
from .pg_kernel import _bd_pad, _col2, _fold2, _round8, pg_tiles


def _fvp_ff_kernel(L, tc, n_acc, do, cdtype, *refs):
    """refs (inputs): obs (tc, do, 2bn); Wf[0..L] = bd(W_l); Wr[1..L] =
    bd(W_l^T); bcol[0..L] f32; dWf[0..L] = bd(dW_l); dbcol[0..L] f32;
    scale (2dap, 1) f32 (inv_var / B, pad rows 0);
    (outputs): M[0..L] packed (2in_p+1, 2out_p) f32;
    (scratch): acc[l] (n_acc, ...) f32."""
    it = iter(refs)
    obs_ref = next(it)
    Wf = [next(it) for _ in range(L + 1)]
    Wr = [next(it) for _ in range(L)]
    bcol = [next(it) for _ in range(L + 1)]
    dWf = [next(it) for _ in range(L + 1)]
    dbcol = [next(it) for _ in range(L + 1)]
    scale = next(it)
    M = [next(it) for _ in range(L + 1)]
    acc = [next(it) for _ in range(L + 1)]

    i, j = pl.program_id(0), pl.program_id(1)
    ni, nj = pl.num_programs(0), pl.num_programs(1)
    dop = _round8(do)

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

        # activation recompute (bd(W) dim-0 contraction = W^T h)
        hs2, ts2 = [], []
        h = x2
        for l in range(L):
            z = dot(Wf[l][:], h) + bcol[l][:]
            hf = jnp.tanh(z)
            ts2.append(1.0 - hf * hf)
            h = hf.astype(cdtype)
            hs2.append(h)

        # forward-mode tangent
        a = dot(dWf[0][:], x2) + dbcol[0][:]
        dh = ts2[0] * a
        for l in range(1, L + 1):
            a = (dot(Wf[l][:], dh.astype(cdtype))
                 + dot(dWf[l][:], hs2[l - 1]) + dbcol[l][:])
            if l < L:
                dh = ts2[l] * a
        dmu = a                                          # (2dap, bn)

        u = dmu * scale[:]                               # pad rows -> 0

        # reverse accumulation (ones row folds gb into the gW dot)
        lhsL = jnp.concatenate([hs2[L - 1], ones_row], axis=0)
        acc[L][t % n_acc] += dot_lanes(lhsL, u.astype(cdtype))
        g = u.astype(cdtype)
        for l in range(L - 1, -1, -1):
            g = (dot(Wr[l][:], g) * ts2[l]).astype(cdtype)
            lhs = jnp.concatenate([x2 if l == 0 else hs2[l - 1],
                                   ones_row], axis=0)
            acc[l][t % n_acc] += dot_lanes(lhs, g)

    @pl.when(jnp.logical_and(i == ni - 1, j == nj - 1))
    def _emit():
        for l in range(L + 1):
            M[l][:] = jnp.sum(acc[l][:], axis=0)


def make_pallas_gn_fvp_ff(params, unravel, obs_sub_ff, damping: float,
                          axis_name=None, block_n=None, t_chunk=None,
                          interpret: bool = False):
    """Drop-in for fvp_kernel.py:make_pallas_gn_fvp, but consuming the
    STRIDED ff subsample (T', do, N) in its storage dtype instead of a
    flattened fp32 (B', do). Returns fvp(v_flat) -> damped, pmean'd
    flat Fv."""
    L = policy_mod.n_layers(params) - 1
    assert L >= 1
    Ts, do, N = obs_sub_ff.shape
    da = params[f"W{L}"].shape[1]
    hidden = [params[f"W{l}"].shape[1] for l in range(L)]
    assert max([do, da] + hidden) <= 64, "pack2 fold needs widths <= 64"
    B = Ts * N
    bn, tc = pg_tiles(Ts, N, block_n, t_chunk)
    assert bn and N % (2 * bn) == 0 and Ts % tc == 0, (
        "make_pallas_gn_fvp_ff needs N %% (2*bn) == 0 and T' %% tc == "
        f"0; got T'={Ts}, N={N}, bn={bn}, tc={tc} — use "
        "fvp_kernel.make_pallas_gn_fvp on the flattened subsample")
    cdtype = obs_sub_ff.dtype
    f32 = jnp.float32
    dop, dap = _round8(do), _round8(da)
    hp = [_round8(h) for h in hidden]
    dims = [(dop if l == 0 else hp[l - 1],
             hp[l] if l < L else dap) for l in range(L + 1)]

    inv_var = jnp.exp(-2.0 * params["logstd"])
    Wf = [_bd_pad(params[f"W{l}"].astype(cdtype),
                  dims[l][0], dims[l][1]) for l in range(L + 1)]
    Wr = [_bd_pad(params[f"W{l}"].T.astype(cdtype),
                  dims[l][1], dims[l][0]) for l in range(1, L + 1)]
    bcol = [_col2(params[f"b{l}"].astype(f32),
                  dims[l][1] - params[f"b{l}"].shape[0])
            for l in range(L + 1)]
    scale = _col2((inv_var / B).astype(f32), dap - da)

    grid = (N // (2 * bn), Ts // tc)
    n_acc = min(8, tc)
    M_shapes = [(2 * dims[l][0] + 1, 2 * dims[l][1])
                for l in range(L + 1)]

    def full_spec(shape):
        return pl.BlockSpec(shape, lambda i, j: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    in_specs = (
        [pl.BlockSpec((tc, do, 2 * bn), lambda i, j: (j, 0, i),
                      memory_space=pltpu.VMEM)]
        + [full_spec(w.shape) for w in Wf]
        + [full_spec(w.shape) for w in Wr]
        + [full_spec(b.shape) for b in bcol]
        + [full_spec(w.shape) for w in Wf]       # dWf: same shapes
        + [full_spec(b.shape) for b in bcol]     # dbcol
        + [full_spec(scale.shape)]
    )
    out_specs = [full_spec(s) for s in M_shapes]
    out_shape = [jax.ShapeDtypeStruct(s, f32) for s in M_shapes]
    scratch = [pltpu.VMEM((n_acc,) + s, f32) for s in M_shapes]

    kernel = functools.partial(_fvp_ff_kernel, L, tc, n_acc, do,
                               cdtype)
    call = pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, scratch_shapes=scratch,
        interpret=interpret,
    )

    def fvp(v_flat):
        t = unravel(v_flat)
        dWf = [_bd_pad(t[f"W{l}"].astype(cdtype),
                       dims[l][0], dims[l][1]) for l in range(L + 1)]
        dbcol = [_col2(t[f"b{l}"].astype(f32),
                       dims[l][1] - t[f"b{l}"].shape[0])
                 for l in range(L + 1)]
        Ms = call(obs_sub_ff, *Wf, *Wr, *bcol, *dWf, *dbcol, scale)
        g_tree = {}
        for l in range(L + 1):
            ip, op = dims[l]
            m = do if l == 0 else hidden[l - 1]
            n = da if l == L else hidden[l]
            Mp = Ms[l]
            g_tree[f"W{l}"] = Mp[:m, :n] + Mp[ip:ip + m, op:op + n]
            g_tree[f"b{l}"] = Mp[2 * ip, :n] + Mp[2 * ip, op:op + n]
        g_tree["logstd"] = 2.0 * t["logstd"]
        gv_flat, _ = ravel_pytree(g_tree)
        if axis_name:
            gv_flat = jax.lax.pmean(gv_flat, axis_name)
        return gv_flat + damping * v_flat

    return fvp
