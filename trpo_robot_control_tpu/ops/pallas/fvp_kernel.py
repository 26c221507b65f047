"""Pallas TPU kernel: fused Gauss-Newton Fisher-vector product.

This is the engine's equivalent of the reference's accelerator kernel
(SURVEY.md section 3 "MaxJ DFE kernel(s)", section 5.2): the linearised
policy pipeline J^T M J v streamed over the rollout batch. One kernel
pass per FVP call fuses:

  forward-mode tangent:  a_l = dh_{l-1} W_l + h_{l-1} dW_l + db_l,
                         dh_l = (1 - h_l^2) * a_l
  Fisher scaling:        u = dmu * inv_var / B
  reverse accumulation:  gW_l += h_{l-1}^T g_l,  gb_l += sum g_l,
                         g_{l-1} = (g_l W_l^T) * (1 - h_{l-1}^2)

so the batch activations (X, h_0, ..., h_{L-1}) are read from HBM exactly
ONCE per call instead of once per matmul. Activations are computed once
per update (they are constant across all cg_iters+1 calls) and reused.

PAIR-PACKED LAYOUT (the key to MXU utilisation): profiling shows this
kernel is MXU-*pass*-bound — every matmul streams its batch dimension
through the systolic array in ~B cycles regardless of how small the
stationary dims are, and a width-64 MLP with 3 outputs leaves half to
97% of the 128x128 array idle. So the production path packs SAMPLE PAIRS
into the 128-wide lane dimension: activations are reshaped (B, H) ->
(B/2, 2H) (a free relayout: sample 2i in lanes 0:H, sample 2i+1 in
lanes H:2H) and weights become block-diag(W, W), making every matmul's
stationary dims 128-wide/deep. The reverse accumulations and the input
layer then cost B/2 cycles instead of B - a ~1.6x cut in total MXU
passes for a (64, 64) policy. The packed accumulators hold the even
samples' sums in the top-left block and the odd samples' in the
bottom-right; the two are folded outside the kernel (the off-diagonal
cross blocks land in array cycles that were idle anyway and are
discarded).

Grid: 1-D over batch tiles. Gradient accumulators live in VMEM across the
whole grid (constant index_map -> block persists; TPU grid steps are
sequential per core) and are zeroed at step 0. When the batch is not a
multiple of the tile, the tail is padded and a per-lane-half row mask
zeroes the padded samples' Fisher terms; when it divides exactly (all
shipped configs) no pad copy and no mask are emitted at all.

Policies whose layer widths exceed 64 lanes (or 2*obs_dim > 128) fall
back to the unpacked kernel, which is the same fusion without the pair
packing.

Correctness twin: ops/fvp.py:make_gn_fvp (jax.linearize form) — equality
is enforced by tests/test_pallas_fvp.py in both interpret and compiled
modes (exact in fp32 mode, bounded in bf16 mode).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.flatten_util import ravel_pytree

from ...models import policy as policy_mod


def _round_up(x, m):
    return (x + m - 1) // m * m


def _bd(a):
    """block_diag(a, a) without scipy: (m, n) -> (2m, 2n)."""
    m, n = a.shape
    z = jnp.zeros((2 * m, 2 * n), a.dtype)
    return z.at[:m, :n].set(a).at[m:, n:].set(a)


# ------------------------------------------------------------- unpacked
def _fvp_kernel(L, block_b, masked, cdtype, *refs):
    """Unpacked kernel body. refs layout (inputs then outputs):

    inputs:  X, h_0..h_{L-1}, W_1..W_L, dW_0..dW_L, db_0..db_L,
             scale (1, da) [, b_real (1,1 SMEM int32) when masked]
    outputs: gW_0..gW_L, gb_0..gb_L
    """
    it = iter(refs)
    X = next(it)
    h = [next(it) for _ in range(L)]
    W = [next(it) for _ in range(L)]          # W_1..W_L (W_0 not needed)
    dW = [next(it) for _ in range(L + 1)]
    db = [next(it) for _ in range(L + 1)]
    scale = next(it)
    b_real = next(it) if masked else None
    gW = [next(it) for _ in range(L + 1)]
    gb = [next(it) for _ in range(L + 1)]

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _zero():
        for r in gW + gb:
            r[:] = jnp.zeros_like(r)

    x = X[:]
    hs = [r[:] for r in h]
    ts = [1.0 - v.astype(jnp.float32) * v.astype(jnp.float32) for v in hs]

    def cast(v):
        return v.astype(cdtype)

    # forward-mode tangent; [dh | h] @ [W ; dW] fuses each layer's two
    # tangent matmuls into one full-K contraction
    a = jnp.dot(x, dW[0][:], preferred_element_type=jnp.float32) + db[0][:]
    dh = ts[0] * a
    for l in range(1, L):
        lhs = jnp.concatenate([cast(dh), hs[l - 1]], axis=1)
        rhs = jnp.concatenate([W[l - 1][:], dW[l][:]], axis=0)
        a = jnp.dot(lhs, rhs, preferred_element_type=jnp.float32) + db[l][:]
        dh = ts[l] * a
    lhs = jnp.concatenate([cast(dh), hs[L - 1]], axis=1)
    rhs = jnp.concatenate([W[L - 1][:], dW[L][:]], axis=0)
    dmu = jnp.dot(lhs, rhs, preferred_element_type=jnp.float32) + db[L][:]

    u = dmu * scale[:]
    if masked:
        rows = jax.lax.broadcasted_iota(jnp.int32, dmu.shape, 0)
        u = jnp.where((rows + i * block_b) < b_real[0, 0], u, 0.0)

    g = cast(u)
    for l in range(L, 0, -1):
        gW[l][:] += jnp.dot(hs[l - 1].T, g,
                            preferred_element_type=jnp.float32)
        gb[l][:] += jnp.sum(g.astype(jnp.float32), axis=0, keepdims=True)
        g = cast(jnp.dot(g, W[l - 1][:].T,
                         preferred_element_type=jnp.float32) * ts[l - 1])
    gW[0][:] += jnp.dot(x.T, g, preferred_element_type=jnp.float32)
    gb[0][:] += jnp.sum(g.astype(jnp.float32), axis=0, keepdims=True)


# --------------------------------------------------------------- packed
def _fvp_kernel_packed(L, block_s, da, masked, cdtype, *refs):
    """Pair-packed kernel body; block_s = sample pairs per tile.

    inputs:  Xp (block_s, 2do), hp_0..hp_{L-1} (block_s, 2h_l),
             bdW_1..bdW_L, bd(dW)_0..bd(dW)_L, db2_0..db2_L (1, 2h_l),
             scale2 (1, 2da) [, b_real (1,1 SMEM int32) when masked]
    outputs: packed gW_0..gW_L (2 in_l, 2 out_l), gb_0..gb_L (1, 2 out_l)
    """
    it = iter(refs)
    X = next(it)
    h = [next(it) for _ in range(L)]
    W = [next(it) for _ in range(L)]          # bd(W_l), l=1..L
    dW = [next(it) for _ in range(L + 1)]     # bd(dW_l)
    db = [next(it) for _ in range(L + 1)]
    scale = next(it)
    b_real = next(it) if masked else None
    gW = [next(it) for _ in range(L + 1)]
    gb = [next(it) for _ in range(L + 1)]

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _zero():
        for r in gW + gb:
            r[:] = jnp.zeros_like(r)

    x = X[:]
    hs = [r[:] for r in h]
    ts = [1.0 - v.astype(jnp.float32) * v.astype(jnp.float32) for v in hs]

    def cast(v):
        return v.astype(cdtype)

    # forward-mode tangent on the packed layout: per layer, two
    # (block_s, 2H) @ (2H, 2H) full-width contractions (the block-diag
    # zeros ride array lanes that would otherwise sit idle)
    a = jnp.dot(x, dW[0][:], preferred_element_type=jnp.float32) + db[0][:]
    dh = ts[0] * a
    for l in range(1, L + 1):
        a = (jnp.dot(cast(dh), W[l - 1][:],
                     preferred_element_type=jnp.float32)
             + jnp.dot(hs[l - 1], dW[l][:],
                       preferred_element_type=jnp.float32)
             + db[l][:])
        if l < L:
            dh = ts[l] * a
    dmu = a                                   # (block_s, 2da)

    u = dmu * scale[:]
    if masked:
        # row r of the tile holds samples 2*(r + i*block_s) (lanes 0:da)
        # and 2*(r + i*block_s) + 1 (lanes da:2da)
        rows = jax.lax.broadcasted_iota(jnp.int32, dmu.shape, 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, dmu.shape, 1)
        sample = 2 * (rows + i * block_s) + (cols >= da).astype(jnp.int32)
        u = jnp.where(sample < b_real[0, 0], u, 0.0)

    g = cast(u)
    for l in range(L, 0, -1):
        gW[l][:] += jnp.dot(hs[l - 1].T, g,
                            preferred_element_type=jnp.float32)
        gb[l][:] += jnp.sum(g.astype(jnp.float32), axis=0, keepdims=True)
        # bd(W)^T == bd(W^T)
        g = cast(jnp.dot(g, W[l - 1][:].T,
                         preferred_element_type=jnp.float32) * ts[l - 1])
    gW[0][:] += jnp.dot(x.T, g, preferred_element_type=jnp.float32)
    gb[0][:] += jnp.sum(g.astype(jnp.float32), axis=0, keepdims=True)


def make_pallas_gn_fvp(params, unravel, obs, damping: float,
                       axis_name=None, block_b: int = 2048,
                       interpret: bool = False,
                       compute_dtype=jnp.float32,
                       packed=None):
    """Drop-in replacement for ops/fvp.py:make_gn_fvp using the fused
    Pallas kernel. Same signature, same semantics (damped, pmean-reduced).

    compute_dtype: dtype streamed through the MXU (fp32 default — the
    kernel is pass-bound, not operand-width-bound, so bf16 buys little;
    both modes are tested). packed: force the pair-packed layout on/off
    (None = auto: packed whenever every layer width fits 64 lanes).
    """
    cdtype = compute_dtype
    L = policy_mod.n_layers(params) - 1      # number of hidden layers
    assert L >= 1, "policy must have at least one hidden layer"
    B, do = obs.shape
    da = params[f"W{L}"].shape[1]
    hidden = [params[f"W{l}"].shape[1] for l in range(L)]
    inv_var = jnp.exp(-2.0 * params["logstd"])

    if packed is None:
        packed = max([do, da] + hidden) <= 64
    assert not packed or max([do, da] + hidden) <= 64

    # activations: computed once in fp32, stored in cdtype — constant
    # across all FVP calls in one update
    hs = []
    hcur = obs
    for l in range(L):
        hcur = jnp.tanh(hcur @ params[f"W{l}"] + params[f"b{l}"])
        hs.append(hcur)

    if packed and block_b % 2:
        block_b += 1
    B_pad = _round_up(B, block_b)
    masked = B_pad != B
    if masked:
        pad = [(0, B_pad - B), (0, 0)]
        X_p = jnp.pad(obs, pad).astype(cdtype)
        hs_p = [jnp.pad(h, pad).astype(cdtype) for h in hs]
    else:
        X_p = obs.astype(cdtype)
        hs_p = [h.astype(cdtype) for h in hs]
    b_real = jnp.array([[B]], dtype=jnp.int32)
    scale = (inv_var / B)[None, :]

    def full_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    if packed:
        # free relayout: (B, d) -> (B/2, 2d) puts sample pairs side by
        # side in the lane dimension
        block_s = block_b // 2
        grid = (B_pad // block_b,)
        X_p = X_p.reshape(B_pad // 2, 2 * do)
        hs_p = [h.reshape(B_pad // 2, 2 * hd)
                for h, hd in zip(hs_p, hidden)]
        Ws = [_bd(params[f"W{l}"]).astype(cdtype) for l in range(1, L + 1)]
        db2 = [jnp.tile(params[f"b{l}"], 2)[None, :] for l in range(L + 1)]
        scale2 = jnp.tile(scale, (1, 2))
        dims_in = [2 * do] + [2 * hd for hd in hidden]
        dims_out = [2 * hd for hd in hidden] + [2 * da]

        def batch_spec(d):
            return pl.BlockSpec((block_s, d), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)

        in_specs = (
            [batch_spec(2 * do)] + [batch_spec(2 * hd) for hd in hidden]
            + [full_spec(w.shape) for w in Ws]
            + [full_spec((dims_in[l], dims_out[l])) for l in range(L + 1)]
            + [full_spec((1, d)) for d in dims_out]
            + [full_spec((1, 2 * da))]
            + ([pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM)] if masked else [])
        )
        out_specs = (
            [full_spec((dims_in[l], dims_out[l])) for l in range(L + 1)]
            + [full_spec((1, d)) for d in dims_out]
        )
        out_shape = (
            [jax.ShapeDtypeStruct((dims_in[l], dims_out[l]), jnp.float32)
             for l in range(L + 1)]
            + [jax.ShapeDtypeStruct((1, d), jnp.float32) for d in dims_out]
        )
        kernel = functools.partial(_fvp_kernel_packed, L, block_s, da,
                                   masked, cdtype)
        call = pl.pallas_call(kernel, grid=grid, in_specs=in_specs,
                              out_specs=out_specs, out_shape=out_shape,
                              interpret=interpret)
        fixed_inputs = [X_p] + hs_p + Ws
        tail = (b_real,) if masked else ()

        def fvp(v_flat):
            t = unravel(v_flat)
            dWs = [_bd(t[f"W{l}"]).astype(cdtype) for l in range(L + 1)]
            dbs = [jnp.tile(t[f"b{l}"], 2)[None, :] for l in range(L + 1)]
            outs = call(*fixed_inputs, *dWs, *dbs, scale2, *tail)
            g_tree = {}
            for l in range(L + 1):
                m = do if l == 0 else hidden[l - 1]
                n = da if l == L else hidden[l]
                gp = outs[l]
                g_tree[f"W{l}"] = gp[:m, :n] + gp[m:, n:]
                gbp = outs[L + 1 + l][0]
                g_tree[f"b{l}"] = gbp[:n] + gbp[n:]
            g_tree["logstd"] = 2.0 * t["logstd"]
            gv_flat, _ = ravel_pytree(g_tree)
            if axis_name:
                gv_flat = jax.lax.pmean(gv_flat, axis_name)
            return gv_flat + damping * v_flat

        return fvp

    # ------------------------------------------------- unpacked fallback
    grid = (B_pad // block_b,)

    def batch_spec(d):
        return pl.BlockSpec((block_b, d), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    in_specs = (
        [batch_spec(do)] + [batch_spec(h) for h in hidden]
        + [full_spec(params[f"W{l}"].shape) for l in range(1, L + 1)]
        + [full_spec(params[f"W{l}"].shape) for l in range(L + 1)]
        + [full_spec((1, params[f"b{l}"].shape[0])) for l in range(L + 1)]
        + [full_spec((1, da))]
        + ([pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM)] if masked else [])
    )
    out_specs = (
        [full_spec(params[f"W{l}"].shape) for l in range(L + 1)]
        + [full_spec((1, params[f"b{l}"].shape[0])) for l in range(L + 1)]
    )
    out_shape = (
        [jax.ShapeDtypeStruct(params[f"W{l}"].shape, jnp.float32)
         for l in range(L + 1)]
        + [jax.ShapeDtypeStruct((1, params[f"b{l}"].shape[0]), jnp.float32)
           for l in range(L + 1)]
    )

    kernel = functools.partial(_fvp_kernel, L, block_b, masked, cdtype)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )

    fixed_inputs = ([X_p] + hs_p
                    + [params[f"W{l}"].astype(cdtype)
                       for l in range(1, L + 1)])
    tail = (b_real,) if masked else ()

    def fvp(v_flat):
        t = unravel(v_flat)
        dWs = [t[f"W{l}"].astype(cdtype) for l in range(L + 1)]
        dbs = [t[f"b{l}"][None, :] for l in range(L + 1)]
        outs = call(*fixed_inputs, *dWs, *dbs, scale, *tail)
        gW = outs[: L + 1]
        gb = outs[L + 1:]
        g_tree = {}
        for l in range(L + 1):
            g_tree[f"W{l}"] = gW[l]
            g_tree[f"b{l}"] = gb[l][0]
        g_tree["logstd"] = 2.0 * t["logstd"]
        gv_flat, _ = ravel_pytree(g_tree)
        if axis_name:
            gv_flat = jax.lax.pmean(gv_flat, axis_name)
        return gv_flat + damping * v_flat

    return fvp
