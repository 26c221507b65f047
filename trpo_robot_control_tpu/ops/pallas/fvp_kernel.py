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

Grid: 1-D over batch tiles. Gradient accumulators live in VMEM across the
whole grid (constant index_map -> block persists; TPU grid steps are
sequential per core) and are zeroed at step 0. A row mask handles the
padded tail of the batch.

Correctness twin: ops/fvp.py:make_gn_fvp (jax.linearize form) — equality
is enforced by tests/test_pallas_fvp.py in both interpret and compiled
modes.
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


def _fvp_kernel(L, block_b, *refs):
    """Kernel body. refs layout (inputs then outputs):

    inputs:  X, h_0..h_{L-1}, W_1..W_L, dW_0..dW_L, db_0..db_L,
             scale (1, da), b_real (1,1 SMEM int32)
    outputs: gW_0..gW_L, gb_0..gb_L
    """
    it = iter(refs)
    X = next(it)
    h = [next(it) for _ in range(L)]
    W = [next(it) for _ in range(L)]          # W_1..W_L (W_0 not needed)
    dW = [next(it) for _ in range(L + 1)]
    db = [next(it) for _ in range(L + 1)]
    scale = next(it)
    b_real = next(it)
    gW = [next(it) for _ in range(L + 1)]
    gb = [next(it) for _ in range(L + 1)]

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _zero():
        for r in gW + gb:
            r[:] = jnp.zeros_like(r)

    x = X[:]
    hs = [r[:] for r in h]
    ts = [1.0 - v * v for v in hs]

    # forward-mode tangent through the tanh MLP. The two matmuls of each
    # layer's tangent rule (dh @ W + h @ dW) are fused into ONE
    # [dh | h] @ [W ; dW] contraction: for H=64 the concatenated K dim is
    # exactly 128 — full MXU depth, half the matmul issues.
    a = jnp.dot(x, dW[0][:], preferred_element_type=jnp.float32) + db[0][:]
    dh = ts[0] * a
    for l in range(1, L):
        lhs = jnp.concatenate([dh, hs[l - 1]], axis=1)
        rhs = jnp.concatenate([W[l - 1][:], dW[l][:]], axis=0)
        a = jnp.dot(lhs, rhs, preferred_element_type=jnp.float32) + db[l][:]
        dh = ts[l] * a
    lhs = jnp.concatenate([dh, hs[L - 1]], axis=1)
    rhs = jnp.concatenate([W[L - 1][:], dW[L][:]], axis=0)
    dmu = jnp.dot(lhs, rhs, preferred_element_type=jnp.float32) + db[L][:]

    # Fisher scaling + mask padded rows (their activations are garbage)
    rows = jax.lax.broadcasted_iota(jnp.int32, dmu.shape, 0)
    mask = (rows + i * block_b) < b_real[0, 0]
    u = jnp.where(mask, dmu * scale[:], 0.0)

    # reverse accumulation
    g = u
    for l in range(L, 0, -1):
        gW[l][:] += jnp.dot(hs[l - 1].T, g,
                            preferred_element_type=jnp.float32)
        gb[l][:] += jnp.sum(g, axis=0, keepdims=True)
        g = jnp.dot(g, W[l - 1][:].T,
                    preferred_element_type=jnp.float32) * ts[l - 1]
    gW[0][:] += jnp.dot(x.T, g, preferred_element_type=jnp.float32)
    gb[0][:] += jnp.sum(g, axis=0, keepdims=True)


def make_pallas_gn_fvp(params, unravel, obs, damping: float,
                       axis_name=None, block_b: int = 512,
                       interpret: bool = False):
    """Drop-in replacement for ops/fvp.py:make_gn_fvp using the fused
    Pallas kernel. Same signature, same semantics (damped, pmean-reduced).
    """
    L = policy_mod.n_layers(params) - 1      # number of hidden layers
    assert L >= 1, "policy must have at least one hidden layer"
    B, do = obs.shape
    da = params[f"W{L}"].shape[1]
    inv_var = jnp.exp(-2.0 * params["logstd"])

    # activations: constant across all FVP calls in one update
    hs = []
    hcur = obs
    for l in range(L):
        hcur = jnp.tanh(hcur @ params[f"W{l}"] + params[f"b{l}"])
        hs.append(hcur)

    B_pad = _round_up(B, block_b)
    grid = (B_pad // block_b,)
    pad = [(0, B_pad - B), (0, 0)]
    X_p = jnp.pad(obs, pad)
    hs_p = [jnp.pad(h, pad) for h in hs]
    b_real = jnp.array([[B]], dtype=jnp.int32)
    scale = (inv_var / B)[None, :]

    hidden = [params[f"W{l}"].shape[1] for l in range(L)]
    batch_spec = lambda d: pl.BlockSpec((block_b, d), lambda i: (i, 0),
                                        memory_space=pltpu.VMEM)
    full_spec = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                           memory_space=pltpu.VMEM)

    in_specs = (
        [batch_spec(do)] + [batch_spec(h) for h in hidden]
        + [full_spec(params[f"W{l}"].shape) for l in range(1, L + 1)]
        + [full_spec(params[f"W{l}"].shape) for l in range(L + 1)]
        + [full_spec((1, params[f"b{l}"].shape[0])) for l in range(L + 1)]
        + [full_spec((1, da))]
        + [pl.BlockSpec((1, 1), lambda i: (0, 0),
                        memory_space=pltpu.SMEM)]
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

    kernel = functools.partial(_fvp_kernel, L, block_b)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )

    fixed_inputs = ([X_p] + hs_p
                    + [params[f"W{l}"] for l in range(1, L + 1)])

    def fvp(v_flat):
        t = unravel(v_flat)
        dWs = [t[f"W{l}"] for l in range(L + 1)]
        dbs = [t[f"b{l}"][None, :] for l in range(L + 1)]
        outs = call(*fixed_inputs, *dWs, *dbs, scale, b_real)
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
