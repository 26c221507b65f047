"""Pallas TPU kernel: the ENTIRE damped Gauss-Newton CG solve in one
kernel launch (SURVEY.md section 5.2 — the reference's accelerator does
exactly this loop across its DMA boundary; here even the scalar CG
recurrences never leave the chip).

Grid = (cg_iters, n_tiles), sequential on a TPU core. Per (it, tile)
step the Pallas pipeline auto-streams the tile's activations (X, h_l)
from HBM (double-buffered by the compiler) and the kernel accumulates the
tile's contribution to z = F p. CG state (x, r, p, z — param-shaped
parts) lives in VMEM for the whole grid; rdotr lives in SMEM. At the last
tile of each iteration the alpha/beta recurrences update the state
in-place; after the final iteration x and r are written out (the caller
gets x^T F x free via x.g - x.r).

Fisher math identical to fvp_kernel.py (fused [dh|h] @ [W;dW] tangent
matmuls, per-sample Fisher scaling, reverse accumulation, masked tail).

Single-device only: cross-shard pmean inside the solve would need a
collective per iteration — sharded runs use the per-call FVP kernel path
(trpo/update.py picks automatically).
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


def _part_names(L):
    return [f"W{l}" for l in range(L + 1)] + [f"b{l}" for l in range(L + 1)]


def _cg_kernel(L, block_b, iters, damping, *refs):
    """refs (inputs):  X, h_0..h_{L-1}, W_1..W_L, g parts (W0..WL, b0..bL,
    logstd), scale (1, da), b_real (SMEM)
    (outputs): x parts + r parts (same order), rdotr (SMEM (1,1))
    (scratch): p parts, z parts, SMEM scalars (rdotr_s)."""
    n_parts = 2 * (L + 1) + 1                  # Ws + bs + logstd
    it = iter(refs)
    X = next(it)
    h = [next(it) for _ in range(L)]
    W = [next(it) for _ in range(L)]           # W_1..W_L
    g = [next(it) for _ in range(n_parts)]
    scale = next(it)
    b_real = next(it)
    x_out = [next(it) for _ in range(n_parts)]
    r_out = [next(it) for _ in range(n_parts)]
    rdotr_out = next(it)
    p_s = [next(it) for _ in range(n_parts)]
    z_s = [next(it) for _ in range(n_parts)]
    sm = next(it)                              # SMEM (2,1): rdotr, pz

    cg_it = pl.program_id(0)
    tile = pl.program_id(1)
    n_tiles = pl.num_programs(1)

    # ---------------- initialisation (first grid step only):
    # x = 0, r = p = g, rdotr = g.g
    @pl.when(jnp.logical_and(cg_it == 0, tile == 0))
    def _init():
        acc = jnp.zeros((), jnp.float32)
        for k in range(n_parts):
            gv = g[k][:]
            x_out[k][:] = jnp.zeros_like(gv)
            r_out[k][:] = gv
            p_s[k][:] = gv
            acc = acc + jnp.sum(gv * gv)
        sm[0, 0] = acc

    # ---------------- z = damping * p (+ logstd Fisher block) at tile 0
    @pl.when(tile == 0)
    def _z_init():
        for k in range(n_parts):
            z_s[k][:] = damping * p_s[k][:]
        # logstd part: F block is 2 I (batch-independent)
        z_s[n_parts - 1][:] = z_s[n_parts - 1][:] \
            + 2.0 * p_s[n_parts - 1][:]

    # ---------------- accumulate this tile's J^T M J p into z
    x_blk = X[:]
    hs = [r[:] for r in h]
    ts = [1.0 - v * v for v in hs]
    pW = [p_s[k] for k in range(L + 1)]
    pb = [p_s[L + 1 + k] for k in range(L + 1)]

    a = jnp.dot(x_blk, pW[0][:], preferred_element_type=jnp.float32) \
        + pb[0][:]
    dh = ts[0] * a
    for l in range(1, L):
        lhs = jnp.concatenate([dh, hs[l - 1]], axis=1)
        rhs = jnp.concatenate([W[l - 1][:], pW[l][:]], axis=0)
        a = jnp.dot(lhs, rhs, preferred_element_type=jnp.float32) \
            + pb[l][:]
        dh = ts[l] * a
    lhs = jnp.concatenate([dh, hs[L - 1]], axis=1)
    rhs = jnp.concatenate([W[L - 1][:], pW[L][:]], axis=0)
    dmu = jnp.dot(lhs, rhs, preferred_element_type=jnp.float32) + pb[L][:]

    rows = jax.lax.broadcasted_iota(jnp.int32, dmu.shape, 0)
    mask = (rows + tile * block_b) < b_real[0, 0]
    u = jnp.where(mask, dmu * scale[:], 0.0)

    gcur = u
    for l in range(L, 0, -1):
        z_s[l][:] += jnp.dot(hs[l - 1].T, gcur,
                             preferred_element_type=jnp.float32)
        z_s[L + 1 + l][:] += jnp.sum(gcur, axis=0, keepdims=True)
        gcur = jnp.dot(gcur, W[l - 1][:].T,
                       preferred_element_type=jnp.float32) * ts[l - 1]
    z_s[0][:] += jnp.dot(x_blk.T, gcur,
                         preferred_element_type=jnp.float32)
    z_s[L + 1][:] += jnp.sum(gcur, axis=0, keepdims=True)

    # ---------------- CG recurrences at the last tile
    @pl.when(tile == n_tiles - 1)
    def _recur():
        pz = jnp.zeros((), jnp.float32)
        for k in range(n_parts):
            pz = pz + jnp.sum(p_s[k][:] * z_s[k][:])
        rdotr = sm[0, 0]
        alpha = rdotr / (pz + 1e-12)
        nrr = jnp.zeros((), jnp.float32)
        for k in range(n_parts):
            x_out[k][:] = x_out[k][:] + alpha * p_s[k][:]
            rnew = r_out[k][:] - alpha * z_s[k][:]
            r_out[k][:] = rnew
            nrr = nrr + jnp.sum(rnew * rnew)
        beta = nrr / (rdotr + 1e-12)
        for k in range(n_parts):
            p_s[k][:] = r_out[k][:] + beta * p_s[k][:]
        sm[0, 0] = nrr

        @pl.when(cg_it == iters - 1)
        def _finish():
            rdotr_out[0, 0] = nrr


def make_pallas_cg(params, unravel, obs, damping: float, iters: int,
                   block_b: int = 1024, interpret: bool = False):
    """Returns solve(g_flat) -> (x_flat, r_flat, rdotr): the whole damped
    Gauss-Newton CG in one kernel. Single device, tanh-MLP policy."""
    L = policy_mod.n_layers(params) - 1
    assert L >= 1
    B, do = obs.shape
    da = params[f"W{L}"].shape[1]
    inv_var = jnp.exp(-2.0 * params["logstd"])

    hs = []
    hcur = obs
    for l in range(L):
        hcur = jnp.tanh(hcur @ params[f"W{l}"] + params[f"b{l}"])
        hs.append(hcur)

    B_pad = _round_up(B, block_b)
    n_tiles = B_pad // block_b
    pad = [(0, B_pad - B), (0, 0)]
    X_p = jnp.pad(obs, pad)
    hs_p = [jnp.pad(h, pad) for h in hs]
    b_real = jnp.array([[B]], dtype=jnp.int32)
    scale = (inv_var / B)[None, :]

    part_shapes = ([params[f"W{l}"].shape for l in range(L + 1)]
                   + [(1, params[f"b{l}"].shape[0]) for l in range(L + 1)]
                   + [(1, da)])
    n_parts = len(part_shapes)

    grid = (iters, n_tiles)
    batch_spec = lambda d: pl.BlockSpec((block_b, d),
                                        lambda i, t: (t, 0),
                                        memory_space=pltpu.VMEM)
    full_spec = lambda shape: pl.BlockSpec(
        shape, lambda i, t: (0,) * len(shape), memory_space=pltpu.VMEM)

    in_specs = ([batch_spec(do)] + [batch_spec(h) for h in hidden_dims(params, L)]
                + [full_spec(params[f"W{l}"].shape) for l in range(1, L + 1)]
                + [full_spec(s) for s in part_shapes]
                + [full_spec((1, da))]
                + [pl.BlockSpec((1, 1), lambda i, t: (0, 0),
                                memory_space=pltpu.SMEM)])
    out_specs = ([full_spec(s) for s in part_shapes] * 2
                 + [pl.BlockSpec((1, 1), lambda i, t: (0, 0),
                                 memory_space=pltpu.SMEM)])
    out_shape = ([jax.ShapeDtypeStruct(s, jnp.float32)
                  for s in part_shapes] * 2
                 + [jax.ShapeDtypeStruct((1, 1), jnp.float32)])
    scratch = ([pltpu.VMEM(s, jnp.float32) for s in part_shapes] * 2
               + [pltpu.SMEM((2, 1), jnp.float32)])

    kernel = functools.partial(_cg_kernel, L, block_b, iters, damping)
    call = pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, scratch_shapes=scratch, interpret=interpret)

    fixed = ([X_p] + hs_p
             + [params[f"W{l}"] for l in range(1, L + 1)])

    def part_list(tree):
        return ([tree[f"W{l}"] for l in range(L + 1)]
                + [tree[f"b{l}"][None, :] for l in range(L + 1)]
                + [tree["logstd"][None, :]])

    def to_tree(parts):
        t = {}
        for l in range(L + 1):
            t[f"W{l}"] = parts[l]
            t[f"b{l}"] = parts[L + 1 + l][0]
        t["logstd"] = parts[2 * (L + 1)][0]
        return t

    def solve(g_flat):
        g_tree = unravel(g_flat)
        outs = call(*fixed, *part_list(g_tree), scale, b_real)
        x_parts = outs[:n_parts]
        r_parts = outs[n_parts:2 * n_parts]
        rdotr = outs[-1][0, 0]
        x_flat, _ = ravel_pytree(to_tree(x_parts))
        r_flat, _ = ravel_pytree(to_tree(r_parts))
        return x_flat, r_flat, rdotr

    return solve


def hidden_dims(params, L):
    return [params[f"W{l}"].shape[1] for l in range(L)]
