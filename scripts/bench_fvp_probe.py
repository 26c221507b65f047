#!/usr/bin/env python
"""Decompose the fused FVP kernel's per-call time: streaming floor vs
forward-tangent vs reverse-accumulation, plus batch scaling.

Each probe kernel keeps the same grid/BlockSpecs as the real kernel so
the pipeline behaviour is comparable. Run alone on the TPU.
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fetch(x):
    return float(np.asarray(x).ravel()[-1])


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, do, H, da = 102400, 12, 64, 3
    bb = 2048
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    X = jax.random.normal(ks[0], (B, do))
    h0 = jnp.tanh(jax.random.normal(ks[1], (B, H)))
    h1 = jnp.tanh(jax.random.normal(ks[2], (B, H)))
    W1 = 0.3 * jax.random.normal(ks[3], (H, H))
    W2 = 0.3 * jax.random.normal(ks[4], (H, da))
    dW0 = jax.random.normal(ks[5], (do, H))
    dW1 = jax.random.normal(ks[6], (H, H))
    dW2 = jax.random.normal(ks[7], (H, da))
    scale = jnp.ones((1, da))

    batch_spec = lambda d: pl.BlockSpec((bb, d), lambda i: (i, 0),
                                        memory_space=pltpu.VMEM)
    full = lambda s: pl.BlockSpec(s, lambda i: (0,) * len(s),
                                  memory_space=pltpu.VMEM)

    def make_call(kernel, n_out_w=True):
        outs = ([jax.ShapeDtypeStruct((do, H), jnp.float32),
                 jax.ShapeDtypeStruct((H, H), jnp.float32),
                 jax.ShapeDtypeStruct((H, da), jnp.float32)])
        return pl.pallas_call(
            kernel, grid=(B // bb,),
            in_specs=[batch_spec(do), batch_spec(H), batch_spec(H),
                      full((H, H)), full((H, da)), full((do, H)),
                      full((H, H)), full((H, da)), full((1, da))],
            out_specs=[full((do, H)), full((H, H)), full((H, da))],
            out_shape=outs)

    def k_stream(X, h0, h1, W1, W2, dW0, dW1, dW2, sc, o0, o1, o2):
        i = pl.program_id(0)
        @pl.when(i == 0)
        def _z():
            o0[:] = jnp.zeros_like(o0)
            o1[:] = jnp.zeros_like(o1)
            o2[:] = jnp.zeros_like(o2)
        # touch every input block without matmuls
        s = (jnp.sum(X[:]) + jnp.sum(h0[:]) + jnp.sum(h1[:]))
        o2[:] = o2[:] + s

    def k_fwd(X, h0, h1, W1, W2, dW0, dW1, dW2, sc, o0, o1, o2):
        i = pl.program_id(0)
        @pl.when(i == 0)
        def _z():
            o0[:] = jnp.zeros_like(o0)
            o1[:] = jnp.zeros_like(o1)
            o2[:] = jnp.zeros_like(o2)
        x, a0, a1 = X[:], h0[:], h1[:]
        t0, t1 = 1 - a0 * a0, 1 - a1 * a1
        a = jnp.dot(x, dW0[:], preferred_element_type=jnp.float32)
        dh = t0 * a
        lhs = jnp.concatenate([dh, a0], axis=1)
        rhs = jnp.concatenate([W1[:], dW1[:]], axis=0)
        dh = t1 * jnp.dot(lhs, rhs, preferred_element_type=jnp.float32)
        lhs = jnp.concatenate([dh, a1], axis=1)
        rhs = jnp.concatenate([W2[:], dW2[:]], axis=0)
        dmu = jnp.dot(lhs, rhs, preferred_element_type=jnp.float32)
        o2[:] = o2[:] + jnp.sum(dmu * sc[:])

    def k_full(X, h0, h1, W1, W2, dW0, dW1, dW2, sc, o0, o1, o2):
        i = pl.program_id(0)
        @pl.when(i == 0)
        def _z():
            o0[:] = jnp.zeros_like(o0)
            o1[:] = jnp.zeros_like(o1)
            o2[:] = jnp.zeros_like(o2)
        x, a0, a1 = X[:], h0[:], h1[:]
        t0, t1 = 1 - a0 * a0, 1 - a1 * a1
        a = jnp.dot(x, dW0[:], preferred_element_type=jnp.float32)
        dh = t0 * a
        lhs = jnp.concatenate([dh, a0], axis=1)
        rhs = jnp.concatenate([W1[:], dW1[:]], axis=0)
        dh = t1 * jnp.dot(lhs, rhs, preferred_element_type=jnp.float32)
        lhs = jnp.concatenate([dh, a1], axis=1)
        rhs = jnp.concatenate([W2[:], dW2[:]], axis=0)
        u = jnp.dot(lhs, rhs, preferred_element_type=jnp.float32) * sc[:]
        o2[:] += jnp.dot(a1.T, u, preferred_element_type=jnp.float32)
        g = jnp.dot(u, W2[:].T, preferred_element_type=jnp.float32) * t1
        o1[:] += jnp.dot(a0.T, g, preferred_element_type=jnp.float32)
        g = jnp.dot(g, W1[:].T, preferred_element_type=jnp.float32) * t0
        o0[:] += jnp.dot(x.T, g, preferred_element_type=jnp.float32)

    def k_rev_dotgen(X, h0, h1, W1, W2, dW0, dW1, dW2, sc, o0, o1, o2):
        """Reverse accumulations via dot_general contracting dim0 x dim0
        (no .T views) — checks whether Mosaic materializes transposes."""
        i = pl.program_id(0)
        @pl.when(i == 0)
        def _z():
            o0[:] = jnp.zeros_like(o0)
            o1[:] = jnp.zeros_like(o1)
            o2[:] = jnp.zeros_like(o2)
        dn = (((0,), (0,)), ((), ()))
        x, a0, a1 = X[:], h0[:], h1[:]
        t0, t1 = 1 - a0 * a0, 1 - a1 * a1
        a = jnp.dot(x, dW0[:], preferred_element_type=jnp.float32)
        dh = t0 * a
        lhs = jnp.concatenate([dh, a0], axis=1)
        rhs = jnp.concatenate([W1[:], dW1[:]], axis=0)
        dh = t1 * jnp.dot(lhs, rhs, preferred_element_type=jnp.float32)
        lhs = jnp.concatenate([dh, a1], axis=1)
        rhs = jnp.concatenate([W2[:], dW2[:]], axis=0)
        u = jnp.dot(lhs, rhs, preferred_element_type=jnp.float32) * sc[:]
        o2[:] += jax.lax.dot_general(a1, u, dn,
                                     preferred_element_type=jnp.float32)
        g = jnp.dot(u, W2[:].T, preferred_element_type=jnp.float32) * t1
        o1[:] += jax.lax.dot_general(a0, g, dn,
                                     preferred_element_type=jnp.float32)
        g = jnp.dot(g, W1[:].T, preferred_element_type=jnp.float32) * t0
        o0[:] += jax.lax.dot_general(x, g, dn,
                                     preferred_element_type=jnp.float32)

    inputs = (X, h0, h1, W1, W2, dW0, dW1, dW2, scale)

    def timed(call, tag, n_lo=8, n_hi=72, reps=3):
        def chain(n):
            def f(d0):
                def body(c, _):
                    o = call(inputs[0] + c * 1e-20, *inputs[1:])
                    return jnp.sum(o[2]) * 1e-20, ()
                c, _ = jax.lax.scan(body, d0, None, length=n)
                return c
            return jax.jit(f)
        c_lo, c_hi = chain(n_lo), chain(n_hi)
        _fetch(c_lo(jnp.float32(0.0))); _fetch(c_hi(jnp.float32(0.0)))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter(); _fetch(c_lo(jnp.float32(0.0)))
            tl = time.perf_counter() - t0
            t0 = time.perf_counter(); _fetch(c_hi(jnp.float32(0.0)))
            th = time.perf_counter() - t0
            best = min(best, (th - tl) / (n_hi - n_lo))
        print(f"{tag:18s} {1e3 * best:8.4f} ms/call", flush=True)

    timed(make_call(k_stream), "stream-only")
    timed(make_call(k_fwd), "fwd-only")
    timed(make_call(k_full), "full")
    timed(make_call(k_rev_dotgen), "full-dotgen")


if __name__ == "__main__":
    main()
