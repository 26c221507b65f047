#!/usr/bin/env python
"""Probe: can a Pallas kernel beat XLA's lane-strided gather?

The five line-search subsample views (obs_ff[..., ::8] etc.) cost
4.3 ms at c5 (docs/performance.md round-5 glue attribution) — the
minor-dim stride reads every cacheline, so the 1.6 GB of input is
touched in full but XLA's gather runs at ~2x worse than stream
bandwidth. Round 5 measured the XLA block-stride reshape variant WORSE
(10.8 ms) and rejected kernel-side emission on the sharding contract.
Remaining question: does a dedicated Pallas copy kernel — full-lane
reads at stream bandwidth, in-register stride-8 lane selection —
lower at all, and at what cost? Variants:

  (a) XLA x[:, ::8]                      (the shipped gather)
  (b) Pallas: block (rb, 1024) -> out (rb, 128) via in-body x[:, ::8]

Timing: slope method between two chain lengths (docs/performance.md
measurement pitfalls), real chip.

OUTCOME (2026-08-20, round 5 — recorded dead end): Mosaic cannot
express lane-stride-8 extraction at all. Three lowering paths, all
fail to compile (while all pass in interpret mode):
  - in-body x[:, ::8]          -> "Shape mismatch in input, indices
                                   and output" (gather path)
  - reshape(rb, lanes//8, 8)[:, :, 0] -> compiler ICE (HTTP 500 from
                                   tpu_compile_helper)
  - lax.slice(..., strides=(1, 8)) -> "'vector.extract_strided_slice'
                                   op expected strides to be confined
                                   to [1, 2)"
The MXU selection alternative (x @ one-hot S) costs 1024 MACs per
surviving element = ~0.5 s at c5 scale — two orders above the gather
it would replace. The XLA gather itself measures 9.9 ms standalone at
obs_ff shape (146 GB/s effective; the in-update attribution of 4.3 ms
for all five views reflects XLA fusing the gathers into consumers).
The strided gather therefore stands as the floor for a
sharding-invariant env-strided line-search estimator, as judged in
round 5 ("the remaining c5 glue" in docs/performance.md).
"""
import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def pallas_gather(x, k=8, rb=None, lanes=1024):
    R, N = x.shape
    if rb is None:  # largest sublane-aligned row block dividing R
        rb = max(b for b in range(8, 257, 8) if R % b == 0)
    assert N % lanes == 0 and R % rb == 0, (R, N, rb)

    def body(x_ref, o_ref):
        o_ref[...] = x_ref[...][:, ::k]

    return pl.pallas_call(
        body,
        grid=(R // rb, N // lanes),
        in_specs=[pl.BlockSpec((rb, lanes), lambda r, n: (r, n))],
        out_specs=pl.BlockSpec((rb, lanes // k), lambda r, n: (r, n)),
        out_shape=jax.ShapeDtypeStruct((R, N // k), x.dtype),
    )(x)


def slope_time(fn, x, reps=3, n1=4, n2=12):
    @functools.partial(jax.jit, static_argnums=1)
    def chain(x, n):
        # keep each link live via a data dependence on one scalar
        acc = jnp.zeros((), jnp.float32)
        y = None
        for i in range(n):
            y = fn(x + acc.astype(x.dtype))
            acc = acc + y[0, 0].astype(jnp.float32) * 1e-30
        return y, acc

    out = []
    for _ in range(reps):
        ts = {}
        for n in (n1, n2):
            r = chain(x, n)
            jax.tree.map(lambda a: np.asarray(a[0, 0] if a.ndim else a),
                         r)  # warm compile + fetch
            t0 = time.perf_counter()
            r = chain(x, n)
            np.asarray(r[1])
            ts[n] = time.perf_counter() - t0
        out.append((ts[n2] - ts[n1]) / (n2 - n1))
    return out


def main():
    # c5's obs_ff as a 2-D view: (T*do, N) bf16
    R, N = 200 * 54, 65536
    x = jax.device_put(
        (np.random.RandomState(0).randn(R, N) / 8).astype(jnp.bfloat16))
    gb = R * N * 2 / 1e9

    def xla(v):
        return v[:, ::8]

    for name, fn in (("xla", xla), ("pallas", pallas_gather)):
        try:
            y1 = np.asarray(jax.jit(xla)(x), np.float32)
            y2 = np.asarray(jax.jit(fn)(x), np.float32)
            assert np.array_equal(y1, y2), "MISMATCH"
            ts = slope_time(fn, x)
            med = sorted(ts)[len(ts) // 2]
            print(f"{name}: {[round(t*1e3, 3) for t in ts]} ms/call  "
                  f"median {med*1e3:.3f} ms  read-BW {gb/med:.0f} GB/s",
                  flush=True)
        except Exception as e:  # noqa: BLE001 - probe reports and moves on
            print(f"{name}: FAILED {type(e).__name__}: {e}"[:500],
                  flush=True)


if __name__ == "__main__":
    main()
