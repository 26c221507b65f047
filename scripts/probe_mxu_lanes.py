#!/usr/bin/env python
"""MXU lane-width micro-probe (round 4, VERDICT r3 next-1a).

Question: at what per-pass lane count does Mosaic engage MORE THAN ONE
of the MXUs for a single in-kernel `dot_general`? The rollout kernels'
pair-packed MLP streams bb/2 = 128 lanes per pass and sits at a
single-MXU-pass floor (~21 ms of c5's 121 ms rollout,
docs/performance.md roofline term (a)); the FVP kernel at block 2048
lanes is quoted at ~80% of the 4-MXU row-streaming floor. If wider
streams engage more MXUs, widening the rollout tile (bf16 bb 256 ->
512/1024 via a T-chunked grid) is the single largest remaining rollout
lever; if not, the roofline's "<2x headroom" judgement becomes a
measured fact.

Method: a (128, 128) orthogonal stationary weight W in VMEM; the kernel
runs an in-kernel fori_loop of CHAIN-long DEPENDENT matmul chains
x <- W @ x on an (128, L) block — the same dependency structure as the
rollout MLP's 3 sequential layers (orthogonal W keeps values O(1)
forever). `chains` independent copies interleave to separate pipeline
latency from throughput. Cost model: a single MXU streams L lanes in
~L cycles at ~0.94 GHz; n engaged MXUs divide that. Slope timing
between two n_iter values (tunnelled runtime: fetch jitter cancels).
Run alone (one TPU client at a time).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHAIN = 100
CLOCK_GHZ = 0.94


def _fetch(x):
    return float(np.asarray(x).ravel()[0])


def make_kernel(L, n_iter, n_chains, dtype):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(w_ref, x_ref, o_ref):
        W = w_ref[:]
        xs = tuple(x_ref[:, i * L:(i + 1) * L] for i in range(n_chains))

        def body(i, xs):
            for _ in range(CHAIN):
                xs = tuple(
                    jax.lax.dot_general(
                        W, x, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32).astype(dtype)
                    for x in xs)
            return xs

        xs = jax.lax.fori_loop(0, n_iter, body, xs)
        o_ref[:] = jnp.concatenate(xs, axis=1)

    interpret = os.environ.get("PROBE_INTERPRET", "") == "1"

    @jax.jit
    def run(W, x):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec((128, 128), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((128, n_chains * L), lambda: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((128, n_chains * L), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((128, n_chains * L), dtype),
            interpret=interpret,
        )(W, x)

    return run


def time_matmul(L, n_chains, dtype="float32", target_mm=4e5, reps=3):
    import jax.numpy as jnp
    dt = jnp.dtype(dtype)
    n_hi = max(int(target_mm / (CHAIN * n_chains)), 8)
    n_lo = max(n_hi // 10, 1)
    lo = make_kernel(L, n_lo, n_chains, dt)
    hi = make_kernel(L, n_hi, n_chains, dt)
    rng = np.random.RandomState(0)
    Q, _ = np.linalg.qr(rng.randn(128, 128))
    W = jnp.asarray(Q, jnp.float32)
    x = jnp.asarray(rng.randn(128, n_chains * L), dt)
    _fetch(lo(W, x)); _fetch(hi(W, x))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); _fetch(lo(W, x))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter(); _fetch(hi(W, x))
        t_hi = time.perf_counter() - t0
        per_mm = (t_hi - t_lo) / (CHAIN * n_chains * (n_hi - n_lo))
        best = min(best, per_mm)
    return 1e9 * best


def main():
    print("# (128,128) @ (128,L) in-kernel dependent-chain matmul cost")
    print("# single-MXU model: L cycles = L/%.2f ns; n-MXU divides it"
          % CLOCK_GHZ)
    print(f"# {'L':>5} {'chains':>6} {'dtype':>8} {'ns/matmul':>10} "
          f"{'cycles':>8} {'cyc/L':>6} {'implied MXUs':>12}")
    for dtype in ("float32",):
        for L in (128, 256, 512, 1024, 2048):
            for n_chains in (1, 2, 4):
                if n_chains * L > 4096:
                    continue
                ns = time_matmul(L, n_chains, dtype)
                cyc = ns * CLOCK_GHZ
                print(f"  {L:5d} {n_chains:6d} {dtype:>8} {ns:10.1f} "
                      f"{cyc:8.0f} {cyc / L:6.2f} {L / cyc:12.2f}",
                      flush=True)


if __name__ == "__main__":
    main()
