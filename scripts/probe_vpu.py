#!/usr/bin/env python
"""VPU cost micro-probe for the fused rollout kernels (round 3).

Measures, inside a real Pallas kernel, the per-op cost of chained
elementwise ops on (r, B) blocks for r in {1, 7, 8} and of
transcendentals — decides whether splitting the (n+1, B) fused
mass/bias sweep into an (n, B) zero-velocity column sweep + (1, B)
bias sweep can win, and sizes the FK trig + Box-Muller share.

Method: the op chain (CHAIN ops long) runs inside an in-kernel
`fori_loop` of n_iter repeats, so one kernel call executes
CHAIN * n_iter ops (~1e7): the ~30-40 ms host-fetch jitter of this
tunnelled runtime cancels in the slope between two n_iter values.
Run alone (one TPU client at a time).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHAIN = 200


def _fetch(x):
    return float(np.asarray(x).ravel()[0])


def make_kernel(rows, bb, n_iter, op):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        def body(i, x):
            # data-dependent chain; constants keep x bounded
            for _ in range(CHAIN):
                if op == "fma":
                    x = x * 0.999 + 1e-6
                elif op == "sin":
                    x = jnp.sin(x)
                elif op == "exp":
                    x = jnp.exp(x) * 0.5
                elif op == "log":
                    x = jnp.log(jnp.abs(x) + 1.0)
                elif op == "rsqrt":
                    x = jax.lax.rsqrt(jnp.abs(x) + 1.0)
            return x
        o_ref[:] = jax.lax.fori_loop(0, n_iter, body, x_ref[:])

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec((rows, bb), lambda: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((rows, bb), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, bb), jnp.float32),
        )(x)

    return run


def time_op(rows, bb, op, target_ops=2e7, reps=3):
    import jax.numpy as jnp
    n_hi = max(int(target_ops / CHAIN), 10)
    n_lo = max(n_hi // 10, 1)
    lo = make_kernel(rows, bb, n_lo, op)
    hi = make_kernel(rows, bb, n_hi, op)
    x = jnp.ones((rows, bb), jnp.float32) * 0.5
    _fetch(lo(x)); _fetch(hi(x))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); _fetch(lo(x))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter(); _fetch(hi(x))
        t_hi = time.perf_counter() - t0
        best = min(best, (t_hi - t_lo) / (CHAIN * (n_hi - n_lo)))
    return 1e9 * best


def sweep():
    """Instruction-cost surface over (rows, width): decides how to lay
    envs out in the fused rollout kernels. If the per-instruction cost
    is ~flat from (1, B) to (8, B) (it is — round 3), then packing 8
    env sub-blocks into the sublane dim makes every (1, B) channel op
    carry 8x the envs for the same issue cost; this sweep maps where
    that flatness ends (wider rows / wider lanes)."""
    shapes = [(1, 512), (4, 512), (8, 512), (16, 512), (32, 512),
              (64, 512), (1, 1024), (1, 2048), (1, 4096),
              (8, 1024), (8, 2048), (8, 4096), (16, 2048)]
    print("# fma ns/op over (rows, width); ps/elem in parens")
    for rows, bb in shapes:
        ns = time_op(rows, bb, "fma", target_ops=2e7)
        per_elem = ns / (rows * bb)
        print(f"fma    ({rows:2d},{bb:4d})  {ns:8.3f} ns/op "
              f"({1e3 * per_elem:6.3f} ps/elem)", flush=True)


def main():
    if "--sweep" in sys.argv:
        sweep()
        return
    bb = int(os.environ.get("PROBE_BB", "512"))
    print(f"# block width B={bb}; ns/op, in-kernel fori_loop slope")
    for op in ("fma", "sin", "exp", "log", "rsqrt"):
        rows_list = (1, 7, 8) if op == "fma" else (1, 8)
        # transcendentals are ~10-50x fma cost: fewer ops suffice
        target = 2e7 if op == "fma" else 2e6
        for rows in rows_list:
            ns = time_op(rows, bb, op, target_ops=target)
            per_elem = ns / (rows * bb)
            print(f"{op:6s} ({rows},{bb})  {ns:8.3f} ns/op "
                  f"({1e3 * per_elem:6.3f} ps/elem)", flush=True)


if __name__ == "__main__":
    main()
