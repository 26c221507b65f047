#!/usr/bin/env python
"""Microbenchmark the fused FVP kernel variants at c2 scale.

Times K chained FVP calls (each call's output feeds the next input, so
the chain serializes on-device) with bench.py's fetch-forced slope method.
Run alone (never concurrently with another TPU process).

  python scripts/bench_fvp.py [--block 1024] [--dtype bf16|f32] [--batch 102400]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fetch(x):
    return float(np.asarray(x).ravel()[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=102400)
    ap.add_argument("--do", type=int, default=12)
    ap.add_argument("--da", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.flatten_util import ravel_pytree

    from trpo_robot_control_tpu.models import policy
    from trpo_robot_control_tpu.ops.fvp import make_gn_fvp
    from trpo_robot_control_tpu.ops.pallas.fvp_kernel import make_pallas_gn_fvp

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    params = policy.init_params(k1, args.do, args.da, (64, 64), -0.5)
    params["W2"] = 0.3 * jax.random.normal(k2, params["W2"].shape)
    obs = jax.random.normal(k3, (args.batch, args.do))
    theta, unravel = ravel_pytree(params)
    v0 = jax.random.normal(jax.random.PRNGKey(9), theta.shape)

    def chain(make, n):
        def f(v0):
            fvp = make()
            def body(v, _):
                w = fvp(v)
                return w / (jnp.linalg.norm(w) + 1e-8), ()
            v, _ = jax.lax.scan(body, v0, None, length=n)
            return v
        return jax.jit(f)

    def timed(make, lo=200, hi=3200, reps=3):
        c_lo, c_hi = chain(make, lo), chain(make, hi)
        _fetch(c_lo(v0)); _fetch(c_hi(v0))          # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter(); _fetch(c_lo(v0))
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter(); _fetch(c_hi(v0))
            t_hi = time.perf_counter() - t0
            best = min(best, (t_hi - t_lo) / (hi - lo))
        return 1e3 * best

    variants = [("xla", lambda: make_gn_fvp(params, unravel, obs, 0.1))]
    for bb in (512, 1024, 2048, 4096):
        if args.batch % bb:
            continue
        for name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
            variants.append((
                f"pallas_b{bb}_{name}",
                lambda bb=bb, dt=dt: make_pallas_gn_fvp(
                    params, unravel, obs, 0.1, block_b=bb,
                    compute_dtype=dt)))

    for name, make in variants:
        try:
            ms = timed(make)
            print(f"{name:22s} {ms:8.4f} ms/call", flush=True)
        except Exception as e:
            print(f"{name:22s} FAILED: {type(e).__name__}: {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
