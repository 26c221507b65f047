#!/usr/bin/env python
"""Measure the fused surrogate-gradient kernel vs the XLA twin at
config scale (round 5). Run alone (never with another TPU process)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fetch(x):
    return float(np.asarray(x).ravel()[-1])


def _slope_time(fn, args, n_lo=4, n_hi=20, reps=3):
    import jax
    import jax.numpy as jnp

    def chain(n):
        def run(*a):
            def body(acc, _):
                eps = (acc * 1e-30).astype(a[0].dtype)
                out = fn(a[0] + eps, *a[1:])
                leaves = [jnp.sum(x.astype(jnp.float32))
                          for x in jax.tree.leaves(out)]
                return acc + sum(leaves) * 1e-20, None
            acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return acc
        return jax.jit(run)

    c_lo, c_hi = chain(n_lo), chain(n_hi)
    _fetch(c_lo(*args)); _fetch(c_hi(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); _fetch(c_lo(*args))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter(); _fetch(c_hi(*args))
        t_hi = time.perf_counter() - t0
        best = min(best, (t_hi - t_lo) / (n_hi - n_lo))
    return 1e3 * best


def main():
    import jax
    import jax.numpy as jnp

    from trpo_robot_control_tpu.configs import CONFIGS
    from trpo_robot_control_tpu.models import policy
    from trpo_robot_control_tpu.ops.pallas.pg_kernel import (
        pallas_surrogate_grad_ff, pg_tiles)
    from trpo_robot_control_tpu.trpo.train import init_state

    for name in sys.argv[1:] or ["c3_franka7"]:
        cfg = CONFIGS[name]
        T, N, do, da = (cfg.horizon, cfg.n_envs, cfg.obs_dim,
                        cfg.arm.n_joints)
        dt = jnp.bfloat16 if cfg.trpo.ff_store_dtype == "bf16" \
            else jnp.float32
        params = init_state(cfg, seed=0).params
        k = jax.random.split(jax.random.PRNGKey(0), 3)
        obs = jax.random.normal(k[0], (T, do, N), jnp.float32).astype(dt)
        act = (0.3 * jax.random.normal(k[1], (T, da, N),
                                       jnp.float32)).astype(dt)
        adv = jax.random.normal(k[2], (T, N), jnp.float32)
        store = jnp.bfloat16 if dt == jnp.bfloat16 else None

        def twin(o, a, ad):
            return policy.surrogate_grad_ff(params, o, a, ad,
                                            store_dtype=store)

        ms_twin = _slope_time(twin, (obs, act, adv))
        bn, tc = pg_tiles(T, N)
        print(f"{name}: twin {ms_twin:8.3f} ms   (tiles bn={bn} tc={tc})",
              flush=True)
        for bnv, tcv in [(None, None), (512, None), (1024, 4),
                         (512, 4), (1024, 8)]:
            bn2, tc2 = pg_tiles(T, N, bnv, tcv)
            if not bn2 or N % (2 * bn2) or T % tc2:
                continue

            def kern(o, a, ad):
                return pallas_surrogate_grad_ff(params, o, a, ad,
                                                block_n=bnv,
                                                t_chunk=tcv)

            ms_k = _slope_time(kern, (obs, act, adv))
            print(f"  kernel bn={bn2:5d} tc={tc2:2d}: {ms_k:8.3f} ms "
                  f"({ms_twin / max(ms_k, 1e-9):.2f}x)", flush=True)


if __name__ == "__main__":
    main()
