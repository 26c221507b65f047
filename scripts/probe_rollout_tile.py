#!/usr/bin/env python
"""Rollout tile-width A/B on the REAL 3-D kernel (round 4, VERDICT r3
next-1b): does widening the env tile (bf16 bb 256 -> 512, i.e. pack2
lane streams 128 -> 256 per MXU pass) speed the fused rollout?

bb=512 bf16 outputs are ~12.7 MB double-buffered — over auto_block_b's
4 MB budget but possibly inside the 16 MB VMEM scope in PRNG mode (no
eps input block). If it compiles and the rollout gets faster, wider
streams engage more MXU throughput and a T-chunked grid (which makes
bb=1024+ affordable) is the next lever; if it compiles and is NOT
faster, the single-MXU-pass floor claim in docs/performance.md is
measured, not judged. Slope-timed (chained scan, one fetch). Run alone.
"""
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

    from trpo_robot_control_tpu.configs import CONFIGS
    from trpo_robot_control_tpu.envs import arm
    from trpo_robot_control_tpu.models import policy
    from trpo_robot_control_tpu.ops.pallas.rollout3d_kernel import (
        pallas_rollout3d)

    cfg = CONFIGS[os.environ.get("PROBE_CONFIG", "c3_franka7")]
    N = int(os.environ.get("PROBE_ENVS", cfg.n_envs))
    print(f"# {cfg.name}: N={N} T={cfg.horizon} bf16 emission, PRNG mode",
          flush=True)
    state_key = jax.random.PRNGKey(0)
    params = policy.init_params(
        jax.random.PRNGKey(1), cfg.obs_dim, cfg.arm.n_joints,
        cfg.trpo.hidden, cfg.trpo.logstd_init)

    def make_chain(bb, tc, n):
        def body(k, _):
            k, k2 = jax.random.split(k)
            batch = pallas_rollout3d(cfg, params, k2, n_envs=N,
                                     block_b=bb, t_chunk=tc,
                                     store_dtype=jnp.bfloat16)
            # consume rewards_ff (kernel-native) so no transpose rides
            # along in the timing
            return k, batch["rewards_ff"].sum()
        return jax.jit(lambda k: jax.lax.scan(body, k, None, length=n))

    def timed(bb, tc, n, reps=3):
        r = make_chain(bb, tc, n)
        _fetch(r(state_key)[1])
        best = float("inf")
        for i in range(reps):
            t0 = time.perf_counter()
            _fetch(r(jax.random.PRNGKey(10 + i))[1])
            best = min(best, time.perf_counter() - t0)
        return best

    n_lo, n_hi = 4, 24
    import json
    cases = json.loads(os.environ.get(
        "PROBE_CASES",
        "[[256, null], [256, 40], [512, 40], [1024, 40], [1024, 8]]"))
    for bb, tc in cases:
        if N % bb:
            continue
        try:
            s = (timed(bb, tc, n_hi) - timed(bb, tc, n_lo)) / (n_hi - n_lo)
        except Exception as e:
            print(f"bb={bb} Tc={tc}: FAILED ({type(e).__name__}): "
                  f"{str(e)[:300]}", flush=True)
            continue
        steps = N * cfg.horizon
        print(f"bb={bb} Tc={str(tc):>4}: {1e3 * s:8.3f} ms/rollout "
              f"({steps / s / 1e6:7.1f} M env-steps/s)", flush=True)


if __name__ == "__main__":
    main()
