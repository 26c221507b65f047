#!/usr/bin/env python
"""Size the in-kernel action-sampling cost of the fused 3-D rollout.

The non-terminating fast path has almost no transcendentals left in the
dynamics (incremental trig), but the Box-Muller sampler still costs
n_act x (log + sqrt + cos) per step (~64 ns per (1,B) transcendental,
scripts/probe_vpu.py). This times the SAME kernel at c3 scale in:

  prng mode  — on-chip PRNG + Box-Muller per step (production path)
  eps mode   — normals precomputed outside and streamed from HBM
               (the twin-test path; ~23 MB extra HBM read at c3)

The difference bounds what a cheaper sampler can win. Both modes run
at block_b=128: the (T, n, bb) eps input block on top of the output
blocks exceeds the 16 MB VMEM scope at the production block 512, so
the comparison drops both to 128 (same relative per-step costs).
Run alone.
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
    from trpo_robot_control_tpu.ops.pallas.rollout3d_kernel import \
        pallas_rollout3d
    from trpo_robot_control_tpu.trpo.train import init_state

    cfg = CONFIGS[os.environ.get("PROBE_CONFIG", "c3_franka7")]
    T, N, n = cfg.horizon, cfg.n_envs, cfg.arm.n_joints
    state = init_state(cfg, seed=0)
    params = state.params
    eps = jax.random.normal(jax.random.PRNGKey(7), (T, N, n), jnp.float32)

    def chain(n_steps, use_eps):
        def run(params, eps):
            def body(acc, _):
                # carry-dependent perturbation so XLA can't hoist
                p = dict(params)
                p["b0"] = p["b0"] + acc * 1e-30
                kw = dict(eps=eps) if use_eps else {}
                batch = pallas_rollout3d(cfg, p, 0, block_b=128, **kw)
                return acc + jnp.mean(batch["rewards"]) * 1e-20, None
            acc, _ = jax.lax.scan(body, jnp.float32(0), None,
                                  length=n_steps)
            return acc
        return jax.jit(run)

    n_lo, n_hi = 4, 24
    for tag, use_eps in (("prng", False), ("eps", True)):
        lo, hi = chain(n_lo, use_eps), chain(n_hi, use_eps)
        _fetch(lo(params, eps)); _fetch(hi(params, eps))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); _fetch(lo(params, eps))
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter(); _fetch(hi(params, eps))
            t_hi = time.perf_counter() - t0
            best = min(best, (t_hi - t_lo) / (n_hi - n_lo))
        ms = 1e3 * best
        steps = T * N
        print(f"{tag:5s} {ms:8.3f} ms/rollout  "
              f"{steps / best / 1e6:7.1f} M steps/s", flush=True)


if __name__ == "__main__":
    main()
