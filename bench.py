#!/usr/bin/env python
"""Benchmark harness (SURVEY.md section 8 metrics contract).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Headline metric: FVP-CG natural-gradient updates/s on config 2 (3-link
arm, 1024 envs, horizon 100, 10 CG iterations) — one full TRPO iteration
(rollout + GAE + baseline refit + CG natural gradient + KL line search)
entirely on-device per update.

Timing method: K updates are chained on-device with `lax.scan` (one
dispatch, one result fetch) because on this tunnelled TPU runtime
`block_until_ready` returns at enqueue-ack, not completion — only a host
fetch of the result forces truth. The measured one-off fetch round-trip
(~40 ms here) is subtracted.

`vs_baseline`: speedup over the reference TRPO implementation's per-update
latency at the same config. The reference mount was empty (SURVEY.md
section 0), so the stand-in is this repo's fp64 NumPy oracle — the
"pure-NumPy/CPU reference TRPO update" of BASELINE.json config 1 — measured
on this machine: 615.5 s/update at config 2 (rollout 543.9 s + update
71.6 s; reproduce with `python bench.py --measure-oracle`).

Details (rollout steps/s/chip, per-update latency, compile time) go to
bench_details.json next to this file.
"""
import argparse
import json
import os
import sys
import time

# fp64 NumPy oracle on this machine's CPU, config 2 (1024 envs x horizon
# 100): one full TRPO update. Measured 2026-08-17; reproduce with
# --measure-oracle.
ORACLE_C2_SECONDS_PER_UPDATE = 615.5


def measure_oracle():
    import numpy as np

    from oracle import net
    from oracle.trpo import OracleEnv, collect_rollouts, trpo_update
    from trpo_robot_control_tpu.configs import C2_REACHER3
    cfg = C2_REACHER3
    rng = np.random.RandomState(0)
    env = OracleEnv(cfg)
    params = net.init_params(rng, cfg.arm.obs_dim, cfg.arm.n_joints,
                             cfg.trpo.hidden, cfg.trpo.logstd_init)
    w = np.zeros(2 * cfg.arm.obs_dim + 4)
    t0 = time.perf_counter()
    batch = collect_rollouts(cfg, env, params, rng)
    t1 = time.perf_counter()
    trpo_update(cfg, params, w, batch)
    t2 = time.perf_counter()
    print(f"rollout_s={t1 - t0:.3f} update_s={t2 - t1:.3f} "
          f"total_s={t2 - t0:.3f}")
    return t2 - t0


def _fetch(x):
    """Force completion: pull one scalar to host."""
    import numpy as np
    return float(np.asarray(x).ravel()[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="c2_reacher3")
    ap.add_argument("--updates", type=int, default=16,
                    help="updates per timed block (device-chained)")
    ap.add_argument("--blocks", type=int, default=3)
    ap.add_argument("--measure-oracle", action="store_true")
    args = ap.parse_args()

    if args.measure_oracle:
        measure_oracle()
        return

    import jax

    from trpo_robot_control_tpu.configs import CONFIGS
    from trpo_robot_control_tpu.envs import arm
    from trpo_robot_control_tpu.models import policy
    from trpo_robot_control_tpu.parallel.mesh import make_mesh
    from trpo_robot_control_tpu.trpo.train import (init_state,
                                                   make_train_many)

    cfg = CONFIGS[args.config]
    n_dev = len(jax.devices())
    mesh = make_mesh() if n_dev > 1 else None
    state = init_state(cfg, seed=0)
    many = make_train_many(cfg, args.updates, mesh=mesh)

    # --- measure host fetch round-trip floor (single compiled fn, chained)
    inc = jax.jit(lambda x: x + 1.0)
    z = inc(jax.numpy.float32(0.0))
    _fetch(z)                      # compile + first round trip
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        z = inc(z)
        _fetch(z)
    fetch_s = (time.perf_counter() - t0) / reps

    # --- warmup / compile
    t0 = time.perf_counter()
    state, stats = many(state)
    _fetch(stats["mean_return"])
    compile_s = time.perf_counter() - t0

    # --- timed blocks
    best = float("inf")
    last_return = None
    for _ in range(args.blocks):
        t0 = time.perf_counter()
        state, stats = many(state)
        last_return = _fetch(stats["mean_return"])
        elapsed = time.perf_counter() - t0 - fetch_s
        best = min(best, elapsed / args.updates)
    updates_per_s = 1.0 / best
    per_update_ms = 1e3 * best

    # --- rollout-only steps/s/chip: slope between chain lengths removes
    # both the fetch round-trip and any constant dispatch cost
    rollout_fn = arm.make_rollout_fn(cfg)

    def roll_chain(n):
        def body(k, _):
            k, k2 = jax.random.split(k)
            batch = rollout_fn(state.params, k2)
            return k, batch["rewards"].sum()
        return jax.jit(lambda k: jax.lax.scan(body, k, None, length=n))

    def timed(n, reps=2):
        r = roll_chain(n)
        _fetch(r(jax.random.PRNGKey(0))[1])          # compile + warm
        best = float("inf")
        for i in range(reps):
            t0 = time.perf_counter()
            _fetch(r(jax.random.PRNGKey(1 + i))[1])
            best = min(best, time.perf_counter() - t0)
        return best

    # long chains: fused rollouts are sub-ms, so the slope must be far
    # above the ~ms fetch jitter
    k_lo, k_hi = 8, 104
    roll_s = max((timed(k_hi) - timed(k_lo)) / (k_hi - k_lo), 1e-6)
    env_steps = cfg.n_envs * cfg.horizon
    steps_per_s_chip = env_steps / roll_s / max(n_dev, 1)

    vs_baseline = updates_per_s * ORACLE_C2_SECONDS_PER_UPDATE \
        if args.config == "c2_reacher3" else None

    details = dict(
        config=cfg.name, n_devices=n_dev,
        device_kind=jax.devices()[0].device_kind,
        updates_per_s=updates_per_s, per_update_ms=per_update_ms,
        rollout_steps_per_s_per_chip=steps_per_s_chip,
        env_steps_per_update=env_steps, compile_s=compile_s,
        fetch_roundtrip_ms=1e3 * fetch_s,
        oracle_seconds_per_update=ORACLE_C2_SECONDS_PER_UPDATE,
        final_return=last_return,
    )
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_details.json"), "w") as f:
        json.dump(details, f, indent=2)

    print(json.dumps({
        "metric": "fvp_cg_natural_gradient_updates_per_s",
        "value": round(updates_per_s, 4),
        "unit": "updates/s",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
    }))


if __name__ == "__main__":
    sys.exit(main())
