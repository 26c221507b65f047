#!/usr/bin/env python
"""Ablate where c2's per-update time goes (CG vs the rest).

Times `make_train_many` chains at cg_iters in {10, 1} and ls_steps in
{10, 1} with bench.py's fetch-forced method, and prints the marginal
cost of 9 CG/FVP iterations and 9 line-search exponents. Leaves data
for the next optimization round (docs/performance.md "where the
remaining time goes").

Run alone (never concurrently with another TPU process).
"""
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fetch(x):
    return float(np.asarray(x).ravel()[-1])


def _make_rollout_many(cfg, n_steps):
    """Chain of rollouts alone (policy fwd + dynamics, no TRPO update):
    isolates the rollout term of the per-update time."""
    import jax
    import jax.numpy as jnp

    from trpo_robot_control_tpu.envs import arm

    rollout_fn = arm.make_rollout_fn(cfg)

    def many(params, key):
        def body(carry, _):
            k, acc = carry
            k, k_roll = jax.random.split(k)
            batch = rollout_fn(params, k_roll)
            return (k, acc + jnp.mean(batch["rewards"])), None

        (_, acc), _ = jax.lax.scan(body, (key, jnp.float32(0)), None,
                                   length=n_steps)
        return acc

    return jax.jit(many)


def main():
    import argparse

    import jax

    from trpo_robot_control_tpu.configs import CONFIGS
    from trpo_robot_control_tpu.trpo.train import init_state, make_train_many

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="c2_reacher3")
    ap.add_argument("--chain", type=int, nargs=2, default=None,
                    metavar=("LO", "HI"))
    args = ap.parse_args()
    base = CONFIGS[args.config]
    # slope between two chain lengths cancels the ~30-40 ms tunnel fetch
    # jitter; chain lengths scale inversely with per-update cost
    defaults = {"c1_reacher2": (32, 512), "c2_reacher3": (32, 512),
                "c3_franka7": (8, 64), "c4_franka7_obstacle": (4, 24),
                "c5_multitask": (2, 10)}
    n_lo, n_hi = args.chain or defaults.get(args.config, (8, 64))
    results = {}

    # rollout-only term first
    ro_lo = _make_rollout_many(base, n_lo)
    ro_hi = _make_rollout_many(base, n_hi)
    st0 = init_state(base, seed=0)
    k = jax.random.PRNGKey(0)
    _fetch(ro_lo(st0.params, k)); _fetch(ro_hi(st0.params, k))  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); _fetch(ro_lo(st0.params, k))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter(); _fetch(ro_hi(st0.params, k))
        t_hi = time.perf_counter() - t0
        best = min(best, (t_hi - t_lo) / (n_hi - n_lo))
    results["rollout_only"] = 1e3 * best
    print(f"{'rollout_only':18s} {results['rollout_only']:7.3f} ms/update",
          flush=True)

    for tag, trpo_kw in [
        ("base(cg10,ls10)", {}),
        ("cg1", {"cg_iters": 1}),
        ("ls1", {"ls_steps": 1}),
        ("cg1+ls1", {"cg_iters": 1, "ls_steps": 1}),
    ]:
        cfg = base.replace(trpo=dataclasses.replace(base.trpo, **trpo_kw))
        state = init_state(cfg, seed=0)
        many_lo = make_train_many(cfg, n_lo, mesh=None)
        many_hi = make_train_many(cfg, n_hi, mesh=None)
        def fresh():            # the train step donates its state args
            return jax.tree.map(lambda x: x.copy(), state)

        _, stats = many_lo(fresh()); _fetch(stats["mean_return"])  # compile
        _, stats = many_hi(fresh()); _fetch(stats["mean_return"])
        best = float("inf")
        for _ in range(3):
            s = fresh(); _fetch(s.params["logstd"])
            t0 = time.perf_counter()
            _, stats = many_lo(s); _fetch(stats["mean_return"])
            t_lo = time.perf_counter() - t0
            s = fresh(); _fetch(s.params["logstd"])
            t0 = time.perf_counter()
            _, stats = many_hi(s); _fetch(stats["mean_return"])
            t_hi = time.perf_counter() - t0
            best = min(best, (t_hi - t_lo) / (n_hi - n_lo))
        results[tag] = 1e3 * best
        print(f"{tag:18s} {results[tag]:7.3f} ms/update", flush=True)

    cg9 = results["base(cg10,ls10)"] - results["cg1"]
    ls9 = results["base(cg10,ls10)"] - results["ls1"]
    print(json.dumps({
        "config": args.config,
        "per_update_ms": results,
        "marginal_9_cg_fvp_ms": cg9,
        "per_fvp_iter_ms": cg9 / 9.0,
        "marginal_9_ls_steps_ms": ls9,
        "residual_cg1_ls1_ms": results["cg1+ls1"],
        "update_side_ms": results["cg1+ls1"] - results["rollout_only"],
    }, indent=2))


if __name__ == "__main__":
    main()
