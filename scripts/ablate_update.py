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


def main():
    import jax

    from trpo_robot_control_tpu.configs import CONFIGS
    from trpo_robot_control_tpu.trpo.train import init_state, make_train_many

    base = CONFIGS["c2_reacher3"]
    n_lo, n_hi = 32, 512     # slope between two chain lengths cancels
    results = {}             # the ~30-40 ms tunnel fetch jitter
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
        "per_update_ms": results,
        "marginal_9_cg_fvp_ms": cg9,
        "per_fvp_iter_ms": cg9 / 9.0,
        "marginal_9_ls_steps_ms": ls9,
        "residual_cg1_ls1_ms": results["cg1+ls1"],
    }, indent=2))


if __name__ == "__main__":
    main()
