"""Shared harness for the convergence A/B scripts (ab_bf16 /
ab_surrgrad / ab_fvp_ff): each arm runs the full-scale training in its
OWN subprocess (docs/performance.md pitfall 4 — the tunnelled TPU
worker cannot hold several configs' programs in one process) and
reports a RESULT json line; the orchestrator exits non-zero when an
arm fails."""
import dataclasses
import json
import os
import subprocess
import sys


def run_one(field, value, name, n_iters, seed):
    """Run one arm in-process: train `name` with TRPOSpec.`field`
    replaced by `value`, print the RESULT line."""
    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), ".."))
    from trpo_robot_control_tpu.configs import CONFIGS
    from trpo_robot_control_tpu.trpo.train import train

    base = CONFIGS[name]
    cfg = base.replace(trpo=dataclasses.replace(base.trpo,
                                                **{field: value}))
    _, hist = train(cfg, n_iters=n_iters, seed=seed)
    rets = [float(h["mean_return"]) for h in hist]
    kls = [float(h["kl"]) for h in hist]
    print("RESULT " + json.dumps(dict(
        first3=float(np.mean(rets[:3])), last5=float(np.mean(rets[-5:])),
        final=rets[-1], max_kl=max(kls),
        # stats["accepted"] is the accepted line-search EXPONENT k
        # (k = 0 is the full step), not a boolean
        max_accepted_k=max(int(h["accepted"]) for h in hist))))


def ab_main(script_path, arms, default_config="c4_franka7_obstacle",
            default_iters=40):
    """CLI entry shared by the ab_* scripts. `arms` = (field, values).
    Usage: <script>                 -> orchestrate all arms
           <script> one VALUE [config] [iters] [seed] -> one arm."""
    field, values = arms
    if len(sys.argv) > 1 and sys.argv[1] == "one":
        name = sys.argv[3] if len(sys.argv) > 3 else default_config
        iters = int(sys.argv[4]) if len(sys.argv) > 4 else default_iters
        seed = int(sys.argv[5]) if len(sys.argv) > 5 else 0
        return run_one(field, sys.argv[2], name, iters, seed) or 0

    out = {}
    for value in values:
        r = subprocess.run(
            [sys.executable, os.path.abspath(script_path), "one", value],
            capture_output=True, text=True, timeout=3600,
            cwd=os.path.dirname(os.path.dirname(
                os.path.abspath(script_path))))
        line = [l for l in r.stdout.splitlines()
                if l.startswith("RESULT ")]
        if not line:
            print(f"{value} FAILED:\n{r.stderr[-1500:]}", file=sys.stderr)
            return 1
        out[value] = json.loads(line[0][len("RESULT "):])
        print(f"# {value}: " + json.dumps(out[value]), flush=True)
    print(json.dumps(out))
    return 0
