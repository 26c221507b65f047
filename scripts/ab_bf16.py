#!/usr/bin/env python
"""Convergence A/B for trpo.ff_store_dtype="bf16" at full c4 scale.

bf16 storage rounds (a) the kernel-emitted obs_ff/actions_ff and (b)
the surrogate-gradient pass's hidden activations/cotangents; every
contraction still accumulates fp32. The gradient-level error is bounded
by tests/test_ff_baseline.py; this is the end-to-end check (same seed,
40 iters, full 16k-env c4) that decides whether bf16 becomes the c3-c5
default. One subprocess per arm (docs/performance.md pitfall 4).

  python scripts/ab_bf16.py            # orchestrate both arms
  python scripts/ab_bf16.py one f32|bf16 [config] [iters]
"""
import dataclasses
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_one(dtype, name, n_iters):
    import numpy as np

    from trpo_robot_control_tpu.configs import CONFIGS
    from trpo_robot_control_tpu.trpo.train import train

    base = CONFIGS[name]
    cfg = base.replace(trpo=dataclasses.replace(base.trpo,
                                                ff_store_dtype=dtype))
    _, hist = train(cfg, n_iters=n_iters, seed=0)
    rets = [float(h["mean_return"]) for h in hist]
    kls = [float(h["kl"]) for h in hist]
    print("RESULT " + json.dumps(dict(
        first3=float(np.mean(rets[:3])), last5=float(np.mean(rets[-5:])),
        final=rets[-1], max_kl=max(kls),
        # stats["accepted"] is the accepted line-search EXPONENT k
        # (k = 0 is the full step), not a boolean
        max_accepted_k=max(int(h["accepted"]) for h in hist))))


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "one":
        name = sys.argv[3] if len(sys.argv) > 3 else "c4_franka7_obstacle"
        iters = int(sys.argv[4]) if len(sys.argv) > 4 else 40
        return run_one(sys.argv[2], name, iters)

    out = {}
    for dtype in ("f32", "bf16"):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "one", dtype],
            capture_output=True, text=True, timeout=3600,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        line = [l for l in r.stdout.splitlines()
                if l.startswith("RESULT ")]
        if not line:
            print(f"{dtype} FAILED:\n{r.stderr[-1500:]}", file=sys.stderr)
            return 1
        out[dtype] = json.loads(line[0][len("RESULT "):])
        print(f"# {dtype}: " + json.dumps(out[dtype]), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
