#!/usr/bin/env python
"""Convergence A/B for the ff-native FVP kernel at full c4 scale:
fvp_impl="pallas" (ff-native kernel, ops/pallas/fvp_ff_kernel.py) vs
"pallas_bm" (the round-2 batch-major kernel on the relaid-out fp32
subsample). The ff kernel streams bf16 weight/obs operands where the
batch-major one streams fp32 (same MXU operand rounding at DEFAULT
precision, different association) — this is the end-to-end decision
check mirroring scripts/ab_surrgrad.py.

  python scripts/ab_fvp_ff.py            # orchestrate both arms
  python scripts/ab_fvp_ff.py one pallas|pallas_bm [config] [iters] [seed]
"""
import dataclasses
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_one(impl, name, n_iters, seed):
    import numpy as np

    from trpo_robot_control_tpu.configs import CONFIGS
    from trpo_robot_control_tpu.trpo.train import train

    base = CONFIGS[name]
    cfg = base.replace(trpo=dataclasses.replace(base.trpo,
                                                fvp_impl=impl))
    _, hist = train(cfg, n_iters=n_iters, seed=seed)
    rets = [float(h["mean_return"]) for h in hist]
    kls = [float(h["kl"]) for h in hist]
    print("RESULT " + json.dumps(dict(
        first3=float(np.mean(rets[:3])), last5=float(np.mean(rets[-5:])),
        final=rets[-1], max_kl=max(kls),
        max_accepted_k=max(int(h["accepted"]) for h in hist))))


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "one":
        name = sys.argv[3] if len(sys.argv) > 3 else "c4_franka7_obstacle"
        iters = int(sys.argv[4]) if len(sys.argv) > 4 else 40
        seed = int(sys.argv[5]) if len(sys.argv) > 5 else 0
        return run_one(sys.argv[2], name, iters, seed)

    out = {}
    for impl in ("pallas_bm", "pallas"):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "one", impl],
            capture_output=True, text=True, timeout=3600,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        line = [l for l in r.stdout.splitlines()
                if l.startswith("RESULT ")]
        if not line:
            print(f"{impl} FAILED:\n{r.stderr[-1500:]}", file=sys.stderr)
            return 1
        out[impl] = json.loads(line[0][len("RESULT "):])
        print(f"# {impl}: " + json.dumps(out[impl]), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
