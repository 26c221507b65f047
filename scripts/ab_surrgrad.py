#!/usr/bin/env python
"""Convergence A/B for trpo.surrgrad_impl="pallas" at full c4 scale.

The fused surrogate-gradient kernel (ops/pallas/pg_kernel.py) rounds
the policy WEIGHTS to the storage dtype for its in-kernel matmuls; the
XLA twin keeps fp32 weights in the HLO (though the MXU rounds them to
bf16 per pass at DEFAULT precision anyway). End-to-end decision check:
same seed, 40 iters, full 16k-env c4, arms in separate subprocesses.
Measured 2026-08-20: last5 -86.66 (pallas) vs -86.60 (xla), identical
acceptance — indistinguishable (docs/performance.md round 5).

  python scripts/ab_surrgrad.py            # orchestrate both arms
  python scripts/ab_surrgrad.py one pallas|xla [config] [iters] [seed]
"""
import sys

from _ab_common import ab_main

if __name__ == "__main__":
    sys.exit(ab_main(__file__, ("surrgrad_impl", ("xla", "pallas"))))
