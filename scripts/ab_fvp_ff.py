#!/usr/bin/env python
"""Convergence A/B for the ff-native FVP kernel at full c4 scale:
fvp_impl="pallas" (ff-native kernel, ops/pallas/fvp_ff_kernel.py) vs
"pallas_bm" (the round-2 batch-major kernel on the relaid-out fp32
subsample). Measured 2026-08-20: last5 -86.81 (ff) vs -86.66 (bm),
one near-boundary iteration backtracks to k=1, KL <= delta throughout
— indistinguishable (docs/performance.md round 5).

  python scripts/ab_fvp_ff.py            # orchestrate both arms
  python scripts/ab_fvp_ff.py one pallas|pallas_bm [config] [iters] [seed]
"""
import sys

from _ab_common import ab_main

if __name__ == "__main__":
    sys.exit(ab_main(__file__, ("fvp_impl", ("pallas_bm", "pallas"))))
