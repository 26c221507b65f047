#!/usr/bin/env python
"""Convergence A/B for trpo.ff_store_dtype="bf16" at full c4 scale.

bf16 storage rounds (a) the kernel-emitted obs_ff/actions_ff and (b)
the surrogate-gradient pass's hidden activations/cotangents; every
contraction still accumulates fp32. The gradient-level error is bounded
by tests/test_ff_baseline.py; this is the end-to-end check (same seed,
40 iters, full 16k-env c4) that decided bf16 as the c3-c5 default
(docs/performance.md "Storage dtype", round 3).

  python scripts/ab_bf16.py            # orchestrate both arms
  python scripts/ab_bf16.py one f32|bf16 [config] [iters] [seed]
"""
import sys

from _ab_common import ab_main

if __name__ == "__main__":
    sys.exit(ab_main(__file__, ("ff_store_dtype", ("f32", "bf16"))))
