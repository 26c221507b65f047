"""TPU regression smoke test (SURVEY.md section 6.3; VERDICT r1 item 4).

Runs `scripts/tpu_checks.py` — compiled-kernel-vs-twin equivalence, PRNG
determinism, shard_map-on-a-real-mesh composition, and a short fused
training run — in a SUBPROCESS, because:

- the pytest process is pinned to the fake 8-device CPU mesh by
  conftest.py (fast, deterministic unit tests), and
- only one TPU client may exist at a time on the tunnelled chip, so the
  TPU work must live in its own exclusive process.

Select with `pytest -m tpu` on a machine with the chip; the test skips
cleanly (subprocess exit 3) when no TPU is present. The captured output
is written to artifacts/tpu_checks_latest.txt so each round's compiled
-kernel evidence can be committed.
"""
import os
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


@pytest.mark.tpu
def test_tpu_checks_suite():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    try:
        proc = subprocess.run(
            [sys.executable, str(REPO / "scripts" / "tpu_checks.py")],
            cwd=REPO, env=env, capture_output=True, text=True,
            timeout=1800)
    except subprocess.TimeoutExpired:
        pytest.skip("TPU backend unreachable (tunnel hang)")
    out = proc.stdout + proc.stderr
    art = REPO / "artifacts"
    art.mkdir(exist_ok=True)
    (art / "tpu_checks_latest.txt").write_text(out)
    if proc.returncode == 3:
        pytest.skip("no TPU device available")
    assert proc.returncode == 0, out[-4000:]
    assert "ALL TPU CHECKS PASSED" in out
