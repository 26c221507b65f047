"""Force an 8-device CPU mesh for all tests (SURVEY.md section 6.4).

Must run before jax is imported anywhere, hence env vars are set at
conftest import time.
"""
import os

# The harness environment pins JAX_PLATFORMS=axon (one tunneled TPU chip);
# unit tests must run on the fake 8-device CPU mesh instead — fast compiles
# and deterministic numerics. TPU-only tests override via the `tpu` marker
# and a subprocess (see tests/test_tpu_smoke.py).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# In this environment the axon plugin wins over the JAX_PLATFORMS env var;
# the config API is authoritative, so force CPU through it as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
