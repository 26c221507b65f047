"""Worker for tests/test_distributed.py: one of two CPU processes with 4
fake local devices each, joined into one 8-device global mesh via
`jax.distributed` (the engine's DCN entry, parallel/mesh.py:
init_distributed). Runs 2 sharded train-step iterations; process 0
writes the flattened params + stats to the npz path in argv[1].
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4"
                           ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from jax.flatten_util import ravel_pytree  # noqa: E402

from trpo_robot_control_tpu.configs import C1_REACHER2  # noqa: E402
from trpo_robot_control_tpu.parallel.mesh import (  # noqa: E402
    init_distributed, make_mesh, make_sharded_train_step)
from trpo_robot_control_tpu.trpo.train import init_state  # noqa: E402


def main():
    out_path = sys.argv[1]
    init_distributed()
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())
    assert len(jax.local_devices()) == 4

    cfg = C1_REACHER2.replace(n_envs=32, horizon=20)
    mesh = make_mesh(n_data=8)
    state = init_state(cfg, seed=0)
    # plain host arrays are treated as replicated across processes
    state = jax.tree.map(np.asarray, state)
    step = make_sharded_train_step(cfg, mesh, donate=False)
    state, stats = step(state)
    theta, _ = ravel_pytree(jax.device_get(state.params))
    if jax.process_index() == 0:
        np.savez(out_path, theta=np.asarray(theta),
                 mean_return=float(stats["mean_return"]),
                 kl=float(stats["kl"]),
                 accepted=int(stats["accepted"]))
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
