"""Pallas fused FVP kernel vs its pure-jnp/XLA twin (SURVEY.md section
6.3 — our "Simulation RunRule": interpret=True on CPU in CI, compiled on
real TPU via the `tpu` marker subset)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from trpo_robot_control_tpu.models import policy
from trpo_robot_control_tpu.ops.fvp import make_gn_fvp
from trpo_robot_control_tpu.ops.pallas.fvp_kernel import make_pallas_gn_fvp


def _setup(B=300, do=9, da=2, hidden=(64, 64), seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    params = policy.init_params(k1, do, da, hidden, -0.5)
    # non-trivial final layer so mu isn't ~0
    params["W%d" % len(hidden)] = 0.3 * jax.random.normal(
        k2, params["W%d" % len(hidden)].shape)
    obs = jax.random.normal(jax.random.PRNGKey(seed + 1), (B, do))
    theta, unravel = ravel_pytree(params)
    return params, unravel, obs, theta


@pytest.mark.parametrize("shape", [
    dict(B=300, do=9, da=2, hidden=(64, 64)),     # c1-like, padded tail
    dict(B=512, do=24, da=7, hidden=(64, 64)),    # c3-like, exact tiles
    dict(B=100, do=5, da=3, hidden=(32,)),        # single hidden layer
    dict(B=1030, do=12, da=4, hidden=(64, 64, 64)),  # 3 hidden layers
])
def test_pallas_fvp_matches_xla(shape):
    hidden = shape.pop("hidden")
    params, unravel, obs, theta = _setup(hidden=hidden, **shape)
    f_ref = make_gn_fvp(params, unravel, obs, damping=0.1)
    f_pal = make_pallas_gn_fvp(params, unravel, obs, damping=0.1,
                               block_b=256, interpret=True)
    for s in range(3):
        v = jax.random.normal(jax.random.PRNGKey(100 + s), theta.shape)
        ref = np.asarray(f_ref(v))
        pal = np.asarray(f_pal(v))
        np.testing.assert_allclose(pal, ref, rtol=2e-4, atol=2e-6)


def test_pallas_fvp_inside_jit_cg():
    """The kernel composes with jit + the CG loop."""
    from trpo_robot_control_tpu.ops.cg import conjugate_gradient
    params, unravel, obs, theta = _setup()

    @jax.jit
    def solve(g):
        f = make_pallas_gn_fvp(params, unravel, obs, damping=0.1,
                               block_b=256, interpret=True)
        x, _, res = conjugate_gradient(f, g, 10)
        return x, res

    g = jax.random.normal(jax.random.PRNGKey(7), theta.shape)
    x, res = solve(g)
    f_ref = make_gn_fvp(params, unravel, obs, damping=0.1)
    x_ref, _, _ = conjugate_gradient(f_ref, g, 10)
    cos = float(jnp.dot(x, x_ref) /
                (jnp.linalg.norm(x) * jnp.linalg.norm(x_ref)))
    assert cos > 0.99999, cos
