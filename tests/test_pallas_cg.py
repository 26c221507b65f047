"""Whole-CG-in-one-kernel vs the per-call FVP + fori_loop CG twin
(SURVEY.md section 6.3)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from trpo_robot_control_tpu.models import policy
from trpo_robot_control_tpu.ops.cg import conjugate_gradient
from trpo_robot_control_tpu.ops.fvp import make_gn_fvp
from trpo_robot_control_tpu.ops.pallas.cg_kernel import make_pallas_cg


def _setup(B=700, do=12, da=3, hidden=(64, 64), seed=0):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    params = policy.init_params(k1, do, da, hidden, -0.5)
    params["W%d" % len(hidden)] = 0.3 * jax.random.normal(
        k2, params["W%d" % len(hidden)].shape)
    obs = jax.random.normal(k3, (B, do))
    theta, unravel = ravel_pytree(params)
    return params, unravel, obs, theta


@pytest.mark.parametrize("shape", [
    dict(B=700, do=12, da=3, hidden=(64, 64)),      # padded tail
    dict(B=512, do=9, da=2, hidden=(32,)),          # 1 hidden layer
])
def test_fused_cg_matches_loop_cg(shape):
    hidden = shape.pop("hidden")
    params, unravel, obs, theta = _setup(hidden=hidden, **shape)
    damping, iters = 0.1, 10

    fvp = make_gn_fvp(params, unravel, obs, damping)
    solve = make_pallas_cg(params, unravel, obs, damping, iters,
                           block_b=256, interpret=True)

    for s in range(2):
        g = jax.random.normal(jax.random.PRNGKey(50 + s), theta.shape)
        x_ref, r_ref, rr_ref = conjugate_gradient(fvp, g, iters)
        x, r, rr = solve(g)
        cos = float(jnp.dot(x, x_ref) /
                    (jnp.linalg.norm(x) * jnp.linalg.norm(x_ref)))
        assert cos > 0.99999, cos
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                                   rtol=5e-3, atol=1e-5)
        # curvature via the CG invariant matches too
        xhx_ref = float(jnp.dot(x_ref, g) - jnp.dot(x_ref, r_ref))
        xhx = float(jnp.dot(x, g) - jnp.dot(x, r))
        np.testing.assert_allclose(xhx, xhx_ref, rtol=1e-3)


def test_fused_cg_inside_jit():
    params, unravel, obs, theta = _setup()

    @jax.jit
    def run(g):
        solve = make_pallas_cg(params, unravel, obs, 0.1, 10,
                               block_b=256, interpret=True)
        return solve(g)

    g = jax.random.normal(jax.random.PRNGKey(3), theta.shape)
    x, r, rr = run(g)
    assert np.isfinite(np.asarray(x)).all()
    assert float(rr) >= 0.0
