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
    """fp32 compute mode is numerically equivalent to the XLA twin."""
    hidden = shape.pop("hidden")
    params, unravel, obs, theta = _setup(hidden=hidden, **shape)
    f_ref = make_gn_fvp(params, unravel, obs, damping=0.1)
    f_pal = make_pallas_gn_fvp(params, unravel, obs, damping=0.1,
                               block_b=256, interpret=True,
                               compute_dtype=jnp.float32)
    for s in range(3):
        v = jax.random.normal(jax.random.PRNGKey(100 + s), theta.shape)
        ref = np.asarray(f_ref(v))
        pal = np.asarray(f_pal(v))
        np.testing.assert_allclose(pal, ref, rtol=2e-4, atol=2e-6)


@pytest.mark.parametrize("shape", [
    dict(B=300, do=9, da=2, hidden=(64, 64)),        # wide-enough: packed
    dict(B=200, do=9, da=2, hidden=(96, 96)),        # >64 lanes: unpacked
    dict(B=257, do=9, da=2, hidden=(64, 64)),        # odd B, padded pack
])
def test_pallas_fvp_unpacked_equals_packed_paths(shape):
    """Auto path selection (pair-packed vs unpacked fallback) is exact
    against the XLA twin either way."""
    hidden = shape.pop("hidden")
    params, unravel, obs, theta = _setup(hidden=hidden, **shape)
    f_ref = make_gn_fvp(params, unravel, obs, damping=0.1)
    f_auto = make_pallas_gn_fvp(params, unravel, obs, damping=0.1,
                                block_b=128, interpret=True,
                                compute_dtype=jnp.float32)
    f_unpacked = make_pallas_gn_fvp(params, unravel, obs, damping=0.1,
                                    block_b=128, interpret=True,
                                    compute_dtype=jnp.float32,
                                    packed=False)
    for s in range(2):
        v = jax.random.normal(jax.random.PRNGKey(50 + s), theta.shape)
        ref = np.asarray(f_ref(v))
        np.testing.assert_allclose(np.asarray(f_auto(v)), ref,
                                   rtol=2e-4, atol=2e-6)
        np.testing.assert_allclose(np.asarray(f_unpacked(v)), ref,
                                   rtol=2e-4, atol=2e-6)


@pytest.mark.parametrize("shape", [
    dict(B=300, do=9, da=2, hidden=(64, 64)),     # padded tail
    dict(B=512, do=24, da=7, hidden=(64, 64)),    # exact tiles
])
def test_pallas_fvp_bf16_bounded(shape):
    """The production bf16 mode: Fv within ~bf16 rounding of exact, and
    damping keeps the relative error well-conditioned."""
    hidden = shape.pop("hidden")
    params, unravel, obs, theta = _setup(hidden=hidden, **shape)
    f_ref = make_gn_fvp(params, unravel, obs, damping=0.1)
    f_pal = make_pallas_gn_fvp(params, unravel, obs, damping=0.1,
                               block_b=256, interpret=True,
                               compute_dtype=jnp.bfloat16)
    for s in range(3):
        v = jax.random.normal(jax.random.PRNGKey(100 + s), theta.shape)
        ref = np.asarray(f_ref(v))
        pal = np.asarray(f_pal(v))
        denom = np.linalg.norm(ref)
        assert np.linalg.norm(pal - ref) / denom < 2e-2, \
            np.linalg.norm(pal - ref) / denom


@pytest.mark.parametrize("compute_dtype,min_cos",
                         [(jnp.float32, 0.99999), (jnp.bfloat16, 0.9999)])
def test_pallas_fvp_inside_jit_cg(compute_dtype, min_cos):
    """The kernel composes with jit + the CG loop; the bf16 production
    mode's CG direction stays within cosine >= 0.9999 of the exact fp32
    solve (tighter than the 0.999 oracle-parity contract, SURVEY.md 4.8)."""
    from trpo_robot_control_tpu.ops.cg import conjugate_gradient
    params, unravel, obs, theta = _setup(B=1024)

    @jax.jit
    def solve(g):
        f = make_pallas_gn_fvp(params, unravel, obs, damping=0.1,
                               block_b=256, interpret=True,
                               compute_dtype=compute_dtype)
        x, _, res = conjugate_gradient(f, g, 10)
        return x, res

    g = jax.random.normal(jax.random.PRNGKey(7), theta.shape)
    x, res = solve(g)
    f_ref = make_gn_fvp(params, unravel, obs, damping=0.1)
    x_ref, _, _ = conjugate_gradient(f_ref, g, 10)
    cos = float(jnp.dot(x, x_ref) /
                (jnp.linalg.norm(x) * jnp.linalg.norm(x_ref)))
    assert cos > min_cos, cos
