"""JAX rigid-body dynamics vs the fp64 NumPy oracle (SURVEY.md section 6.2)."""
import numpy as np

import jax
import jax.numpy as jnp

from oracle.dynamics import ArmModel
from trpo_robot_control_tpu.configs import franka_like_arm, planar_arm
from trpo_robot_control_tpu.envs import rigid_body as rb


def _compare_arm(spec, n_states=8, seed=0, atol=1e-4, rtol=1e-4):
    model = ArmModel(spec)
    n = spec.n_joints
    rng = np.random.RandomState(seed)
    q = rng.uniform(-np.pi, np.pi, (n_states, n))
    qd = rng.uniform(-2, 2, (n_states, n))
    qdd = rng.uniform(-2, 2, (n_states, n))
    tau = rng.uniform(-1, 1, (n_states, n))

    qj = jnp.asarray(q, jnp.float32)
    qdj = jnp.asarray(qd, jnp.float32)

    # FK
    ee_j = np.asarray(rb.ee_pos(spec, qj))
    ee_o = np.stack([model.ee_pos(q[i]) for i in range(n_states)])
    np.testing.assert_allclose(ee_j, ee_o, atol=atol)

    # inverse dynamics
    tau_j = np.asarray(rb.rnea(spec, qj, qdj, jnp.asarray(qdd, jnp.float32)))
    tau_o = np.stack([model.rnea(q[i], qd[i], qdd[i])
                      for i in range(n_states)])
    np.testing.assert_allclose(tau_j, tau_o, atol=atol * 50, rtol=rtol * 10)

    # mass matrix
    M_j = np.asarray(rb.mass_matrix(spec, qj))
    M_o = np.stack([model.mass_matrix(q[i]) for i in range(n_states)])
    np.testing.assert_allclose(M_j, M_o, atol=atol * 10, rtol=rtol * 10)

    # one integrator step
    q2j, qd2j = rb.dynamics_step(spec, qj, qdj, jnp.asarray(tau, jnp.float32))
    q2o = np.empty_like(q)
    qd2o = np.empty_like(qd)
    for i in range(n_states):
        q2o[i], qd2o[i] = model.step(q[i], qd[i], tau[i])
    np.testing.assert_allclose(np.asarray(q2j), q2o, atol=1e-4)
    np.testing.assert_allclose(np.asarray(qd2j), qd2o, atol=2e-3)


def test_planar2_matches_oracle():
    _compare_arm(planar_arm(2))


def test_planar3_matches_oracle():
    _compare_arm(planar_arm(3))


def test_franka7_matches_oracle():
    _compare_arm(franka_like_arm(), atol=3e-4)


def test_vmap_equals_loop():
    spec = planar_arm(3)
    key = jax.random.PRNGKey(0)
    q = jax.random.uniform(key, (16, 3), minval=-3.0, maxval=3.0)
    qd = jax.random.uniform(key, (16, 3), minval=-2.0, maxval=2.0)
    batched = rb.mass_matrix(spec, q)
    single = jnp.stack([rb.mass_matrix(spec, q[i]) for i in range(16)])
    np.testing.assert_allclose(np.asarray(batched), np.asarray(single),
                               atol=1e-6)
