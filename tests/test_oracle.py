"""Unit tests for the fp64 NumPy oracle (SURVEY.md section 6.2).

The oracle is itself the fixture for the JAX engine, so it gets its own
independent checks: closed-form 2-link dynamics, energy behaviour, gravity
vs potential-energy gradient, brute-force GAE, FVP vs finite-difference
KL Hessian, CG vs dense solve.
"""
import numpy as np
import pytest

from oracle import net
from oracle.dynamics import ArmModel
from oracle.trpo import (OracleEnv, collect_rollouts, conjugate_gradient,
                         gae, make_fvp, surrogate_grad, trpo_update)
from trpo_robot_control_tpu.configs import (C1_REACHER2, franka_like_arm,
                                            planar_arm)
from trpo_robot_control_tpu.configs.base import (ArmSpec, JointSpec,
                                                 LinkSpec)


# ------------------------------------------------------------- dynamics
def closed_form_2link(spec, q, qd):
    """Textbook planar 2-link M and C*qd (no gravity, lc = l/2, rod)."""
    l1 = spec.joints[1].pos[0]
    m1, m2 = spec.links[0].mass, spec.links[1].mass
    lc1 = spec.links[0].com[0]
    lc2 = spec.links[1].com[0]
    I1 = spec.links[0].inertia_diag[2]
    I2 = spec.links[1].inertia_diag[2]
    c2, s2 = np.cos(q[1]), np.sin(q[1])
    a1 = I1 + I2 + m1 * lc1 ** 2 + m2 * (l1 ** 2 + lc2 ** 2)
    a2 = m2 * l1 * lc2
    a3 = I2 + m2 * lc2 ** 2
    M = np.array([[a1 + 2 * a2 * c2, a3 + a2 * c2],
                  [a3 + a2 * c2, a3]])
    h = m2 * l1 * lc2 * s2
    cqd = np.array([-h * (2 * qd[0] * qd[1] + qd[1] ** 2),
                    h * qd[0] ** 2])
    return M, cqd


def test_mass_matrix_matches_closed_form():
    spec = planar_arm(2)
    model = ArmModel(spec)
    rng = np.random.RandomState(0)
    for _ in range(10):
        q = rng.uniform(-np.pi, np.pi, 2)
        qd = rng.uniform(-3, 3, 2)
        M_cf, c_cf = closed_form_2link(spec, q, qd)
        np.testing.assert_allclose(model.mass_matrix(q), M_cf, atol=1e-10)
        np.testing.assert_allclose(model.bias(q, qd), c_cf, atol=1e-10)


def test_mass_matrix_spd():
    model = ArmModel(franka_like_arm())
    rng = np.random.RandomState(1)
    for _ in range(5):
        q = rng.uniform(-np.pi, np.pi, 7)
        M = model.mass_matrix(q)
        np.testing.assert_allclose(M, M.T, atol=1e-10)
        assert np.linalg.eigvalsh(M).min() > 0


def test_fk_known_poses():
    spec = planar_arm(2)
    model = ArmModel(spec)
    np.testing.assert_allclose(model.ee_pos(np.zeros(2)), [1.0, 0, 0],
                               atol=1e-12)
    np.testing.assert_allclose(model.ee_pos(np.array([np.pi / 2, 0.0])),
                               [0, 1.0, 0], atol=1e-12)
    np.testing.assert_allclose(
        model.ee_pos(np.array([0.0, np.pi / 2])), [0.5, 0.5, 0], atol=1e-12)


def _vertical_2link():
    """2-link arm swinging in the x-z plane (gravity does work)."""
    izz = 1.0 * 0.5 ** 2 / 12
    return ArmSpec(
        joints=(JointSpec(pos=(0, 0, 0), rpy=(np.pi / 2, 0, 0)),
                JointSpec(pos=(0.5, 0, 0))),
        links=tuple(LinkSpec(mass=1.0, com=(0.25, 0, 0),
                             inertia_diag=(1e-6, izz, izz))
                    for _ in range(2)),
        ee_offset=(0.5, 0, 0), gravity=9.81, joint_damping=0.0,
        dt=1e-3, n_substeps=1, qd_limit=1e9)


def test_energy_conservation_passive():
    """Passive (tau=0, no damping) energy drift is small and first-order
    in dt — i.e. integrator error, not a dynamics bug."""
    import dataclasses

    def drift(dt, t_final=0.5):
        spec = dataclasses.replace(_vertical_2link(), dt=dt)
        model = ArmModel(spec)
        q = np.array([0.3, -0.4])
        qd = np.array([0.5, -0.2])
        e0 = model.energy(q, qd)
        for _ in range(int(t_final / dt)):
            q, qd = model.step(q, qd, np.zeros(2))
        return abs(model.energy(q, qd) - e0) / max(abs(e0), 1.0)

    d_coarse, d_fine = drift(1e-3), drift(1e-4)
    assert d_fine < 0.005, f"energy drift {d_fine:.5f} at dt=1e-4"
    assert d_fine < 0.3 * d_coarse, (d_coarse, d_fine)


def test_gravity_torque_is_potential_gradient():
    model = ArmModel(_vertical_2link())
    rng = np.random.RandomState(2)
    q = rng.uniform(-2, 2, 2)
    eps = 1e-6

    def pe(qq):
        R, p, _ = model.fk(qq)
        return sum(model.mass[i] * model.spec.gravity
                   * (p[i] + R[i] @ model.com[i])[2] for i in range(2))

    g_analytic = model.bias(q, np.zeros(2))
    g_fd = np.array([
        (pe(q + eps * np.eye(2)[i]) - pe(q - eps * np.eye(2)[i])) / (2 * eps)
        for i in range(2)])
    np.testing.assert_allclose(g_analytic, g_fd, atol=1e-6)


# ------------------------------------------------------------------ gae
def test_gae_matches_brute_force():
    rng = np.random.RandomState(3)
    N, T, gamma, lam = 4, 12, 0.97, 0.9
    r = rng.standard_normal((N, T))
    v = rng.standard_normal((N, T))
    adv = gae(r, v, gamma, lam)
    # brute force: delta_t then A_t = sum_l (gamma lam)^l delta_{t+l}
    v_next = np.concatenate([v[:, 1:], np.zeros((N, 1))], axis=1)
    nonterm = np.ones(T)
    nonterm[-1] = 0.0
    delta = r + gamma * v_next * nonterm - v
    for t in range(T):
        expect = sum((gamma * lam) ** (l - t) * delta[:, l]
                     for l in range(t, T))
        np.testing.assert_allclose(adv[:, t], expect, atol=1e-10)


# ----------------------------------------------------- policy gradients
def _tiny_setup(seed=4, B=16, do=3, da=2, hidden=(5,)):
    rng = np.random.RandomState(seed)
    params = net.init_params(rng, do, da, hidden, logstd_init=-0.3)
    # non-degenerate weights for the final layer
    params["W1"] = rng.standard_normal(params["W1"].shape) * 0.3
    obs = rng.standard_normal((B, do))
    actions = rng.standard_normal((B, da))
    adv = rng.standard_normal(B)
    return params, obs, actions, adv


def test_surrogate_grad_matches_finite_difference():
    params, obs, actions, adv = _tiny_setup()
    mu, logstd, cache = net.forward(params, obs)
    logp_old = net.log_prob(mu, logstd, actions)
    g = surrogate_grad(params, cache, mu, actions, adv)

    theta = net.flatten(params)

    def surr(vec):
        p = net.unflatten_like(params, vec)
        m, ls, _ = net.forward(p, obs)
        return np.mean(np.exp(net.log_prob(m, ls, actions) - logp_old) * adv)

    eps = 1e-6
    idx = np.random.RandomState(5).choice(theta.size, 25, replace=False)
    for i in idx:
        e = np.zeros_like(theta)
        e[i] = eps
        fd = (surr(theta + e) - surr(theta - e)) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=2e-4, atol=1e-7)


def test_fvp_matches_kl_hessian_finite_difference():
    params, obs, actions, adv = _tiny_setup(seed=6)
    mu, logstd, cache = net.forward(params, obs)
    fvp = make_fvp(params, cache, mu, damping=0.0)

    theta = net.flatten(params)

    def kl_grad(vec):
        """grad wrt NEW params of mean KL(old || new)."""
        p = net.unflatten_like(params, vec)
        m, ls, c = net.forward(p, obs)
        B = obs.shape[0]
        var_new = np.exp(2.0 * ls)
        var_old = np.exp(2.0 * logstd)
        dmu = (m - mu) / var_new / B
        dls = np.sum(1.0 - (var_old + (mu - m) ** 2) / var_new, axis=0) / B
        return net.flatten(net.vjp(p, c, dmu, dls))

    rng = np.random.RandomState(7)
    for _ in range(3):
        v = rng.standard_normal(theta.size)
        eps = 1e-5
        fd = (kl_grad(theta + eps * v) - kl_grad(theta - eps * v)) / (2 * eps)
        Fv = fvp(v)
        np.testing.assert_allclose(Fv, fd, rtol=5e-4, atol=1e-6)


def test_fvp_symmetric_psd():
    params, obs, actions, adv = _tiny_setup(seed=8, B=8, do=2, da=1,
                                            hidden=(3,))
    mu, logstd, cache = net.forward(params, obs)
    fvp = make_fvp(params, cache, mu, damping=0.0)
    n = net.flatten(params).size
    F = np.stack([fvp(np.eye(n)[i]) for i in range(n)], axis=1)
    np.testing.assert_allclose(F, F.T, atol=1e-10)
    assert np.linalg.eigvalsh(F).min() > -1e-10


def test_cg_matches_dense_solve():
    rng = np.random.RandomState(9)
    n = 20
    A_ = rng.standard_normal((n, n))
    A = A_ @ A_.T + n * np.eye(n)
    b = rng.standard_normal(n)
    x = conjugate_gradient(lambda v: A @ v, b, iters=n)
    np.testing.assert_allclose(x, np.linalg.solve(A, b), rtol=1e-6,
                               atol=1e-8)


# ---------------------------------------------------------- end-to-end
@pytest.mark.slow
def test_oracle_training_improves_return():
    cfg = C1_REACHER2.replace(n_envs=32, horizon=40)
    from oracle.trpo import train
    _, hist = train(cfg, n_iters=12, seed=0)
    first = np.mean([h["mean_return"] for h in hist[:3]])
    last = np.mean([h["mean_return"] for h in hist[-3:]])
    assert last > first, (first, last)
    assert all(h["kl"] <= cfg.trpo.delta + 1e-9 for h in hist)


def test_update_accepts_step_and_respects_kl():
    cfg = C1_REACHER2.replace(n_envs=16, horizon=20)
    rng = np.random.RandomState(0)
    env = OracleEnv(cfg)
    params = net.init_params(rng, cfg.arm.obs_dim, cfg.arm.n_joints,
                             cfg.trpo.hidden, cfg.trpo.logstd_init)
    w = np.zeros(2 * cfg.arm.obs_dim + 4)
    batch = collect_rollouts(cfg, env, params, rng)
    _, _, stats = trpo_update(cfg, params, w, batch)
    assert stats["accepted"] >= 0
    assert stats["kl"] <= cfg.trpo.delta + 1e-9
    assert stats["beta"] > 0
