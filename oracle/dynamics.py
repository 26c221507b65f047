"""fp64 NumPy rigid-body dynamics oracle for fixed-base serial arms.

Recursive Newton-Euler (world-frame recursion) gives inverse dynamics
ID(q, qd, qdd) -> tau; the mass matrix is assembled column-by-column via
ID(q, 0, e_j) with gravity off (CRBA-by-RNEA), bias = ID(q, qd, 0).
Forward dynamics solves M qdd = tau - bias - damping*qd.

This is the correctness fixture for the JAX engine (SURVEY.md section 6.1);
deliberately loop-based and simple. The parity contract is SURVEY.md
section 4 ("Arm dynamics spec") — the reference mount was empty (section 0)
so no reference file:line can be cited.
"""
from __future__ import annotations

import numpy as np

from trpo_robot_control_tpu.configs.base import ArmSpec


def rpy_matrix(rpy):
    r, p, y = rpy
    cr, sr = np.cos(r), np.sin(r)
    cp, sp = np.cos(p), np.sin(p)
    cy, sy = np.cos(y), np.sin(y)
    Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def rot_z(theta):
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


class ArmModel:
    """Precomputes fixed transforms from an ArmSpec."""

    def __init__(self, spec: ArmSpec):
        self.spec = spec
        self.n = spec.n_joints
        self.T_rot = [rpy_matrix(j.rpy) for j in spec.joints]
        self.T_pos = [np.asarray(j.pos, dtype=np.float64) for j in spec.joints]
        self.mass = np.array([l.mass for l in spec.links])
        self.com = [np.asarray(l.com, dtype=np.float64) for l in spec.links]
        self.inertia = [np.diag(l.inertia_diag).astype(np.float64)
                        for l in spec.links]
        self.ee_offset = np.asarray(spec.ee_offset, dtype=np.float64)

    # ---------------------------------------------------------------- FK
    def fk(self, q):
        """Forward kinematics: world rotation + joint origin per link, and
        the end-effector position."""
        n = self.n
        R = [None] * n
        p = [None] * n
        R_par, p_par = np.eye(3), np.zeros(3)
        for i in range(n):
            p[i] = p_par + R_par @ self.T_pos[i]
            R[i] = R_par @ self.T_rot[i] @ rot_z(q[i])
            R_par, p_par = R[i], p[i]
        ee = p[n - 1] + R[n - 1] @ self.ee_offset
        return R, p, ee

    def ee_pos(self, q):
        return self.fk(q)[2]

    # ------------------------------------------------------------- RNEA
    def rnea(self, q, qd, qdd, gravity=None):
        """Inverse dynamics tau = ID(q, qd, qdd) with given gravity
        magnitude (along world -z). Joint damping NOT included."""
        spec = self.spec
        n = self.n
        g = spec.gravity if gravity is None else gravity
        R, p, _ = self.fk(q)

        axis = [None] * n     # world joint axis
        w = [None] * n        # angular velocity
        wd = [None] * n       # angular acceleration
        a = [None] * n        # linear acceleration of joint origin
        ac = [None] * n       # linear acceleration of COM
        cw = [None] * n       # world COM position

        w_par = np.zeros(3)
        wd_par = np.zeros(3)
        # Base acceleration trick: a_0 = +g z_hat simulates gravity.
        a_par = np.array([0.0, 0.0, g])
        R_par = np.eye(3)

        for i in range(n):
            s = R_par @ self.T_rot[i] @ np.array([0.0, 0.0, 1.0])
            axis[i] = s
            r = R_par @ self.T_pos[i]
            a[i] = a_par + np.cross(wd_par, r) + np.cross(w_par, np.cross(w_par, r))
            w[i] = w_par + s * qd[i]
            wd[i] = wd_par + s * qdd[i] + np.cross(w_par, s * qd[i])
            d = R[i] @ self.com[i]
            cw[i] = p[i] + d
            ac[i] = a[i] + np.cross(wd[i], d) + np.cross(w[i], np.cross(w[i], d))
            w_par, wd_par, a_par, R_par = w[i], wd[i], a[i], R[i]

        tau = np.zeros(n)
        f_child = np.zeros(3)
        n_child = np.zeros(3)
        p_child = np.zeros(3)
        for i in range(n - 1, -1, -1):
            Iw = R[i] @ self.inertia[i] @ R[i].T
            F = self.mass[i] * ac[i]
            N = Iw @ wd[i] + np.cross(w[i], Iw @ w[i])
            f = F + f_child
            nn = (N + n_child + np.cross(cw[i] - p[i], F)
                  + np.cross(p_child - p[i], f_child))
            tau[i] = axis[i] @ nn
            f_child, n_child, p_child = f, nn, p[i]
        return tau

    def mass_matrix(self, q):
        n = self.n
        M = np.zeros((n, n))
        zero = np.zeros(n)
        for j in range(n):
            e = np.zeros(n)
            e[j] = 1.0
            M[:, j] = self.rnea(q, zero, e, gravity=0.0)
        return 0.5 * (M + M.T)

    def bias(self, q, qd):
        """C(q,qd) qd + g(q) (no joint damping)."""
        return self.rnea(q, qd, np.zeros(self.n))

    def forward_dynamics(self, q, qd, tau):
        M = self.mass_matrix(q)
        b = self.bias(q, qd) + self.spec.joint_damping * qd
        return np.linalg.solve(M, tau - b)

    # ------------------------------------------------------------- step
    def step(self, q, qd, tau):
        """Semi-implicit Euler with n_substeps, velocity clipping."""
        spec = self.spec
        h = spec.dt / spec.n_substeps
        for _ in range(spec.n_substeps):
            qdd = self.forward_dynamics(q, qd, tau)
            qd = np.clip(qd + h * qdd, -spec.qd_limit, spec.qd_limit)
            q = q + h * qd
        return q, qd

    def energy(self, q, qd):
        """Kinetic + potential energy (for conservation tests)."""
        ke = 0.5 * qd @ self.mass_matrix(q) @ qd
        pe = 0.0
        R, p, _ = self.fk(q)
        for i in range(self.n):
            c = p[i] + R[i] @ self.com[i]
            pe += self.mass[i] * self.spec.gravity * c[2]
        return ke + pe
