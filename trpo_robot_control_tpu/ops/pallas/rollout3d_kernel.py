"""Pallas TPU kernel: fused rollout for GENERAL 3-D serial arms (7-DoF
Franka-like chains with gravity and obstacle cost — configs c3/c4).

Extends the planar kernel's design (rollout_kernel.py) to full spatial
dynamics: the same world-frame RNEA recursion as envs/rigid_body.py (the
parity fixture), expressed on "vec3-on-lanes" components — every scalar
channel is a (1, B) array with the env batch on the 128-wide lane
dimension, rotations are 9 such channels. Fixed transforms are Python
float constants, so sparse entries (0, +-1 for Franka-style rpy) fold
away at trace time.

Per step, entirely in VMEM:
  FK -> observation -> policy MLP (MXU, feature-first) -> Box-Muller
  sampling (on-chip PRNG) -> all n mass-matrix columns + gravity bias as
  ONE sublane-stacked RNEA sweep (_mass_bias_fused) -> unrolled
  rsqrt-Cholesky solve -> semi-implicit Euler (n_substeps) -> reward
  (+ track/push task terms and smooth obstacle penalty when enabled).

Correctness twin: rollout3d_reference (lax.scan over the same math) and,
transitively, the generic RNEA path + fp64 oracle + MuJoCo
(tests/test_pallas_rollout3d.py).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...configs.base import ExperimentConfig
from ...envs.rigid_body import ArmConstants
from .rollout_kernel import (_normals, _policy_ff, _policy_ff_pack2,
                             _uniform_01, out_vma, pack2_ok,
                             pack2_weights)

_TWO_PI = 2.0 * np.pi


# ------------------------------------------------- vec3 on lanes helpers
def v_add(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def v_sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def v_scale(s, a):
    return (s * a[0], s * a[1], s * a[2])


def v_cross(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def v_dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def m_vec_const(R, v3):
    """R: 9-tuple of (1,B); v3: python float 3-tuple (sparse-folded)."""
    out = []
    for r in range(3):
        acc = None
        for c in range(3):
            x = float(v3[c])
            if x == 0.0:
                continue
            term = R[3 * r + c] if x == 1.0 else \
                (-R[3 * r + c] if x == -1.0 else R[3 * r + c] * x)
            acc = term if acc is None else acc + term
        out.append(acc if acc is not None else jnp.zeros_like(R[0]))
    return tuple(out)


def m_vec(R, v):
    """R: 9-tuple; v: 3-tuple of (1,B)."""
    return (R[0] * v[0] + R[1] * v[1] + R[2] * v[2],
            R[3] * v[0] + R[4] * v[1] + R[5] * v[2],
            R[6] * v[0] + R[7] * v[1] + R[8] * v[2])


def m_mul_const(R, T):
    """R (variable 9-tuple) @ T (3x3 python floats, sparse-folded)."""
    out = []
    for r in range(3):
        for c in range(3):
            acc = None
            for k in range(3):
                x = float(T[k][c])
                if x == 0.0:
                    continue
                term = R[3 * r + k] if x == 1.0 else \
                    (-R[3 * r + k] if x == -1.0 else R[3 * r + k] * x)
                acc = term if acc is None else acc + term
            out.append(acc if acc is not None
                       else jnp.zeros_like(R[0]))
    return tuple(out)


def m_rotz(A, cq, sq):
    """A @ Rz(q): columns 0,1 mix by cos/sin; column 2 unchanged."""
    return (A[0] * cq + A[1] * sq, -A[0] * sq + A[1] * cq, A[2],
            A[3] * cq + A[4] * sq, -A[3] * sq + A[4] * cq, A[5],
            A[6] * cq + A[7] * sq, -A[6] * sq + A[7] * cq, A[8])


class Arm3DConsts(NamedTuple):
    n: int
    n_tasks: int
    T_rot: tuple      # n x (3x3 float tuples)
    T_pos: tuple      # n x (3 floats)
    mass: tuple
    com: tuple        # n x (3 floats)
    inertia: tuple    # n x (3x3 float tuples, link frame)
    ee_offset: tuple
    gravity: float
    damping: float
    dt: float
    n_substeps: int
    torque_limit: float
    qd_limit: float
    qd_obs_scale: float
    ctrl_weight: float
    obstacle_weight: float
    obstacle_radius: float
    obstacle_center: tuple
    track_omega: float
    push_speed: float
    push_weight: float
    chol_reg: float
    # early termination (cfg.done_dist > 0): episodes end on reaching
    # the target; the kernel resamples a fresh episode IN-KERNEL from
    # the on-chip PRNG (same distributions as envs/arm.py:reset)
    done_dist: float = 0.0
    q0_noise: float = 0.0
    qd0_noise: float = 0.0
    rmin: float = 0.0
    rmax: float = 0.0
    # planar arms sample targets in the z=0 plane (envs/arm.py:reset);
    # without this flag a planar arm routed here with done_dist > 0
    # would resample unreachable off-plane targets after the first done
    planar: bool = False


def arm3d_consts(cfg: ExperimentConfig, chol_reg: float = 1e-6):
    spec = cfg.arm
    c = ArmConstants(spec)
    return Arm3DConsts(
        n=c.n,
        n_tasks=int(cfg.n_tasks),
        T_rot=tuple(tuple(map(tuple, t)) for t in c.T_rot),
        T_pos=tuple(tuple(t) for t in c.T_pos),
        mass=tuple(c.mass),
        com=tuple(tuple(x) for x in c.com),
        inertia=tuple(tuple(map(tuple, i)) for i in c.inertia),
        ee_offset=tuple(c.ee_offset),
        gravity=float(spec.gravity),
        damping=float(spec.joint_damping), dt=float(spec.dt),
        n_substeps=int(spec.n_substeps),
        torque_limit=float(spec.torque_limit),
        qd_limit=float(spec.qd_limit),
        qd_obs_scale=float(spec.qd_obs_scale),
        ctrl_weight=float(cfg.cost.ctrl_weight),
        obstacle_weight=float(cfg.cost.obstacle_weight),
        obstacle_radius=float(cfg.cost.obstacle_radius),
        obstacle_center=tuple(cfg.cost.obstacle_center),
        track_omega=float(cfg.cost.track_omega),
        push_speed=float(cfg.cost.push_speed),
        push_weight=float(cfg.cost.push_weight),
        chol_reg=chol_reg,
        done_dist=float(cfg.done_dist),
        q0_noise=float(spec.q0_noise),
        qd0_noise=float(spec.qd0_noise),
        rmin=float(spec.target_rmin_frac * spec.reach),
        rmax=float(spec.target_rmax_frac * spec.reach),
        planar=bool(c.planar),
    )


def auto_tile3d(cfg: ExperimentConfig, n_envs: int,
                vmem_budget_bytes: int = 3 * 1024 * 1024,
                max_b: int = 512):
    """(block_b, t_chunk) for the 3-D kernel.

    The in-kernel policy matmul is LATENCY-bound — a dependent
    (128,128)@(128,L) matmul costs a ~constant ~175 cycles for
    L = 128..1024 (scripts/probe_mxu_lanes.py) — so wider tiles win:
    the MLP cost per env drops ~linearly with tile width. What capped
    the tile at 256 was the full-horizon double-buffered output block;
    the T-chunked grid (t_chunk) shrinks that block by T/Tc. Measured
    at c3 (scripts/probe_rollout_tile.py, bf16): bb 256 -> 512 gives
    7.66 -> 6.27 ms/rollout (+22%), flat in Tc from 8..50; bb=1024
    REGRESSES to 7.1 ms (the ~(n+1, bb) RNEA live set outgrows
    VMEM/vreg headroom), hence max_b=512 — a measured decision, not a
    budget bound. Terminating configs return t_chunk=None and the old
    full-T budget-shrunk tile (in-kernel resets keep the unchunked
    kernel).
    """
    elt = 2 if cfg.trpo.ff_store_dtype == "bf16" else 4
    bps = (cfg.obs_dim + cfg.arm.n_joints) * elt \
        + (8 if cfg.done_dist > 0.0 else 4)        # bytes/env/step
    T = cfg.horizon
    if cfg.done_dist > 0.0:
        from .rollout_kernel import auto_block_b
        return auto_block_b(cfg, n_envs), None
    if n_envs < 128:
        return n_envs, None
    bb = (min(max_b, n_envs) // 128) * 128
    while bb > 128 and n_envs % bb:
        bb -= 128
    if T * bps * bb <= vmem_budget_bytes:
        return bb, None
    # largest divisor of T whose output block fits; prefer multiples of
    # 8 (the trig-refresh period K) so chunking adds no extra refreshes
    divisors = sorted((d for d in range(1, T + 1) if T % d == 0),
                      reverse=True)
    for mult8 in (True, False):
        for Tc in divisors:
            if mult8 and Tc % 8:
                continue
            if Tc < T and Tc * bps * bb <= vmem_budget_bytes:
                return bb, Tc
    return 128, None


def _fk3(c: Arm3DConsts, cq, sq):
    """FK from per-joint cos/sin lists. Returns (R[i] 9-tuples,
    p[i] vec3s, axis[i] vec3s, Afix[i] 9-tuples, ee vec3)."""
    n = c.n
    zero = jnp.zeros_like(cq[0])
    one = jnp.ones_like(cq[0])
    R_par = (one, zero, zero, zero, one, zero, zero, zero, one)
    p_par = (zero, zero, zero)
    R, p, axis = [], [], []
    for i in range(n):
        A = m_mul_const(R_par, c.T_rot[i])
        p_i = v_add(p_par, m_vec_const(R_par, c.T_pos[i]))
        R_i = m_rotz(A, cq[i], sq[i])
        axis.append((A[2], A[5], A[8]))       # z column of R_par@T_rot
        R.append(R_i)
        p.append(p_i)
        R_par, p_par = R_i, p_i
    ee = v_add(p[-1], m_vec_const(R[-1], c.ee_offset))
    return R, p, axis, ee


def _mass_bias_fused(c: Arm3DConsts, R, p, axis, qd):
    """ALL n mass-matrix columns + the bias pass as ONE RNEA sweep on
    (n+1, B) component arrays: the sublane dimension indexes the pass
    (row j < n: zero-velocity unit-qdd_j column => M[:, j]; row n: real
    velocity + gravity, qdd = 0 => bias). Identical recursion, ~n+1 x
    fewer vector instructions than n+1 separate sweeps.

    R/p/axis are (1, B) components and broadcast against (n+1, B).
    Returns (M dict[(i<=j)] of (1,B), bias list of n (1,B)).
    """
    n = c.n
    B_like = qd[0]
    rows = n + 1
    zero_r = jnp.zeros((rows,) + B_like.shape[1:], B_like.dtype)
    zv = (zero_r, zero_r, zero_r)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)

    def col_const(j):
        """(rows, 1) selector: 1.0 in row j (built in-kernel: Pallas
        forbids captured array constants)."""
        return (row_ids == j).astype(B_like.dtype)

    bias_row = col_const(n)
    g_vec = (zero_r, zero_r,
             c.gravity * bias_row + zero_r) if c.gravity else zv

    w_par, wd_par = zv, zv
    a_par = g_vec
    p_par = (jnp.zeros_like(B_like),) * 3
    ws, wds, acs, cws = [], [], [], []
    for i in range(n):
        qd_i = bias_row * qd[i]              # (rows, B): only bias row
        qdd_i = col_const(i)                 # (rows, 1): only column i
        r = v_sub(p[i], p_par)               # (1,B) broadcasts up
        a_i = v_add(a_par, v_add(v_cross(wd_par, r),
                                 v_cross(w_par, v_cross(w_par, r))))
        s = axis[i]
        w_i = v_add(w_par, v_scale(qd_i, s))
        wd_i = v_add(v_add(wd_par, v_scale(qdd_i, s)),
                     v_cross(w_par, v_scale(qd_i, s)))
        d = m_vec_const(R[i], c.com[i])
        ac_i = v_add(a_i, v_add(v_cross(wd_i, d),
                                v_cross(w_i, v_cross(w_i, d))))
        ws.append(w_i); wds.append(wd_i); acs.append(ac_i)
        cws.append(v_add(p[i], d))
        w_par, wd_par, a_par, p_par = w_i, wd_i, a_i, p[i]

    taus = [None] * n
    f_child, n_child = zv, zv
    p_child = (jnp.zeros_like(B_like),) * 3
    for i in range(n - 1, -1, -1):
        def I_w_vec(v, Ri=R[i], Ic=c.inertia[i]):
            tv = m_vec((Ri[0], Ri[3], Ri[6],
                        Ri[1], Ri[4], Ri[7],
                        Ri[2], Ri[5], Ri[8]), v)
            iv = (tv[0] * float(Ic[0][0]) + tv[1] * float(Ic[0][1])
                  + tv[2] * float(Ic[0][2]),
                  tv[0] * float(Ic[1][0]) + tv[1] * float(Ic[1][1])
                  + tv[2] * float(Ic[1][2]),
                  tv[0] * float(Ic[2][0]) + tv[1] * float(Ic[2][1])
                  + tv[2] * float(Ic[2][2]))
            return m_vec(R[i], iv)
        F = v_scale(c.mass[i], acs[i])
        N = v_add(I_w_vec(wds[i]), v_cross(ws[i], I_w_vec(ws[i])))
        f = v_add(F, f_child)
        nn = v_add(v_add(N, n_child),
                   v_add(v_cross(v_sub(cws[i], p[i]), F),
                         v_cross(v_sub(p_child, p[i]), f_child)))
        taus[i] = v_dot(axis[i], nn)          # (rows, B)
        f_child, n_child, p_child = f, nn, p[i]

    M = {}
    bias = [None] * n
    for i in range(n):
        for j in range(i, n):
            M[(i, j)] = taus[i][j:j + 1]
        bias[i] = taus[i][n:n + 1]
    return M, bias


def _chol_solve3(c: Arm3DConsts, M, rhs):
    """Unrolled Cholesky; divisions/sqrts replaced by ONE rsqrt per pivot
    + reciprocal multiplies (VPU div/sqrt are many-cycle; this was the
    single biggest cost in the fused rollout by ablation)."""
    n = c.n
    L = {}
    inv_d = [None] * n
    for j in range(n):
        s = M[(j, j)] + c.chol_reg
        for k in range(j):
            s = s - L[(j, k)] * L[(j, k)]
        inv = jax.lax.rsqrt(s)
        inv_d[j] = inv
        L[(j, j)] = s * inv                    # = sqrt(s)
        for i in range(j + 1, n):
            t = M[(j, i)] if (j, i) in M else M[(i, j)]
            for k in range(j):
                t = t - L[(i, k)] * L[(j, k)]
            L[(i, j)] = t * inv
    y = [None] * n
    for i in range(n):
        s = rhs[i]
        for k in range(i):
            s = s - L[(i, k)] * y[k]
        y[i] = s * inv_d[i]
    x = [None] * n
    for i in range(n - 1, -1, -1):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[(k, i)] * x[k]
        x[i] = s * inv_d[i]
    return x


def _rot_increment(cq, sq, dq):
    """Advance (cos q, sin q) by a small integration step dq via
    5th/4th-order polynomials + one first-order renormalisation.
    |dq| <= qd_limit * dt / n_substeps (~0.2 rad) keeps truncation
    ~1e-7, at fp32 rounding level; the kernel refreshes exact cos/sin
    every few steps (outer loop), bounding composition drift at ~1e-6
    rad. Replaces 2 transcendentals per joint per substep with ~19 fma:
    scripts/probe_vpu.py measured in-kernel sin at ~64 ns/op vs fma at
    2.6 ns on (1, B) blocks — the 3 FK trig evaluations per step were
    ~35% of the whole fused rollout."""
    dq2 = dq * dq
    sd = dq * (1.0 - dq2 * (1.0 / 6.0 - dq2 * (1.0 / 120.0)))
    cd = 1.0 - dq2 * (0.5 - dq2 * (1.0 / 24.0))
    c2 = cq * cd - sq * sd
    s2 = sq * cd + cq * sd
    r = 1.5 - 0.5 * (c2 * c2 + s2 * s2)
    return c2 * r, s2 * r


def _score_step(c: Arm3DConsts, qd, tgt, tau_l, cq2, sq2, task_oh):
    """Post-step scoring shared by _step3 and _step3_fast: track-target
    rotation, post-step FK, reach cost, push/obstacle terms (mirrors
    envs/arm.py:step). Returns (tgt2, rew, dist2, fk2); fk2 is the
    post-step FK products, which the fast path carries into the next
    step as its pre-step FK."""
    n = c.n
    if task_oh is not None:
        co = float(np.cos(c.track_omega * c.dt))
        so = float(np.sin(c.track_omega * c.dt))
        mask1 = task_oh[1]
        tx = jnp.where(mask1 > 0.5, co * tgt[0] - so * tgt[1], tgt[0])
        ty = jnp.where(mask1 > 0.5, so * tgt[0] + co * tgt[1], tgt[1])
        tgt = (tx, ty, tgt[2])

    R2, p2, axis2, ee2 = _fk3(c, cq2, sq2)
    d = v_sub(ee2, tgt)
    ctrl = None
    for i in range(n):
        t2 = tau_l[i] * tau_l[i]
        ctrl = t2 if ctrl is None else ctrl + t2
    rew = -(v_dot(d, d) + c.ctrl_weight * ctrl)

    if task_oh is not None and c.n_tasks > 2:
        # push task (family 2): EE velocity should match
        # push_speed * dir(to target); v_ee = sum qd_i axis_i x (ee - p_i)
        v_ee = (jnp.zeros_like(ee2[0]),) * 3
        for i in range(n):
            v_ee = v_add(v_ee, v_scale(
                qd[i], v_cross(axis2[i], v_sub(ee2, p2[i]))))
        dn = jnp.sqrt(v_dot(d, d)) + 1e-6
        dirn = (-d[0] / dn, -d[1] / dn, -d[2] / dn)
        verr = v_sub(v_ee, v_scale(c.push_speed * jnp.ones_like(dn), dirn))
        rew = rew - jnp.where(task_oh[2] > 0.5,
                              c.push_weight * v_dot(verr, verr), 0.0)

    if c.obstacle_weight > 0.0:
        oc = c.obstacle_center
        pen = None
        for pt in p2[1:] + [ee2]:
            dx = pt[0] - oc[0]
            dy = pt[1] - oc[1]
            dz = pt[2] - oc[2]
            dist = jnp.sqrt(dx * dx + dy * dy + dz * dz)
            term = jnp.maximum(c.obstacle_radius - dist, 0.0) ** 2
            pen = term if pen is None else pen + term
        rew = rew - c.obstacle_weight * pen
    return tgt, rew, v_dot(d, d), (R2, p2, axis2, ee2)


def _step3_fast(c: Arm3DConsts, mlp, sigma, q, qd, tgt, eps,
                cq, sq, fk, task_oh=None):
    """One 3-D env step with CARRIED trig + FK (non-terminating fast
    path). Two structural savings over _step3, same math otherwise
    (kernel == jnp twin tested at 1e-5):

    1. The post-step FK that scores step t IS step t+1's pre-step FK —
       computed once in _score_step and carried (FK chains per step:
       n_substeps, was n_substeps + 1).
    2. cos/sin advance by _rot_increment at each integration instead of
       fresh transcendentals; the caller refreshes exact values every
       few steps (trig per step: 0, was 14 x ~64 ns).
    """
    n = c.n
    R, p, axis, ee = fk
    q, cq, sq = list(q), list(cq), list(sq)
    obs_rows = (cq + sq + [c.qd_obs_scale * x for x in qd]
                + [tgt[0] - ee[0], tgt[1] - ee[1], tgt[2] - ee[2]])
    if task_oh is not None:
        obs_rows = obs_rows + list(task_oh)
    obs = jnp.concatenate(obs_rows, axis=0)
    mu = mlp(obs)
    act = mu + sigma * eps
    tau = jnp.clip(act, -c.torque_limit, c.torque_limit)
    tau_l = [tau[i:i + 1] for i in range(n)]

    h = c.dt / c.n_substeps
    for s in range(c.n_substeps):
        if s > 0:
            R, p, axis, ee = _fk3(c, cq, sq)
        M, bias = _mass_bias_fused(c, R, p, axis, qd)
        rhs = [tau_l[i] - bias[i] - c.damping * qd[i] for i in range(n)]
        qdd = _chol_solve3(c, M, rhs)
        qd = [jnp.clip(qd[i] + h * qdd[i], -c.qd_limit, c.qd_limit)
              for i in range(n)]
        for i in range(n):
            dq = h * qd[i]
            q[i] = q[i] + dq
            cq[i], sq[i] = _rot_increment(cq[i], sq[i], dq)

    tgt2, rew, _, fk2 = _score_step(c, qd, tgt, tau_l, cq, sq, task_oh)
    return q, qd, tgt2, cq, sq, fk2, obs, act, rew


def _step3(c: Arm3DConsts, mlp, sigma, q, qd, tgt, eps, task_oh=None):
    """One 3-D env step on (1,B) components. q/qd lists of n; tgt vec3;
    task_oh: tuple of n_tasks (1,B) masks (multi-task) or None.
    Returns (q2, qd2, tgt2, obs (do,B), act (n,B), rew (1,B)).

    Mirrors envs/arm.py:step exactly: clip -> dynamics -> (track target
    rotation) -> score at the post-step state (+ push velocity penalty
    for family 2, obstacle penalty when enabled).
    """
    n = c.n
    cq = [jnp.cos(x) for x in q]
    sq = [jnp.sin(x) for x in q]
    R, p, axis, ee = _fk3(c, cq, sq)

    obs_rows = (cq + sq + [c.qd_obs_scale * x for x in qd]
                + [tgt[0] - ee[0], tgt[1] - ee[1], tgt[2] - ee[2]])
    if task_oh is not None:
        obs_rows = obs_rows + list(task_oh)
    obs = jnp.concatenate(obs_rows, axis=0)
    mu = mlp(obs)
    act = mu + sigma * eps
    tau = jnp.clip(act, -c.torque_limit, c.torque_limit)
    tau_l = [tau[i:i + 1] for i in range(n)]

    one = jnp.ones_like(q[0])
    h = c.dt / c.n_substeps
    for s in range(c.n_substeps):
        if s > 0:
            cq = [jnp.cos(x) for x in q]
            sq = [jnp.sin(x) for x in q]
            R, p, axis, ee = _fk3(c, cq, sq)
        M, bias = _mass_bias_fused(c, R, p, axis, qd)
        rhs = [tau_l[i] - bias[i] - c.damping * qd[i] for i in range(n)]
        qdd = _chol_solve3(c, M, rhs)
        qd = [jnp.clip(qd[i] + h * qdd[i], -c.qd_limit, c.qd_limit)
              for i in range(n)]
        q = [q[i] + h * qd[i] for i in range(n)]

    cq2 = [jnp.cos(x) for x in q]
    sq2 = [jnp.sin(x) for x in q]
    tgt, rew, dist2, _ = _score_step(c, qd, tgt, tau_l, cq2, sq2, task_oh)
    return q, qd, tgt, obs, act, rew, dist2


def _rollout3d_kernel(c: Arm3DConsts, T, n_layers, use_prng,
                      terminating, pack2, *refs):
    it = iter(refs)
    q0_ref = next(it)
    qd0_ref = next(it)
    tgt_ref = next(it)
    task_ref = next(it) if c.n_tasks > 1 else None
    Ws = [next(it) for _ in range(n_layers)]
    bs = [next(it) for _ in range(n_layers)]
    logstd_ref = next(it)
    if use_prng:
        seed_ref = next(it)
    else:
        eps_ref = next(it)
    obs_out = next(it)
    act_out = next(it)
    rew_out = next(it)
    done_out = next(it) if terminating else None

    n = c.n
    if use_prng:
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
    sigma = jnp.exp(logstd_ref[:])

    q = [q0_ref[i:i + 1, :] for i in range(n)]
    qd = [qd0_ref[i:i + 1, :] for i in range(n)]
    tgt = (tgt_ref[0:1, :], tgt_ref[1:2, :], tgt_ref[2:3, :])
    task_oh = None if task_ref is None else tuple(
        task_ref[i:i + 1, :] for i in range(c.n_tasks))
    W_blocks = [w[:] for w in Ws]
    b_blocks = [b[:] for b in bs]
    if pack2:
        mlp = lambda o: _policy_ff_pack2(W_blocks, b_blocks, o, n)
    else:
        mlp = lambda o: _policy_ff(W_blocks, b_blocks, o)

    def body(t, carry):
        if terminating and task_oh is not None:
            q, qd, tgt, toh = carry
        else:
            q, qd, tgt = carry
            toh = task_oh
        if use_prng:
            eps = _normals(n, q[0].shape[-1])
        else:
            eps = eps_ref[t]
        q2, qd2, tgt2, obs, act, rew, dist2 = _step3(
            c, mlp, sigma, q, qd, tgt, eps, toh)
        obs_out[t] = obs.astype(obs_out.dtype)
        act_out[t] = act.astype(act_out.dtype)
        rew_out[t] = rew
        if terminating:
            # episode ends on reaching the (post-step, possibly
            # track-rotated) target; resample a FRESH episode in-kernel
            # (same distributions as envs/arm.py:reset)
            done = (dist2 < c.done_dist * c.done_dist)   # (1, B) bool
            done_out[t] = done.astype(jnp.float32)
            row = (1, q2[0].shape[-1])
            for i in range(n):
                qf = c.q0_noise * (2.0 * _uniform_01(row) - 1.0)
                qdf = c.qd0_noise * (2.0 * _uniform_01(row) - 1.0)
                q2[i] = jnp.where(done, qf, q2[i])
                qd2[i] = jnp.where(done, qdf, qd2[i])
            r = c.rmin + (c.rmax - c.rmin) * _uniform_01(row)
            if c.planar:
                # planar arms: target in the z=0 plane, angle uniform
                # (matches envs/arm.py:reset planar branch)
                th = _TWO_PI * _uniform_01(row)
                tx, ty, tz = r * jnp.cos(th), r * jnp.sin(th), \
                    jnp.zeros_like(r)
            else:
                # fresh target: r * dir, dir ~ normalized 3-normal,
                # z = |z| (upper hemisphere)
                g1 = jnp.sqrt(-2.0 * jnp.log(_uniform_01(row))) \
                    * jnp.cos(_TWO_PI * _uniform_01(row))
                bm = jnp.sqrt(-2.0 * jnp.log(_uniform_01(row)))
                ang = _TWO_PI * _uniform_01(row)
                g2 = bm * jnp.cos(ang)
                g3 = bm * jnp.sin(ang)
                nrm = jnp.sqrt(g1 * g1 + g2 * g2 + g3 * g3) + 1e-12
                tx, ty, tz = r * g1 / nrm, r * g2 / nrm, \
                    r * jnp.abs(g3) / nrm
            tgt2 = (jnp.where(done, tx, tgt2[0]),
                    jnp.where(done, ty, tgt2[1]),
                    jnp.where(done, tz, tgt2[2]))
            if toh is not None:
                # fresh task family ~ uniform {0..n_tasks-1}
                u = _uniform_01(row) * c.n_tasks
                toh = tuple(
                    jnp.where(done,
                              jnp.logical_and(u >= k, u < k + 1)
                              .astype(jnp.float32), toh[k])
                    for k in range(c.n_tasks))
                return (q2, qd2, tgt2, toh)
        return (q2, qd2, tgt2)

    if terminating:
        # in-kernel resets re-randomise q, so carried trig/FK would be
        # stale for reset lanes: the terminating path keeps the
        # per-step exact-FK body (shipped c3-c5 are non-terminating)
        if task_oh is not None:
            jax.lax.fori_loop(0, T, body, (q, qd, tgt, task_oh))
        else:
            jax.lax.fori_loop(0, T, body, (q, qd, tgt))
        return

    # Fast path: nested loop. The outer level refreshes exact cos/sin +
    # FK every K steps (bounds _rot_increment composition drift at
    # ~1e-6 rad); the inner K steps carry trig + post-step FK across
    # the step boundary (_step3_fast) — measured ~30% of the whole
    # kernel at c3-c5 (FK trig + the third FK chain per step).
    K = next(k for k in (8, 5, 4, 3, 2, 1) if T % k == 0)

    def inner(j, st, t0):
        q, qd, tgt, cq, sq, fk = st
        t = t0 + j
        if use_prng:
            eps = _normals(n, q[0].shape[-1])
        else:
            eps = eps_ref[t]
        q, qd, tgt, cq, sq, fk, obs, act, rew = _step3_fast(
            c, mlp, sigma, q, qd, tgt, eps, cq, sq,
            fk, task_oh)
        obs_out[t] = obs.astype(obs_out.dtype)
        act_out[t] = act.astype(act_out.dtype)
        rew_out[t] = rew
        return (q, qd, tgt, cq, sq, fk)

    def outer(o, st):
        q, qd, tgt = st
        cq = [jnp.cos(x) for x in q]
        sq = [jnp.sin(x) for x in q]
        fk = _fk3(c, cq, sq)
        t0 = o * K
        st2 = jax.lax.fori_loop(0, K, lambda j, s: inner(j, s, t0),
                                (q, qd, tgt, cq, sq, fk))
        return st2[:3]

    jax.lax.fori_loop(0, T // K, outer, (q, qd, tgt))


def _rollout3d_kernel_chunked(c: Arm3DConsts, Tc, n_chunks, n_layers,
                              use_prng, pack2, *refs):
    """T-CHUNKED twin of _rollout3d_kernel's fast path (round 4).

    Grid = (env_tiles, n_chunks), chunk dim innermost — TPU grid steps
    run sequentially, so the joint state persists across chunks in a
    VMEM scratch block and only a (Tc, d, bb) output block is
    double-buffered per step. Why: the in-kernel policy matmul is
    LATENCY-bound, not stream-bound — a dependent (128,128)@(128,L)
    matmul costs a ~constant ~175 cycles for L = 128..1024
    (scripts/probe_mxu_lanes.py) — so lanes are nearly free up to 1024
    and the MLP cost per env drops ~linearly with tile width. Full-T
    output blocks capped the tile at 256 envs (VMEM double-buffering);
    chunking T lifts that to 1024.

    Non-terminating only (in-kernel resets would need the carried-trig
    guard anyway; terminating configs keep the unchunked kernel).
    refs: [q0, qd0, tgt, (task), Ws, bs, logstd, seed|eps,
           obs_out, act_out, rew_out, state_scratch].
    """
    it = iter(refs)
    q0_ref = next(it)
    qd0_ref = next(it)
    tgt_ref = next(it)
    task_ref = next(it) if c.n_tasks > 1 else None
    Ws = [next(it) for _ in range(n_layers)]
    bs = [next(it) for _ in range(n_layers)]
    logstd_ref = next(it)
    if use_prng:
        seed_ref = next(it)
    else:
        eps_ref = next(it)
    obs_out = next(it)
    act_out = next(it)
    rew_out = next(it)
    state_ref = next(it)                    # (2n+3, bb) fp32 scratch

    n = c.n
    j = pl.program_id(1)
    if use_prng:
        # deterministic stream per (env tile, chunk); the chunked and
        # unchunked kernels draw DIFFERENT streams (same distributions)
        # — eps mode is the bit-exact equivalence path
        pltpu.prng_seed(seed_ref[0, 0]
                        + pl.program_id(0) * n_chunks + j)
    sigma = jnp.exp(logstd_ref[:])

    @pl.when(j == 0)
    def _init():
        state_ref[0:n] = q0_ref[:]
        state_ref[n:2 * n] = qd0_ref[:]
        state_ref[2 * n:2 * n + 3] = tgt_ref[:]

    q = [state_ref[i:i + 1, :] for i in range(n)]
    qd = [state_ref[n + i:n + i + 1, :] for i in range(n)]
    tgt = (state_ref[2 * n:2 * n + 1, :],
           state_ref[2 * n + 1:2 * n + 2, :],
           state_ref[2 * n + 2:2 * n + 3, :])
    task_oh = None if task_ref is None else tuple(
        task_ref[i:i + 1, :] for i in range(c.n_tasks))
    W_blocks = [w[:] for w in Ws]
    b_blocks = [b[:] for b in bs]
    if pack2:
        mlp = lambda o: _policy_ff_pack2(W_blocks, b_blocks, o, n)
    else:
        mlp = lambda o: _policy_ff(W_blocks, b_blocks, o)

    K = next(k for k in (8, 5, 4, 3, 2, 1) if Tc % k == 0)

    def inner(jj, st, t0):
        q, qd, tgt, cq, sq, fk = st
        t = t0 + jj                          # block-local step index
        if use_prng:
            eps = _normals(n, q[0].shape[-1])
        else:
            eps = eps_ref[t]
        q, qd, tgt, cq, sq, fk, obs, act, rew = _step3_fast(
            c, mlp, sigma, q, qd, tgt, eps, cq, sq, fk, task_oh)
        obs_out[t] = obs.astype(obs_out.dtype)
        act_out[t] = act.astype(act_out.dtype)
        rew_out[t] = rew
        return (q, qd, tgt, cq, sq, fk)

    def outer(o, st):
        q, qd, tgt = st
        cq = [jnp.cos(x) for x in q]
        sq = [jnp.sin(x) for x in q]
        fk = _fk3(c, cq, sq)
        st2 = jax.lax.fori_loop(0, K, lambda jj, s: inner(jj, s, o * K),
                                (q, qd, tgt, cq, sq, fk))
        return st2[:3]

    qf, qdf, tgtf = jax.lax.fori_loop(0, Tc // K, outer, (q, qd, tgt))
    state_ref[0:n] = jnp.concatenate(qf, axis=0)
    state_ref[n:2 * n] = jnp.concatenate(qdf, axis=0)
    state_ref[2 * n:2 * n + 3] = jnp.concatenate(list(tgtf), axis=0)


def pallas_rollout3d(cfg: ExperimentConfig, params, key_or_seed,
                     n_envs=None, eps=None, block_b: int = 512,
                     interpret: bool = False, q0=None, qd0=None,
                     tgt=None, task=None, store_dtype=None,
                     t_chunk=None):
    """Fused 3-D rollout. Same contract as envs/arm.py:rollout.

    store_dtype=bf16 emits obs_ff/actions_ff in bf16 straight from the
    kernel (rewards/dones stay fp32): halves the kernel's output write
    traffic AND feeds the feature-first update path its HBM-bound
    operands pre-rounded (see trpo.ff_store_dtype). The batch-major
    obs/actions copies are cast back to fp32 (they are dead code in the
    fused train step)."""
    from ...envs import arm as arm_mod

    c = arm3d_consts(cfg)
    n = c.n
    N = cfg.n_envs if n_envs is None else n_envs
    T = cfg.horizon
    do = cfg.obs_dim

    if isinstance(key_or_seed, int) or jnp.ndim(key_or_seed) == 0:
        key = jax.random.PRNGKey(key_or_seed)
    else:
        key = key_or_seed
    k_reset, k_seed = jax.random.split(key)
    if q0 is None:
        state0 = arm_mod.reset(cfg, k_reset, N)
        q0, qd0, tgt = state0.q, state0.qd, state0.tgt
        task = state0.task
    elif task is None:
        task = jnp.zeros(N, jnp.int32)
    seed = jax.random.randint(k_seed, (1, 1), 0,
                              np.iinfo(np.int32).max, dtype=jnp.int32)

    bb = min(block_b, N)
    assert N % bb == 0
    terminating = cfg.done_dist > 0.0
    assert not terminating or eps is None, \
        "in-kernel early termination resamples episodes from the " \
        "on-chip PRNG; the eps twin mode runs fixed-horizon only"
    # T-chunked grid (round 4): chunk dim innermost/sequential; state
    # carried in VMEM scratch; double-buffered output block shrinks by
    # T/Tc so the env tile can widen to 1024 (see
    # _rollout3d_kernel_chunked). Terminating configs keep the
    # unchunked kernel (in-kernel resets need per-step exact FK anyway).
    chunked = (t_chunk is not None and 0 < t_chunk < T
               and not terminating)
    if chunked:
        assert T % t_chunk == 0, (T, t_chunk)
        Tc = t_chunk
        n_chunks = T // Tc
        grid = (N // bb, n_chunks)
        env_ix = lambda i, j: (0, i)
        const_ix = lambda nd: (lambda i, j: (0,) * nd)
        t_ix = lambda i, j: (j, 0, i)
    else:
        Tc = T
        grid = (N // bb,)
        env_ix = lambda i: (0, i)
        const_ix = lambda nd: (lambda i: (0,) * nd)
        t_ix = lambda i: (0, 0, i)

    q0_ff = q0.T
    qd0_ff = qd0.T
    tgt_ff = tgt.T                               # (3, N)

    L = sum(1 for k in params if k.startswith("W"))
    Ws = [params[f"W{i}"] for i in range(L)]
    bs = [params[f"b{i}"][:, None] for i in range(L)]
    logstd = params["logstd"][:, None]
    # pair-packed MLP: block-diagonal weights built at trace time; every
    # in-kernel policy matmul then streams bb/2 lanes (rollout_kernel.py)
    pack2 = pack2_ok(cfg, bb)
    if pack2:
        Ws, bs = pack2_weights(Ws, [b[:, 0] for b in bs])

    batch_in = lambda d: pl.BlockSpec((d, bb), env_ix,
                                      memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, const_ix(len(shape)),
                                      memory_space=pltpu.VMEM)
    in_specs = [batch_in(n), batch_in(n), batch_in(3)]
    inputs = [q0_ff, qd0_ff, tgt_ff]
    if cfg.n_tasks > 1:
        task_oh_ff = jax.nn.one_hot(task, cfg.n_tasks,
                                    dtype=jnp.float32).T    # (K, N)
        in_specs.append(batch_in(cfg.n_tasks))
        inputs.append(task_oh_ff)
    in_specs += ([full(w.shape) for w in Ws]
                 + [full(b.shape) for b in bs]
                 + [full(logstd.shape)])
    inputs += Ws + bs + [logstd]

    use_prng = eps is None
    if use_prng:
        in_specs.append(pl.BlockSpec((1, 1), const_ix(2),
                                     memory_space=pltpu.SMEM))
        inputs.append(seed)
    else:
        eps_ff = jnp.swapaxes(eps, 1, 2)          # (T, N, n) -> (T, n, N)
        in_specs.append(pl.BlockSpec((Tc, n, bb), t_ix,
                                     memory_space=pltpu.VMEM))
        inputs.append(eps_ff)

    out_specs = [
        pl.BlockSpec((Tc, do, bb), t_ix, memory_space=pltpu.VMEM),
        pl.BlockSpec((Tc, n, bb), t_ix, memory_space=pltpu.VMEM),
        pl.BlockSpec((Tc, 1, bb), t_ix, memory_space=pltpu.VMEM),
    ]
    st_dt = store_dtype or jnp.float32
    vma = out_vma(inputs)
    out_shape = [
        jax.ShapeDtypeStruct((T, do, N), st_dt, vma=vma),
        jax.ShapeDtypeStruct((T, n, N), st_dt, vma=vma),
        jax.ShapeDtypeStruct((T, 1, N), jnp.float32, vma=vma),
    ]
    if terminating:
        out_specs.append(pl.BlockSpec((Tc, 1, bb), t_ix,
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((T, 1, N), jnp.float32,
                                              vma=vma))

    if chunked:
        kernel = functools.partial(_rollout3d_kernel_chunked, c, Tc,
                                   n_chunks, L, use_prng, pack2)
        scratch = [pltpu.VMEM((2 * n + 3, bb), jnp.float32)]
    else:
        kernel = functools.partial(_rollout3d_kernel, c, T, L, use_prng,
                                   terminating, pack2)
        scratch = []
    outs = pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, scratch_shapes=scratch,
        interpret=interpret)(*inputs)
    obs_ff, act_ff, rew_ff = outs[:3]

    # obs_ff/rewards_ff: kernel-native feature-first views — the ff
    # update pipeline runs (T, N) end-to-end on them, so the batch-major
    # copies here are dead code in the fused train step (rollout_kernel)
    f32 = jnp.float32
    batch = dict(obs=jnp.transpose(obs_ff, (2, 0, 1)).astype(f32),
                 actions=jnp.transpose(act_ff, (2, 0, 1)).astype(f32),
                 rewards=jnp.transpose(rew_ff[:, 0, :], (1, 0)),
                 obs_ff=obs_ff, actions_ff=act_ff,
                 rewards_ff=rew_ff[:, 0, :])
    if terminating:
        # the final step always terminates (fixed buffer end, no
        # bootstrap) — same convention as envs/arm.py:rollout
        dones_tn = outs[3][:, 0, :].at[-1].set(1.0)
        batch["dones_ff"] = dones_tn
        batch["dones"] = dones_tn.T
    return batch


def rollout3d_reference(cfg: ExperimentConfig, params, q0, qd0, tgt, eps,
                        task=None):
    """jnp twin (lax.scan over the same component math)."""
    c = arm3d_consts(cfg)
    n = c.n
    L = sum(1 for k in params if k.startswith("W"))
    Ws = [params[f"W{i}"] for i in range(L)]
    bs = [params[f"b{i}"][:, None] for i in range(L)]
    sigma = jnp.exp(params["logstd"])[:, None]

    q = [q0.T[i:i + 1] for i in range(n)]
    qd = [qd0.T[i:i + 1] for i in range(n)]
    tgt_t = (tgt[:, 0:1].T, tgt[:, 1:2].T, tgt[:, 2:3].T)
    task_oh = None
    if cfg.n_tasks > 1:
        oh = jax.nn.one_hot(task, cfg.n_tasks, dtype=jnp.float32).T
        task_oh = tuple(oh[i:i + 1] for i in range(cfg.n_tasks))

    mlp = lambda o: _policy_ff(Ws, bs, o)

    def body(carry, eps_t):
        q, qd, tgt_c = carry
        q2, qd2, tgt2, obs, act, rew, _ = _step3(c, mlp, sigma, q, qd,
                                                 tgt_c, eps_t.T, task_oh)
        return (q2, qd2, tgt2), (obs, act, rew)

    (_, _, _), (obs, act, rew) = jax.lax.scan(body, (q, qd, tgt_t), eps)
    return dict(obs=jnp.transpose(obs, (2, 0, 1)),
                actions=jnp.transpose(act, (2, 0, 1)),
                rewards=jnp.transpose(rew[:, 0, :], (1, 0)))
