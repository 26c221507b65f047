"""Pallas TPU kernel: fused rollout for planar n-link arms.

The engine's hot loop (SURVEY.md sections 3, 5.3): one `pallas_call` runs
the ENTIRE horizon for a tile of envs — joint state, target and policy
parameters stay in VMEM across all T steps; HBM sees only the per-step
(obs, action, reward) outputs. This replaces ~50 XLA kernel launches per
env step (FK, mass matrix, bias, Cholesky, policy MLP, sampling, reward)
with a single fused kernel, removing the per-step latency floor that
dominates rollout time for small-to-medium batches.

Layout: FEATURE-FIRST — every per-env quantity is an array of shape
(k, B) with the env batch on the 128-wide lane dimension, so elementwise
dynamics work uses full lanes, and the policy matmuls run on the MXU as
(H, k) x (k, B) contractions with B on lanes.

Dynamics are the planar closed form (mathematically equal to the RNEA
fixture; equality asserted in tests/test_pallas_rollout.py):
  M_ij   = sum_{k >= max(i,j)} m_k <J_ki, J_kj> + I_k,  J_ki = perp(c_k - p_i)
  bias   = planar Newton-Euler with qdd = 0 (centripetal only; planar
           horizontal arms have no gravity torque)
  solve  = unrolled Cholesky (n <= 3 typical; any small n supported)

Action noise: on-chip PRNG (pltpu.prng_random_bits) + Box-Muller, seeded
per (host seed, tile); or caller-provided eps for bit-exact testing
against the jnp twin `rollout_reference`.
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

_TWO_PI = 2.0 * np.pi


class PlanarConsts(NamedTuple):
    """Static planar-arm constants extracted from an ArmSpec."""
    n: int
    l: tuple        # link lengths (joint offsets along parent x)
    lc: tuple       # COM offsets along link x
    m: tuple
    iz: tuple       # inertia about z at COM
    damping: float
    dt: float
    n_substeps: int
    torque_limit: float
    qd_limit: float
    qd_obs_scale: float
    ctrl_weight: float
    chol_reg: float
    # early termination (cfg.done_dist > 0): episodes end on reaching
    # the target; the kernel resamples a fresh episode IN-KERNEL from
    # the on-chip PRNG (same distributions as envs/arm.py:reset)
    done_dist: float = 0.0
    q0_noise: float = 0.0
    qd0_noise: float = 0.0
    rmin: float = 0.0
    rmax: float = 0.0


def auto_block_b(cfg: ExperimentConfig, n_envs: int,
                 vmem_budget_bytes: int = 4 * 1024 * 1024,
                 max_b: int = 1024) -> int:
    """Largest env-tile (multiple of 128, <= max_b) whose per-tile output
    block (obs+act+rew for the full horizon) fits the VMEM budget —
    Mosaic double-buffers output blocks, so keep them ~< 4MB of the 16MB
    v5e VMEM."""
    # bf16 storage (trpo.ff_store_dtype) halves the obs/act output
    # blocks -> roughly doubles the feasible tile; rewards (and dones)
    # stay fp32. Bigger tiles also enable the pair-packed MLP
    # (pack2_ok: bb % 256 == 0).
    elt = 2 if cfg.trpo.ff_store_dtype == "bf16" else 4
    bytes_per_env = cfg.horizon * (
        (cfg.obs_dim + cfg.arm.n_joints) * elt
        + (8 if cfg.done_dist > 0.0 else 4))
    bb = min(max_b, max(128, vmem_budget_bytes // bytes_per_env))
    bb = (bb // 128) * 128
    while n_envs % bb and bb > 128:
        bb -= 128
    return bb if n_envs >= 128 else n_envs


def planar_consts(cfg: ExperimentConfig, chol_reg: float = 1e-6):
    spec = cfg.arm
    c = ArmConstants(spec)
    assert c.planar, "fused rollout kernel requires a planar arm"
    assert abs(spec.gravity) < 1e-12, "planar kernel assumes zero gravity"
    assert cfg.n_tasks == 1, "planar kernel covers the reach task"
    n = spec.n_joints
    l = tuple(float(spec.joints[i + 1].pos[0]) for i in range(n - 1)) \
        + (float(spec.ee_offset[0]),)
    return PlanarConsts(
        n=n, l=l,
        lc=tuple(float(lk.com[0]) for lk in spec.links),
        m=tuple(float(lk.mass) for lk in spec.links),
        iz=tuple(float(lk.inertia_diag[2]) for lk in spec.links),
        damping=float(spec.joint_damping), dt=float(spec.dt),
        n_substeps=int(spec.n_substeps),
        torque_limit=float(spec.torque_limit),
        qd_limit=float(spec.qd_limit),
        qd_obs_scale=float(spec.qd_obs_scale),
        ctrl_weight=float(cfg.cost.ctrl_weight),
        chol_reg=chol_reg,
        done_dist=float(cfg.done_dist),
        q0_noise=float(spec.q0_noise),
        qd0_noise=float(spec.qd0_noise),
        rmin=float(spec.target_rmin_frac * spec.reach),
        rmax=float(spec.target_rmax_frac * spec.reach),
    )


# ----------------------------------------------------------------- math
# All helpers take/return lists of (1, B) arrays (feature-first), so the
# SAME code runs inside the Pallas kernel and in the jnp reference twin.

def _fk_ff(c: PlanarConsts, q):
    """q: list of n (1,B). Returns (cth, sth, px, py, cx, cy, eex, eey):
    absolute angles' cos/sin, joint origins, link COMs, end effector."""
    n = c.n
    th = []
    acc = None
    for i in range(n):
        acc = q[i] if acc is None else acc + q[i]
        th.append(acc)
    cth = [jnp.cos(t) for t in th]
    sth = [jnp.sin(t) for t in th]
    px, py = [], []
    x = jnp.zeros_like(q[0])
    y = jnp.zeros_like(q[0])
    for i in range(n):
        px.append(x)
        py.append(y)
        x = x + c.l[i] * cth[i]
        y = y + c.l[i] * sth[i]
    cx = [px[i] + c.lc[i] * cth[i] for i in range(n)]
    cy = [py[i] + c.lc[i] * sth[i] for i in range(n)]
    return cth, sth, px, py, cx, cy, x, y       # x,y = EE


def _mass_ff(c: PlanarConsts, px, py, cx, cy):
    """M as dict[(i,j)] of (1,B), i <= j (symmetric)."""
    n = c.n
    M = {}
    for i in range(n):
        for j in range(i, n):
            acc = None
            for k in range(j, n):
                # J_ki = perp(c_k - p_i) = (-(cy_k - py_i), cx_k - px_i)
                dot = ((cy[k] - py[i]) * (cy[k] - py[j])
                       + (cx[k] - px[i]) * (cx[k] - px[j]))
                term = c.m[k] * dot + c.iz[k]
                acc = term if acc is None else acc + term
            M[(i, j)] = acc
    return M


def _bias_ff(c: PlanarConsts, qd, px, py, cx, cy):
    """Planar Newton-Euler with qdd = 0, no gravity: centripetal bias."""
    n = c.n
    w = []
    acc = None
    for i in range(n):
        acc = qd[i] if acc is None else acc + qd[i]
        w.append(acc)
    # forward: joint-origin and COM accelerations (qdd = 0)
    ax, ay = jnp.zeros_like(qd[0]), jnp.zeros_like(qd[0])
    acx, acy = [], []
    jax_, jay = [], []
    for i in range(n):
        jax_.append(ax)
        jay.append(ay)
        w2 = w[i] * w[i]
        acx.append(ax - w2 * (cx[i] - px[i]))
        acy.append(ay - w2 * (cy[i] - py[i]))
        if i + 1 < n:
            ax = ax - w2 * (px[i + 1] - px[i])
            ay = ay - w2 * (py[i + 1] - py[i])
    # backward: forces/torques
    tau = [None] * n
    fx = jnp.zeros_like(qd[0])
    fy = jnp.zeros_like(qd[0])
    nz = jnp.zeros_like(qd[0])
    p_cx, p_cy = jnp.zeros_like(qd[0]), jnp.zeros_like(qd[0])
    for i in range(n - 1, -1, -1):
        Fx = c.m[i] * acx[i]
        Fy = c.m[i] * acy[i]
        nz = (nz
              + (cx[i] - px[i]) * Fy - (cy[i] - py[i]) * Fx
              + (p_cx - px[i]) * fy - (p_cy - py[i]) * fx)
        tau[i] = nz
        fx = Fx + fx
        fy = Fy + fy
        p_cx, p_cy = px[i], py[i]
    return tau


def _chol_solve_ff(c: PlanarConsts, M, rhs):
    """Solve (M + reg I) x = rhs; unrolled Cholesky on (1,B) entries.
    One rsqrt per pivot + reciprocal multiplies (no VPU divides)."""
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
            t = M[(j, i)]
            for k in range(j):
                t = t - L[(i, k)] * L[(j, k)]
            L[(i, j)] = t * inv
    # forward substitution L y = rhs
    y = [None] * n
    for i in range(n):
        s = rhs[i]
        for k in range(i):
            s = s - L[(i, k)] * y[k]
        y[i] = s * inv_d[i]
    # back substitution L^T x = y
    x = [None] * n
    for i in range(n - 1, -1, -1):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[(k, i)] * x[k]
        x[i] = s * inv_d[i]
    return x


def _policy_ff(Ws, bs, obs):
    """Feature-first tanh MLP: obs (do,B) -> mu (da,B). Ws[i]: (d_in,d_out)
    stored exactly as in the param dict; contraction over dim 0."""
    h = obs
    L = len(Ws)
    for i in range(L - 1):
        z = jax.lax.dot_general(Ws[i], h, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        h = jnp.tanh(z + bs[i])
    return jax.lax.dot_general(Ws[L - 1], h, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32) + bs[L - 1]


# -------------------------------------------------- pair-packed MLP
# The in-kernel MLP is MXU-PASS-bound: each dot_general streams its B
# lanes through the systolic array in ~B cycles while the tiny
# stationary weights (<=64 of 128x128) leave most of the array idle —
# measured at exactly the single-pass floor (2.6 ms for 3 passes x
# 1600 block-steps x 512 lanes at c3, docs/performance.md). The fix is
# the FVP kernel's pair-packing, transposed to this layout: fold the
# TWO HALVES of the lane dimension onto the sublane dimension
# ((do, B) -> (2*do_pad, B/2), 8-aligned rows via one zeros + two
# dynamic_update_slice per step) against BLOCK-DIAGONAL weights built
# once at trace time. Every pass then streams B/2 lanes: a 2-hidden-64
# MLP fits exactly ((2*do_pad <= 128, 2h = 128)), halving the MLP's
# MXU time for ~3 cheap vreg-level repacks per step.


def _round8(x: int) -> int:
    return ((x + 7) // 8) * 8


def out_vma(inputs):
    """Varying-mesh-axes set for pallas_call outputs: the union of the
    inputs' vma. Under a check_vma=True shard_map (the TP train step)
    pallas_call REQUIRES an explicit vma on every out ShapeDtypeStruct;
    outside one, jax.typeof(x).vma is frozenset() and passing the empty
    set through is accepted everywhere (verified on jax 0.9)."""
    vma = frozenset()
    for x in inputs:
        vma = vma | getattr(jax.typeof(x), "vma", frozenset())
    return vma


def pack2_ok(cfg, block_b: int) -> bool:
    """Trace-time eligibility for the pair-packed in-kernel MLP."""
    hidden = cfg.trpo.hidden
    return (block_b % 256 == 0
            and len(hidden) >= 1
            and all(h <= 64 for h in hidden)
            and 2 * _round8(cfg.obs_dim) <= 128)


def pack2_weights(Ws, bs):
    """Block-diagonal (2x) weights/biases for _policy_ff_pack2, built at
    trace time outside the kernel (tiny arrays; XLA folds them)."""
    do_pad = _round8(Ws[0].shape[0])
    da_pad = _round8(Ws[-1].shape[1])
    L = len(Ws)
    Ws_bd, bs_bd = [], []
    for i, (W, b) in enumerate(zip(Ws, bs)):
        din, dout = W.shape
        in_pad = do_pad if i == 0 else din
        out_pad = da_pad if i == L - 1 else dout
        Z = jnp.zeros((2 * in_pad, 2 * out_pad), W.dtype)
        Z = Z.at[:din, :dout].set(W)
        Z = Z.at[in_pad:in_pad + din, out_pad:out_pad + dout].set(W)
        Ws_bd.append(Z)
        b_col = b.reshape(dout, 1)
        zb = jnp.zeros((2 * out_pad, 1), b.dtype)
        zb = zb.at[:dout].set(b_col)
        zb = zb.at[out_pad:out_pad + dout].set(b_col)
        bs_bd.append(zb)
    return Ws_bd, bs_bd


def _policy_ff_pack2(Ws_bd, bs_bd, obs, da):
    """Pair-packed twin of _policy_ff: obs (do,B) -> mu (da,B) with
    every matmul streaming B/2 lanes. Same math (the block-diagonal
    zeros contribute exact 0.0); equivalence is covered by the kernel
    twin tests."""
    do, B = obs.shape
    half = B // 2
    do_pad = _round8(do)
    da_pad = _round8(da)
    # concat, not dynamic_update_slice: Mosaic's TPU lowering has no
    # in-kernel DUS (interpret mode accepts it — compiled does not)
    pad = do_pad - do
    zrows = None if pad == 0 else jnp.zeros((pad, half), obs.dtype)
    parts = [obs[:, :half]] + ([zrows] if pad else []) \
        + [obs[:, half:]] + ([zrows] if pad else [])
    h = jnp.concatenate(parts, axis=0)
    L = len(Ws_bd)
    for i in range(L - 1):
        z = jax.lax.dot_general(Ws_bd[i], h, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        h = jnp.tanh(z + bs_bd[i])
    mu2 = jax.lax.dot_general(Ws_bd[L - 1], h, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32) \
        + bs_bd[L - 1]
    return jnp.concatenate([mu2[:da], mu2[da_pad:da_pad + da]], axis=1)


def _step_ff(c: PlanarConsts, mlp, sigma, q, qd, tgtx, tgty, eps):
    """One env step, feature-first. q/qd: lists of n (1,B); eps (n,B).
    Returns (q2, qd2, obs (do,B), act (n,B), rew (1,B))."""
    n = c.n
    cth, sth, px, py, cx, cy, eex, eey = _fk_ff(c, q)

    # observation: [cos q, sin q, qd*s, tgt - ee (x, y, z=0)]
    obs = jnp.concatenate(
        [jnp.cos(jnp.concatenate(q, 0)), jnp.sin(jnp.concatenate(q, 0)),
         c.qd_obs_scale * jnp.concatenate(qd, 0),
         tgtx - eex, tgty - eey, jnp.zeros_like(eex)], axis=0)

    mu = mlp(obs)                                     # (n, B)
    act = mu + sigma * eps
    tau = jnp.clip(act, -c.torque_limit, c.torque_limit)
    tau_l = [tau[i:i + 1] for i in range(n)]

    h = c.dt / c.n_substeps
    for _ in range(c.n_substeps):
        M = _mass_ff(c, px, py, cx, cy)
        bias = _bias_ff(c, qd, px, py, cx, cy)
        rhs = [tau_l[i] - bias[i] - c.damping * qd[i] for i in range(n)]
        qdd = _chol_solve_ff(c, M, rhs)
        qd = [jnp.clip(qd[i] + h * qdd[i], -c.qd_limit, c.qd_limit)
              for i in range(n)]
        q = [q[i] + h * qd[i] for i in range(n)]
        if c.n_substeps > 1:
            cth, sth, px, py, cx, cy, eex, eey = _fk_ff(c, q)

    # reward at the POST-step state (matches oracle/envs/arm.py)
    if c.n_substeps == 1:
        _, _, _, _, _, _, eex, eey = _fk_ff(c, q)
    dx = eex - tgtx
    dy = eey - tgty
    ctrl = None
    for i in range(n):
        t2 = tau_l[i] * tau_l[i]
        ctrl = t2 if ctrl is None else ctrl + t2
    dist2 = dx * dx + dy * dy
    rew = -(dist2 + c.ctrl_weight * ctrl)
    return q, qd, obs, act, rew, dist2


# --------------------------------------------------------------- kernel
def _rollout_kernel(c: PlanarConsts, T, n_layers, use_prng, terminating,
                    pack2, *refs):
    """refs: q0 (n,Bt), qd0 (n,Bt), tgt (2,Bt), W0..W_{L-1}, b0..b_{L-1}
    (feature-first (d,1)), logstd (n,1), seed (1,1 SMEM) | eps (T,n,Bt),
    -> obs_out (T,do,Bt), act_out (T,n,Bt), rew_out (T,1,Bt)
    [, done_out (T,1,Bt) when terminating]."""
    it = iter(refs)
    q0_ref = next(it)
    qd0_ref = next(it)
    tgt_ref = next(it)
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
    sigma = jnp.exp(logstd_ref[:])                   # (n,1) -> broadcast

    q = [q0_ref[i:i + 1, :] for i in range(n)]
    qd = [qd0_ref[i:i + 1, :] for i in range(n)]
    tgtx = tgt_ref[0:1, :]
    tgty = tgt_ref[1:2, :]
    W_blocks = [w[:] for w in Ws]
    b_blocks = [b[:] for b in bs]
    if pack2:
        mlp = lambda o: _policy_ff_pack2(W_blocks, b_blocks, o, n)
    else:
        mlp = lambda o: _policy_ff(W_blocks, b_blocks, o)

    def body(t, carry):
        q, qd, tgtx, tgty = carry
        if use_prng:
            eps = _normals(n, q[0].shape[-1])
        else:
            eps = eps_ref[t]
        q2, qd2, obs, act, rew, dist2 = _step_ff(
            c, mlp, sigma, q, qd, tgtx, tgty, eps)
        obs_out[t] = obs.astype(obs_out.dtype)
        act_out[t] = act.astype(act_out.dtype)
        rew_out[t] = rew
        if terminating:
            # episode ends on reaching the target; resample a FRESH
            # episode in-kernel (same distributions as envs/arm.py:reset,
            # drawn from the on-chip PRNG stream)
            done = (dist2 < c.done_dist * c.done_dist)  # (1, B) bool
            done_out[t] = done.astype(jnp.float32)
            row = (1, q2[0].shape[-1])
            for i in range(n):
                qf = c.q0_noise * (2.0 * _uniform_01(row) - 1.0)
                qdf = c.qd0_noise * (2.0 * _uniform_01(row) - 1.0)
                q2[i] = jnp.where(done, qf, q2[i])
                qd2[i] = jnp.where(done, qdf, qd2[i])
            r = c.rmin + (c.rmax - c.rmin) * _uniform_01(row)
            th = _TWO_PI * _uniform_01(row)
            tgtx = jnp.where(done, r * jnp.cos(th), tgtx)
            tgty = jnp.where(done, r * jnp.sin(th), tgty)
        return (q2, qd2, tgtx, tgty)

    jax.lax.fori_loop(0, T, body, (q, qd, tgtx, tgty))


def _uniform_01(shape):
    """Random bits -> uniform in (0, 1], never 0 (log-safe).

    Mosaic supports neither uint32->f32 casts nor arithmetic-shift-safe
    int32 use directly: bitcast to uint32, logical-shift to 23 bits (top
    bit now 0), bitcast back to int32 (non-negative), then cast to f32.
    """
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    small = pltpu.bitcast(bits >> 9, jnp.int32)
    return small.astype(jnp.float32) * (2.0 ** -23) + (2.0 ** -24)


def _normals(n_rows, n_lanes):
    """(n_rows, n_lanes) standard normals via PAIRED Box-Muller.

    The naive per-row transform (sqrt(-2 ln u1) * cos(2 pi u2)) discards
    the sin half of each pair, spending one log + one trig PER normal.
    Using both halves costs one log + one cos + one sin per TWO normals
    — transcendentals are the dominant VPU cost here (~64 ns each vs
    2.6 ns fma, scripts/probe_vpu.py), so this cuts the sampler's
    transcendental rows from 2n to 3*ceil(n/2) (7 joints: 14 -> 12).
    Exact Box-Muller: the (cos, sin) halves of a pair are independent
    N(0,1); only the PRNG stream layout changes vs the unpaired form.
    """
    half = (n_rows + 1) // 2
    u1 = _uniform_01((half, n_lanes))
    u2 = _uniform_01((half, n_lanes))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    ang = _TWO_PI * u2
    z = jnp.concatenate([r * jnp.cos(ang), r * jnp.sin(ang)], axis=0)
    return z if 2 * half == n_rows else z[:n_rows]


def pallas_rollout(cfg: ExperimentConfig, params, key_or_seed,
                   n_envs=None, eps=None, block_b: int = 1024,
                   interpret: bool = False, q0=None, qd0=None, tgt=None,
                   store_dtype=None):
    """Fused rollout. Returns dict(obs (N,T,do), actions (N,T,da),
    rewards (N,T)) — same contract as envs/arm.py:rollout.
    store_dtype=bf16 emits obs_ff/actions_ff in bf16 (rewards stay
    fp32); see pallas_rollout3d.

    Initial states/targets are sampled with jax.random OUTSIDE the kernel
    (cheap, once per rollout) so their distributions stay identical to the
    reference path; only the per-step action noise uses the on-chip PRNG
    (or caller-supplied `eps` (T,N,n) for bit-exact twin testing).
    """
    from ...envs import arm as arm_mod

    c = planar_consts(cfg)
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
        q0 = state0.q
        qd0 = state0.qd
        tgt = state0.tgt
    seed = jax.random.randint(k_seed, (1, 1), 0,
                              np.iinfo(np.int32).max, dtype=jnp.int32)

    assert N % block_b == 0 or N < block_b, \
        f"n_envs={N} must be a multiple of block_b={block_b} (or smaller)"
    bb = min(block_b, N)
    grid = (N // bb,)

    # feature-first inputs
    q0_ff = q0.T                       # (n, N)
    qd0_ff = qd0.T
    tgt_ff = tgt[:, :2].T              # (2, N)

    L = sum(1 for k in params if k.startswith("W"))
    Ws = [params[f"W{i}"] for i in range(L)]
    bs = [params[f"b{i}"][:, None] for i in range(L)]
    logstd = params["logstd"][:, None]
    # pair-packed MLP: block-diagonal weights built at trace time; every
    # in-kernel policy matmul then streams bb/2 lanes (see above)
    pack2 = pack2_ok(cfg, bb)
    if pack2:
        Ws, bs = pack2_weights(Ws, [b[:, 0] for b in bs])

    batch_in = lambda d: pl.BlockSpec((d, bb), lambda i: (0, i),
                                      memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    in_specs = ([batch_in(n), batch_in(n), batch_in(2)]
                + [full(w.shape) for w in Ws]
                + [full(b.shape) for b in bs]
                + [full(logstd.shape)])
    inputs = [q0_ff, qd0_ff, tgt_ff] + Ws + bs + [logstd]

    use_prng = eps is None
    if use_prng:
        in_specs.append(pl.BlockSpec((1, 1), lambda i: (0, 0),
                                     memory_space=pltpu.SMEM))
        inputs.append(seed)
    else:
        eps_ff = jnp.swapaxes(eps, 1, 2) if eps.shape[1] == N else eps
        # eps arrives (T, N, n) -> (T, n, N)
        in_specs.append(pl.BlockSpec((T, n, bb), lambda i: (0, 0, i),
                                     memory_space=pltpu.VMEM))
        inputs.append(eps_ff)

    out_specs = [
        pl.BlockSpec((T, do, bb), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((T, n, bb), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((T, 1, bb), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),
    ]
    st_dt = store_dtype or jnp.float32
    vma = out_vma(inputs)
    out_shape = [
        jax.ShapeDtypeStruct((T, do, N), st_dt, vma=vma),
        jax.ShapeDtypeStruct((T, n, N), st_dt, vma=vma),
        jax.ShapeDtypeStruct((T, 1, N), jnp.float32, vma=vma),
    ]
    terminating = cfg.done_dist > 0.0
    assert not terminating or use_prng, \
        "in-kernel early termination resamples episodes from the " \
        "on-chip PRNG; the eps twin mode runs fixed-horizon only"
    if terminating:
        out_specs.append(pl.BlockSpec((T, 1, bb), lambda i: (0, 0, i),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((T, 1, N), jnp.float32,
                                              vma=vma))

    kernel = functools.partial(_rollout_kernel, c, T, L, use_prng,
                               terminating, pack2)
    outs = pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, interpret=interpret)(*inputs)
    obs_ff, act_ff, rew_ff = outs[:3]

    # (T, d, N) -> (N, T, d). obs_ff additionally exposes the kernel's
    # NATIVE feature-first layout: the baseline normal equations consume
    # it directly (trpo/update.py), which avoids XLA re-materialising a
    # (F, B)-transposed phi via a chunked while+DUS loop (measured ~3x
    # on the feature pipeline at c4 scale).
    f32 = jnp.float32
    # rewards_ff/dones_ff: the kernel-native (T, N) views — the ff
    # update pipeline consumes them directly (trpo/update.py runs
    # (T, N) end-to-end), leaving every batch-major transpose here as
    # dead code in the fused train step
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


def rollout_reference(cfg: ExperimentConfig, params, q0, qd0, tgt, eps):
    """jnp twin of the kernel (same feature-first math, lax.scan over T)
    for equivalence testing. eps: (T, N, n)."""
    c = planar_consts(cfg)
    n = c.n
    L = sum(1 for k in params if k.startswith("W"))
    Ws = [params[f"W{i}"] for i in range(L)]
    bs = [params[f"b{i}"][:, None] for i in range(L)]
    sigma = jnp.exp(params["logstd"])[:, None]

    q = [q0.T[i:i + 1] for i in range(n)]
    qd = [qd0.T[i:i + 1] for i in range(n)]
    tgtx = tgt[:, 0:1].T
    tgty = tgt[:, 1:2].T

    mlp = lambda o: _policy_ff(Ws, bs, o)

    def body(carry, eps_t):
        q, qd = carry
        q2, qd2, obs, act, rew, _ = _step_ff(c, mlp, sigma, q, qd,
                                             tgtx, tgty, eps_t.T)
        return (q2, qd2), (obs, act, rew)

    (_, _), (obs, act, rew) = jax.lax.scan(body, (q, qd), eps)
    return dict(obs=jnp.transpose(obs, (2, 0, 1)),
                actions=jnp.transpose(act, (2, 0, 1)),
                rewards=jnp.transpose(rew[:, 0, :], (1, 0)))
