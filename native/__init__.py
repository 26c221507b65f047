"""ctypes bindings for the native C++ CPU TRPO backend (native/trpo_cpu.cpp).

Builds the shared library on first import (g++ -O3 -march=native) and
caches it next to the source. The C ABI uses the oracle's sorted-key flat
parameter layout, so arrays round-trip to/from the Python side unchanged.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "trpo_cpu.cpp")


class NativeConfig(ctypes.Structure):
    _fields_ = [
        ("n", ctypes.c_int32),
        ("l", ctypes.c_double * 8),
        ("lc", ctypes.c_double * 8),
        ("m", ctypes.c_double * 8),
        ("iz", ctypes.c_double * 8),
        ("damping", ctypes.c_double),
        ("dt", ctypes.c_double),
        ("n_substeps", ctypes.c_int32),
        ("torque_limit", ctypes.c_double),
        ("qd_limit", ctypes.c_double),
        ("qd_obs_scale", ctypes.c_double),
        ("ctrl_weight", ctypes.c_double),
        ("gamma", ctypes.c_double),
        ("lam", ctypes.c_double),
        ("delta", ctypes.c_double),
        ("cg_damping", ctypes.c_double),
        ("cg_iters", ctypes.c_int32),
        ("ls_steps", ctypes.c_int32),
        ("ls_backtrack", ctypes.c_double),
        ("baseline_reg", ctypes.c_double),
        ("obs_dim", ctypes.c_int32),
        ("act_dim", ctypes.c_int32),
        ("h1", ctypes.c_int32),
        ("h2", ctypes.c_int32),
        ("n_envs", ctypes.c_int32),
        ("horizon", ctypes.c_int32),
        ("q0_noise", ctypes.c_double),
        ("qd0_noise", ctypes.c_double),
        ("rmin", ctypes.c_double),
        ("rmax", ctypes.c_double),
        # 3-D arm description (planar == 0 path)
        ("planar", ctypes.c_int32),
        ("gravity", ctypes.c_double),
        ("jrot", ctypes.c_double * 72),
        ("jpos", ctypes.c_double * 24),
        ("com3", ctypes.c_double * 24),
        ("idiag", ctypes.c_double * 24),
        ("ee_off", ctypes.c_double * 3),
        ("obst_weight", ctypes.c_double),
        ("obst_radius", ctypes.c_double),
        ("obst_center", ctypes.c_double * 3),
        ("n_tasks", ctypes.c_int32),
        ("track_omega", ctypes.c_double),
        ("push_speed", ctypes.c_double),
        ("push_weight", ctypes.c_double),
    ]


def build(force: bool = False) -> str:
    """Build (or reuse) the shared library, keyed by a content hash of
    the source PLUS a host identifier: the build uses -march=native, so
    a same-source .so copied from a different CPU must not be reused
    (it could SIGILL). The .so is never committed (.gitignore)."""
    import hashlib
    import platform
    with open(_SRC, "rb") as f:
        h = hashlib.sha256(f.read())
    # -march=native specializes to this machine's ISA extensions; key on
    # the CPU flags so a binary built elsewhere is never loaded here
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((ln for ln in f if ln.startswith("flags")), "")
    except OSError:
        flags = ""
    h.update((platform.machine() + flags).encode())
    digest = h.hexdigest()[:16]
    lib_path = os.path.join(_DIR, f"libtrpo_cpu.{digest}.so")
    if force or not os.path.exists(lib_path):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fPIC", "-shared",
             "-std=c++17", _SRC, "-o", lib_path],
            check=True, capture_output=True)
    return lib_path


_lib = None


def lib():
    global _lib
    if _lib is None:
        _lib = ctypes.CDLL(build())
        dp = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        _lib.trpo_cpu_rollout.argtypes = [
            ctypes.POINTER(NativeConfig), dp, ctypes.c_uint64, dp, dp, dp]
        _lib.trpo_cpu_rollout.restype = ctypes.c_int
        _lib.trpo_cpu_update.argtypes = [
            ctypes.POINTER(NativeConfig), dp, dp, dp, dp, dp, dp]
        _lib.trpo_cpu_update.restype = ctypes.c_int
        _lib.trpo_cpu_step.argtypes = [
            ctypes.POINTER(NativeConfig), dp, dp, dp, dp,
            ctypes.c_int32, dp, dp]
        _lib.trpo_cpu_step.restype = ctypes.c_int
        _lib.trpo_cpu_param_size.argtypes = [ctypes.POINTER(NativeConfig)]
        _lib.trpo_cpu_param_size.restype = ctypes.c_size_t
    return _lib


def make_config(cfg) -> NativeConfig:
    """Build a NativeConfig from an ExperimentConfig.

    Planar zero-gravity single-task arms take the closed-form planar
    path; everything else (the 7-DoF c3/c4 Franka-like with gravity and
    the obstacle penalty, and ALL multi-task configs — the track/push
    goal families need EE velocities) takes the general world-frame
    RNEA path mirroring oracle/dynamics.py. The full c1-c5 feature set
    is covered; rewards are pinned against the fp64 oracle env in
    tests/test_native_3d.py.
    """
    from trpo_robot_control_tpu.envs.rigid_body import ArmConstants
    from oracle.dynamics import ArmModel
    spec = cfg.arm
    c = ArmConstants(spec)
    assert cfg.done_dist == 0.0, \
        "native backend runs fixed-horizon episodes"
    n = spec.n_joints
    assert n <= 8
    hidden = cfg.trpo.hidden
    assert len(hidden) == 2, "native net is fixed at 2 hidden layers"
    # multitask needs the general 3-D path (EE velocity for the push
    # family), so planar multitask arms take the RNEA route too
    planar = c.planar and abs(spec.gravity) < 1e-12 and cfg.n_tasks == 1
    nc = NativeConfig()
    nc.n = n
    nc.planar = 1 if planar else 0
    nc.gravity = float(spec.gravity)
    model = ArmModel(spec)
    for i in range(n):
        for k in range(9):
            nc.jrot[i * 9 + k] = float(model.T_rot[i].ravel()[k])
        for k in range(3):
            nc.jpos[i * 3 + k] = float(model.T_pos[i][k])
            nc.com3[i * 3 + k] = float(model.com[i][k])
            nc.idiag[i * 3 + k] = float(spec.links[i].inertia_diag[k])
    for k in range(3):
        nc.ee_off[k] = float(spec.ee_offset[k])
        nc.obst_center[k] = float(cfg.cost.obstacle_center[k])
    nc.obst_weight = float(cfg.cost.obstacle_weight)
    nc.obst_radius = float(cfg.cost.obstacle_radius)
    nc.n_tasks = int(cfg.n_tasks)
    nc.track_omega = float(cfg.cost.track_omega)
    nc.push_speed = float(cfg.cost.push_speed)
    nc.push_weight = float(cfg.cost.push_weight)
    if planar:
        ls = [float(spec.joints[i + 1].pos[0]) for i in range(n - 1)] \
            + [float(spec.ee_offset[0])]
        for i in range(n):
            nc.l[i] = ls[i]
            nc.lc[i] = float(spec.links[i].com[0])
    for i in range(n):
        nc.m[i] = float(spec.links[i].mass)
        nc.iz[i] = float(spec.links[i].inertia_diag[2])
    nc.damping = spec.joint_damping
    nc.dt = spec.dt
    nc.n_substeps = spec.n_substeps
    nc.torque_limit = spec.torque_limit
    nc.qd_limit = spec.qd_limit
    nc.qd_obs_scale = spec.qd_obs_scale
    nc.ctrl_weight = cfg.cost.ctrl_weight
    tr = cfg.trpo
    nc.gamma, nc.lam, nc.delta = tr.gamma, tr.lam, tr.delta
    nc.cg_damping, nc.cg_iters = tr.cg_damping, tr.cg_iters
    nc.ls_steps, nc.ls_backtrack = tr.ls_steps, tr.ls_backtrack
    nc.baseline_reg = tr.baseline_reg
    nc.obs_dim = cfg.obs_dim
    nc.act_dim = n
    nc.h1, nc.h2 = hidden
    nc.n_envs, nc.horizon = cfg.n_envs, cfg.horizon
    nc.q0_noise, nc.qd0_noise = spec.q0_noise, spec.qd0_noise
    nc.rmin = spec.target_rmin_frac * spec.reach
    nc.rmax = spec.target_rmax_frac * spec.reach
    return nc


def rollout(cfg, params_flat: np.ndarray, seed: int):
    nc = make_config(cfg)
    N, T = cfg.n_envs, cfg.horizon
    do, da = cfg.obs_dim, cfg.arm.n_joints
    obs = np.zeros((N, T, do))
    act = np.zeros((N, T, da))
    rew = np.zeros((N, T))
    r = lib().trpo_cpu_rollout(ctypes.byref(nc),
                               np.ascontiguousarray(params_flat,
                                                    np.float64),
                               seed, obs, act, rew)
    assert r == 0
    return dict(obs=obs, actions=act, rewards=rew)


def step(cfg, q: np.ndarray, qd: np.ndarray, tau: np.ndarray,
         tgt=None, task: int = 0):
    """One env step (single env): returns (q2, qd2, ee, tgt2, reward).
    Pins the native integrator AND the full reward (obstacle / track /
    push variants) against the fp64 oracle in tests. tau must already
    be clipped to the torque limit."""
    nc = make_config(cfg)
    q = np.ascontiguousarray(q, np.float64).copy()
    qd = np.ascontiguousarray(qd, np.float64).copy()
    tgt = np.zeros(3) if tgt is None \
        else np.ascontiguousarray(tgt, np.float64).copy()
    ee = np.zeros(3)
    rew = np.zeros(1)
    r = lib().trpo_cpu_step(ctypes.byref(nc), q, qd,
                            np.ascontiguousarray(tau, np.float64),
                            tgt, task, ee, rew)
    assert r == 0
    return q, qd, ee, tgt, float(rew[0])


def update(cfg, params_flat: np.ndarray, w: np.ndarray, batch):
    """In-place TRPO update. Returns stats dict."""
    nc = make_config(cfg)
    stats = np.zeros(6)
    params_flat = np.ascontiguousarray(params_flat, np.float64)
    w = np.ascontiguousarray(w, np.float64)
    r = lib().trpo_cpu_update(
        ctypes.byref(nc), params_flat, w,
        np.ascontiguousarray(batch["obs"], np.float64),
        np.ascontiguousarray(batch["actions"], np.float64),
        np.ascontiguousarray(batch["rewards"], np.float64), stats)
    assert r == 0
    return params_flat, w, dict(beta=stats[0], accepted=int(stats[1]),
                                kl=stats[2], surr=stats[3],
                                mean_return=stats[4], g_norm=stats[5])
