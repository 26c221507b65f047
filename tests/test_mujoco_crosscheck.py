"""Cross-check the oracle/JAX rigid-body dynamics against MuJoCo
(SURVEY.md section 9 M4: "cross-check statics & small trajectories against
installed mujoco"). An MJCF model is generated from the same ArmSpec, so
this validates the RNEA/CRBA implementation itself on arbitrary chains —
including the 7-DoF Franka-like arm — against an independent fp64 engine.
"""
import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

from oracle.dynamics import ArmModel
from trpo_robot_control_tpu.configs import franka_like_arm, planar_arm


def spec_to_mjcf(spec) -> str:
    body_xml = ""
    indent = "    "
    for i, (j, l) in enumerate(zip(spec.joints, spec.links)):
        pos = " ".join(f"{v!r}" for v in j.pos)
        rpy = " ".join(f"{v!r}" for v in j.rpy)
        com = " ".join(f"{v!r}" for v in l.com)
        di = " ".join(f"{v!r}" for v in l.inertia_diag)
        body_xml += (
            f'{indent}<body name="link{i}" pos="{pos}" euler="{rpy}">\n'
            f'{indent}  <joint name="j{i}" type="hinge" axis="0 0 1" '
            f'damping="0"/>\n'
            f'{indent}  <inertial pos="{com}" mass="{l.mass!r}" '
            f'diaginertia="{di}"/>\n')
        indent += "  "
    ee = " ".join(f"{v!r}" for v in spec.ee_offset)
    body_xml += f'{indent}<site name="ee" pos="{ee}"/>\n'
    for i in range(len(spec.joints)):
        indent = indent[:-2]
        body_xml += f"{indent}</body>\n"
    return f"""
<mujoco>
  <compiler angle="radian" coordinate="local"/>
  <option gravity="0 0 {-spec.gravity!r}"/>
  <worldbody>
{body_xml}
  </worldbody>
</mujoco>
"""


def _crosscheck(spec, n_states=5, seed=0):
    model = mujoco.MjModel.from_xml_string(spec_to_mjcf(spec))
    data = mujoco.MjData(model)
    ours = ArmModel(spec)
    n = spec.n_joints
    rng = np.random.RandomState(seed)
    for _ in range(n_states):
        q = rng.uniform(-np.pi, np.pi, n)
        qd = rng.uniform(-2, 2, n)

        data.qpos[:] = q
        data.qvel[:] = qd
        mujoco.mj_forward(model, data)

        # FK: end-effector site
        ee_mj = data.site_xpos[0].copy()
        np.testing.assert_allclose(ours.ee_pos(q), ee_mj, atol=1e-9)

        # mass matrix
        M_mj = np.zeros((n, n))
        mujoco.mj_fullM(model, data, M_mj)
        np.testing.assert_allclose(ours.mass_matrix(q), M_mj, atol=1e-9)

        # bias forces C(q,qd)qd + g(q): mj_rne with flg_acc=0
        bias_mj = np.zeros(n)
        mujoco.mj_rne(model, data, 0, bias_mj)
        np.testing.assert_allclose(ours.bias(q, qd), bias_mj, atol=1e-9)


def test_planar2_vs_mujoco():
    _crosscheck(planar_arm(2))


def test_planar3_vs_mujoco():
    _crosscheck(planar_arm(3))


def test_franka7_vs_mujoco():
    _crosscheck(franka_like_arm())


def test_franka7_trajectory_vs_mujoco():
    """Short passive trajectory: same integrator family (semi-implicit
    Euler), small dt — trajectories must stay close over 100 steps."""
    spec = franka_like_arm(dt=1e-3, n_substeps=1, joint_damping=0.0)
    model = mujoco.MjModel.from_xml_string(spec_to_mjcf(spec))
    model.opt.timestep = spec.dt
    model.opt.integrator = mujoco.mjtIntegrator.mjINT_EULER
    data = mujoco.MjData(model)
    ours = ArmModel(spec)

    q = np.array([0.3, -0.5, 0.2, -1.0, 0.4, 0.8, -0.2])
    qd = np.zeros(7)
    data.qpos[:] = q
    data.qvel[:] = qd
    q_o, qd_o = q.copy(), qd.copy()
    for _ in range(100):
        mujoco.mj_step(model, data)
        q_o, qd_o = ours.step(q_o, qd_o, np.zeros(7))
    np.testing.assert_allclose(q_o, data.qpos, atol=2e-3)
