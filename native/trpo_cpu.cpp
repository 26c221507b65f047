// Native CPU backend: full TRPO rollout + natural-gradient update for
// every c1-c5 arm/cost variant (planar closed form; general 3-D
// world-frame RNEA with gravity; obstacle penalty; track/push
// multi-task goal families).
//
// Role (SURVEY.md section 3, "CPU compute implementation" row): the
// reference stack pairs its accelerator kernels with a fast C CPU
// implementation of the same math; this is that component for this
// engine — a from-scratch C++ implementation of the planar arm dynamics,
// Gaussian-MLP policy, GAE, Gauss-Newton FVP, CG and KL line search,
// sharing the frozen algorithm contract (SURVEY.md section 4) and the
// oracle's sorted-key flat parameter layout {W0,W1,W2,b0,b1,b2,logstd}.
//
// fp64 throughout; single-threaded reference semantics with OpenMP-free
// portable loops (vectorizable by -O3 -march=native).
//
// Exposed via a C ABI (see native/__init__.py for the ctypes bindings);
// validated against the NumPy oracle in tests/test_native_cpu.py.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <random>
#include <vector>

namespace {

struct Config {
  // arm
  int32_t n;                 // links/joints
  double l[8];               // joint offsets (last = ee offset)
  double lc[8];
  double m[8];
  double iz[8];
  double damping;
  double dt;
  int32_t n_substeps;
  double torque_limit;
  double qd_limit;
  double qd_obs_scale;
  double ctrl_weight;
  // trpo
  double gamma;
  double lam;
  double delta;
  double cg_damping;
  int32_t cg_iters;
  int32_t ls_steps;
  double ls_backtrack;
  double baseline_reg;
  // net (2 hidden layers, tanh)
  int32_t obs_dim;
  int32_t act_dim;
  int32_t h1;
  int32_t h2;
  // batch
  int32_t n_envs;
  int32_t horizon;
  // env reset
  double q0_noise;
  double qd0_noise;
  double rmin;               // target radius min (absolute)
  double rmax;
  // ---- 3-D arm description (used when planar == 0; mirrors
  // oracle/dynamics.py:ArmModel — world-frame RNEA with a rot-z joint
  // after each fixed rpy rotation)
  int32_t planar;
  double gravity;            // along world -z (base-accel trick)
  double jrot[72];           // 8 x (3x3 row-major) fixed rotations
  double jpos[24];           // 8 x 3 joint origin offsets (parent frame)
  double com3[24];           // 8 x 3 link COM (link frame)
  double idiag[24];          // 8 x 3 link inertia diagonal (link frame)
  double ee_off[3];          // EE offset in last link frame
  // obstacle penalty (inactive when weight == 0); matches
  // trpo_robot_control_tpu/envs/arm.py:obstacle_penalty
  double obst_weight;
  double obst_radius;
  double obst_center[3];
  // multi-task goal families (envs/arm.py: 0 = reach, 1 = track,
  // 2 = push); n_tasks == 1 disables everything below
  int32_t n_tasks;
  double track_omega;
  double push_speed;
  double push_weight;
};

struct ParamView {
  // sorted-key order: W0, W1, W2, b0, b1, b2, logstd
  double *W0, *W1, *W2, *b0, *b1, *b2, *logstd;
  int32_t d0, d1, d2, da;
  static ParamView of(double* flat, const Config& c) {
    ParamView v;
    v.d0 = c.obs_dim; v.d1 = c.h1; v.d2 = c.h2; v.da = c.act_dim;
    double* p = flat;
    v.W0 = p; p += (size_t)v.d0 * v.d1;
    v.W1 = p; p += (size_t)v.d1 * v.d2;
    v.W2 = p; p += (size_t)v.d2 * v.da;
    v.b0 = p; p += v.d1;
    v.b1 = p; p += v.d2;
    v.b2 = p; p += v.da;
    v.logstd = p;
    return v;
  }
  static size_t size(const Config& c) {
    return (size_t)c.obs_dim * c.h1 + (size_t)c.h1 * c.h2 +
           (size_t)c.h2 * c.act_dim + c.h1 + c.h2 + 2 * (size_t)c.act_dim;
  }
};

// ----------------------------------------------------------- dynamics
// Planar closed form, identical math to the Pallas rollout kernel
// (trpo_robot_control_tpu/ops/pallas/rollout_kernel.py).
struct ArmState {
  std::vector<double> q, qd;
};

void fk(const Config& c, const double* q, double* px, double* py,
        double* cx, double* cy, double& eex, double& eey) {
  double th = 0.0, x = 0.0, y = 0.0;
  for (int i = 0; i < c.n; ++i) {
    th += q[i];
    px[i] = x; py[i] = y;
    double ct = std::cos(th), st = std::sin(th);
    cx[i] = x + c.lc[i] * ct;
    cy[i] = y + c.lc[i] * st;
    x += c.l[i] * ct;
    y += c.l[i] * st;
  }
  eex = x; eey = y;
}

void mass_matrix(const Config& c, const double* px, const double* py,
                 const double* cx, const double* cy, double* M /*n*n*/) {
  int n = c.n;
  for (int i = 0; i < n; ++i)
    for (int j = i; j < n; ++j) {
      double acc = 0.0;
      for (int k = j; k < n; ++k) {
        double dot = (cy[k] - py[i]) * (cy[k] - py[j]) +
                     (cx[k] - px[i]) * (cx[k] - px[j]);
        acc += c.m[k] * dot + c.iz[k];
      }
      M[i * n + j] = acc;
      M[j * n + i] = acc;
    }
}

void bias_forces(const Config& c, const double* qd, const double* px,
                 const double* py, const double* cx, const double* cy,
                 double* tau /*n*/) {
  int n = c.n;
  double w = 0.0, ax = 0.0, ay = 0.0;
  std::vector<double> acx(n), acy(n);
  for (int i = 0; i < n; ++i) {
    w += qd[i];
    double w2 = w * w;
    acx[i] = ax - w2 * (cx[i] - px[i]);
    acy[i] = ay - w2 * (cy[i] - py[i]);
    if (i + 1 < n) {
      ax -= w2 * (px[i + 1] - px[i]);
      ay -= w2 * (py[i + 1] - py[i]);
    }
  }
  double fx = 0.0, fy = 0.0, nz = 0.0, pcx = 0.0, pcy = 0.0;
  for (int i = n - 1; i >= 0; --i) {
    double Fx = c.m[i] * acx[i], Fy = c.m[i] * acy[i];
    nz += (cx[i] - px[i]) * Fy - (cy[i] - py[i]) * Fx +
          (pcx - px[i]) * fy - (pcy - py[i]) * fx;
    tau[i] = nz;
    fx += Fx; fy += Fy;
    pcx = px[i]; pcy = py[i];
  }
}

void chol_solve(int n, double* A /*n*n, destroyed*/, double* b /*n, io*/) {
  // in-place Cholesky A = L L^T then solve
  for (int j = 0; j < n; ++j) {
    double s = A[j * n + j];
    for (int k = 0; k < j; ++k) s -= A[j * n + k] * A[j * n + k];
    A[j * n + j] = std::sqrt(s);
    for (int i = j + 1; i < n; ++i) {
      double t = A[i * n + j];
      for (int k = 0; k < j; ++k) t -= A[i * n + k] * A[j * n + k];
      A[i * n + j] = t / A[j * n + j];
    }
  }
  for (int i = 0; i < n; ++i) {
    double s = b[i];
    for (int k = 0; k < i; ++k) s -= A[i * n + k] * b[k];
    b[i] = s / A[i * n + i];
  }
  for (int i = n - 1; i >= 0; --i) {
    double s = b[i];
    for (int k = i + 1; k < n; ++k) s -= A[k * n + i] * b[k];
    b[i] = s / A[i * n + i];
  }
}

// ------------------------------------------------------- 3-D dynamics
// General fixed-base serial arm, world-frame RNEA — the same recursion
// as oracle/dynamics.py:ArmModel (fk / rnea / mass-by-columns / bias),
// fp64, loop-based, n <= 8.
inline void v_cross(const double* a, const double* b, double* o) {
  o[0] = a[1] * b[2] - a[2] * b[1];
  o[1] = a[2] * b[0] - a[0] * b[2];
  o[2] = a[0] * b[1] - a[1] * b[0];
}

inline void m33_vec(const double* R, const double* v, double* o) {
  for (int r = 0; r < 3; ++r)
    o[r] = R[r * 3] * v[0] + R[r * 3 + 1] * v[1] + R[r * 3 + 2] * v[2];
}

inline void m33_tvec(const double* R, const double* v, double* o) {
  for (int r = 0; r < 3; ++r)
    o[r] = R[r] * v[0] + R[3 + r] * v[1] + R[6 + r] * v[2];
}

inline void m33_mul(const double* A, const double* B, double* o) {
  for (int r = 0; r < 3; ++r)
    for (int cc = 0; cc < 3; ++cc)
      o[r * 3 + cc] = A[r * 3] * B[cc] + A[r * 3 + 1] * B[3 + cc] +
                      A[r * 3 + 2] * B[6 + cc];
}

// R_i = R_parent @ T_rot_i @ rot_z(q_i); p_i = p_parent + R_parent @ pos_i
void fk3(const Config& c, const double* q, double* R /*n*9*/,
         double* p /*n*3*/, double* ee /*3*/) {
  int n = c.n;
  double R_par[9] = {1, 0, 0, 0, 1, 0, 0, 0, 1};
  double p_par[3] = {0, 0, 0};
  double tmp[9], rz[9];
  for (int i = 0; i < n; ++i) {
    m33_vec(R_par, &c.jpos[i * 3], &p[i * 3]);
    for (int k = 0; k < 3; ++k) p[i * 3 + k] += p_par[k];
    double cq = std::cos(q[i]), sq = std::sin(q[i]);
    rz[0] = cq; rz[1] = -sq; rz[2] = 0;
    rz[3] = sq; rz[4] = cq;  rz[5] = 0;
    rz[6] = 0;  rz[7] = 0;   rz[8] = 1;
    m33_mul(R_par, &c.jrot[i * 9], tmp);
    m33_mul(tmp, rz, &R[i * 9]);
    std::memcpy(R_par, &R[i * 9], 9 * sizeof(double));
    std::memcpy(p_par, &p[i * 3], 3 * sizeof(double));
  }
  m33_vec(&R[(n - 1) * 9], c.ee_off, ee);
  for (int k = 0; k < 3; ++k) ee[k] += p[(n - 1) * 3 + k];
}

// tau = ID(q, qd, qdd) at given gravity; joint damping NOT included.
void rnea3(const Config& c, const double* q, const double* qd,
           const double* qdd, double gravity, const double* R,
           const double* p, double* tau) {
  int n = c.n;
  double axis[8][3], w[8][3], wd[8][3], a[8][3], cw[8][3], ac[8][3];
  double w_par[3] = {0, 0, 0}, wd_par[3] = {0, 0, 0};
  double a_par[3] = {0, 0, gravity};
  double R_par[9] = {1, 0, 0, 0, 1, 0, 0, 0, 1};
  double t1[3], t2[3], zhat[3] = {0, 0, 1};
  for (int i = 0; i < n; ++i) {
    double rot[9];
    m33_mul(R_par, &c.jrot[i * 9], rot);
    double s[3];
    m33_vec(rot, zhat, s);
    std::memcpy(axis[i], s, sizeof(s));
    double r[3];
    m33_vec(R_par, &c.jpos[i * 3], r);
    v_cross(wd_par, r, t1);
    v_cross(w_par, r, t2);
    double t3[3];
    v_cross(w_par, t2, t3);
    for (int k = 0; k < 3; ++k) a[i][k] = a_par[k] + t1[k] + t3[k];
    for (int k = 0; k < 3; ++k) w[i][k] = w_par[k] + s[k] * qd[i];
    double sv[3] = {s[0] * qd[i], s[1] * qd[i], s[2] * qd[i]};
    v_cross(w_par, sv, t1);
    for (int k = 0; k < 3; ++k)
      wd[i][k] = wd_par[k] + s[k] * qdd[i] + t1[k];
    double d[3];
    m33_vec(&R[i * 9], &c.com3[i * 3], d);
    for (int k = 0; k < 3; ++k) cw[i][k] = p[i * 3 + k] + d[k];
    v_cross(wd[i], d, t1);
    v_cross(w[i], d, t2);
    double t4[3];
    v_cross(w[i], t2, t4);
    for (int k = 0; k < 3; ++k) ac[i][k] = a[i][k] + t1[k] + t4[k];
    std::memcpy(w_par, w[i], sizeof(w_par));
    std::memcpy(wd_par, wd[i], sizeof(wd_par));
    std::memcpy(a_par, a[i], sizeof(a_par));
    std::memcpy(R_par, &R[i * 9], 9 * sizeof(double));
  }
  double f_child[3] = {0, 0, 0}, n_child[3] = {0, 0, 0},
         p_child[3] = {0, 0, 0};
  for (int i = n - 1; i >= 0; --i) {
    // Iw = R diag(I) R^T (link inertia is diagonal in the link frame)
    double RtW[3], Iwwd[3], Iww[3];
    // Iw @ v computed as R @ (diag * (R^T @ v))
    m33_tvec(&R[i * 9], wd[i], RtW);
    for (int k = 0; k < 3; ++k) RtW[k] *= c.idiag[i * 3 + k];
    m33_vec(&R[i * 9], RtW, Iwwd);
    m33_tvec(&R[i * 9], w[i], RtW);
    for (int k = 0; k < 3; ++k) RtW[k] *= c.idiag[i * 3 + k];
    m33_vec(&R[i * 9], RtW, Iww);
    double F[3], Nn[3], wxIww[3];
    for (int k = 0; k < 3; ++k) F[k] = c.m[i] * ac[i][k];
    v_cross(w[i], Iww, wxIww);
    for (int k = 0; k < 3; ++k) Nn[k] = Iwwd[k] + wxIww[k];
    double f[3];
    for (int k = 0; k < 3; ++k) f[k] = F[k] + f_child[k];
    double rc[3], rpc[3], t1b[3], t2b[3];
    for (int k = 0; k < 3; ++k) {
      rc[k] = cw[i][k] - p[i * 3 + k];
      rpc[k] = p_child[k] - p[i * 3 + k];
    }
    v_cross(rc, F, t1b);
    v_cross(rpc, f_child, t2b);
    double nn[3];
    for (int k = 0; k < 3; ++k)
      nn[k] = Nn[k] + n_child[k] + t1b[k] + t2b[k];
    tau[i] = axis[i][0] * nn[0] + axis[i][1] * nn[1] + axis[i][2] * nn[2];
    std::memcpy(f_child, f, sizeof(f));
    std::memcpy(n_child, nn, sizeof(nn));
    std::memcpy(p_child, &p[i * 3], 3 * sizeof(double));
  }
}

// Gaussian elimination with partial pivoting (matches np.linalg.solve's
// LAPACK LU to fp64 rounding for these small well-conditioned systems;
// the oracle's forward dynamics adds NO diagonal jitter, so neither
// does this path).
void lin_solve(int n, double* A /*n*n, destroyed*/, double* b) {
  for (int k = 0; k < n; ++k) {
    int piv = k;
    for (int i = k + 1; i < n; ++i)
      if (std::abs(A[i * n + k]) > std::abs(A[piv * n + k])) piv = i;
    if (piv != k) {
      for (int j = 0; j < n; ++j) std::swap(A[k * n + j], A[piv * n + j]);
      std::swap(b[k], b[piv]);
    }
    for (int i = k + 1; i < n; ++i) {
      double f = A[i * n + k] / A[k * n + k];
      for (int j = k + 1; j < n; ++j) A[i * n + j] -= f * A[k * n + j];
      b[i] -= f * b[k];
    }
  }
  for (int i = n - 1; i >= 0; --i) {
    double s = b[i];
    for (int j = i + 1; j < n; ++j) s -= A[i * n + j] * b[j];
    b[i] = s / A[i * n + i];
  }
}

void dynamics_step3(const Config& c, double* q, double* qd,
                    const double* tau) {
  int n = c.n;
  double R[72], p[24], ee[3], M[64], col[8], rhs[8];
  double zero[8] = {0}, e[8];
  double h = c.dt / c.n_substeps;
  for (int s = 0; s < c.n_substeps; ++s) {
    fk3(c, q, R, p, ee);
    for (int j = 0; j < n; ++j) {
      std::memset(e, 0, sizeof(e));
      e[j] = 1.0;
      rnea3(c, q, zero, e, 0.0, R, p, col);
      for (int i = 0; i < n; ++i) M[i * n + j] = col[i];
    }
    for (int i = 0; i < n; ++i)
      for (int j = i + 1; j < n; ++j) {
        double v = 0.5 * (M[i * n + j] + M[j * n + i]);
        M[i * n + j] = v;
        M[j * n + i] = v;
      }
    rnea3(c, q, qd, zero, c.gravity, R, p, rhs);
    for (int i = 0; i < n; ++i)
      rhs[i] = tau[i] - rhs[i] - c.damping * qd[i];
    lin_solve(n, M, rhs);
    for (int i = 0; i < n; ++i) {
      qd[i] += h * rhs[i];
      if (qd[i] > c.qd_limit) qd[i] = c.qd_limit;
      if (qd[i] < -c.qd_limit) qd[i] = -c.qd_limit;
      q[i] += h * qd[i];
    }
  }
}

// EE velocity: sum_i qd_i * (axis_i x (ee - p_i)); axis_i = R_i z_hat
void ee_velocity3(const Config& c, const double* R, const double* p,
                  const double* qd, const double* ee, double* v) {
  v[0] = v[1] = v[2] = 0.0;
  for (int i = 0; i < c.n; ++i) {
    double axis[3] = {R[i * 9 + 2], R[i * 9 + 5], R[i * 9 + 8]};
    double r[3] = {ee[0] - p[i * 3], ee[1] - p[i * 3 + 1],
                   ee[2] - p[i * 3 + 2]};
    double cx[3];
    v_cross(axis, r, cx);
    for (int k = 0; k < 3; ++k) v[k] += qd[i] * cx[k];
  }
}

// smooth sphere penalty over joint origins [1:] + EE (envs/arm.py)
double obstacle_pen(const Config& c, const double* p, const double* ee) {
  double pen = 0.0;
  for (int i = 1; i <= c.n; ++i) {
    const double* pt = (i == c.n) ? ee : &p[i * 3];
    double dx = pt[0] - c.obst_center[0], dy = pt[1] - c.obst_center[1],
           dz = pt[2] - c.obst_center[2];
    double d = std::sqrt(dx * dx + dy * dy + dz * dz);
    double gap = c.obst_radius - d;
    if (gap > 0.0) pen += gap * gap;
  }
  return pen;
}

void dynamics_step(const Config& c, double* q, double* qd,
                   const double* tau) {
  int n = c.n;
  double px[8], py[8], cx[8], cy[8], eex, eey;
  double M[64], rhs[8];
  double h = c.dt / c.n_substeps;
  for (int s = 0; s < c.n_substeps; ++s) {
    fk(c, q, px, py, cx, cy, eex, eey);
    mass_matrix(c, px, py, cx, cy, M);
    for (int i = 0; i < n; ++i) M[i * n + i] += 1e-6;
    bias_forces(c, qd, px, py, cx, cy, rhs);
    for (int i = 0; i < n; ++i)
      rhs[i] = tau[i] - rhs[i] - c.damping * qd[i];
    chol_solve(n, M, rhs);
    for (int i = 0; i < n; ++i) {
      qd[i] += h * rhs[i];
      if (qd[i] > c.qd_limit) qd[i] = c.qd_limit;
      if (qd[i] < -c.qd_limit) qd[i] = -c.qd_limit;
      q[i] += h * qd[i];
    }
  }
}

// ----------------------------------------------------------------- net
void mlp_forward(const Config& c, const ParamView& p, const double* obs,
                 int B, double* h0, double* h1, double* mu) {
  // obs (B, d0) row-major -> h0 (B, d1), h1 (B, d2), mu (B, da)
  for (int b = 0; b < B; ++b) {
    const double* x = obs + (size_t)b * c.obs_dim;
    double* H0 = h0 + (size_t)b * c.h1;
    for (int j = 0; j < c.h1; ++j) {
      double s = p.b0[j];
      for (int i = 0; i < c.obs_dim; ++i) s += x[i] * p.W0[i * c.h1 + j];
      H0[j] = std::tanh(s);
    }
    double* H1 = h1 + (size_t)b * c.h2;
    for (int j = 0; j < c.h2; ++j) {
      double s = p.b1[j];
      for (int i = 0; i < c.h1; ++i) s += H0[i] * p.W1[i * c.h2 + j];
      H1[j] = std::tanh(s);
    }
    double* M = mu + (size_t)b * c.act_dim;
    for (int j = 0; j < c.act_dim; ++j) {
      double s = p.b2[j];
      for (int i = 0; i < c.h2; ++i) s += H1[i] * p.W2[i * c.act_dim + j];
      M[j] = s;
    }
  }
}

// backprop: given per-sample dmu (B, da) and shared dlogstd (da),
// accumulate grads into gflat (same layout). h0,h1 from forward.
void mlp_vjp(const Config& c, const ParamView& p, const double* obs,
             const double* h0, const double* h1, int B, const double* dmu,
             const double* dlogstd, double* gflat) {
  ParamView g = ParamView::of(gflat, c);
  std::memset(gflat, 0, ParamView::size(c) * sizeof(double));
  std::vector<double> g1(c.h2), g0(c.h1);
  for (int b = 0; b < B; ++b) {
    const double* x = obs + (size_t)b * c.obs_dim;
    const double* H0 = h0 + (size_t)b * c.h1;
    const double* H1 = h1 + (size_t)b * c.h2;
    const double* u = dmu + (size_t)b * c.act_dim;
    for (int j = 0; j < c.act_dim; ++j) g.b2[j] += u[j];
    for (int i = 0; i < c.h2; ++i) {
      double s = 0.0;
      for (int j = 0; j < c.act_dim; ++j) {
        s += p.W2[i * c.act_dim + j] * u[j];
        g.W2[i * c.act_dim + j] += H1[i] * u[j];
      }
      g1[i] = s * (1.0 - H1[i] * H1[i]);
    }
    for (int j = 0; j < c.h2; ++j) g.b1[j] += g1[j];
    for (int i = 0; i < c.h1; ++i) {
      double s = 0.0;
      for (int j = 0; j < c.h2; ++j) {
        s += p.W1[i * c.h2 + j] * g1[j];
        g.W1[i * c.h2 + j] += H0[i] * g1[j];
      }
      g0[i] = s * (1.0 - H0[i] * H0[i]);
    }
    for (int j = 0; j < c.h1; ++j) g.b0[j] += g0[j];
    for (int i = 0; i < c.obs_dim; ++i)
      for (int j = 0; j < c.h1; ++j) g.W0[i * c.h1 + j] += x[i] * g0[j];
  }
  for (int j = 0; j < c.act_dim; ++j) g.logstd[j] = dlogstd[j];
}

// forward-mode: tangent tflat -> dmu (B, da); dlogstd = t.logstd
void mlp_jvp(const Config& c, const ParamView& p, double* tflat,
             const double* obs, const double* h0, const double* h1, int B,
             double* dmu) {
  ParamView t = ParamView::of(tflat, c);
  std::vector<double> dh0(c.h1), dh1(c.h2);
  for (int b = 0; b < B; ++b) {
    const double* x = obs + (size_t)b * c.obs_dim;
    const double* H0 = h0 + (size_t)b * c.h1;
    const double* H1 = h1 + (size_t)b * c.h2;
    for (int j = 0; j < c.h1; ++j) {
      double s = t.b0[j];
      for (int i = 0; i < c.obs_dim; ++i) s += x[i] * t.W0[i * c.h1 + j];
      dh0[j] = (1.0 - H0[j] * H0[j]) * s;
    }
    for (int j = 0; j < c.h2; ++j) {
      double s = t.b1[j];
      for (int i = 0; i < c.h1; ++i)
        s += dh0[i] * p.W1[i * c.h2 + j] + H0[i] * t.W1[i * c.h2 + j];
      dh1[j] = (1.0 - H1[j] * H1[j]) * s;
    }
    double* u = dmu + (size_t)b * c.act_dim;
    for (int j = 0; j < c.act_dim; ++j) {
      double s = t.b2[j];
      for (int i = 0; i < c.h2; ++i)
        s += dh1[i] * p.W2[i * c.act_dim + j] + H1[i] * t.W2[i * c.act_dim + j];
      u[j] = s;
    }
  }
}

}  // namespace

extern "C" {

// Rollout: fills obs (N,T,do), act (N,T,da), rew (N,T). Returns 0.
int trpo_cpu_rollout(const Config* cp, const double* params_flat,
                     uint64_t seed, double* obs_out, double* act_out,
                     double* rew_out) {
  const Config& c = *cp;
  ParamView p = ParamView::of(const_cast<double*>(params_flat), c);
  std::mt19937_64 rng(seed);
  std::uniform_real_distribution<double> unif(-1.0, 1.0);
  std::uniform_real_distribution<double> unif01(0.0, 1.0);
  std::normal_distribution<double> norm(0.0, 1.0);

  int n = c.n, N = c.n_envs, T = c.horizon;
  int K = c.n_tasks > 1 ? c.n_tasks : 1;
  std::vector<double> q((size_t)N * n), qd((size_t)N * n), tgt((size_t)N * 3);
  std::vector<int> task(N, 0);
  for (int e = 0; e < N; ++e) {
    for (int i = 0; i < n; ++i) {
      q[e * n + i] = c.q0_noise * unif(rng);
      qd[e * n + i] = c.qd0_noise * unif(rng);
    }
    double r = c.rmin + (c.rmax - c.rmin) * unif01(rng);
    if (c.planar) {
      double th = 2.0 * M_PI * unif01(rng);
      tgt[e * 3 + 0] = r * std::cos(th);
      tgt[e * 3 + 1] = r * std::sin(th);
      tgt[e * 3 + 2] = 0.0;
    } else {
      // uniform direction on the upper hemisphere (|z|), as the oracle
      double u[3] = {norm(rng), norm(rng), norm(rng)};
      double nu = std::sqrt(u[0] * u[0] + u[1] * u[1] + u[2] * u[2])
                  + 1e-12;
      tgt[e * 3 + 0] = r * u[0] / nu;
      tgt[e * 3 + 1] = r * u[1] / nu;
      tgt[e * 3 + 2] = r * std::abs(u[2]) / nu;
    }
    if (K > 1) {
      int tk = (int)(unif01(rng) * K);
      task[e] = tk >= K ? K - 1 : tk;
    }
  }

  std::vector<double> h0((size_t)c.h1), h1v((size_t)c.h2), mu(c.act_dim);
  std::vector<double> obs_row(c.obs_dim), tau(n);
  double px[8], py[8], cx[8], cy[8], eex, eey;
  double R3[72], p3[24], ee3[3];

  for (int t = 0; t < T; ++t) {
    for (int e = 0; e < N; ++e) {
      double* qe = &q[(size_t)e * n];
      double* qde = &qd[(size_t)e * n];
      double ee[3];
      if (c.planar) {
        fk(c, qe, px, py, cx, cy, eex, eey);
        ee[0] = eex; ee[1] = eey; ee[2] = 0.0;
      } else {
        fk3(c, qe, R3, p3, ee3);
        std::memcpy(ee, ee3, sizeof(ee));
      }
      for (int i = 0; i < n; ++i) {
        obs_row[i] = std::cos(qe[i]);
        obs_row[n + i] = std::sin(qe[i]);
        obs_row[2 * n + i] = c.qd_obs_scale * qde[i];
      }
      for (int k = 0; k < 3; ++k)
        obs_row[3 * n + k] = tgt[e * 3 + k] - ee[k];
      if (K > 1)
        for (int k = 0; k < K; ++k)
          obs_row[3 * n + 3 + k] = (task[e] == k) ? 1.0 : 0.0;
      mlp_forward(c, p, obs_row.data(), 1, h0.data(), h1v.data(),
                  mu.data());
      for (int i = 0; i < n; ++i) {
        double a = mu[i] + std::exp(p.logstd[i]) * norm(rng);
        act_out[((size_t)e * T + t) * c.act_dim + i] = a;
        tau[i] = a > c.torque_limit ? c.torque_limit
                 : (a < -c.torque_limit ? -c.torque_limit : a);
      }
      std::memcpy(&obs_out[((size_t)e * T + t) * c.obs_dim],
                  obs_row.data(), c.obs_dim * sizeof(double));
      double pen = 0.0;
      if (c.planar) {
        dynamics_step(c, qe, qde, tau.data());
        fk(c, qe, px, py, cx, cy, eex, eey);
        ee[0] = eex; ee[1] = eey; ee[2] = 0.0;
      } else {
        dynamics_step3(c, qe, qde, tau.data());
        fk3(c, qe, R3, p3, ee3);
        std::memcpy(ee, ee3, sizeof(ee));
        if (c.obst_weight > 0.0) pen = obstacle_pen(c, p3, ee3);
      }
      // track family: the target orbits world z BEFORE being scored
      // (persisted; mirrors envs/arm.py:step and the oracle)
      if (K > 1 && task[e] == 1) {
        double co = std::cos(c.track_omega * c.dt);
        double so = std::sin(c.track_omega * c.dt);
        double tx = co * tgt[e * 3] - so * tgt[e * 3 + 1];
        double ty = so * tgt[e * 3] + co * tgt[e * 3 + 1];
        tgt[e * 3] = tx;
        tgt[e * 3 + 1] = ty;
      }
      double d[3], d2 = 0.0;
      for (int k = 0; k < 3; ++k) {
        d[k] = ee[k] - tgt[e * 3 + k];
        d2 += d[k] * d[k];
      }
      double ctrl = 0.0;
      for (int i = 0; i < n; ++i) ctrl += tau[i] * tau[i];
      double rew = -(d2 + c.ctrl_weight * ctrl + c.obst_weight * pen);
      if (K > 1 && task[e] == 2) {
        // push family: EE velocity should match push_speed * dir(to tgt)
        double v[3];
        ee_velocity3(c, R3, p3, qde, ee, v);
        double dn = std::sqrt(d2) + 1e-6;
        double verr2 = 0.0;
        for (int k = 0; k < 3; ++k) {
          double ve = v[k] - c.push_speed * (-d[k] / dn);
          verr2 += ve * ve;
        }
        rew -= c.push_weight * verr2;
      }
      rew_out[(size_t)e * T + t] = rew;
    }
  }
  return 0;
}

// Single env step: dynamics + post-step EE + full reward (all cost
// variants), exposed so tests can pin the native integrator AND reward
// against the fp64 oracle (oracle/trpo.py:OracleEnv.step). q/qd/tgt
// updated in place (tgt rotates for the track family); tau is the
// ALREADY-CLIPPED torque.
int trpo_cpu_step(const Config* cp, double* q, double* qd,
                  const double* tau, double* tgt, int32_t task,
                  double* ee_out, double* rew_out) {
  const Config& c = *cp;
  double R[72], p[24];
  double pen = 0.0;
  if (c.planar) {
    double px[8], py[8], cx[8], cy[8], eex, eey;
    dynamics_step(c, q, qd, tau);
    fk(c, q, px, py, cx, cy, eex, eey);
    ee_out[0] = eex; ee_out[1] = eey; ee_out[2] = 0.0;
  } else {
    dynamics_step3(c, q, qd, tau);
    fk3(c, q, R, p, ee_out);
    if (c.obst_weight > 0.0) pen = obstacle_pen(c, p, ee_out);
  }
  if (c.n_tasks > 1 && task == 1) {
    double co = std::cos(c.track_omega * c.dt);
    double so = std::sin(c.track_omega * c.dt);
    double tx = co * tgt[0] - so * tgt[1];
    double ty = so * tgt[0] + co * tgt[1];
    tgt[0] = tx;
    tgt[1] = ty;
  }
  double d[3], d2 = 0.0, ctrl = 0.0;
  for (int k = 0; k < 3; ++k) {
    d[k] = ee_out[k] - tgt[k];
    d2 += d[k] * d[k];
  }
  for (int i = 0; i < c.n; ++i) ctrl += tau[i] * tau[i];
  double rew = -(d2 + c.ctrl_weight * ctrl + c.obst_weight * pen);
  if (c.n_tasks > 1 && task == 2 && !c.planar) {
    double v[3];
    ee_velocity3(c, R, p, qd, ee_out, v);
    double dn = std::sqrt(d2) + 1e-6;
    double verr2 = 0.0;
    for (int k = 0; k < 3; ++k) {
      double ve = v[k] - c.push_speed * (-d[k] / dn);
      verr2 += ve * ve;
    }
    rew -= c.push_weight * verr2;
  }
  *rew_out = rew;
  return 0;
}

// One TRPO update on a batch. obs (N,T,do), act (N,T,da), rew (N,T).
// params_flat updated in place; w (baseline weights, 2*do+4) in place.
// stats_out: [beta, accepted_k, kl, surr, mean_return, gnorm].
int trpo_cpu_update(const Config* cp, double* params_flat, double* w,
                    const double* obs, const double* act,
                    const double* rew, double* stats_out) {
  const Config& c = *cp;
  int n = c.n, N = c.n_envs, T = c.horizon, do_ = c.obs_dim,
      da = c.act_dim;
  size_t B = (size_t)N * T;
  size_t P = ParamView::size(c);
  ParamView p = ParamView::of(params_flat, c);

  // ---- baseline features phi(s,t) = [obs, obs^2, t/T, (t/T)^2,
  //      (t/T)^3, 1]
  int F = 2 * do_ + 4;
  std::vector<double> phi(B * F), values(B);
  for (int e = 0; e < N; ++e)
    for (int t = 0; t < T; ++t) {
      size_t r = (size_t)e * T + t;
      const double* o = obs + r * do_;
      double* f = &phi[r * F];
      for (int i = 0; i < do_; ++i) { f[i] = o[i]; f[do_ + i] = o[i] * o[i]; }
      double tt = (double)t / T;
      f[2 * do_] = tt; f[2 * do_ + 1] = tt * tt;
      f[2 * do_ + 2] = tt * tt * tt; f[2 * do_ + 3] = 1.0;
      double v = 0.0;
      for (int i = 0; i < F; ++i) v += f[i] * w[i];
      values[r] = v;
    }

  // ---- GAE (terminate at t = T-1, no bootstrap)
  std::vector<double> adv(B), targets(B);
  for (int e = 0; e < N; ++e) {
    double next_v = 0.0, next_a = 0.0;
    for (int t = T - 1; t >= 0; --t) {
      size_t r = (size_t)e * T + t;
      double nonterm = (t == T - 1) ? 0.0 : 1.0;
      double delta = rew[r] + c.gamma * next_v * nonterm - values[r];
      next_a = delta + c.gamma * c.lam * nonterm * next_a;
      adv[r] = next_a;
      next_v = values[r];
      targets[r] = 0.0;  // fill after whiten
    }
  }
  double mean = 0.0, m2 = 0.0;
  for (size_t r = 0; r < B; ++r) mean += adv[r];
  mean /= B;
  for (size_t r = 0; r < B; ++r) {
    double d = adv[r] - mean;
    m2 += d * d;
  }
  double std = std::sqrt(m2 / B);
  for (size_t r = 0; r < B; ++r) {
    targets[r] = adv[r] + values[r];
    adv[r] = (adv[r] - mean) / (std + 1e-8);
  }

  // ---- refit baseline: (phi^T phi + reg I) w = phi^T y
  {
    std::vector<double> A((size_t)F * F, 0.0), bb(F, 0.0);
    for (size_t r = 0; r < B; ++r) {
      const double* f = &phi[r * F];
      for (int i = 0; i < F; ++i) {
        bb[i] += f[i] * targets[r];
        for (int j = i; j < F; ++j) A[(size_t)i * F + j] += f[i] * f[j];
      }
    }
    for (int i = 0; i < F; ++i)
      for (int j = 0; j < i; ++j) A[(size_t)i * F + j] = A[(size_t)j * F + i];
    for (int i = 0; i < F; ++i) A[(size_t)i * F + i] += c.baseline_reg;
    chol_solve(F, A.data(), bb.data());
    std::memcpy(w, bb.data(), F * sizeof(double));
  }

  // ---- forward pass + policy gradient
  std::vector<double> h0(B * (size_t)c.h1), h1v(B * (size_t)c.h2),
      mu(B * (size_t)da);
  mlp_forward(c, p, obs, (int)B, h0.data(), h1v.data(), mu.data());

  std::vector<double> logp_old(B), sigma(da), inv_var(da);
  for (int j = 0; j < da; ++j) {
    sigma[j] = std::exp(p.logstd[j]);
    inv_var[j] = 1.0 / (sigma[j] * sigma[j]);
  }
  const double LOG2PI = std::log(2.0 * M_PI);
  for (size_t r = 0; r < B; ++r) {
    double s = 0.0;
    for (int j = 0; j < da; ++j) {
      double z = (act[r * da + j] - mu[r * da + j]) / sigma[j];
      s += z * z + 2.0 * p.logstd[j] + LOG2PI;
    }
    logp_old[r] = -0.5 * s;
  }

  std::vector<double> g(P), dmu(B * (size_t)da), dls(da, 0.0);
  for (size_t r = 0; r < B; ++r)
    for (int j = 0; j < da; ++j) {
      double z = (act[r * da + j] - mu[r * da + j]) / sigma[j];
      dmu[r * da + j] = adv[r] * z / sigma[j] / (double)B;
      dls[j] += adv[r] * (z * z - 1.0) / (double)B;
    }
  mlp_vjp(c, p, obs, h0.data(), h1v.data(), (int)B, dmu.data(),
          dls.data(), g.data());

  // ---- CG on damped Gauss-Newton FVP
  auto fvp = [&](const double* v, double* out) {
    std::vector<double> vv(v, v + P), du(B * (size_t)da);
    ParamView t = ParamView::of(vv.data(), c);
    mlp_jvp(c, p, vv.data(), obs, h0.data(), h1v.data(), (int)B,
            du.data());
    for (size_t r = 0; r < B; ++r)
      for (int j = 0; j < da; ++j)
        du[r * da + j] *= inv_var[j] / (double)B;
    std::vector<double> uls(da);
    for (int j = 0; j < da; ++j) uls[j] = 2.0 * t.logstd[j];
    mlp_vjp(c, p, obs, h0.data(), h1v.data(), (int)B, du.data(),
            uls.data(), out);
    for (size_t i = 0; i < P; ++i) out[i] += c.cg_damping * v[i];
  };

  std::vector<double> x(P, 0.0), r_(g), pdir(g), z(P);
  double rdotr = 0.0;
  for (size_t i = 0; i < P; ++i) rdotr += r_[i] * r_[i];
  for (int it = 0; it < c.cg_iters; ++it) {
    fvp(pdir.data(), z.data());
    double pz = 0.0;
    for (size_t i = 0; i < P; ++i) pz += pdir[i] * z[i];
    double alpha = rdotr / pz;
    double nrr = 0.0;
    for (size_t i = 0; i < P; ++i) {
      x[i] += alpha * pdir[i];
      r_[i] -= alpha * z[i];
      nrr += r_[i] * r_[i];
    }
    double beta = nrr / rdotr;
    for (size_t i = 0; i < P; ++i) pdir[i] = r_[i] + beta * pdir[i];
    rdotr = nrr;
  }

  fvp(x.data(), z.data());
  double xhx = 0.0;
  for (size_t i = 0; i < P; ++i) xhx += x[i] * z[i];
  double beta_step = std::sqrt(2.0 * c.delta / (xhx + 1e-12));

  // ---- line search
  double surr_old = 0.0;
  for (size_t r = 0; r < B; ++r) surr_old += adv[r];
  surr_old /= B;

  std::vector<double> theta(params_flat, params_flat + P), cand(P);
  std::vector<double> mu_c(B * (size_t)da), h0c(h0.size()), h1c(h1v.size());
  int accepted = -1;
  double kl_fin = 0.0, surr_fin = surr_old;
  for (int k = 0; k < c.ls_steps; ++k) {
    double scale = beta_step * std::pow(c.ls_backtrack, k);
    for (size_t i = 0; i < P; ++i) cand[i] = theta[i] + scale * x[i];
    ParamView pc = ParamView::of(cand.data(), c);
    mlp_forward(c, pc, obs, (int)B, h0c.data(), h1c.data(), mu_c.data());
    double surr = 0.0, kl = 0.0;
    for (size_t r = 0; r < B; ++r) {
      double lp = 0.0, klr = 0.0;
      for (int j = 0; j < da; ++j) {
        double sc = std::exp(pc.logstd[j]);
        double zc = (act[r * da + j] - mu_c[r * da + j]) / sc;
        lp += zc * zc + 2.0 * pc.logstd[j] + LOG2PI;
        double dm = mu[r * da + j] - mu_c[r * da + j];
        klr += pc.logstd[j] - p.logstd[j] +
               (sigma[j] * sigma[j] + dm * dm) / (2.0 * sc * sc) - 0.5;
      }
      surr += std::exp(-0.5 * lp - logp_old[r]) * adv[r];
      kl += klr;
    }
    surr /= B;
    kl /= B;
    if (surr > surr_old && kl <= c.delta) {
      accepted = k;
      std::memcpy(params_flat, cand.data(), P * sizeof(double));
      kl_fin = kl;
      surr_fin = surr;
      break;
    }
  }

  double mret = 0.0;
  for (int e = 0; e < N; ++e)
    for (int t = 0; t < T; ++t) mret += rew[(size_t)e * T + t];
  mret /= N;
  double gn = 0.0;
  for (size_t i = 0; i < P; ++i) gn += g[i] * g[i];

  stats_out[0] = beta_step;
  stats_out[1] = accepted;
  stats_out[2] = kl_fin;
  stats_out[3] = surr_fin;
  stats_out[4] = mret;
  stats_out[5] = std::sqrt(gn);
  return 0;
}

size_t trpo_cpu_param_size(const Config* cp) {
  return ParamView::size(*cp);
}

}  // extern "C"
