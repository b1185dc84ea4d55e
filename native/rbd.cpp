// gato_tpu native rigid-body dynamics runtime.
//
// Plays the role native Pinocchio plays in the reference stack
// (python/bsqp/common.py:49-91 uses pin.aba for the closed-loop simulator;
// interface.py:212 uses pin FK for reported EE error): an independent,
// native-performance implementation of the same rigid-body algorithms, used
// by the MPC layer as the simulation plant and by the test suite as a
// cross-implementation oracle for the JAX dynamics core.
//
// Conventions match gato_tpu/dynamics: Featherstone spatial algebra, motion
// [w; v], force [n; f]; per-joint tree transform (R_tree, p_tree) with a
// revolute axis in the child frame; z-up gravity of magnitude g applied via
// base acceleration. Model arrays are supplied by the Python URDF parser.
//
// Build: g++ -O3 -march=native -shared -fPIC -o librbd.so rbd.cpp

#include <cmath>
#include <cstring>

namespace {

constexpr int MAX_J = 16;

struct Model {
    int nq;
    double R_tree[MAX_J][3][3];
    double p_tree[MAX_J][3];
    double axis[MAX_J][3];
    double inertia[MAX_J][6][6];
    double gravity;
};

using Vec3 = double[3];
using Mat3 = double[3][3];
using Vec6 = double[6];

inline void cross(const double* a, const double* b, double* o) {
    o[0] = a[1] * b[2] - a[2] * b[1];
    o[1] = a[2] * b[0] - a[0] * b[2];
    o[2] = a[0] * b[1] - a[1] * b[0];
}

inline void matvec3(const Mat3 E, const double* v, double* o) {
    for (int i = 0; i < 3; ++i)
        o[i] = E[i][0] * v[0] + E[i][1] * v[1] + E[i][2] * v[2];
}

inline void matTvec3(const Mat3 E, const double* v, double* o) {
    for (int i = 0; i < 3; ++i)
        o[i] = E[0][i] * v[0] + E[1][i] * v[1] + E[2][i] * v[2];
}

// E_i = (R_tree_i * R_axis(q_i))^T : rotation parent->child
void joint_E(const Model& m, int i, double q, Mat3 E) {
    const double* k = m.axis[i];
    double c = std::cos(q), s = std::sin(q), C = 1.0 - c;
    double Rj[3][3] = {
        {c + k[0] * k[0] * C, k[0] * k[1] * C - k[2] * s, k[0] * k[2] * C + k[1] * s},
        {k[1] * k[0] * C + k[2] * s, c + k[1] * k[1] * C, k[1] * k[2] * C - k[0] * s},
        {k[2] * k[0] * C - k[1] * s, k[2] * k[1] * C + k[0] * s, c + k[2] * k[2] * C},
    };
    for (int r = 0; r < 3; ++r)
        for (int cidx = 0; cidx < 3; ++cidx) {
            double v = 0;
            for (int t = 0; t < 3; ++t) v += m.R_tree[i][r][t] * Rj[t][cidx];
            E[cidx][r] = v;  // transpose
        }
}

// motion transform: [E w ; E (v - r x w)]
void xm_apply(const Mat3 E, const double* r, const Vec6 in, Vec6 out) {
    double rxw[3], t[3];
    cross(r, in, rxw);
    for (int i = 0; i < 3; ++i) t[i] = in[3 + i] - rxw[i];
    matvec3(E, in, out);
    matvec3(E, t, out + 3);
}

// force to parent: [E^T n + r x (E^T f) ; E^T f]
void xf_apply_T(const Mat3 E, const double* r, const Vec6 f, Vec6 out) {
    double Etf[3], Etn[3], rx[3];
    matTvec3(E, f + 3, Etf);
    matTvec3(E, f, Etn);
    cross(r, Etf, rx);
    for (int i = 0; i < 3; ++i) {
        out[i] = Etn[i] + rx[i];
        out[3 + i] = Etf[i];
    }
}

void imul6(const double I[6][6], const Vec6 v, Vec6 o) {
    for (int i = 0; i < 6; ++i) {
        double a = 0;
        for (int j = 0; j < 6; ++j) a += I[i][j] * v[j];
        o[i] = a;
    }
}

void crm(const Vec6 v, const Vec6 mvec, Vec6 o) {
    double a[3], b[3], c2[3];
    cross(v, mvec, a);          // w x mw
    cross(v, mvec + 3, b);      // w x mv
    cross(v + 3, mvec, c2);     // vl x mw
    for (int i = 0; i < 3; ++i) {
        o[i] = a[i];
        o[3 + i] = b[i] + c2[i];
    }
}

void crf(const Vec6 v, const Vec6 f, Vec6 o) {
    double a[3], b[3], c2[3];
    cross(v, f, a);             // w x n
    cross(v + 3, f + 3, b);     // vl x fl
    cross(v, f + 3, c2);        // w x fl
    for (int i = 0; i < 3; ++i) {
        o[i] = a[i] + b[i];
        o[3 + i] = c2[i];
    }
}

void rnea_impl(const Model& m, const double* q, const double* qd,
               const double* qdd, const double* f_ext, double* tau) {
    int nq = m.nq;
    Mat3 E[MAX_J];
    Vec6 v[MAX_J], a[MAX_J], f[MAX_J];
    Vec6 v_par = {0, 0, 0, 0, 0, 0};
    Vec6 a_par = {0, 0, 0, 0, 0, m.gravity};
    for (int i = 0; i < nq; ++i) {
        joint_E(m, i, q[i], E[i]);
        const double* r = m.p_tree[i];
        Vec6 vJ;
        for (int k = 0; k < 3; ++k) {
            vJ[k] = m.axis[i][k] * qd[i];
            vJ[3 + k] = 0;
        }
        xm_apply(E[i], r, v_par, v[i]);
        for (int k = 0; k < 6; ++k) v[i][k] += vJ[k];
        Vec6 cvj;
        crm(v[i], vJ, cvj);
        xm_apply(E[i], r, a_par, a[i]);
        for (int k = 0; k < 3; ++k) a[i][k] += m.axis[i][k] * qdd[i];
        for (int k = 0; k < 6; ++k) a[i][k] += cvj[k];
        Vec6 Ia, Iv, cIv;
        imul6(m.inertia[i], a[i], Ia);
        imul6(m.inertia[i], v[i], Iv);
        crf(v[i], Iv, cIv);
        for (int k = 0; k < 6; ++k) f[i][k] = Ia[k] + cIv[k];
        std::memcpy(v_par, v[i], sizeof(Vec6));
        std::memcpy(a_par, a[i], sizeof(Vec6));
    }
    if (f_ext)
        for (int k = 0; k < 6; ++k) f[nq - 1][k] -= f_ext[k];
    for (int i = nq - 1; i >= 0; --i) {
        tau[i] = 0;
        for (int k = 0; k < 3; ++k) tau[i] += m.axis[i][k] * f[i][k];
        if (i > 0) {
            Vec6 fp;
            xf_apply_T(E[i], m.p_tree[i], f[i], fp);
            for (int k = 0; k < 6; ++k) f[i - 1][k] += fp[k];
        }
    }
}

void crba_impl(const Model& m, const double* q, double* M /* nq*nq */) {
    int nq = m.nq;
    Mat3 E[MAX_J];
    double Ic[MAX_J][6][6];
    for (int i = 0; i < nq; ++i) {
        joint_E(m, i, q[i], E[i]);
        std::memcpy(Ic[i], m.inertia[i], sizeof(double) * 36);
    }
    for (int i = nq - 1; i >= 0; --i) {
        if (i > 0) {
            // X = [[E, 0], [-E skew(r), E]];  Ic[i-1] += X^T Ic[i] X
            const double* r = m.p_tree[i];
            double X[6][6] = {};
            double sk[3][3] = {{0, -r[2], r[1]}, {r[2], 0, -r[0]}, {-r[1], r[0], 0}};
            for (int a2 = 0; a2 < 3; ++a2)
                for (int b = 0; b < 3; ++b) {
                    X[a2][b] = E[i][a2][b];
                    X[3 + a2][3 + b] = E[i][a2][b];
                    double v = 0;
                    for (int t = 0; t < 3; ++t) v += E[i][a2][t] * sk[t][b];
                    X[3 + a2][b] = -v;
                }
            double T1[6][6];
            for (int a2 = 0; a2 < 6; ++a2)
                for (int b = 0; b < 6; ++b) {
                    double v = 0;
                    for (int t = 0; t < 6; ++t) v += Ic[i][a2][t] * X[t][b];
                    T1[a2][b] = v;
                }
            for (int a2 = 0; a2 < 6; ++a2)
                for (int b = 0; b < 6; ++b) {
                    double v = 0;
                    for (int t = 0; t < 6; ++t) v += X[t][a2] * T1[t][b];
                    Ic[i - 1][a2][b] += v;
                }
        }
        Vec6 F, S = {m.axis[i][0], m.axis[i][1], m.axis[i][2], 0, 0, 0};
        imul6(Ic[i], S, F);
        double mii = 0;
        for (int k = 0; k < 6; ++k) mii += S[k] * F[k];
        M[i * nq + i] = mii;
        int j = i;
        while (j > 0) {
            Vec6 Fp;
            xf_apply_T(E[j], m.p_tree[j], F, Fp);
            std::memcpy(F, Fp, sizeof(Vec6));
            --j;
            double v = 0;
            for (int k = 0; k < 3; ++k) v += F[k] * m.axis[j][k];
            M[i * nq + j] = v;
            M[j * nq + i] = v;
        }
    }
}

bool cholsolve(int n, double* A /* destroyed */, double* b) {
    // in-place LL^T factor + solve
    for (int j = 0; j < n; ++j) {
        double d = A[j * n + j];
        for (int k = 0; k < j; ++k) d -= A[j * n + k] * A[j * n + k];
        if (d <= 0) return false;
        d = std::sqrt(d);
        A[j * n + j] = d;
        for (int i = j + 1; i < n; ++i) {
            double s = A[i * n + j];
            for (int k = 0; k < j; ++k) s -= A[i * n + k] * A[j * n + k];
            A[i * n + j] = s / d;
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
    return true;
}

void fd_impl(const Model& m, const double* q, const double* qd,
             const double* tau, const double* f_ext, double* qdd) {
    int nq = m.nq;
    double c[MAX_J], zero[MAX_J] = {};
    rnea_impl(m, q, qd, zero, f_ext, c);
    double M[MAX_J * MAX_J];
    crba_impl(m, q, M);
    for (int i = 0; i < nq; ++i) qdd[i] = tau[i] - c[i];
    cholsolve(nq, M, qdd);
}

void fk_ee_impl(const Model& m, const double* q, double* out6) {
    double Rw[3][3] = {{1, 0, 0}, {0, 1, 0}, {0, 0, 1}};
    double pw[3] = {0, 0, 0};
    for (int i = 0; i < m.nq; ++i) {
        Mat3 E;
        joint_E(m, i, q[i], E);
        double pr[3];
        matvec3(Rw, m.p_tree[i], pr);
        for (int k = 0; k < 3; ++k) pw[k] += pr[k];
        double Rn[3][3];
        for (int r = 0; r < 3; ++r)
            for (int cidx = 0; cidx < 3; ++cidx) {
                double v = 0;
                for (int t = 0; t < 3; ++t) v += Rw[r][t] * E[cidx][t];  // Rw @ E^T
                Rn[r][cidx] = v;
            }
        std::memcpy(Rw, Rn, sizeof(Rn));
    }
    out6[0] = pw[0];
    out6[1] = pw[1];
    out6[2] = pw[2];
    out6[3] = std::atan2(Rw[2][1], Rw[2][2]);
    out6[4] = -std::atan2(Rw[2][0], std::sqrt(Rw[2][1] * Rw[2][1] + Rw[2][2] * Rw[2][2]));
    out6[5] = std::atan2(Rw[1][0], Rw[0][0]);
}

}  // namespace

extern "C" {

void* rbd_create(int nq, const double* R_tree, const double* p_tree,
                 const double* axis, const double* inertia, double gravity) {
    if (nq <= 0 || nq > MAX_J) return nullptr;
    Model* m = new Model();
    m->nq = nq;
    std::memcpy(m->R_tree, R_tree, sizeof(double) * nq * 9);
    std::memcpy(m->p_tree, p_tree, sizeof(double) * nq * 3);
    std::memcpy(m->axis, axis, sizeof(double) * nq * 3);
    std::memcpy(m->inertia, inertia, sizeof(double) * nq * 36);
    m->gravity = gravity;
    return m;
}

void rbd_destroy(void* h) { delete static_cast<Model*>(h); }

void rbd_rnea(void* h, const double* q, const double* qd, const double* qdd,
              const double* f_ext, double* tau) {
    rnea_impl(*static_cast<Model*>(h), q, qd, qdd, f_ext, tau);
}

void rbd_crba(void* h, const double* q, double* M) {
    crba_impl(*static_cast<Model*>(h), q, M);
}

void rbd_fd(void* h, const double* q, const double* qd, const double* tau,
            const double* f_ext, double* qdd) {
    fd_impl(*static_cast<Model*>(h), q, qd, tau, f_ext, qdd);
}

void rbd_fk_ee(void* h, const double* q, double* out6) {
    fk_ee_impl(*static_cast<Model*>(h), q, out6);
}

// RK4 step with an optional constant world-frame wrench applied at the EE
// link origin (re-expressed in the EE frame per evaluation), matching
// api/common.rk4_step. x = [q; qd] length 2*nq, u length nq.
void rbd_rk4(void* h, const double* x, const double* u, double dt,
             const double* f_ext_world, double* x_next) {
    Model& m = *static_cast<Model*>(h);
    int nq = m.nq;
    double k[4][2 * MAX_J];
    double xt[2 * MAX_J];

    auto deriv = [&](const double* xs, double* out) {
        double fe_local[6];
        const double* fe = nullptr;
        if (f_ext_world) {
            // FK rotation of EE frame
            double Rw[3][3] = {{1, 0, 0}, {0, 1, 0}, {0, 0, 1}};
            for (int i = 0; i < nq; ++i) {
                Mat3 E;
                joint_E(m, i, xs[i], E);
                double Rn[3][3];
                for (int r = 0; r < 3; ++r)
                    for (int c2 = 0; c2 < 3; ++c2) {
                        double v = 0;
                        for (int t = 0; t < 3; ++t) v += Rw[r][t] * E[c2][t];
                        Rn[r][c2] = v;
                    }
                std::memcpy(Rw, Rn, sizeof(Rn));
            }
            // world wrench [force; torque] -> EE-frame spatial force [n; f]
            for (int i = 0; i < 3; ++i) {
                fe_local[i] = Rw[0][i] * f_ext_world[3] + Rw[1][i] * f_ext_world[4] + Rw[2][i] * f_ext_world[5];
                fe_local[3 + i] = Rw[0][i] * f_ext_world[0] + Rw[1][i] * f_ext_world[1] + Rw[2][i] * f_ext_world[2];
            }
            fe = fe_local;
        }
        for (int i = 0; i < nq; ++i) out[i] = xs[nq + i];
        fd_impl(m, xs, xs + nq, u, fe, out + nq);
    };

    deriv(x, k[0]);
    for (int i = 0; i < 2 * nq; ++i) xt[i] = x[i] + 0.5 * dt * k[0][i];
    deriv(xt, k[1]);
    for (int i = 0; i < 2 * nq; ++i) xt[i] = x[i] + 0.5 * dt * k[1][i];
    deriv(xt, k[2]);
    for (int i = 0; i < 2 * nq; ++i) xt[i] = x[i] + dt * k[2][i];
    deriv(xt, k[3]);
    for (int i = 0; i < 2 * nq; ++i)
        x_next[i] = x[i] + dt / 6.0 * (k[0][i] + 2 * k[1][i] + 2 * k[2][i] + k[3][i]);
}

}  // extern "C"
