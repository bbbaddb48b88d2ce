// Native CPU kernels for cytvdn_tpu — C++/OpenMP implementation of the TV
// iteration primitives (the reference implements these in Cython/OpenMP:
// cyTVDN/anisotropic.pyx, halfisotropic.pyx, utils.pyx; this is a fresh
// implementation from the mathematical spec in SURVEY.md §8.1).
//
// Roles:
//   1. CPU production backend (backend="cpp" in the Python API).
//   2. Reference-performance proxy: same memory-traffic structure as the
//      reference kernels (one read-modify-write traversal per call, tight
//      contiguous inner loops, OpenMP outer parallelism) for honest
//      baseline measurements on hosts without the Cython build.
//
// All reductions are accumulated in double regardless of data type (the
// reference accumulates in the data type with nondeterministic OpenMP
// ordering; double accumulation is strictly more accurate).
//
// Build: g++ -O3 -fopenmp -shared -fPIC (see cytvdn_tpu/cpp/build.py).

#include <algorithm>
#include <cmath>
#include <cstdint>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

template <typename T>
inline T clipv(T x, T c) {
    return std::min(std::max(x, -c), c);
}

// ---------------------------------------------------------------------------
// Anisotropic accumulator update along axis `ax` of an ndim-array (any rank):
//   b = clip(a - shift_backward(a, ax) + b)          [plain]
//   d' = clip(...); b = d' + tk*(d' - d); d = d'     [FISTA when d != null]
// BC at index 0 along ax: 0 periodic (read last), 1 mirror (read index 1),
// 2 Jia-Zhao (zero difference). Returns the L1 norm of updated b.
// ---------------------------------------------------------------------------
template <typename T>
double acc_update(const T* a, T* b, T* d, double tk, const int64_t* shape,
                  int ndim, int ax, double clip_, int bc) {
    int64_t outer = 1, inner = 1;
    for (int i = 0; i < ax; ++i) outer *= shape[i];
    for (int i = ax + 1; i < ndim; ++i) inner *= shape[i];
    const int64_t nax = shape[ax];
    const T clip = static_cast<T>(clip_);
    const T tkr = static_cast<T>(tk);
    double norm = 0.0;

#pragma omp parallel for collapse(2) reduction(+ : norm) schedule(static)
    for (int64_t o = 0; o < outer; ++o) {
        for (int64_t i = 0; i < nax; ++i) {
            int64_t prev;
            if (i > 0) prev = i - 1;
            else if (bc == 0) prev = nax - 1;
            else if (bc == 1) prev = (nax > 1) ? 1 : 0;
            else prev = 0;  // JZ: self -> zero difference
            const T* ap = a + (o * nax + i) * inner;
            const T* app = a + (o * nax + prev) * inner;
            T* bp = b + (o * nax + i) * inner;
            if (d) {
                T* dp = d + (o * nax + i) * inner;
                for (int64_t k = 0; k < inner; ++k) {
                    T dn = clipv<T>(ap[k] - app[k] + bp[k], clip);
                    T bn = dn + tkr * (dn - dp[k]);
                    bp[k] = bn;
                    dp[k] = dn;
                    norm += std::fabs(static_cast<double>(bn));
                }
            } else {
                for (int64_t k = 0; k < inner; ++k) {
                    T bn = clipv<T>(ap[k] - app[k] + bp[k], clip);
                    bp[k] = bn;
                    norm += std::fabs(static_cast<double>(bn));
                }
            }
        }
    }
    return norm;
}

// ---------------------------------------------------------------------------
// Half-isotropic paired update (4D only, Jia-Zhao BCs only, as in the
// reference): backward differences along ax1/ax2 jointly projected onto the
// L2 ball of radius clip. FISTA when d1/d2 non-null.
// ---------------------------------------------------------------------------
template <typename T>
double iso_update(const T* a, T* b1, T* b2, T* d1, T* d2, double tk,
                  const int64_t* sh, int ax1, int ax2, double clip_) {
    const int64_t n0 = sh[0], n1 = sh[1], n2 = sh[2], n3 = sh[3];
    const T clip = static_cast<T>(clip_);
    const T tkr = static_cast<T>(tk);
    const int64_t st[4] = {n1 * n2 * n3, n2 * n3, n3, 1};
    const int64_t s1 = st[ax1], s2 = st[ax2];
    double norm = 0.0;

#pragma omp parallel for collapse(2) reduction(+ : norm) schedule(static)
    for (int64_t i = 0; i < n0; ++i) {
        for (int64_t j = 0; j < n1; ++j) {
            for (int64_t k = 0; k < n2; ++k) {
                for (int64_t l = 0; l < n3; ++l) {
                    const int64_t ix[4] = {i, j, k, l};
                    const int64_t idx = ((i * n1 + j) * n2 + k) * n3 + l;
                    // JZ: stride collapses to 0 at index 0 of the grad axis
                    const int64_t o1 = (ix[ax1] > 0) ? s1 : 0;
                    const int64_t o2 = (ix[ax2] > 0) ? s2 : 0;
                    T e1 = a[idx] - a[idx - o1] + b1[idx];
                    T e2 = a[idx] - a[idx - o2] + b2[idx];
                    T mag = std::hypot(e1, e2);
                    if (mag > clip) {
                        e1 = e1 / (mag / clip);
                        e2 = e2 / (mag / clip);
                    }
                    if (d1) {
                        T bn1 = e1 + tkr * (e1 - d1[idx]);
                        T bn2 = e2 + tkr * (e2 - d2[idx]);
                        b1[idx] = bn1;
                        b2[idx] = bn2;
                        d1[idx] = e1;
                        d2[idx] = e2;
                        norm += std::fabs(static_cast<double>(bn1)) +
                                std::fabs(static_cast<double>(bn2));
                    } else {
                        b1[idx] = e1;
                        b2[idx] = e2;
                        norm += std::fabs(static_cast<double>(e1)) +
                                std::fabs(static_cast<double>(e2));
                    }
                }
            }
        }
    }
    return norm;
}

// ---------------------------------------------------------------------------
// Reconstruction update (single pass, stencil reads of each accumulator at
// the element and its +1 neighbor along that accumulator's axis):
//   recon = orig - sum_k w_k * (b_k - shift_forward(b_k, k))
// BC: periodic/JZ wrap (valid under the JZ zero-slab invariant); mirror
// clamps to the last index (zero trailing difference — the reference's
// mirror branch is buggy, utils.pyx:117-120; this is the corrected form).
// Outputs delta numerator and |recon_old| sums for the relative change.
// ---------------------------------------------------------------------------
template <typename T>
void recon_update_3d(const T* orig, T* recon, const T* b0, const T* b1,
                     const T* b2, const T* w, const int64_t* sh, int bc,
                     double* delta_num, double* recon_norm) {
    const int64_t n0 = sh[0], n1 = sh[1], n2 = sh[2];
    double dn = 0.0, rn = 0.0;

#pragma omp parallel for collapse(2) reduction(+ : dn, rn) schedule(static)
    for (int64_t i = 0; i < n0; ++i) {
        for (int64_t j = 0; j < n1; ++j) {
            const int64_t i2 = (bc == 1) ? std::min(i + 1, n0 - 1)
                                         : (i + 1) % n0;
            const int64_t j2 = (bc == 1) ? std::min(j + 1, n1 - 1)
                                         : (j + 1) % n1;
            const int64_t base = (i * n1 + j) * n2;
            const int64_t base_i2 = (i2 * n1 + j) * n2;
            const int64_t base_j2 = (i * n1 + j2) * n2;
            for (int64_t k = 0; k < n2; ++k) {
                const int64_t k2 = (bc == 1) ? std::min(k + 1, n2 - 1)
                                             : (k + 1) % n2;
                const int64_t idx = base + k;
                T div = w[0] * (b0[idx] - b0[base_i2 + k]) +
                        w[1] * (b1[idx] - b1[base_j2 + k]) +
                        w[2] * (b2[idx] - b2[base + k2]);
                T old = recon[idx];
                T nv = orig[idx] - div;
                recon[idx] = nv;
                dn += std::fabs(static_cast<double>(nv - old));
                rn += std::fabs(static_cast<double>(old));
            }
        }
    }
    *delta_num = dn;
    *recon_norm = rn;
}

template <typename T>
void recon_update_4d(const T* orig, T* recon, const T* b0, const T* b1,
                     const T* b2, const T* b3, const T* w, const int64_t* sh,
                     int bc, double* delta_num, double* recon_norm) {
    const int64_t n0 = sh[0], n1 = sh[1], n2 = sh[2], n3 = sh[3];
    double dn = 0.0, rn = 0.0;

#pragma omp parallel for collapse(2) reduction(+ : dn, rn) schedule(static)
    for (int64_t i = 0; i < n0; ++i) {
        for (int64_t j = 0; j < n1; ++j) {
            const int64_t i2 = (bc == 1) ? std::min(i + 1, n0 - 1)
                                         : (i + 1) % n0;
            const int64_t j2 = (bc == 1) ? std::min(j + 1, n1 - 1)
                                         : (j + 1) % n1;
            for (int64_t k = 0; k < n2; ++k) {
                const int64_t k2 = (bc == 1) ? std::min(k + 1, n2 - 1)
                                             : (k + 1) % n2;
                const int64_t r0 = ((i * n1 + j) * n2 + k) * n3;
                const int64_t ri = ((i2 * n1 + j) * n2 + k) * n3;
                const int64_t rj = ((i * n1 + j2) * n2 + k) * n3;
                const int64_t rk = ((i * n1 + j) * n2 + k2) * n3;
                for (int64_t l = 0; l < n3; ++l) {
                    const int64_t l2 = (bc == 1) ? std::min(l + 1, n3 - 1)
                                                 : (l + 1) % n3;
                    const int64_t idx = r0 + l;
                    T div = w[0] * (b0[idx] - b0[ri + l]) +
                            w[1] * (b1[idx] - b1[rj + l]) +
                            w[2] * (b2[idx] - b2[rk + l]) +
                            w[3] * (b3[idx] - b3[r0 + l2]);
                    T old = recon[idx];
                    T nv = orig[idx] - div;
                    recon[idx] = nv;
                    dn += std::fabs(static_cast<double>(nv - old));
                    rn += std::fabs(static_cast<double>(old));
                }
            }
        }
    }
    *delta_num = dn;
    *recon_norm = rn;
}

template <typename T>
double sse(const T* a, const T* b, int64_t n) {
    double s = 0.0;
#pragma omp parallel for reduction(+ : s) schedule(static)
    for (int64_t i = 0; i < n; ++i) {
        double t = static_cast<double>(a[i]) - static_cast<double>(b[i]);
        s += t * t;
    }
    return s;
}

}  // namespace

extern "C" {

// ---- float32 ----
double tv_acc_update_f32(const float* a, float* b, float* d, double tk,
                         const int64_t* shape, int ndim, int ax, double clip,
                         int bc) {
    return acc_update<float>(a, b, d, tk, shape, ndim, ax, clip, bc);
}
double tv_iso_update_f32(const float* a, float* b1, float* b2, float* d1,
                         float* d2, double tk, const int64_t* sh, int ax1,
                         int ax2, double clip) {
    return iso_update<float>(a, b1, b2, d1, d2, tk, sh, ax1, ax2, clip);
}
void tv_recon_update_3d_f32(const float* orig, float* recon, const float* b0,
                            const float* b1, const float* b2, const float* w,
                            const int64_t* sh, int bc, double* dn, double* rn) {
    recon_update_3d<float>(orig, recon, b0, b1, b2, w, sh, bc, dn, rn);
}
void tv_recon_update_4d_f32(const float* orig, float* recon, const float* b0,
                            const float* b1, const float* b2, const float* b3,
                            const float* w, const int64_t* sh, int bc,
                            double* dn, double* rn) {
    recon_update_4d<float>(orig, recon, b0, b1, b2, b3, w, sh, bc, dn, rn);
}
double tv_sse_f32(const float* a, const float* b, int64_t n) {
    return sse<float>(a, b, n);
}

// ---- float64 ----
double tv_acc_update_f64(const double* a, double* b, double* d, double tk,
                         const int64_t* shape, int ndim, int ax, double clip,
                         int bc) {
    return acc_update<double>(a, b, d, tk, shape, ndim, ax, clip, bc);
}
double tv_iso_update_f64(const double* a, double* b1, double* b2, double* d1,
                         double* d2, double tk, const int64_t* sh, int ax1,
                         int ax2, double clip) {
    return iso_update<double>(a, b1, b2, d1, d2, tk, sh, ax1, ax2, clip);
}
void tv_recon_update_3d_f64(const double* orig, double* recon,
                            const double* b0, const double* b1,
                            const double* b2, const double* w,
                            const int64_t* sh, int bc, double* dn, double* rn) {
    recon_update_3d<double>(orig, recon, b0, b1, b2, w, sh, bc, dn, rn);
}
void tv_recon_update_4d_f64(const double* orig, double* recon,
                            const double* b0, const double* b1,
                            const double* b2, const double* b3,
                            const double* w, const int64_t* sh, int bc,
                            double* dn, double* rn) {
    recon_update_4d<double>(orig, recon, b0, b1, b2, b3, w, sh, bc, dn, rn);
}
double tv_sse_f64(const double* a, const double* b, int64_t n) {
    return sse<double>(a, b, n);
}

int tv_num_threads() {
#if defined(_OPENMP)
    return omp_get_max_threads();
#else
    return 1;
#endif
}

}  // extern "C"
