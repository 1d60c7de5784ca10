// Batched symmetric-indefinite KKT solves for the f64 polish — the hot
// host-side operation of the certified-accuracy pipeline (qpalm_tpu/
// polish.py).  numpy's batched np.linalg.solve runs LU (dgetrf, 2/3 nk^3
// FLOPs); the polish KKT matrix is symmetric (quasi-definite), so
// Bunch-Kaufman dsytrf (1/3 nk^3) + dsytrs does the same job with half
// the FLOPs and keeps the factors for iterative-refinement re-solves.
//
// Layout notes: the caller passes C-order (row-major) K of shape
// (B, nk, nk); reinterpreted column-major this is K^T, which equals K by
// symmetry, so the buffers are handed to LAPACK as-is with uplo='L'.
// Factors overwrite K in place; ipiv (B, nk) must be kept for re-solves.
//
// LAPACK is swappable at runtime like the supernodal backend's BLAS
// (bkkt_use_lapack): the scipy wheel's OpenBLAS exports `scipy_`-prefixed
// LP64 symbols and is much faster than the system reference LAPACK.

#include <string>
#include <vector>

#include <dlfcn.h>

extern "C" {
void dsytrf_(const char *, const int *, double *, const int *, int *,
             double *, const int *, int *);
void dsytrs_(const char *, const int *, const int *, const double *,
             const int *, const int *, double *, const int *, int *);
}

namespace {
using dsytrf_t = decltype(&dsytrf_);
using dsytrs_t = decltype(&dsytrs_);
dsytrf_t p_dsytrf = &dsytrf_;
dsytrs_t p_dsytrs = &dsytrs_;
}  // namespace

extern "C" int bkkt_use_lapack(const char *path) {
  void *h = dlopen(path, RTLD_NOW | RTLD_LOCAL);
  if (!h) return -1;
  for (const char *pre : {"scipy_", ""}) {
    auto trf = (dsytrf_t)dlsym(h, (std::string(pre) + "dsytrf_").c_str());
    auto trs = (dsytrs_t)dlsym(h, (std::string(pre) + "dsytrs_").c_str());
    if (trf && trs) {
      p_dsytrf = trf;
      p_dsytrs = trs;
      return 0;
    }
  }
  dlclose(h);
  return -2;
}

// Factor every lane of K (B, nk, nk) in place and solve K x = rhs
// (B, nk, in/out).  fail[b] is set to 1 when lane b's factorization
// breaks down (caller falls back for that lane).  Returns the number of
// failed lanes, or -1 on an unexpected error.
extern "C" int bkkt_factor_solve(int B, int nk, double *K, int *ipiv,
                                 double *rhs, int *fail) {
  try {
    const int one = 1;
    int lwork = nk * 64;
    std::vector<double> work(lwork);
    int nfail = 0;
    for (int b = 0; b < B; ++b) {
      double *Kb = K + (size_t)b * nk * nk;
      int *pv = ipiv + (size_t)b * nk;
      double *rb = rhs + (size_t)b * nk;
      int info = 0;
      p_dsytrf("L", &nk, Kb, &nk, pv, work.data(), &lwork, &info);
      if (info != 0) {
        fail[b] = 1;
        nfail++;
        continue;
      }
      fail[b] = 0;
      p_dsytrs("L", &nk, &one, Kb, &nk, pv, rb, &nk, &info);
      if (info != 0) {
        fail[b] = 1;
        nfail++;
      }
    }
    return nfail;
  } catch (...) {
    return -1;
  }
}

// Re-solve with the factors left by bkkt_factor_solve (refinement steps).
// Lanes flagged failed are skipped.
extern "C" int bkkt_resolve(int B, int nk, const double *K,
                            const int *ipiv, double *rhs,
                            const int *fail) {
  try {
    const int one = 1;
    for (int b = 0; b < B; ++b) {
      if (fail[b]) continue;
      int info = 0;
      p_dsytrs("L", &nk, &one, K + (size_t)b * nk * nk, &nk,
               ipiv + (size_t)b * nk, rhs + (size_t)b * nk, &nk, &info);
      if (info != 0) return -1;
    }
    return 0;
  } catch (...) {
    return -1;
  }
}
