// Native host kernels for omp_amg_tpu's amortized setup phase.
//
// The reference this framework replaces was an OpenMP C code; the TPU build
// keeps the *solve* path on-device (JAX/Pallas) and uses this small OpenMP
// C++ library for the host-side setup kernels where numpy's many-temporary
// style is the bottleneck (SURVEY.md §2 #3/#9: SpGEMM/RAP; grid-transfer
// chains of the lattice-comb RAP).
//
// Build: see csrc/Makefile (g++ -O3 -fopenmp -shared -fPIC).
// Python binding: omp_amg_tpu/native.py via ctypes, with numpy fallback.

#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// y = A x for DIA storage: data[k*n + i] multiplies x[i + offsets[k]].
void dia_apply_f64(int64_t n, int64_t ndiag, const int64_t* offsets,
                   const double* data, const double* x, double* y) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    double acc = 0.0;
    for (int64_t k = 0; k < ndiag; ++k) {
      int64_t j = i + offsets[k];
      if (j >= 0 && j < n) acc += data[k * n + i] * x[j];
    }
    y[i] = acc;
  }
}

// Linear interpolation along the LAST (fastest) axis of a (rows, nc) view:
// out (rows, nf): out[.., 2j] = x[.., j]; out[.., 2j+1] = (x[..,j]+x[..,j+1])/2.
void prolong_last_f64(int64_t rows, int64_t nc, int64_t nf, const double* x,
                      double* out) {
#pragma omp parallel for schedule(static)
  for (int64_t r = 0; r < rows; ++r) {
    const double* xr = x + r * nc;
    double* orow = out + r * nf;
    for (int64_t i = 0; i < nf; ++i) {
      if ((i & 1) == 0) {
        orow[i] = xr[i >> 1];
      } else {
        int64_t j = (i - 1) >> 1;
        double right = (j + 1 < nc) ? xr[j + 1] : 0.0;
        orow[i] = 0.5 * (xr[j] + right);
      }
    }
  }
}

// Transpose of prolong_last: out[.., j] = x[.., 2j] + (x[..,2j-1]+x[..,2j+1])/2.
void restrict_last_f64(int64_t rows, int64_t nf, int64_t nc, const double* x,
                       double* out) {
#pragma omp parallel for schedule(static)
  for (int64_t r = 0; r < rows; ++r) {
    const double* xr = x + r * nf;
    double* orow = out + r * nc;
    for (int64_t j = 0; j < nc; ++j) {
      double acc = (2 * j < nf) ? xr[2 * j] : 0.0;
      if (2 * j - 1 >= 0) acc += 0.5 * xr[2 * j - 1];
      if (2 * j + 1 < nf) acc += 0.5 * xr[2 * j + 1];
      orow[j] = acc;
    }
  }
}

// Strided transpose helper: out[j*rows + r] = x[r*cols + j] (move an axis
// to the end); used by Python to apply the last-axis transfer kernels along
// any axis. Blocked for cache friendliness.
void transpose2d_f64(int64_t rows, int64_t cols, const double* x, double* out) {
  const int64_t B = 64;
#pragma omp parallel for collapse(2) schedule(static)
  for (int64_t rb = 0; rb < rows; rb += B)
    for (int64_t cb = 0; cb < cols; cb += B) {
      int64_t rmax = rb + B < rows ? rb + B : rows;
      int64_t cmax = cb + B < cols ? cb + B : cols;
      for (int64_t r = rb; r < rmax; ++r)
        for (int64_t c = cb; c < cmax; ++c) out[c * rows + r] = x[r * cols + c];
    }
}

// Blocked (multi-vector) variants: X is (n, nvec) row-major; the operator
// data is read ONCE for all nvec vectors — the lattice-comb RAP probes all
// 3^d combs in a single pass over A.

void dia_apply_block_f64(int64_t n, int64_t ndiag, int64_t nvec,
                         const int64_t* offsets, const double* data,
                         const double* x, double* y) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    double* yr = y + i * nvec;
    for (int64_t t = 0; t < nvec; ++t) yr[t] = 0.0;
    for (int64_t k = 0; k < ndiag; ++k) {
      int64_t j = i + offsets[k];
      if (j < 0 || j >= n) continue;
      double d = data[k * n + i];
      const double* xr = x + j * nvec;
      for (int64_t t = 0; t < nvec; ++t) yr[t] += d * xr[t];
    }
  }
}

// Prolong/restrict along the MIDDLE axis of a (rows, n_axis, nvec) view.
void prolong_mid_f64(int64_t rows, int64_t nc, int64_t nf, int64_t nvec,
                     const double* x, double* out) {
#pragma omp parallel for collapse(2) schedule(static)
  for (int64_t r = 0; r < rows; ++r)
    for (int64_t i = 0; i < nf; ++i) {
      const double* base = x + r * nc * nvec;
      double* orow = out + (r * nf + i) * nvec;
      if ((i & 1) == 0) {
        const double* xr = base + (i >> 1) * nvec;
        for (int64_t t = 0; t < nvec; ++t) orow[t] = xr[t];
      } else {
        int64_t j = (i - 1) >> 1;
        const double* xl = base + j * nvec;
        if (j + 1 < nc) {
          const double* xr = base + (j + 1) * nvec;
          for (int64_t t = 0; t < nvec; ++t)
            orow[t] = 0.5 * (xl[t] + xr[t]);
        } else {
          for (int64_t t = 0; t < nvec; ++t) orow[t] = 0.5 * xl[t];
        }
      }
    }
}

void restrict_mid_f64(int64_t rows, int64_t nf, int64_t nc, int64_t nvec,
                      const double* x, double* out) {
#pragma omp parallel for collapse(2) schedule(static)
  for (int64_t r = 0; r < rows; ++r)
    for (int64_t j = 0; j < nc; ++j) {
      const double* base = x + r * nf * nvec;
      double* orow = out + (r * nc + j) * nvec;
      for (int64_t t = 0; t < nvec; ++t) orow[t] = 0.0;
      if (2 * j < nf) {
        const double* xr = base + 2 * j * nvec;
        for (int64_t t = 0; t < nvec; ++t) orow[t] += xr[t];
      }
      if (2 * j - 1 >= 0) {
        const double* xr = base + (2 * j - 1) * nvec;
        for (int64_t t = 0; t < nvec; ++t) orow[t] += 0.5 * xr[t];
      }
      if (2 * j + 1 < nf) {
        const double* xr = base + (2 * j + 1) * nvec;
        for (int64_t t = 0; t < nvec; ++t) orow[t] += 0.5 * xr[t];
      }
    }
}

// ---------------------------------------------------------------------------
// CSR SpGEMM (Gustavson, two calls: row_nnz then fill), f64 values, i32 cols.
// ---------------------------------------------------------------------------

void spgemm_row_nnz(int64_t n_rows, int64_t n_cols_out,
                    const int64_t* a_indptr, const int32_t* a_idx,
                    const int64_t* b_indptr, const int32_t* b_idx,
                    int64_t* row_nnz) {
#pragma omp parallel
  {
    std::vector<int32_t> marker(n_cols_out, -1);
#pragma omp for schedule(dynamic, 64)
    for (int64_t i = 0; i < n_rows; ++i) {
      int64_t cnt = 0;
      for (int64_t pa = a_indptr[i]; pa < a_indptr[i + 1]; ++pa) {
        int32_t k = a_idx[pa];
        for (int64_t pb = b_indptr[k]; pb < b_indptr[k + 1]; ++pb) {
          int32_t j = b_idx[pb];
          if (marker[j] != (int32_t)i) {
            marker[j] = (int32_t)i;
            ++cnt;
          }
        }
      }
      row_nnz[i] = cnt;
    }
  }
}

void spgemm_fill(int64_t n_rows, int64_t n_cols_out, const int64_t* a_indptr,
                 const int32_t* a_idx, const double* a_val,
                 const int64_t* b_indptr, const int32_t* b_idx,
                 const double* b_val, const int64_t* c_indptr, int32_t* c_idx,
                 double* c_val) {
#pragma omp parallel
  {
    std::vector<int64_t> marker(n_cols_out, -1);
    std::vector<double> accum(n_cols_out, 0.0);
#pragma omp for schedule(dynamic, 64)
    for (int64_t i = 0; i < n_rows; ++i) {
      int64_t head = c_indptr[i];
      int64_t cnt = 0;
      for (int64_t pa = a_indptr[i]; pa < a_indptr[i + 1]; ++pa) {
        int32_t k = a_idx[pa];
        double va = a_val[pa];
        for (int64_t pb = b_indptr[k]; pb < b_indptr[k + 1]; ++pb) {
          int32_t j = b_idx[pb];
          if (marker[j] != i) {  // not yet in this row
            marker[j] = i;
            c_idx[head + cnt] = j;
            accum[j] = va * b_val[pb];
            ++cnt;
          } else {
            accum[j] += va * b_val[pb];
          }
        }
      }
      for (int64_t p = head; p < head + cnt; ++p) c_val[p] = accum[c_idx[p]];
      // sort columns within the row (insertion sort; rows are short)
      for (int64_t p = head + 1; p < head + cnt; ++p) {
        int32_t cj = c_idx[p];
        double cv = c_val[p];
        int64_t q = p - 1;
        while (q >= head && c_idx[q] > cj) {
          c_idx[q + 1] = c_idx[q];
          c_val[q + 1] = c_val[q];
          --q;
        }
        c_idx[q + 1] = cj;
        c_val[q + 1] = cv;
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Fused structured Galerkin RAP: one pass over the fine DIA operator.
//
// For every fine nonzero A[fa, fb] and every pair of coarse interpolation
// parents (ia of fa, jb of fb; ≤2 per coarsened axis, weights 1 or 1/2),
// accumulate wa·A·wb into the coarse tap  δ = jb − ia ∈ {-1,0,1}^d.
// Output: data_c[(3^d), nc] in lexicographic tap order (invalid taps stay
// exactly zero). Equivalent to R·A·P with linear tensor transfers; the
// lattice-comb probe (Python) validates it per level.
// ---------------------------------------------------------------------------

void rap_stencil_f64(int64_t d, const int64_t* dims, const int64_t* cdims,
                     const int64_t* coarsened, int64_t ndiag,
                     const int64_t* offsets, const int64_t* fine_deltas,
                     const double* data,
                     double* data_c /* (3^d, nc) zero-initialized */) {
  int64_t n = 1, nc = 1;
  int64_t strides[3] = {1, 1, 1}, cstrides[3] = {1, 1, 1};
  int64_t D[3] = {1, 1, 1};
  for (int64_t ax = 0; ax < d; ++ax) D[ax] = dims[ax];
  for (int64_t ax = 0; ax < d; ++ax) n *= dims[ax];
  for (int64_t ax = 0; ax < d; ++ax) nc *= cdims[ax];
  for (int64_t ax = d - 2; ax >= 0; --ax) {
    strides[ax] = strides[ax + 1] * dims[ax + 1];
    cstrides[ax] = cstrides[ax + 1] * cdims[ax + 1];
  }
  int64_t pow3 = 1;
  for (int64_t ax = 0; ax < d; ++ax) pow3 *= 3;

  // Per-axis parent tables: for each fine coord f along axis ax →
  // up to 2 (coarse coord, weight) pairs.
  std::vector<std::vector<int64_t>> pc0(3), pc1(3);
  std::vector<std::vector<double>> pw0(3), pw1(3);
  std::vector<std::vector<int>> pn(3);
  for (int64_t ax = 0; ax < d; ++ax) {
    pc0[ax].resize(D[ax]); pc1[ax].resize(D[ax]);
    pw0[ax].resize(D[ax]); pw1[ax].resize(D[ax]);
    pn[ax].resize(D[ax]);
    for (int64_t f = 0; f < D[ax]; ++f) {
      if (!coarsened[ax]) {
        pn[ax][f] = 1; pc0[ax][f] = f; pw0[ax][f] = 1.0;
      } else if ((f & 1) == 0) {
        pn[ax][f] = 1; pc0[ax][f] = f >> 1; pw0[ax][f] = 1.0;
      } else {
        int cnt = 1;
        pc0[ax][f] = (f - 1) >> 1; pw0[ax][f] = 0.5;
        if (((f + 1) >> 1) < cdims[ax]) {
          pc1[ax][f] = (f + 1) >> 1; pw1[ax][f] = 0.5; cnt = 2;
        }
        pn[ax][f] = cnt;
      }
    }
  }

  int nthreads = 1;
#ifdef _OPENMP
  nthreads = omp_get_max_threads();
#endif
  std::vector<double> partial((size_t)(nthreads - 1) * pow3 * nc, 0.0);

  // flatten outer two axes for parallelism; innermost axis streamed
  int64_t outer = n / D[d - 1];
  int64_t nx = D[d - 1];
  int64_t axl = d - 1;  // last axis index

#pragma omp parallel
  {
    int tid = 0;
#ifdef _OPENMP
    tid = omp_get_thread_num();
#endif
    double* out = tid == 0 ? data_c
                           : partial.data() + (size_t)(tid - 1) * pow3 * nc;

#pragma omp for schedule(static)
    for (int64_t o = 0; o < outer; ++o) {
      int64_t co[3] = {0, 0, 0};
      {
        int64_t rem = o;
        for (int64_t ax = d - 2; ax >= 0; --ax) {
          co[ax] = rem % dims[ax];
          rem /= dims[ax];
        }
      }
      for (int64_t fx = 0; fx < nx; ++fx) {
        int64_t fa = o * nx + fx;
        int64_t ca[3] = {co[0], co[1], co[2]};
        ca[axl] = fx;
        for (int64_t k = 0; k < ndiag; ++k) {
          double val = data[k * n + fa];
          if (val == 0.0) continue;
          int64_t cb[3];
          bool inb = true;
          for (int64_t ax = 0; ax < d; ++ax) {
            cb[ax] = ca[ax] + fine_deltas[k * d + ax];
            if (cb[ax] < 0 || cb[ax] >= D[ax]) { inb = false; break; }
          }
          if (!inb) continue;  // masked-zero invariant should prevent this

          // enumerate parent combinations per axis (≤2 each side)
          for (int64_t ax = 0; ax < d; ++ax) (void)0;
          int64_t icc[3]; double wa;
          int na0 = pn[0][ca[0]];
          int na1 = d > 1 ? pn[1][ca[1]] : 1;
          int na2 = d > 2 ? pn[2][ca[2]] : 1;
          int nb0 = pn[0][cb[0]];
          int nb1 = d > 1 ? pn[1][cb[1]] : 1;
          int nb2 = d > 2 ? pn[2][cb[2]] : 1;
          for (int s0 = 0; s0 < na0; ++s0) {
            int64_t a0 = s0 ? pc1[0][ca[0]] : pc0[0][ca[0]];
            double w0 = s0 ? pw1[0][ca[0]] : pw0[0][ca[0]];
            for (int s1 = 0; s1 < na1; ++s1) {
              int64_t a1 = d > 1 ? (s1 ? pc1[1][ca[1]] : pc0[1][ca[1]]) : 0;
              double w1 = d > 1 ? (s1 ? pw1[1][ca[1]] : pw0[1][ca[1]]) : 1.0;
              for (int s2 = 0; s2 < na2; ++s2) {
                int64_t a2 = d > 2 ? (s2 ? pc1[2][ca[2]] : pc0[2][ca[2]]) : 0;
                double w2 = d > 2 ? (s2 ? pw1[2][ca[2]] : pw0[2][ca[2]]) : 1.0;
                icc[0] = a0; icc[1] = a1; icc[2] = a2;
                wa = w0 * w1 * w2;
                int64_t ic = a0 * cstrides[0] + a1 * cstrides[1] +
                             a2 * cstrides[2];
                double wav = wa * val;
                for (int t0 = 0; t0 < nb0; ++t0) {
                  int64_t b0 = t0 ? pc1[0][cb[0]] : pc0[0][cb[0]];
                  int64_t d0 = b0 - icc[0];
                  if (d0 < -1 || d0 > 1) continue;
                  double v0 = (t0 ? pw1[0][cb[0]] : pw0[0][cb[0]]) * wav;
                  for (int t1 = 0; t1 < nb1; ++t1) {
                    int64_t b1 = d > 1 ? (t1 ? pc1[1][cb[1]] : pc0[1][cb[1]]) : 0;
                    int64_t d1 = b1 - icc[1];
                    if (d1 < -1 || d1 > 1) continue;
                    double v1 = (d > 1 ? (t1 ? pw1[1][cb[1]] : pw0[1][cb[1]])
                                       : 1.0) * v0;
                    for (int t2 = 0; t2 < nb2; ++t2) {
                      int64_t b2 = d > 2 ? (t2 ? pc1[2][cb[2]] : pc0[2][cb[2]]) : 0;
                      int64_t d2 = b2 - icc[2];
                      if (d2 < -1 || d2 > 1) continue;
                      double v2 = (d > 2 ? (t2 ? pw1[2][cb[2]] : pw0[2][cb[2]])
                                         : 1.0) * v1;
                      int64_t tap;
                      if (d == 3)
                        tap = ((d0 + 1) * 3 + (d1 + 1)) * 3 + (d2 + 1);
                      else if (d == 2)
                        tap = (d0 + 1) * 3 + (d1 + 1);
                      else
                        tap = d0 + 1;
                      out[tap * nc + ic] += v2;
                    }
                  }
                }
              }
            }
          }
        }
      }
    }
  }
  for (int tsrc = 1; tsrc < nthreads; ++tsrc) {
    const double* src = partial.data() + (size_t)(tsrc - 1) * pow3 * nc;
#pragma omp parallel for schedule(static)
    for (int64_t p = 0; p < pow3 * nc; ++p) data_c[p] += src[p];
  }
}

int native_num_threads() {
#ifdef _OPENMP
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
