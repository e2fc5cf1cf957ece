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

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif


// Implementation (round-5 rewrite): the original kernel re-scanned the
// full k-wide ELL row of every strong-F neighbor twice per use (a_ki
// lookup + distribution) — O(k^2) per row, 26 s at the 256^3 L1 level
// where k ~ 60. This version first COMPACTS the planes into CSR-style
// adjacency (nonzero slots only, columns ascending within rows — both
// plane builders guarantee it) plus a strong-C-negative sublist per row,
// then walks exactly the needed entries and binary-searches a_ki.
// Accumulation order, truncation tie-breaks and every numeric decision
// match the original slot-order walk, so the output is BIT-IDENTICAL
// (pinned against the numpy twin by tests/test_native_setup.py).
// Templated over the value type: the f32 entry reads the setup's native
// f32 planes directly (each term converts exactly to double), removing
// the caller's n*k f64 conversion temp (~1.7 GB at 256^3 L1).
template <typename T>
static void extpi_interp_impl(int64_t n, int64_t k, int64_t n_coarse,
                              const int32_t* col, const T* val,
                              const uint8_t* mask, const int8_t* state,
                              const int64_t* cmap, int64_t max_elements,
                              int32_t* p_col, double* p_val) {
  const int8_t C = 1, F = 2;
  // ---- pass A: per-row nonzero + strong-C-neg counts ----
  std::vector<int64_t> off(n + 1, 0), soff(n + 1, 0);
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    const int32_t* ci = col + i * k;
    const T* vi = val + i * k;
    const uint8_t* mi = mask + i * k;
    int64_t cnt = 0, scnt = 0;
    for (int64_t s = 0; s < k; ++s) {
      if (vi[s] == (T)0) continue;
      ++cnt;
      int32_t c = ci[s];
      if (mi[s] && state[c] == C && vi[s] < (T)0 && c != (int32_t)i)
        ++scnt;
    }
    off[i + 1] = cnt;
    soff[i + 1] = scnt;
  }
  for (int64_t i = 0; i < n; ++i) {
    off[i + 1] += off[i];
    soff[i + 1] += soff[i];
  }
  // ---- pass B: fill compact adjacency + strong-C-neg lists + d_base ----
  std::vector<int32_t> ccol(off[n]);
  std::vector<T> cval(off[n]);
  std::vector<uint8_t> cstr(off[n]);
  std::vector<int32_t> scn_cmap(soff[n]);
  std::vector<T> scn_val(soff[n]);
  std::vector<double> d_base(n);
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    const int32_t* ci = col + i * k;
    const T* vi = val + i * k;
    const uint8_t* mi = mask + i * k;
    int64_t w = off[i], sw = soff[i];
    double acc = 0.0;
    for (int64_t s = 0; s < k; ++s) {
      T v = vi[s];
      if (v == (T)0) continue;
      int32_t c = ci[s];
      bool strong = mi[s] != 0;
      ccol[w] = c;
      cval[w] = v;
      cstr[w] = (uint8_t)strong;
      ++w;
      if (strong && state[c] == C && v < (T)0 && c != (int32_t)i) {
        scn_cmap[sw] = (int32_t)cmap[c];
        scn_val[sw] = v;
        ++sw;
        acc += (double)v;   // d_base: same summand set, same slot order
      }
    }
    d_base[i] = acc;
  }

#pragma omp parallel
  {
    std::vector<double> accum(n_coarse, 0.0);
    std::vector<int64_t> marker(n_coarse, -1);
    std::vector<int64_t> cols_seen;
    std::vector<double> asc_part(n_coarse, 0.0);
    struct Cand { double w; int64_t pos; int64_t cj; };
    std::vector<Cand> cand;

#pragma omp for schedule(dynamic, 256)
    for (int64_t i = 0; i < n; ++i) {
      int32_t* pc = p_col + i * max_elements;
      double* pv = p_val + i * max_elements;
      for (int64_t s = 0; s < max_elements; ++s) { pc[s] = 0; pv[s] = 0.0; }
      if (state[i] == C) {
        pc[0] = (int32_t)cmap[i];
        pv[0] = 1.0;
        continue;
      }
      cols_seen.clear();
      double diag = 0.0, weak_sum = 0.0, bki_sum = 0.0;
      for (int64_t e = off[i]; e < off[i + 1]; ++e) {
        int32_t c = ccol[e];
        double v = (double)cval[e];
        if (c == (int32_t)i) {
          diag += v;
          continue;
        }
        bool strong = cstr[e] != 0;
        if (strong && state[c] == C) {
          int64_t j = cmap[c];
          if (marker[j] != i) {
            marker[j] = i;
            accum[j] = 0.0;
            asc_part[j] = 0.0;
            cols_seen.push_back(j);
          }
          asc_part[j] += v;
          continue;
        }
        if (strong && state[c] == F) {
          // a_ki: negative coupling back from row c to i — binary search
          // over row c's compacted (ascending) columns
          double a_ki = 0.0;
          int64_t lo = off[c], hi = off[c + 1];
          while (lo < hi) {
            int64_t mid = (lo + hi) >> 1;
            if (ccol[mid] < (int32_t)i) lo = mid + 1; else hi = mid;
          }
          if (lo < off[c + 1] && ccol[lo] == (int32_t)i
              && cval[lo] < (T)0)
            a_ki = (double)cval[lo];
          double d_ik = d_base[c] + a_ki;
          if (d_ik == 0.0) { weak_sum += v; continue; }
          double b = v / d_ik;
          bki_sum += b * a_ki;
          for (int64_t e2 = soff[c]; e2 < soff[c + 1]; ++e2) {
            int64_t j = scn_cmap[e2];
            if (marker[j] != i) {
              marker[j] = i;
              accum[j] = 0.0;
              asc_part[j] = 0.0;
              cols_seen.push_back(j);
            }
            accum[j] += b * (double)scn_val[e2];
          }
          continue;
        }
        weak_sum += v;
      }
      double dtil = diag + weak_sum + bki_sum;
      if (dtil == 0.0) dtil = 1.0;
      cand.clear();
      for (size_t t = 0; t < cols_seen.size(); ++t) {
        int64_t j = cols_seen[t];
        double nv = accum[j] + asc_part[j];
        if (nv == 0.0) continue;
        cand.push_back({-nv / dtil, (int64_t)t, j});
      }
      int64_t keep = (int64_t)cand.size();
      if (keep > max_elements) {
        std::sort(cand.begin(), cand.end(), [](const Cand& a, const Cand& b) {
          double fa = a.w < 0 ? -a.w : a.w, fb = b.w < 0 ? -b.w : b.w;
          if (fa != fb) return fa > fb;
          return a.cj < b.cj;
        });
        double full_p = 0.0, full_n = 0.0, kept_p = 0.0, kept_n = 0.0;
        for (int64_t t = 0; t < (int64_t)cand.size(); ++t) {
          double w = cand[t].w;
          if (w > 0) full_p += w; else full_n += w;
          if (t < max_elements) { if (w > 0) kept_p += w; else kept_n += w; }
        }
        double fac_p = kept_p != 0.0 ? full_p / kept_p : 1.0;
        double fac_n = kept_n != 0.0 ? full_n / kept_n : 1.0;
        for (int64_t t = 0; t < max_elements; ++t)
          cand[t].w *= cand[t].w > 0 ? fac_p : fac_n;
        keep = max_elements;
      }
      std::sort(cand.begin(), cand.begin() + keep,
                [](const Cand& a, const Cand& b) { return a.cj < b.cj; });
      for (int64_t t = 0; t < keep; ++t) {
        pc[t] = (int32_t)cand[t].cj;
        pv[t] = cand[t].w;
      }
    }
  }
}

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

// f32 variant: half the operator stream — used by the setup-phase λmax
// power iteration, whose 20 sweeps over the finest level dominate setup
// wall-clock once RAP is surrogate-based (λmax only feeds smoother bounds,
// so f32 is ample).
void dia_apply_f32(int64_t n, int64_t ndiag, const int64_t* offsets,
                   const float* data, const float* x, float* y) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    float acc = 0.0f;
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

// Numeric-only SpGEMM into a CACHED output pattern (value-only hierarchy
// refresh, VERDICT r3 #4): same A/B sparsity as when the pattern was built,
// new values. Skips the counting pass, marker bookkeeping, index writes and
// per-row sorts of the two-phase product above — one FMA per term plus a
// gather/reset at the cached (sorted) output positions. The caller
// guarantees every product term lands inside the cached pattern (A and B
// patterns unchanged); positions the new values cancel at simply hold 0.
void spgemm_numeric(int64_t n_rows, int64_t n_cols_out,
                    const int64_t* a_indptr, const int32_t* a_idx,
                    const double* a_val, const int64_t* b_indptr,
                    const int32_t* b_idx, const double* b_val,
                    const int64_t* c_indptr, const int32_t* c_idx,
                    double* c_val) {
#pragma omp parallel
  {
    std::vector<double> accum(n_cols_out, 0.0);
#pragma omp for schedule(dynamic, 64)
    for (int64_t i = 0; i < n_rows; ++i) {
      for (int64_t pa = a_indptr[i]; pa < a_indptr[i + 1]; ++pa) {
        int32_t k = a_idx[pa];
        double va = a_val[pa];
        for (int64_t pb = b_indptr[k]; pb < b_indptr[k + 1]; ++pb)
          accum[b_idx[pb]] += va * b_val[pb];
      }
      for (int64_t p = c_indptr[i]; p < c_indptr[i + 1]; ++p) {
        c_val[p] = accum[c_idx[p]];
        accum[c_idx[p]] = 0.0;
      }
    }
  }
}

// Sparse-encode for the batched upload pack (utils/pack.py): indices +
// values of the nonzero elements in one parallel pass. The numpy
// flatnonzero + fancy-gather chain cost ~4 s on the ~620 MB of plan
// arrays at 27-pt 128³. w4: 4-byte elements — float compare when
// as_float (matches np.flatnonzero on f32: −0.0 counts as zero), bit
// compare otherwise (int32 lane words). w2: 2-byte elements, bit compare
// (matches the uint16 view probe used for bfloat16). Returns the count.
int64_t sparse_encode_w4(const uint32_t* x, int64_t n, int as_float,
                         int32_t* idx, uint32_t* val) {
  // nt is the ACTUAL team size, read inside the region: if OpenMP grants
  // fewer threads than omp_get_max_threads() (dynamic teams, thread
  // limits, nesting), a partition by the requested count would silently
  // skip the ranges of the threads that never materialized (ADVICE r4)
  int nt = 1;
  std::vector<int64_t> counts;
  const float* xf = reinterpret_cast<const float*>(x);
#pragma omp parallel
  {
    int t = 0;
#ifdef _OPENMP
    t = omp_get_thread_num();
#pragma omp single
    {
      nt = omp_get_num_threads();
      counts.assign(nt + 1, 0);
    }
#else
    counts.assign(nt + 1, 0);
#endif
    int64_t lo = n * t / nt, hi = n * (t + 1) / nt, cnt = 0;
    for (int64_t i = lo; i < hi; ++i)
      cnt += as_float ? (xf[i] != 0.0f) : (x[i] != 0);
    counts[t + 1] = cnt;
#pragma omp barrier
#pragma omp single
    for (int i = 0; i < nt; ++i) counts[i + 1] += counts[i];
    int64_t w = counts[t];
    for (int64_t i = lo; i < hi; ++i) {
      bool nz = as_float ? (xf[i] != 0.0f) : (x[i] != 0);
      if (nz) {
        idx[w] = (int32_t)i;
        val[w] = x[i];
        ++w;
      }
    }
  }
  return counts[nt];
}

int64_t sparse_encode_w2(const uint16_t* x, int64_t n, int32_t* idx,
                         uint16_t* val) {
  int nt = 1;  // actual team size (see sparse_encode_w4)
  std::vector<int64_t> counts;
#pragma omp parallel
  {
    int t = 0;
#ifdef _OPENMP
    t = omp_get_thread_num();
#pragma omp single
    {
      nt = omp_get_num_threads();
      counts.assign(nt + 1, 0);
    }
#else
    counts.assign(nt + 1, 0);
#endif
    int64_t lo = n * t / nt, hi = n * (t + 1) / nt, cnt = 0;
    for (int64_t i = lo; i < hi; ++i) cnt += (x[i] != 0);
    counts[t + 1] = cnt;
#pragma omp barrier
#pragma omp single
    for (int i = 0; i < nt; ++i) counts[i + 1] += counts[i];
    int64_t w = counts[t];
    for (int64_t i = lo; i < hi; ++i)
      if (x[i] != 0) {
        idx[w] = (int32_t)i;
        val[w] = x[i];
        ++w;
      }
  }
  return counts[nt];
}

// Fused sparse-encode + lane extraction for routed plans (utils/pack.py
// add_routed): one pass over the dense val4 emits the nonzero index and
// value streams AND the u8 lane stream (read from the packed lidx words
// at emit time) — replacing the separate sparse_encode + routed_lanes_at
// passes over the multi-GB plan arrays. Same team-size-safe partition and
// probe semantics as sparse_encode_w4/w2. Returns the count.
int64_t sparse_encode_routed_w4(const uint32_t* x, int64_t n, int as_float,
                                const uint32_t* lidxp, int64_t kc,
                                int32_t* idx, uint32_t* val,
                                uint8_t* lanes) {
  int nt = 1;
  std::vector<int64_t> counts;
  const float* xf = reinterpret_cast<const float*>(x);
  int64_t kq = kc / 4;
#pragma omp parallel
  {
    int t = 0;
#ifdef _OPENMP
    t = omp_get_thread_num();
#pragma omp single
    {
      nt = omp_get_num_threads();
      counts.assign(nt + 1, 0);
    }
#else
    counts.assign(nt + 1, 0);
#endif
    int64_t lo = n * t / nt, hi = n * (t + 1) / nt, cnt = 0;
    for (int64_t i = lo; i < hi; ++i)
      cnt += as_float ? (xf[i] != 0.0f) : (x[i] != 0);
    counts[t + 1] = cnt;
#pragma omp barrier
#pragma omp single
    for (int i = 0; i < nt; ++i) counts[i + 1] += counts[i];
    int64_t w = counts[t];
    for (int64_t i = lo; i < hi; ++i) {
      bool nz = as_float ? (xf[i] != 0.0f) : (x[i] != 0);
      if (nz) {
        idx[w] = (int32_t)i;
        val[w] = x[i];
        int64_t lane = i & 127, u = i >> 7;
        int64_t s = u & 7, q = u >> 3;
        int64_t ks = q % kc;
        int64_t wd = (((q / kc) * kq + (ks >> 2)) * 8 + s) * 128 + lane;
        lanes[w] = (uint8_t)((lidxp[wd] >> (8 * (ks & 3))) & 0x7F);
        ++w;
      }
    }
  }
  return counts[nt];
}

int64_t sparse_encode_routed_w2(const uint16_t* x, int64_t n,
                                const uint32_t* lidxp, int64_t kc,
                                int32_t* idx, uint16_t* val,
                                uint8_t* lanes) {
  int nt = 1;
  std::vector<int64_t> counts;
  int64_t kq = kc / 4;
#pragma omp parallel
  {
    int t = 0;
#ifdef _OPENMP
    t = omp_get_thread_num();
#pragma omp single
    {
      nt = omp_get_num_threads();
      counts.assign(nt + 1, 0);
    }
#else
    counts.assign(nt + 1, 0);
#endif
    int64_t lo = n * t / nt, hi = n * (t + 1) / nt, cnt = 0;
    for (int64_t i = lo; i < hi; ++i) cnt += (x[i] != 0);
    counts[t + 1] = cnt;
#pragma omp barrier
#pragma omp single
    for (int i = 0; i < nt; ++i) counts[i + 1] += counts[i];
    int64_t w = counts[t];
    for (int64_t i = lo; i < hi; ++i)
      if (x[i] != 0) {
        idx[w] = (int32_t)i;
        val[w] = x[i];
        int64_t lane = i & 127, u = i >> 7;
        int64_t s = u & 7, q = u >> 3;
        int64_t ks = q % kc;
        int64_t wd = (((q / kc) * kq + (ks >> 2)) * 8 + s) * 128 + lane;
        lanes[w] = (uint8_t)((lidxp[wd] >> (8 * (ks & 3))) & 0x7F);
        ++w;
      }
  }
  return counts[nt];
}

// Delta-encode a sorted unique int32 position stream as u8 gaps with
// int32 exceptions for gaps >= 255 (utils/pack.py — 1 B/entry through the
// relay instead of 4). ``prev`` is the previous global position MINUS the
// part's global offset (so multi-part fused groups encode without ever
// materializing the offset-shifted index arrays). Returns the exception
// count, or -1 when exc_cap would overflow (caller retries with a bigger
// buffer). exc_pos entries are relative to ``pos0`` (the part's start in
// the fused stream).
int64_t delta_encode_u8(const int32_t* idx, int64_t n, int64_t prev,
                        int64_t pos0, uint8_t* du8, int32_t* exc_pos,
                        int32_t* exc_gap, int64_t exc_cap) {
  int64_t ne = 0;
  for (int64_t i = 0; i < n; ++i) {
    int64_t gap = (int64_t)idx[i] - prev;
    prev = idx[i];
    if (gap >= 255) {
      if (ne >= exc_cap) return -1;
      exc_pos[ne] = (int32_t)(pos0 + i);
      exc_gap[ne] = (int32_t)gap;
      du8[i] = 255;
      ++ne;
    } else {
      du8[i] = (uint8_t)gap;
    }
  }
  return ne;
}

// Lane stream for the device-side lidx derivation (utils/pack.py
// add_routed): lanes[i] = the 7-bit lane of val4 flat position idx[i],
// read out of the packed lidx words (sparse/routed.py layout — val4
// (NC,KC,8,128), lidxp (NC,KC/4,8,128) with 4 slots' lanes per int32).
// Shipping this 1 B/nnz stream instead of the packed-word scatter removes
// the whole lidx plan array from the host->device transfer.
void routed_lanes_at(const uint32_t* lidxp, const int32_t* idx, int64_t n,
                     int64_t kc, uint8_t* lanes) {
  int64_t kq = kc / 4;
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    int64_t p = idx[i];
    int64_t lane = p & 127, u = p >> 7;
    int64_t s = u & 7, q = u >> 3;
    int64_t ks = q % kc, ci = q / kc;
    int64_t w = ((ci * kq + (ks >> 2)) * 8 + s) * 128 + lane;
    lanes[i] = (uint8_t)((lidxp[w] >> (8 * (ks & 3))) & 0x7F);
  }
}

// CSR matvec, f64, row-parallel: the λmax power iteration's inner product
// (20 sweeps over every level dominate the refresh/setup "lmax" phase when
// run through scipy's single-threaded csr_matvec; same per-row
// accumulation order, so results match scipy to FP-contraction noise).
void csr_matvec_f64(int64_t n_rows, const int64_t* indptr,
                    const int32_t* idx, const double* val, const double* x,
                    double* y) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n_rows; ++i) {
    double acc = 0.0;
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p)
      acc += val[p] * x[idx[p]];
    y[i] = acc;
  }
}

// Permutation gather, f64: out[i] = x[perm[i]] (cached CSR transpose value
// maps during refresh; numpy fancy-indexing pays a temp + checks).
void perm_gather_f64(int64_t n, const int64_t* perm, const double* x,
                     double* out) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) out[i] = x[perm[i]];
}

// int32-permutation variant: the refresh caches store their scatter maps
// as int32 (halves the multi-GB host cache at 256³) — gathering through
// them must not re-widen per call.
void perm_gather_f64_i32(int64_t n, const int32_t* perm, const double* x,
                         double* out) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) out[i] = x[perm[i]];
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

// ---------------------------------------------------------------------------
// Extended+i interpolation (host setup hot spot; SURVEY.md §2 #8, the
// formulas match omp_amg_tpu/amg/host_setup.py::extpi_interpolation_np —
// the vectorized-numpy twin, which this kernel replaces for speed).
//
// Inputs are padded ELL planes (col==0/val==0 padding, cols sorted within
// rows), the strength mask per slot, the PMIS state (0/1/2 = U/C/F), and
// the fine→coarse map. Output is the padded P (n, max_elements) planes.
// Deterministic: per-row computation, fixed accumulation order (slot order,
// products before nothing — see below), stable truncation tie-break
// (|w| desc, first-seen asc).
// ---------------------------------------------------------------------------

void extpi_interp_f64(int64_t n, int64_t k, int64_t n_coarse,
                      const int32_t* col, const double* val,
                      const uint8_t* mask, const int8_t* state,
                      const int64_t* cmap, int64_t max_elements,
                      int32_t* p_col, double* p_val) {
  extpi_interp_impl<double>(n, k, n_coarse, col, val, mask, state, cmap,
                            max_elements, p_col, p_val);
}

// f32-plane entry: the setup's ELL value planes are float32 — reading
// them directly removes the caller-side (n, k) float64 conversion temp.
void extpi_interp_f32v(int64_t n, int64_t k, int64_t n_coarse,
                       const int32_t* col, const float* val,
                       const uint8_t* mask, const int8_t* state,
                       const int64_t* cmap, int64_t max_elements,
                       int32_t* p_col, double* p_val) {
  extpi_interp_impl<float>(n, k, n_coarse, col, val, mask, state, cmap,
                           max_elements, p_col, p_val);
}

// ---------------------------------------------------------------------------
// Distance-2 greedy column coloring (for the colored-probing device RAP):
// columns sharing any row get distinct colors. Sequential deterministic
// greedy in ascending column order with per-row color bitmasks; supports up
// to 64*MAXW colors. Returns the color count, or -1 if it would exceed the
// cap (caller falls back). indptr/indices = CSR of the matrix whose columns
// are being colored; cindptr/cindices = its CSC (column -> rows).
// ---------------------------------------------------------------------------

int64_t d2_color_greedy(int64_t n_rows, int64_t n_cols,
                        const int64_t* indptr, const int32_t* indices,
                        const int64_t* cindptr, const int32_t* cindices,
                        int32_t* color_out) {
  const int64_t MAXW = 4;  // 256 colors
  std::vector<uint64_t> rowmask((size_t)n_rows * MAXW, 0);
  int64_t ncolors = 0;
  for (int64_t j = 0; j < n_cols; ++j) {
    uint64_t forb[MAXW] = {0, 0, 0, 0};
    for (int64_t p = cindptr[j]; p < cindptr[j + 1]; ++p) {
      const uint64_t* rm = rowmask.data() + (size_t)cindices[p] * MAXW;
      for (int64_t w = 0; w < MAXW; ++w) forb[w] |= rm[w];
    }
    int64_t c = -1;
    for (int64_t w = 0; w < MAXW && c < 0; ++w) {
      uint64_t free_bits = ~forb[w];
      if (free_bits) c = w * 64 + __builtin_ctzll(free_bits);
    }
    if (c < 0) return -1;
    color_out[j] = (int32_t)c;
    if (c + 1 > ncolors) ncolors = c + 1;
    uint64_t bit = 1ull << (c & 63);
    int64_t w = c >> 6;
    for (int64_t p = cindptr[j]; p < cindptr[j + 1]; ++p)
      rowmask[(size_t)cindices[p] * MAXW + w] |= bit;
  }
  return ncolors;
}

// ---------------------------------------------------------------------------
// Routed-ELL planner (sparse/routed.py compact-chunk layout) — the numpy
// planner cost ~30 s per PMIS 96^3 hierarchy (round-3 profile); these two
// passes reproduce its output bit-exactly at OpenMP speed.
//
// Layout recap (KC = 16 slots/chunk, LANES = 128, blocks of 1024 rows):
//   row r -> (block b = r/1024, sublane s = (r/128)%8, lane l = r%128)
//   per (b, s): nonzeros grouped by x-chunk j = col/128 - base[b]; a
//   (group, j) pair with max-per-row multiplicity m occupies m slots,
//   slot ranges assigned in ascending j; within a (row, j) run the t-th
//   entry takes slot slot_base(j) + t (CSR sorted indices make runs
//   contiguous and deterministic).
// ---------------------------------------------------------------------------

// Pass 1: per-block span base and slot demand. Returns the global span
// (pad8, >= s_min, >= 8) or -1 when a block's local span exceeds s_cap.
// ws > 1 pads every (group, chunk) slot run to a ws multiple (window-share
// packing: the kernel reads one x-chunk per ws slots).
int64_t routed_plan_demand(int64_t n_rows, const int64_t* indptr,
                           const int32_t* indices, int64_t s_min,
                           int64_t s_cap, int64_t ws, int32_t* sbase,
                           int32_t* bk) {
  const int64_t nb = (n_rows + 1023) / 1024;
  int64_t span = s_min > 8 ? s_min : 8;
  bool overflow = false;
#pragma omp parallel
  {
    std::vector<int32_t> dem;       // per-chunk demand, local span sized
    std::vector<int32_t> touched;
    int64_t span_l = 0;
#pragma omp for schedule(dynamic, 4)
    for (int64_t b = 0; b < nb; ++b) {
      const int64_t r0 = b * 1024;
      const int64_t r1 = std::min(r0 + 1024, n_rows);
      int64_t cmin = INT64_MAX, cmax = -1;
      for (int64_t r = r0; r < r1; ++r)
        for (int64_t p = indptr[r]; p < indptr[r + 1]; ++p) {
          const int64_t c = indices[p] >> 7;
          if (c < cmin) cmin = c;
          if (c > cmax) cmax = c;
        }
      if (cmax < 0) {  // empty block
        sbase[b] = 0;
        bk[b] = 0;
        continue;
      }
      const int64_t sp = cmax - cmin + 1;
      if (sp > s_cap) { overflow = true; continue; }
      if (sp > span_l) span_l = sp;
      sbase[b] = (int32_t)cmin;
      if ((int64_t)dem.size() < sp) dem.assign((size_t)sp, 0);
      int32_t bkmax = 0;
      for (int64_t s = 0; s < 8; ++s) {
        const int64_t g0 = r0 + s * 128;
        const int64_t g1 = std::min(g0 + 128, r1);
        touched.clear();
        for (int64_t r = g0; r < g1; ++r) {
          int64_t jprev = -1;
          int32_t cnt = 0;
          for (int64_t p = indptr[r]; p < indptr[r + 1]; ++p) {
            const int64_t j = (indices[p] >> 7) - cmin;
            cnt = (j == jprev) ? cnt + 1 : 1;
            jprev = j;
            if (dem[j] == 0) touched.push_back((int32_t)j);
            if (cnt > dem[j]) dem[j] = cnt;
          }
        }
        int32_t total = 0;
        for (int32_t j : touched) {
          total += (int32_t)((dem[j] + ws - 1) / ws * ws);
          dem[j] = 0;
        }
        if (total > bkmax) bkmax = total;
      }
      bk[b] = bkmax;
    }
#pragma omp critical
    if (span_l > span) span = span_l;
  }
  if (overflow) return -1;
  return (span + 7) / 8 * 8;
}

// Pass 2: fill the compact plan arrays. cbase/kch as computed host-side
// (kch = max(ceil(bk/16), 1)); val4 (NC,16,8,128) f32, lidxp
// (NC,4,8,128) int32 with 4 slots' lanes packed per word, soff (NC,128).
// Arrays arrive zero-initialized.
static void routed_fill_impl(int64_t n_rows, const int64_t* indptr,
                             const int32_t* indices, const double* data,
                             const int32_t* sbase, const int32_t* cbase,
                             int64_t ws, float* val4, int32_t* lidxp,
                             int32_t* soff, int64_t* pos /* nullable */) {
  const int64_t nb = (n_rows + 1023) / 1024;
#pragma omp parallel
  {
    std::vector<int32_t> dem, slot_base;
    std::vector<int32_t> touched;
#pragma omp for schedule(dynamic, 4)
    for (int64_t b = 0; b < nb; ++b) {
      const int64_t r0 = b * 1024;
      const int64_t r1 = std::min(r0 + 1024, n_rows);
      const int64_t cmin = sbase[b];
      const int64_t cb = cbase[b];
      for (int64_t s = 0; s < 8; ++s) {
        const int64_t g0 = r0 + s * 128;
        const int64_t g1 = std::min(g0 + 128, r1);
        // demand for this group, then ascending-j prefix -> slot bases
        touched.clear();
        for (int64_t r = g0; r < g1; ++r) {
          int64_t jprev = -1;
          int32_t cnt = 0;
          for (int64_t p = indptr[r]; p < indptr[r + 1]; ++p) {
            const int64_t j = (indices[p] >> 7) - cmin;
            cnt = (j == jprev) ? cnt + 1 : 1;
            jprev = j;
            if ((int64_t)dem.size() <= j) dem.resize((size_t)j + 1, 0);
            if (dem[j] == 0 && cnt == 1) touched.push_back((int32_t)j);
            if (cnt > dem[j]) dem[j] = cnt;
          }
        }
        std::sort(touched.begin(), touched.end());
        if ((int64_t)slot_base.size() < (int64_t)dem.size())
          slot_base.resize(dem.size());
        int32_t acc = 0;
        const int64_t cb128 = cb * 128;
        for (int32_t j : touched) {
          slot_base[j] = acc;
          const int32_t pad = (int32_t)((dem[j] + ws - 1) / ws * ws);
          // padded run slots carry j with val = 0, so the kernel's
          // one-window-per-ws-slots read stays valid (numpy twin fills
          // the whole padded run the same way)
          if (ws > 1)
            for (int32_t q = acc; q < acc + pad; ++q)
              soff[cb128 + (q >> 4) * 128 + (q & 15) * 8 + s] = j;
          acc += pad;
        }
        // fill entries
        for (int64_t r = g0; r < g1; ++r) {
          const int64_t l = r & 127;
          int64_t jprev = -1;
          int32_t t = 0;
          for (int64_t p = indptr[r]; p < indptr[r + 1]; ++p) {
            const int64_t c = indices[p];
            const int64_t j = (c >> 7) - cmin;
            t = (j == jprev) ? t + 1 : 0;
            jprev = j;
            const int64_t slot = slot_base[j] + t;
            const int64_t ci = cb + (slot >> 4);
            const int64_t ks = slot & 15;
            const int64_t vp = ((ci * 16 + ks) * 8 + s) * 128 + l;
            val4[vp] = (float)data[p];
            if (pos) pos[p] = vp;  // value-refresh scatter map (CSR order)
            lidxp[((ci * 4 + (ks >> 2)) * 8 + s) * 128 + l] |=
                (int32_t)(c & 127) << (8 * (ks & 3));
            soff[ci * 128 + ks * 8 + s] = (int32_t)j;
          }
        }
        for (int32_t j : touched) dem[j] = 0;
      }
    }
  }
}

void routed_plan_fill(int64_t n_rows, const int64_t* indptr,
                      const int32_t* indices, const double* data,
                      const int32_t* sbase, const int32_t* cbase, int64_t ws,
                      float* val4, int32_t* lidxp, int32_t* soff) {
  routed_fill_impl(n_rows, indptr, indices, data, sbase, cbase, ws, val4,
                   lidxp, soff, nullptr);
}

// Variant emitting the value-refresh scatter map: pos[p] = flat val4 index
// of CSR entry p (amg/refresh.py re-fills plan values device-side).
void routed_plan_fill_map(int64_t n_rows, const int64_t* indptr,
                          const int32_t* indices, const double* data,
                          const int32_t* sbase, const int32_t* cbase,
                          int64_t ws, float* val4, int32_t* lidxp,
                          int32_t* soff, int64_t* pos) {
  routed_fill_impl(n_rows, indptr, indices, data, sbase, cbase, ws, val4,
                   lidxp, soff, pos);
}

// ---------------------------------------------------------------------------
// CSR → padded ELL planes (sparse/formats.ell_planes_from_scipy): the numpy
// fancy-index fill cost ~5 s on the 43 M-nnz 27-pt coarse operator.
// Arrays arrive zeroed; CSR entries land at positions 0..len-1 per row.
// ---------------------------------------------------------------------------

void ell_fill_f32(int64_t n, int64_t k, const int64_t* indptr,
                  const int32_t* indices, const double* data, int32_t* col,
                  float* val) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    const int64_t base = i * k;
    int64_t j = 0;
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p, ++j) {
      col[base + j] = indices[p];
      val[base + j] = (float)data[p];
    }
  }
}

// ---------------------------------------------------------------------------
// CSR → DIA extraction (sparse/formats.dia_planes_from_csr): mark present
// offsets, then fill the (ndiag, n) planes — two parallel passes.
// ---------------------------------------------------------------------------

void dia_mark_offsets(int64_t n, const int64_t* indptr,
                      const int32_t* indices, uint8_t* seen /* 2n-1 */) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i)
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p)
      seen[(int64_t)indices[p] - i + (n - 1)] = 1;  // benign byte race
}

void dia_fill_planes(int64_t n, const int64_t* indptr,
                     const int32_t* indices, const double* data,
                     const int32_t* lookup /* 2n-1: offset → diag idx */,
                     double* out /* (ndiag, n), zeroed */) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i)
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
      const int64_t k = lookup[(int64_t)indices[p] - i + (n - 1)];
      out[k * n + i] = data[p];
    }
}

// ---------------------------------------------------------------------------
// Plane-major packing for PlaneDia (sparse/formats.to_plane_dia):
// (ndiag, nz*pr*128) f64 diagonals → (nz, ndiag, pr, 128) f32 planes, plus
// an exact bf16-losslessness test (a f32 is bf16-representable iff its low
// 16 mantissa bits are zero) and the lossless bf16 repack. The numpy
// transpose+cast chain cost ~12 s at 27-pt 128³ on this 2-core host.
// ---------------------------------------------------------------------------

void plane_pack_f32(int64_t ndiag, int64_t nz, int64_t pr,
                    const double* data, float* out) {
  const int64_t plane = pr * 128;
  const int64_t n = nz * plane;
#pragma omp parallel for collapse(2) schedule(static)
  for (int64_t z = 0; z < nz; ++z)
    for (int64_t d = 0; d < ndiag; ++d) {
      const double* src = data + d * n + z * plane;
      float* dst = out + (z * ndiag + d) * plane;
      for (int64_t i = 0; i < plane; ++i) dst[i] = (float)src[i];
    }
}

int bf16_lossless_f32(const float* x, int64_t n) {
  int ok = 1;
#pragma omp parallel for schedule(static) reduction(&& : ok)
  for (int64_t i = 0; i < n; ++i) {
    uint32_t b;
    std::memcpy(&b, x + i, 4);
    if (b & 0xFFFFu) ok = 0;
  }
  return ok;
}

void bf16_pack_f32(const float* x, int64_t n, uint16_t* out) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    uint32_t b;
    std::memcpy(&b, x + i, 4);
    out[i] = (uint16_t)(b >> 16);
  }
}

// Round-to-nearest-even variant (lossy compression of plan values — the
// truncating pack above is reserved for verified-lossless data).
void bf16_round_pack_f32(const float* x, int64_t n, uint16_t* out) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    uint32_t b;
    std::memcpy(&b, x + i, 4);
    const uint32_t r = ((b >> 16) & 1u) + 0x7FFFu;
    out[i] = (uint16_t)((b + r) >> 16);
  }
}

// ---------------------------------------------------------------------------
// PMIS coarsening (amg/host_setup.py pmis_np) — bit-identical native port.
// All reductions are integer or pure comparisons (max / argmax-by-largest-
// index), so OpenMP scheduling cannot change the result; the hash01 weights
// reproduce the numpy lowbias32 mixer exactly.
// ---------------------------------------------------------------------------

static inline float hash01_u32(uint32_t x) {
  x = (x ^ (x >> 16)) * 0x7FEB352Du;
  x = (x ^ (x >> 15)) * 0x846CA68Bu;
  x = x ^ (x >> 16);
  return (float)(x >> 8) * (1.0f / (float)(1 << 24));
}

void strength_mask_f32(int64_t n, int64_t k, const int32_t* col,
                       const float* val, double theta, uint8_t* mask) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    const int32_t* c = col + i * k;
    const float* v = val + i * k;
    uint8_t* m = mask + i * k;
    float diag = 0.0f;
    for (int64_t j = 0; j < k; ++j)
      if (c[j] == (int32_t)i) diag += v[j];
    const float sign = diag >= 0.0f ? 1.0f : -1.0f;
    // row_max = max over ALL k slots of s (non-offdiag slots contribute
    // 0, exactly like the numpy where() formulation)
    float row_max = -std::numeric_limits<float>::infinity();
    for (int64_t j = 0; j < k; ++j) {
      const bool offd = c[j] != (int32_t)i && v[j] != 0.0f;
      const float s = offd ? -sign * v[j] : 0.0f;
      if (s > row_max) row_max = s;
    }
    // f32 threshold semantics, exactly like the numpy flavor (NEP-50:
    // python-float theta casts to f32, compare runs in f32) — an f64
    // compare can flip exact-tie rows for non-dyadic theta (ADVICE r3).
    const float thr = (float)theta * row_max;
    for (int64_t j = 0; j < k; ++j) {
      const bool offd = c[j] != (int32_t)i && v[j] != 0.0f;
      const float s = offd ? -sign * v[j] : 0.0f;
      m[j] = (offd && s > 0.0f && s >= thr && row_max > 0.0f) ? 1 : 0;
    }
  }
}

int64_t pmis_f32(int64_t n, int64_t k, const int32_t* col,
                 const uint8_t* mask, int64_t max_rounds, int32_t* state) {
  const int32_t UNDEC = 0, CPT = 1, FPT = 2;
  // influence counts (S^T column counts) — atomic integer adds, exact
  std::vector<int64_t> cnt((size_t)n, 0);
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i)
    for (int64_t j = 0; j < k; ++j)
      if (mask[i * k + j]) {
#pragma omp atomic
        cnt[col[i * k + j]]++;
      }
  std::vector<float> weight((size_t)n);
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i)
    weight[i] = (float)cnt[i] + hash01_u32((uint32_t)i);

  // reverse (S^T) adjacency lists; per-list order is scheduling-dependent
  // but every consumer is an order-free max/any reduction
  std::vector<int64_t> rptr((size_t)n + 1, 0);
  {
    std::vector<int64_t> deg((size_t)n, 0);
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i)
      for (int64_t j = 0; j < k; ++j)
        if (mask[i * k + j]) {
#pragma omp atomic
          deg[col[i * k + j]]++;
        }
    for (int64_t i = 0; i < n; ++i) rptr[i + 1] = rptr[i] + deg[i];
  }
  std::vector<int32_t> radj((size_t)rptr[n]);
  {
    std::vector<int64_t> fill((size_t)n, 0);
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i)
      for (int64_t j = 0; j < k; ++j)
        if (mask[i * k + j]) {
          const int64_t c = col[i * k + j];
          int64_t p;
#pragma omp atomic capture
          p = fill[c]++;
          radj[rptr[c] + p] = (int32_t)i;
        }
  }

  std::vector<float> key((size_t)n);
  std::vector<uint8_t> cand((size_t)n, 0);
  for (int64_t i = 0; i < n; ++i) state[i] = UNDEC;
  int64_t round = 0;
  for (; round < max_rounds; ++round) {
    int64_t n_undec = 0;
#pragma omp parallel for schedule(static) reduction(+ : n_undec)
    for (int64_t i = 0; i < n; ++i) {
      key[i] = state[i] == UNDEC ? weight[i] : -1.0f;
      if (state[i] == UNDEC) n_undec++;
    }
    if (n_undec == 0) break;
#pragma omp parallel for schedule(dynamic, 1024)
    for (int64_t i = 0; i < n; ++i) {
      cand[i] = 0;
      if (state[i] != UNDEC) continue;
      float nb_key = -1.0f;
      int64_t nb_idx = -1;
      for (int64_t j = 0; j < k; ++j)
        if (mask[i * k + j]) {
          const int64_t q = col[i * k + j];
          const float kq = key[q];
          if (kq > nb_key) { nb_key = kq; nb_idx = q; }
          else if (kq == nb_key && q > nb_idx) nb_idx = q;
        }
      for (int64_t p = rptr[i]; p < rptr[i + 1]; ++p) {
        const int64_t q = radj[p];
        const float kq = key[q];
        if (kq > nb_key) { nb_key = kq; nb_idx = q; }
        else if (kq == nb_key && q > nb_idx) nb_idx = q;
      }
      const float w = weight[i];
      cand[i] = (w > nb_key || (w == nb_key && i > nb_idx)) ? 1 : 0;
    }
#pragma omp parallel for schedule(dynamic, 1024)
    for (int64_t i = 0; i < n; ++i) {
      if (state[i] != UNDEC) continue;
      if (cand[i]) { state[i] = CPT; continue; }
      bool has_c = false;
      for (int64_t j = 0; j < k && !has_c; ++j)
        if (mask[i * k + j] && cand[col[i * k + j]]) has_c = true;
      for (int64_t p = rptr[i]; p < rptr[i + 1] && !has_c; ++p)
        if (cand[radj[p]]) has_c = true;
      if (has_c) state[i] = FPT;
    }
  }
  if (round >= max_rounds) return -1;
  // stranded-F promotion (forward strong deps, none on a C-point).
  // Dependencies are tested against a PRE-promotion snapshot, exactly like
  // pmis_np (host_setup.py:127-130, is_c taken before the where()): testing
  // live state would make chained stranded-F outcomes depend on OpenMP
  // scheduling and diverge from the numpy flavor (ADVICE r3 high).
  std::vector<uint8_t> was_c((size_t)n);
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) was_c[i] = state[i] == CPT ? 1 : 0;
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    if (state[i] != FPT) continue;
    bool any_dep = false, dep_c = false;
    for (int64_t j = 0; j < k; ++j)
      if (mask[i * k + j]) {
        any_dep = true;
        if (was_c[col[i * k + j]]) { dep_c = true; break; }
      }
    if (any_dep && !dep_c) state[i] = CPT;
  }
  return round;
}

int native_num_threads() {
#ifdef _OPENMP
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
