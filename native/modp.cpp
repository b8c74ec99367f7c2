// Mod-p dense linear algebra kernels for the exact certifier.
//
// Native analog of the reference's exact elimination work (relp-num rational
// Gaussian elimination); here the O(m^3) part of Dixon p-adic lifting — the
// one-time mod-p matrix inversion — runs as tight C++ loops instead of numpy
// outer-product updates.
//
// p must satisfy p < 2^21 so that products and row-combination accumulators
// fit comfortably in int64.
//
// Build: g++ -O3 -std=c++17 -shared -fPIC -o libmodp.so modp.cpp

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

int64_t pow_mod(int64_t base, int64_t exponent, int64_t p) {
  int64_t result = 1 % p;
  base %= p;
  while (exponent > 0) {
    if (exponent & 1) result = (result * base) % p;
    base = (base * base) % p;
    exponent >>= 1;
  }
  return result;
}

}  // namespace

extern "C" {

// Invert an m x m matrix mod p.  `a` (row-major, entries in [0, p)) is
// destroyed; the inverse lands in `out`.  Returns 0 on success, -1 if
// singular mod p.
int32_t modp_invert(int64_t* a, int64_t* out, int64_t m, int64_t p) {
  for (int64_t i = 0; i < m; ++i) {
    for (int64_t j = 0; j < m; ++j) out[i * m + j] = (i == j) ? 1 : 0;
  }
  for (int64_t k = 0; k < m; ++k) {
    int64_t pivot_row = -1;
    for (int64_t i = k; i < m; ++i) {
      if (a[i * m + k] % p != 0) {
        pivot_row = i;
        break;
      }
    }
    if (pivot_row < 0) return -1;
    if (pivot_row != k) {
      for (int64_t j = 0; j < m; ++j) {
        std::swap(a[k * m + j], a[pivot_row * m + j]);
        std::swap(out[k * m + j], out[pivot_row * m + j]);
      }
    }
    const int64_t inv = pow_mod(a[k * m + k], p - 2, p);
    int64_t* ak = a + k * m;
    int64_t* ok = out + k * m;
    for (int64_t j = 0; j < m; ++j) {
      ak[j] = (ak[j] * inv) % p;
      ok[j] = (ok[j] * inv) % p;
    }
    for (int64_t i = 0; i < m; ++i) {
      if (i == k) continue;
      const int64_t factor = a[i * m + k] % p;
      if (factor == 0) continue;
      int64_t* ai = a + i * m;
      int64_t* oi = out + i * m;
      for (int64_t j = 0; j < m; ++j) {
        ai[j] = (ai[j] - factor * ak[j]) % p;
        oi[j] = (oi[j] - factor * ok[j]) % p;
      }
    }
  }
  // Normalize to [0, p).
  for (int64_t i = 0; i < m * m; ++i) {
    a[i] %= p;
    if (a[i] < 0) a[i] += p;
    out[i] %= p;
    if (out[i] < 0) out[i] += p;
  }
  return 0;
}

// out = (A @ x) mod p for row-major A (m x m), x (m).
void modp_matvec(const int64_t* a, const int64_t* x, int64_t* out, int64_t m,
                 int64_t p) {
  for (int64_t i = 0; i < m; ++i) {
    const int64_t* row = a + i * m;
    // Accumulate in int64: m * p^2 must stay < 2^63 — fine for
    // p < 2^21 and m < 2^20.
    int64_t acc = 0;
    for (int64_t j = 0; j < m; ++j) {
      acc += row[j] * x[j] % p;
      if (acc >= (int64_t{1} << 62)) acc %= p;
    }
    out[i] = acc % p;
  }
}

}  // extern "C"
