// Native FCIDUMP body parser (data-loader hot path).
//
// The FCIDUMP integral format (reference reader:
// pauxy/utils/hamiltonian_converter.py:8-100) is a text file with one
// integral per line; molecular files reach 1e6-1e8 lines, and a Python
// regex-per-line parse becomes the dominant setup cost before the TPU ever
// sees work.  This translation unit parses the *body* (the Python layer
// parses the short &FCI header) with strtod/strtol straight off one
// in-memory buffer and applies the 8-fold permutational symmetry fill into
// caller-allocated numpy arrays — no allocation, no copies, no exceptions
// across the C ABI.
//
// Exposed via ctypes (see native/__init__.py); the pure-Python parser in
// utils/qmcpack.read_fcidump remains the behavioural oracle and fallback.

#include <cctype>
#include <cstdlib>

namespace {

// Advance past spaces/tabs/CR (not newlines — line structure is irrelevant
// here; entries are whitespace separated and self-delimiting).
inline const char *skip_ws(const char *p, const char *end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r' || *p == '\n'))
    ++p;
  return p;
}

// Fill the 8 permutations (chemist (ij|kl) real symmetry) with {vr, vi}.
// cplx selects interleaved complex128 storage (stride 2 doubles).
inline void fill8(double *eri, long n, long i, long j, long k, long l,
                  double vr, double vi, bool cplx) {
  const long perms[8][4] = {
      {i, j, k, l}, {j, i, k, l}, {i, j, l, k}, {j, i, l, k},
      {k, l, i, j}, {l, k, i, j}, {k, l, j, i}, {l, k, j, i}};
  const long s = cplx ? 2 : 1;
  for (auto &p : perms) {
    long idx = ((p[0] * n + p[1]) * n + p[2]) * n + p[3];
    eri[idx * s] = vr;
    if (cplx) eri[idx * s + 1] = vi;
  }
}

}  // namespace

extern "C" {

// Parse the FCIDUMP body in buf[0..len) for a norb-orbital system.
//   h1e:  [norb, norb] doubles (cplx=0) or complex128-as-double-pairs
//   eri:  [norb^4] likewise
//   ecore: 1 (or 2) doubles
// Returns the number of integral entries consumed, or -(byte offset + 1)
// of the first malformed entry.  Unparseable trailing garbage on a line
// (e.g. comments) is not supported — the writers never produce it.
long pauxy_fcidump_fill(const char *buf, long len, long norb, int cplx,
                        double *h1e, double *eri, double *ecore) {
  const char *p = buf;
  const char *end = buf + len;
  long count = 0;
  while (true) {
    p = skip_ws(p, end);
    if (p >= end) break;
    double vr = 0.0, vi = 0.0;
    char *q = nullptr;
    if (cplx) {
      if (*p != '(') return -(long)(p - buf) - 1;
      ++p;
      vr = strtod(p, &q);
      if (q == p) return -(long)(p - buf) - 1;
      p = skip_ws(q, end);
      if (p < end && *p == ',') ++p;
      vi = strtod(p, &q);
      if (q == p) return -(long)(p - buf) - 1;
      p = skip_ws(q, end);
      if (p < end && *p == ')') ++p;
    } else {
      vr = strtod(p, &q);
      if (q == p) return -(long)(p - buf) - 1;
      p = q;
    }
    long ix[4];
    for (int t = 0; t < 4; ++t) {
      char *r = nullptr;
      ix[t] = strtol(p, &r, 10);
      if (r == p) return -(long)(p - buf) - 1;
      p = r;
    }
    const long i = ix[0], j = ix[1], k = ix[2], l = ix[3];
    const long s = cplx ? 2 : 1;
    if (i == 0 && j == 0 && k == 0 && l == 0) {
      ecore[0] = vr;
      if (cplx) ecore[1] = vi;
    } else if (k == 0 && l == 0) {
      // One-body: Hermitian fill (conjugate transpose element).
      long a = (i - 1) * norb + (j - 1), b = (j - 1) * norb + (i - 1);
      h1e[a * s] = vr;
      h1e[b * s] = vr;
      if (cplx) {
        h1e[a * s + 1] = vi;
        h1e[b * s + 1] = -vi;
      }
    } else {
      fill8(eri, norb, i - 1, j - 1, k - 1, l - 1, vr, vi, cplx != 0);
    }
    ++count;
  }
  return count;
}

}  // extern "C"
