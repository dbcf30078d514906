// Minimal Armadillo-compatible shim: just enough of mat/cx_mat for the
// reference MDQT programs (small dense matrices, naive arithmetic).
// Used ONLY to compile the reference for cross-validation data.
#pragma once
#include <complex>
#include <cstring>
#include <cstdio>
#include <vector>

namespace arma {

namespace fill {
struct eye_t {};
struct zeros_t {};
static const eye_t eye{};
static const zeros_t zeros{};
}  // namespace fill

class mat {
 public:
  int nr = 0, nc = 0;
  std::vector<double> d;
  mat() {}
  mat(int r, int c) : nr(r), nc(c), d((size_t)r * c, 0.0) {}
  mat(int r, int c, fill::zeros_t) : mat(r, c) {}
  mat(int r, int c, fill::eye_t) : mat(r, c) {
    for (int i = 0; i < r && i < c; i++) (*this)(i, i) = 1.0;
  }
  double &operator()(int i, int j) { return d[(size_t)i * nc + j]; }
  double operator()(int i, int j) const { return d[(size_t)i * nc + j]; }
  mat col(int j) const {
    mat out(nr, 1);
    for (int i = 0; i < nr; i++) out(i, 0) = (*this)(i, j);
    return out;
  }
  mat t() const {
    mat out(nc, nr);
    for (int i = 0; i < nr; i++)
      for (int j = 0; j < nc; j++) out(j, i) = (*this)(i, j);
    return out;
  }
};

inline mat operator+(const mat &a, const mat &b) {
  mat o(a.nr, a.nc);
  for (size_t k = 0; k < a.d.size(); k++) o.d[k] = a.d[k] + b.d[k];
  return o;
}
inline mat operator-(const mat &a, const mat &b) {
  mat o(a.nr, a.nc);
  for (size_t k = 0; k < a.d.size(); k++) o.d[k] = a.d[k] - b.d[k];
  return o;
}
inline mat operator*(double s, const mat &a) {
  mat o = a;
  for (auto &v : o.d) v *= s;
  return o;
}
inline mat operator*(const mat &a, double s) { return s * a; }
inline mat operator*(const mat &a, const mat &b) {
  mat o(a.nr, b.nc);
  for (int i = 0; i < a.nr; i++)
    for (int k = 0; k < a.nc; k++) {
      double av = a(i, k);
      if (av == 0.0) continue;
      for (int j = 0; j < b.nc; j++) o(i, j) += av * b(k, j);
    }
  return o;
}

class cx_mat {
 public:
  int nr = 0, nc = 0;
  std::vector<std::complex<double>> d;
  cx_mat() {}
  cx_mat(int r, int c) : nr(r), nc(c), d((size_t)r * c, 0.0) {}
  cx_mat(const mat &re, const mat &im) : nr(re.nr), nc(re.nc),
        d((size_t)re.nr * re.nc) {
    for (size_t k = 0; k < d.size(); k++) d[k] = {re.d[k], im.d[k]};
  }
  // implicit promotion from real mat
  cx_mat(const mat &re) : nr(re.nr), nc(re.nc), d((size_t)re.nr * re.nc) {
    for (size_t k = 0; k < d.size(); k++) d[k] = {re.d[k], 0.0};
  }
  std::complex<double> &operator()(int i, int j) {
    return d[(size_t)i * nc + j];
  }
  std::complex<double> operator()(int i, int j) const {
    return d[(size_t)i * nc + j];
  }
  void zeros() { for (auto &v : d) v = 0.0; }
  cx_mat t() const {  // conjugate transpose
    cx_mat out(nc, nr);
    for (int i = 0; i < nr; i++)
      for (int j = 0; j < nc; j++) out(j, i) = std::conj((*this)(i, j));
    return out;
  }
  void print(const char *name = "") const {
    std::printf("%s\n", name);
    for (int i = 0; i < nr; i++) {
      for (int j = 0; j < nc; j++) {
        auto v = (*this)(i, j);
        std::printf("(%g,%g) ", v.real(), v.imag());
      }
      std::printf("\n");
    }
  }
};

inline cx_mat &operator+=(cx_mat &a, const cx_mat &b) {
  for (size_t k = 0; k < a.d.size(); k++) a.d[k] += b.d[k];
  return a;
}
inline cx_mat operator+(const cx_mat &a, const cx_mat &b) {
  cx_mat o(a.nr, a.nc);
  for (size_t k = 0; k < a.d.size(); k++) o.d[k] = a.d[k] + b.d[k];
  return o;
}
inline cx_mat operator-(const cx_mat &a, const cx_mat &b) {
  cx_mat o(a.nr, a.nc);
  for (size_t k = 0; k < a.d.size(); k++) o.d[k] = a.d[k] - b.d[k];
  return o;
}
template <typename S>
inline cx_mat operator*(const S &s, const cx_mat &a) {
  cx_mat o = a;
  for (auto &v : o.d) v = std::complex<double>(s) * v;
  return o;
}
inline cx_mat operator*(const cx_mat &a, double s) {
  cx_mat o = a;
  for (auto &v : o.d) v *= s;
  return o;
}
inline cx_mat operator*(const cx_mat &a, std::complex<double> s) {
  cx_mat o = a;
  for (auto &v : o.d) v *= s;
  return o;
}
inline cx_mat operator/(const cx_mat &a, double s) {
  cx_mat o = a;
  for (auto &v : o.d) v /= s;
  return o;
}
inline cx_mat operator*(const cx_mat &a, const cx_mat &b) {
  cx_mat o(a.nr, b.nc);
  for (int i = 0; i < a.nr; i++)
    for (int k = 0; k < a.nc; k++) {
      std::complex<double> av = a(i, k);
      if (av == std::complex<double>(0.0)) continue;
      for (int j = 0; j < b.nc; j++) o(i, j) += av * b(k, j);
    }
  return o;
}
// mixed real/complex products
inline cx_mat operator*(const mat &a, const cx_mat &b) { return cx_mat(a) * b; }
inline cx_mat operator*(const cx_mat &a, const mat &b) { return a * cx_mat(b); }
inline cx_mat operator+(const mat &a, const cx_mat &b) { return cx_mat(a) + b; }
inline cx_mat operator-(const mat &a, const cx_mat &b) { return cx_mat(a) - b; }

}  // namespace arma
