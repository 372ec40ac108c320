// Weibull meta-recognition for open-set action recognition.
//
// Native counterpart of the reference's libMR
// (InternVideo1/Downstream/Open-Set-Action-Recognition/experiments/libMR/:
// MetaRecognition.cpp + weibull.c): fit a 2-parameter Weibull to the tail
// of a score/distance distribution by maximum likelihood (Newton iterations
// on the shape parameter's profile-likelihood equation), then evaluate the
// CDF as the "probability of outlier-ness" (w_score). Numerical host-side
// MLE — not a device op.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

// Solve for shape k:  f(k) = sum(x^k ln x)/sum(x^k) - 1/k - mean(ln x) = 0
// via Newton's method; scale follows in closed form.
bool weibull_mle(const double* x, int n, double* shape, double* scale) {
  if (n < 2) return false;
  double mean_ln = 0.0;
  for (int i = 0; i < n; ++i) {
    if (x[i] <= 0.0) return false;
    mean_ln += std::log(x[i]);
  }
  mean_ln /= n;

  double k = 1.0;
  for (int iter = 0; iter < 100; ++iter) {
    double a = 0.0, b = 0.0, c = 0.0;  // sum x^k ln x, sum x^k, sum x^k ln^2 x
    for (int i = 0; i < n; ++i) {
      double lx = std::log(x[i]);
      double xk = std::pow(x[i], k);
      a += xk * lx;
      b += xk;
      c += xk * lx * lx;
    }
    double f = a / b - 1.0 / k - mean_ln;
    double fp = (c * b - a * a) / (b * b) + 1.0 / (k * k);
    double step = f / fp;
    k -= step;
    if (k <= 0.0) k = 1e-6;
    if (std::fabs(step) < 1e-10) break;
  }
  double b = 0.0;
  for (int i = 0; i < n; ++i) b += std::pow(x[i], k);
  *shape = k;
  *scale = std::pow(b / n, 1.0 / k);
  return std::isfinite(k) && std::isfinite(*scale);
}

}  // namespace

extern "C" {

// Fit the Weibull to the `tail_size` largest values (fit_high semantics:
// extreme-value tail of max-distances). Returns 1 on success.
int mr_fit_high(const double* data, int n, int tail_size,
                double* shape, double* scale, double* translate) {
  std::vector<double> v(data, data + n);
  std::sort(v.begin(), v.end());
  int m = std::min(tail_size, n);
  std::vector<double> tail(v.end() - m, v.end());
  // translate so the tail is strictly positive (libMR's translate_amount)
  double lo = tail.front();
  double t = lo <= 0.0 ? 1.0 - lo : 0.0;
  for (auto& e : tail) e += t;
  *translate = t;
  return weibull_mle(tail.data(), m, shape, scale) ? 1 : 0;
}

// Weibull CDF at (x + translate): probability that x is at or beyond the
// fitted extreme tail (w_score).
void mr_w_score(const double* x, int n, double shape, double scale,
                double translate, double* out) {
  for (int i = 0; i < n; ++i) {
    double v = x[i] + translate;
    out[i] = v <= 0.0
                 ? 0.0
                 : 1.0 - std::exp(-std::pow(v / scale, shape));
  }
}

}  // extern "C"
