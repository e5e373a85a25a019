// Dense-tableau simplex LP solver for the hap-graph flow problem.
//
// Native fallback for environments without scipy: solves
//   min 1.t   s.t.   t >= |x - a|,  C x = 0,  x, t >= 0
// (the LP of solve_flow.rs:195-291). Problems are tiny (edges ~ blocks *
// ploidy^2), so a Big-M dense tableau with Bland's rule (deterministic,
// cycle-free) is plenty.

#include <cstdint>
#include <cstring>
#include <vector>
#include <cmath>

namespace {

constexpr double kEps = 1e-9;

// Standard-form: min c.z  s.t. A z = b, z >= 0, via Big-M tableau.
// Returns 0 on success and fills z (length nv).
int solve_standard(int m, int nv, const std::vector<double>& A,
                   const std::vector<double>& b,
                   const std::vector<double>& c, double big_m,
                   std::vector<double>& z) {
    int width = nv + m;  // variables + artificials
    std::vector<double> T(static_cast<size_t>(m + 1) * (width + 1), 0.0);
    auto at = [&](int r, int col) -> double& {
        return T[static_cast<size_t>(r) * (width + 1) + col];
    };
    std::vector<int> basis(m);
    for (int r = 0; r < m; ++r) {
        double rowsign = b[r] < 0 ? -1.0 : 1.0;
        for (int j = 0; j < nv; ++j)
            at(r, j) = rowsign * A[static_cast<size_t>(r) * nv + j];
        at(r, nv + r) = 1.0;
        at(r, width) = rowsign * b[r];
        basis[r] = nv + r;
    }
    for (int j = 0; j < nv; ++j) at(m, j) = c[j];
    for (int r = 0; r < m; ++r) at(m, nv + r) = big_m;
    // Price out artificials.
    for (int r = 0; r < m; ++r)
        for (int j = 0; j <= width; ++j) at(m, j) -= big_m * at(r, j);

    for (int iter = 0; iter < 200000; ++iter) {
        int enter = -1;  // Bland: smallest index with negative cost
        for (int j = 0; j < width; ++j) {
            if (at(m, j) < -kEps) { enter = j; break; }
        }
        if (enter < 0) break;  // optimal
        int leave = -1;
        double best = 0.0;
        for (int r = 0; r < m; ++r) {
            double a = at(r, enter);
            if (a > kEps) {
                double ratio = at(r, width) / a;
                if (leave < 0 || ratio < best - kEps ||
                    (std::fabs(ratio - best) <= kEps &&
                     basis[r] < basis[leave])) {
                    leave = r;
                    best = ratio;
                }
            }
        }
        if (leave < 0) return 1;  // unbounded
        double piv = at(leave, enter);
        for (int j = 0; j <= width; ++j) at(leave, j) /= piv;
        for (int r = 0; r <= m; ++r) {
            if (r == leave) continue;
            double f = at(r, enter);
            if (std::fabs(f) > 0) {
                for (int j = 0; j <= width; ++j)
                    at(r, j) -= f * at(leave, j);
            }
        }
        basis[leave] = enter;
    }
    z.assign(nv, 0.0);
    for (int r = 0; r < m; ++r)
        if (basis[r] < nv) z[basis[r]] = at(r, width);
    return 0;
}

}  // namespace

extern "C" {

// E edges with target weights ae[E]; ncons conservation rows over x given
// row-major cons[ncons * E]. Writes flows x[E]. Returns 0 on success.
int floria_solve_flow(int32_t E, const double* ae, int32_t ncons,
                      const double* cons, double* x_out) {
    // Variables: x[E], t[E], s1[E], s2[E] (surplus for the two abs rows).
    //   t - x + s1 = -a  ->  x - t - s1 = a   (t >= x - a ... )
    // Rows: x_e - t_e + s1_e = a_e? Derive:
    //   t >= a - x  ->  t + x - s1 = a, s1 >= 0
    //   t >= x - a  ->  t - x + s2 = -a -> x - t - s2 = a ... careful sign
    // Use: (1) t + x - s1 = a ; (2) x - t + ... no: t - x >= -a
    //      -> t - x + a >= 0 -> t - x - s2 = -a with s2 >= 0.
    int nv = 4 * E;
    int m = 2 * E + ncons;
    std::vector<double> A(static_cast<size_t>(m) * nv, 0.0);
    std::vector<double> b(m, 0.0);
    std::vector<double> c(nv, 0.0);
    for (int e = 0; e < E; ++e) c[E + e] = 1.0;  // sum t
    auto arow = [&](int r) { return A.begin() + static_cast<size_t>(r) * nv; };
    for (int e = 0; e < E; ++e) {
        // t + x - s1 = a
        auto r1 = arow(e);
        r1[e] = 1.0; r1[E + e] = 1.0; r1[2 * E + e] = -1.0;
        b[e] = ae[e];
        // t - x - s2 = -a
        auto r2 = arow(E + e);
        r2[e] = -1.0; r2[E + e] = 1.0; r2[3 * E + e] = -1.0;
        b[E + e] = -ae[e];
    }
    for (int k = 0; k < ncons; ++k) {
        auto r = arow(2 * E + k);
        for (int e = 0; e < E; ++e)
            r[e] = cons[static_cast<size_t>(k) * E + e];
        b[2 * E + k] = 0.0;
    }
    double big_m = 0.0;
    for (int e = 0; e < E; ++e) big_m = std::max(big_m, std::fabs(ae[e]));
    big_m = (big_m + 1.0) * 1000.0;
    std::vector<double> z;
    int rc = solve_standard(m, nv, A, b, c, big_m, z);
    if (rc != 0) return rc;
    for (int e = 0; e < E; ++e) x_out[e] = z[e];
    return 0;
}

}  // extern "C"
