// pgdrome_tpu native host kernels.
//
// The TPU compute path is JAX/XLA (see pgdrome_tpu/separated.py); these
// C++ kernels cover the host-side runtime work the reference delegates to
// DOLFIN's C++ core (SURVEY.md §2.3): FEM assembly scatter-add (numpy's
// np.add.at is an order of magnitude slower), the tridiagonal (Thomas)
// solve used by host-side FD paths, and the non-uniform FD operator
// builder.  Bound via ctypes (pgdrome_tpu/native.py) with pure-numpy
// fallbacks, so the framework works without a compiler.

#include <cstdint>
#include <cstring>

extern "C" {

// Dense scatter-add: A[rows[k], cols[k]] += vals[k]  (A is n x n, C order)
void scatter_add_dense(double* A, int64_t n, const int64_t* rows,
                       const int64_t* cols, const double* vals, int64_t nnz) {
    for (int64_t k = 0; k < nnz; ++k) {
        A[rows[k] * n + cols[k]] += vals[k];
    }
}

// Vector scatter-add: b[idx[k]] += vals[k]
void scatter_add_vector(double* b, const int64_t* idx, const double* vals,
                        int64_t nnz) {
    for (int64_t k = 0; k < nnz; ++k) {
        b[idx[k]] += vals[k];
    }
}

// Thomas algorithm for a tridiagonal system; dl/d/du of length n
// (dl[0], du[n-1] unused).  Overwrites x with the solution.  Returns 0 on
// success, 1 on zero pivot.
int thomas_solve(const double* dl, const double* d, const double* du,
                 const double* b, double* x, int64_t n) {
    if (n <= 0) return 1;
    double* cp = new double[n];
    double* dp = new double[n];
    if (d[0] == 0.0) { delete[] cp; delete[] dp; return 1; }
    cp[0] = du[0] / d[0];
    dp[0] = b[0] / d[0];
    for (int64_t i = 1; i < n; ++i) {
        double m = d[i] - dl[i] * cp[i - 1];
        if (m == 0.0) { delete[] cp; delete[] dp; return 1; }
        cp[i] = du[i] / m;
        dp[i] = (b[i] - dl[i] * dp[i - 1]) / m;
    }
    x[n - 1] = dp[n - 1];
    for (int64_t i = n - 2; i >= 0; --i) {
        x[i] = dp[i] - cp[i] * x[i + 1];
    }
    delete[] cp;
    delete[] dp;
    return 0;
}

// Non-uniform FD operators (reference pgdrome/solver.py:947-988 semantics):
// lumped trapezoid mass M, mass-weighted 3-point second derivative D2,
// mass-weighted upwind first derivative D1.  All dense n x n, zeroed first.
void fd_matrices(const double* xg, int64_t n, double* M, double* D2,
                 double* D1) {
    std::memset(M, 0, sizeof(double) * n * n);
    std::memset(D2, 0, sizeof(double) * n * n);
    std::memset(D1, 0, sizeof(double) * n * n);
    if (n < 2) return;
    auto at = [n](double* A, int64_t i, int64_t j) -> double& {
        return A[i * n + j];
    };
    double h0 = xg[1] - xg[0];
    at(M, 0, 0) = h0 / 2;
    at(D2, 0, 0) = -1.0 / h0;
    at(D2, 0, 1) = 1.0 / h0;
    at(D1, 0, 0) = -0.5;
    at(D1, 0, 1) = 0.5;
    for (int64_t i = 1; i < n - 1; ++i) {
        double hp = xg[i + 1] - xg[i];
        double hm = xg[i] - xg[i - 1];
        at(M, i, i) = (hp + hm) / 2;
        at(D2, i, i) = -(hp + hm) / (hp * hm);
        at(D2, i, i + 1) = 1.0 / hp;
        at(D2, i, i - 1) = 1.0 / hm;
        at(D1, i, i) = (hp + hm) / (2 * hm);
        at(D1, i, i - 1) = -(hp + hm) / (2 * hm);
    }
    double hm = xg[n - 1] - xg[n - 2];
    at(M, n - 1, n - 1) = hm / 2;
    at(D2, n - 1, n - 1) = -1.0 / hm;
    at(D2, n - 1, n - 2) = 1.0 / hm;
    at(D1, n - 1, n - 1) = 1.0;
    at(D1, n - 1, n - 2) = -1.0;
}

}  // extern "C"
