"""Native C++ host kernels vs numpy references (ctypes bindings)."""

import numpy as np

from pgdrome_tpu.utils import native
from pgdrome_tpu.ops.fd import FD_matrices


class TestNative:
    def test_library_builds(self):
        # the image has g++; the library must load (or be built on demand)
        assert native.available()

    def test_scatter_add_dense(self):
        rng = np.random.default_rng(0)
        n, nnz = 50, 400
        rows = rng.integers(0, n, nnz)
        cols = rng.integers(0, n, nnz)
        vals = rng.normal(size=nnz)
        A1 = np.zeros((n, n))
        native.scatter_add_dense(A1, rows, cols, vals)
        A2 = np.zeros((n, n))
        np.add.at(A2, (rows, cols), vals)
        np.testing.assert_allclose(A1, A2, atol=1e-14)

    def test_scatter_add_vector(self):
        rng = np.random.default_rng(1)
        b1 = np.zeros(30)
        idx = rng.integers(0, 30, 100)
        vals = rng.normal(size=100)
        native.scatter_add_vector(b1, idx, vals)
        b2 = np.zeros(30)
        np.add.at(b2, idx, vals)
        np.testing.assert_allclose(b1, b2, atol=1e-14)

    def test_thomas(self):
        rng = np.random.default_rng(2)
        n = 40
        d = 4.0 + rng.random(n)
        dl = rng.random(n)
        du = rng.random(n)
        A = np.diag(d) + np.diag(dl[1:], -1) + np.diag(du[:-1], 1)
        b = rng.normal(size=n)
        x = native.thomas_solve(dl, d, du, b)
        np.testing.assert_allclose(A @ x, b, atol=1e-10)

    def test_fd_matrices_match(self):
        x = np.sort(np.random.default_rng(3).random(25))
        M1, D21, D11 = native.fd_matrices(x)
        M2, D22, D12 = FD_matrices(x)
        np.testing.assert_allclose(M1, np.asarray(M2), atol=1e-14)
        np.testing.assert_allclose(D21, np.asarray(D22), atol=1e-12)
        np.testing.assert_allclose(D11, np.asarray(D12), atol=1e-12)
