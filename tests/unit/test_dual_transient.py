"""Exact rhs-parametric output surrogate (dual.rhs_parametric_qoi).

For the moving-heat-source family the operator is parameter-free, so
s(p) = zᵀ b(p) is EXACT: against the space-time FOM driven by the same
separated source the closed form must match to f64 machine precision
(this pins the whole algebra — adjoint solve, kron bc rows, weight
reduction, pointwise-coefficient recovery); against the TRUE Gaussian
source the error must sit at the source-separation floor."""

import numpy as np
import pytest

from pgdrome_tpu.dual import rhs_parametric_qoi
from pgdrome_tpu.models.problems import moving_heat_source


@pytest.fixture(scope="module")
def problem():
    # rank 256 puts the separation floor at ~3e-5 on this grid (rank 96
    # sits at 1.3e-2); exactness vs the separated-source FOM holds at
    # any rank, the true-source floor test needs the tight one
    return moving_heat_source(n_x=48, n_t=40, n_P=8, n_v=10,
                              source_rank=256, separation="hierarchical",
                              separation_tol=1e-9)


def _fom_lu(sep):
    from scipy import sparse as sps
    from scipy.sparse import linalg as spla

    nx, nt = sep.sizes[0], sep.sizes[1]
    ops0 = np.asarray(sep.ops[0], dtype=np.float64)
    ops1 = np.asarray(sep.ops[1], dtype=np.float64)
    A = sum(sps.kron(sps.csr_matrix(ops0[t]), sps.csr_matrix(ops1[t]))
            for t in range(ops0.shape[0])).tolil()
    ic = [ix * nt for ix in range(nx)]
    for rr in ic:
        A.rows[rr] = [rr]
        A.data[rr] = [1.0]
    return spla.splu(A.tocsr().tocsc()), ic


class TestExactness:
    def test_matches_separated_source_fom_to_machine(self, problem):
        sep, Vs, factors, sep_err = problem
        sensors = [(0.55, 0.8), (0.3, 0.5)]
        qoi = rhs_parametric_qoi(sep, Vs, sensors)

        lu, ic = _fom_lu(sep)
        nx, nt = sep.sizes[0], sep.sizes[1]
        Mx = np.asarray(sep.mass[0], dtype=np.float64)
        Mt = np.asarray(sep.ops[1][1], dtype=np.float64)
        MxF = np.asarray(factors[0], dtype=np.float64) @ Mx.T
        MtF = np.asarray(factors[1], dtype=np.float64) @ Mt.T
        P_grid = Vs[2].tabulate_dof_coordinates()[:, 0]
        v_grid = Vs[3].tabulate_dof_coordinates()[:, 0]

        from pgdrome_tpu.dual import point_functional

        ls = [np.kron(point_functional(Vs[0], x0),
                      point_functional(Vs[1], t0))
              for x0, t0 in sensors]
        rng = np.random.default_rng(5)
        pairs = [(0, 0), (7, 9)] + [
            (int(rng.integers(0, 8)), int(rng.integers(0, 10)))
            for _ in range(6)]
        samples = np.array([[P_grid[ip], v_grid[iv]] for ip, iv in pairs])
        s = qoi(samples)

        scale = np.abs(s).max()
        for k, (ip, iv) in enumerate(pairs):
            w = P_grid[ip] * np.asarray(factors[2], dtype=np.float64)[:, iv]
            b = np.einsum("r,ri,rj->ij", w, MxF, MtF).ravel()
            b[ic] = 0.0
            u = lu.solve(b)
            for j, l in enumerate(ls):
                assert abs(s[k, j] - l @ u) < 1e-12 * scale

    def test_true_source_error_is_separation_floor(self, problem):
        sep, Vs, factors, sep_err = problem
        qoi = rhs_parametric_qoi(sep, Vs, [(0.55, 0.8)])

        lu, ic = _fom_lu(sep)
        nx, nt = sep.sizes[0], sep.sizes[1]
        Mx = np.asarray(sep.mass[0], dtype=np.float64)
        Mt = np.asarray(sep.ops[1][1], dtype=np.float64)
        x = Vs[0].tabulate_dof_coordinates()[:, 0]
        t = Vs[1].tabulate_dof_coordinates()[:, 0]
        P_grid = Vs[2].tabulate_dof_coordinates()[:, 0]
        v_grid = Vs[3].tabulate_dof_coordinates()[:, 0]

        from pgdrome_tpu.dual import point_functional

        l = np.kron(point_functional(Vs[0], 0.55),
                    point_functional(Vs[1], 0.8))
        errs, scale = [], []
        for ip, iv in [(0, 0), (7, 9), (3, 5)]:
            g = np.exp(-((x[:, None] - 0.15 - v_grid[iv] * t[None, :]) ** 2)
                       / 0.08 ** 2)
            b = P_grid[ip] * (Mx @ g @ Mt.T).ravel()
            b[ic] = 0.0
            s_true = l @ lu.solve(b)
            s = qoi([[P_grid[ip], v_grid[iv]]])[0, 0]
            errs.append(abs(s - s_true))
            scale.append(abs(s_true))
        # vs the TRUE source the only error is the source separation —
        # and the OUTPUT sits well BELOW the field-level floor (the
        # solve + sensor smooth the separation error: measured ~1.1e-6
        # relative at sep_err 3.1e-5 on this grid)
        rel = max(errs) / max(scale)
        assert rel < max(sep_err, 1e-12)       # beats the field floor
        assert rel < 3e-6                      # measured 1.1e-6, 3x slack
        assert rel > 1e-10                     # and it IS the floor, not eps


class TestValidationAndShape:
    def test_parametric_operator_rejected(self):
        from pgdrome_tpu.models.problems import parametric_elliptic

        sep, Vs = parametric_elliptic(n_x=24, n_p=8, num_params=2)
        with pytest.raises(ValueError, match="parameter-dependent"):
            rhs_parametric_qoi(sep, Vs, [(0.5,)], fixed_dims=(0,))

    def test_sensor_coordinate_count_checked(self, problem):
        sep, Vs, _, _ = problem
        with pytest.raises(ValueError, match="one coordinate per"):
            rhs_parametric_qoi(sep, Vs, [(0.5,)])

    def test_sample_column_count_checked(self, problem):
        sep, Vs, _, _ = problem
        qoi = rhs_parametric_qoi(sep, Vs, [(0.5, 0.5)])
        with pytest.raises(ValueError, match="columns"):
            qoi(np.ones((3, 3)))

    def test_weights_shape(self, problem):
        sep, Vs, factors, _ = problem
        qoi = rhs_parametric_qoi(sep, Vs, [(0.5, 0.5), (0.2, 0.9)])
        R = np.asarray(factors[0]).shape[0]
        assert qoi.weights.shape == (2, R)
        assert qoi([[0.7, 0.7], [0.6, 0.9]]).shape == (2, 2)
