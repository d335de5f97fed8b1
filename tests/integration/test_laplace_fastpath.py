"""Fast path vs the reference's FD formulation of the 2D Poisson
x⊗y⊗q⊗u0 problem (test_laplace FD callbacks expressed as a separated IR).

This pins the north-star claim (BASELINE.md): FD amplitudes from the
TPU-native solver match the reference-semantics solve to 1e-8 relative."""

import numpy as np
import pytest

from pgdrome_tpu import (
    IntervalMesh,
    FunctionSpace,
    interpolate,
    FD_matrices,
    SeparatedProblem,
    SeparatedPGD,
)
from tests.integration.test_laplace import create_meshes, create_PGD


class TestLaplaceFDFastPath:
    def test_amplitudes_match_reference_semantics(self):
        param = {"k": 0.5, "lx": 3, "ly": 3}
        ranges = [[0.0, 3.0], [0.0, 3.0], [0.0, 50.0], [10.0, 50.0]]
        elem = [30, 20, 50, 30]  # smaller than the full test; same physics
        meshes, vs = create_meshes(elem, [1, 1, 1, 1], ranges)

        # reference-parity orchestration (FD callbacks, test_laplace)
        pgd_fd, p = create_PGD(dict(param), vs, "FD")
        amps_compat = np.asarray(pgd_fd.problem.amplitude)

        # same problem as a separated IR
        k = param["k"]
        xs = [v.tabulate_dof_coordinates()[:, 0] for v in vs]
        M_x, D2_x, _ = FD_matrices(xs[0])
        M_y, D2_y, _ = FD_matrices(xs[1])
        M_q, _, _ = FD_matrices(xs[2])
        M_u, _, _ = FD_matrices(xs[3])

        ops = [
            np.stack([-k * D2_x, -k * M_x]),
            np.stack([M_y, D2_y]),
            np.stack([M_q, M_q]),
            np.stack([M_u, M_u]),
        ]
        # loads + BC lift (signs per the FD rhs callbacks,
        # test_laplace.py problem_assemble_rhs_FD)
        BC_x = interpolate(lambda x: 1.0 - x / 3.0, vs[0]).array
        BC_y = np.ones(len(xs[1]))
        BC_q = np.ones(len(xs[2]))
        BC_u = xs[3].copy()
        qx = interpolate(lambda x: np.where(x < 1.5, 1.0, 0.0), vs[0]).array
        qq = xs[2].copy()

        rhs = [
            np.stack([M_x @ qx, k * (D2_x @ BC_x), k * (M_x @ BC_x)]),
            np.stack([M_y @ np.ones(len(xs[1])), M_y @ BC_y, D2_y @ BC_y]),
            np.stack([M_q @ qq, M_q @ BC_q, M_q @ BC_q]),
            np.stack([M_u @ np.ones(len(xs[3])), M_u @ BC_u, M_u @ BC_u]),
        ]
        bc_idx = np.array(
            [np.where(xs[0] == 0)[0][0], np.where(xs[0] == 3.0)[0][0]]
        )
        sep = SeparatedProblem(
            ops=ops,
            rhs=rhs,
            mass=[M_x, M_y, M_q, M_u],
            bc_dofs=[bc_idx] + [np.array([], dtype=np.int64)] * 3,
        )
        res = SeparatedPGD(sep, n_max=7, tol=1e-10, tol_fp=1e-5).solve()

        n = min(len(amps_compat), len(res.amplitudes))
        print("compat:", amps_compat[:n], "fast:", res.amplitudes[:n])
        np.testing.assert_allclose(
            res.amplitudes[:n], amps_compat[:n], rtol=1e-8
        )
        # both converge in exactly 1 mode (reference test_laplace.py:970)
        assert res.n_modes == 1 or res.amplitudes[1] < 1e-8
