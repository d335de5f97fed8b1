"""PGD on a FOREIGN unstructured triangle mesh, end to end: load the
checked-in fixture (written by scripts/make_unstructured_fixture.py with
no mesh_class tag — the layout an external tool would produce), evaluate
its modes, then solve a parametric diffusion PGD problem ON the loaded
mesh and verify vs per-sample f64 FEM.

Closes the last reference capability gap (VERDICT r3 missing #1): the
reference ingests arbitrary dolfin meshes from `_data.h5`
(reference model.py:450-461, 641-714).
"""

import os

import numpy as np
import pytest

from pgdrome_tpu.fem.mesh import SimplicialMesh
from pgdrome_tpu.fem.space import FunctionSpace
from pgdrome_tpu.fem.assembly import mass_matrix, stiffness_matrix, load_vector
from pgdrome_tpu.fem.bc import DirichletBC
from pgdrome_tpu.fem.interpolate import eval_dofs_at_points
from pgdrome_tpu import io as pio
from pgdrome_tpu.fem.mesh import IntervalMesh
from pgdrome_tpu.separated import SeparatedProblem, SeparatedPGD, evaluate_modes_1d

FIXTURE = os.path.join(
    os.path.dirname(__file__), "..", "fixtures", "unstructured_tri",
    "Unstr_data.h5",
)


@pytest.fixture(scope="module")
def loaded():
    V, fcts = pio.read_modes_hdf5(FIXTURE)
    return V, fcts


class TestFixtureIngest:
    def test_mesh_is_simplicial(self, loaded):
        V, fcts = loaded
        assert isinstance(V.mesh(), SimplicialMesh)
        assert V.mesh().num_vertices() == 58
        assert V.mesh().num_cells() == 90
        assert len(fcts) == 2

    def test_modes_match_analytic_at_vertices(self, loaded):
        V, fcts = loaded
        xy = V.mesh().coordinates()
        np.testing.assert_allclose(
            fcts[0].array,
            xy[:, 0] * (1 - xy[:, 0]) * xy[:, 1] * (1 - xy[:, 1]),
            atol=1e-12,
        )
        np.testing.assert_allclose(
            fcts[1].array, np.sin(np.pi * xy[:, 0]) * xy[:, 1], atol=1e-12
        )

    def test_point_evaluation_on_loaded_mesh(self, loaded):
        V, fcts = loaded
        rng = np.random.default_rng(0)
        pts = np.stack(
            [rng.uniform(0.05, 0.95, 200), rng.uniform(0.05, 0.95, 200)],
            axis=1,
        )
        vals = eval_dofs_at_points(V, fcts[1].array, pts)
        # P1 interpolation of a smooth function on an h~0.17 mesh
        exact = np.sin(np.pi * pts[:, 0]) * pts[:, 1]
        assert np.abs(np.asarray(vals) - exact).max() < 0.05


class TestPGDOnForeignMesh:
    @pytest.fixture(scope="class")
    def solved(self, loaded):
        V, _ = loaded
        mesh = V.mesh()
        Vp = FunctionSpace(IntervalMesh(16, 0.0, 1.0), "P", 1)

        def w(pts):
            return (
                np.sin(np.pi * pts[..., 0]) ** 2
                * np.sin(np.pi * pts[..., 1]) ** 2
                / 2.0
            )

        K0 = stiffness_matrix(V)
        Kw = stiffness_matrix(V, weight=w)
        Mp = mass_matrix(Vp)
        Mp_l = np.diag(Mp.sum(axis=1))
        Mpw_l = np.diag(mass_matrix(Vp, weight=lambda p: p).sum(axis=1))
        b_x = load_vector(V, lambda x: np.ones(x.shape[:-1]))
        b_p = load_vector(Vp, lambda p: np.ones_like(p))
        bc = DirichletBC(V, 0.0)  # topological boundary
        sep = SeparatedProblem(
            ops=[np.stack([K0, Kw]), np.stack([Mp_l, Mpw_l])],
            rhs=[b_x[None, :], b_p[None, :]],
            mass=[mass_matrix(V), Mp],
            bc_dofs=[bc.dofs, np.array([], dtype=np.int64)],
        )
        res = SeparatedPGD(
            sep, n_max=16, tol=1e-12, tol_fp=1e-7, dtype=np.float64
        ).solve()
        return V, Vp, res, w, b_x, bc

    def test_verified_vs_per_sample_fem(self, solved):
        V, Vp, res, w, b_x, bc = solved
        grid = Vp.tabulate_dof_coordinates()[:, 0]
        free = np.setdiff1d(np.arange(V.dim()), bc.dofs)
        samples = np.concatenate([[grid[1], grid[-2]],
                                  grid[[3, 7, 11]]])
        errs = []
        for p in samples:
            K = stiffness_matrix(
                V, weight=lambda pts: 1.0 + p * w(pts)
            )
            u_ref = np.zeros(V.dim())
            u_ref[free] = np.linalg.solve(K[np.ix_(free, free)], b_x[free])
            fac = np.asarray(
                evaluate_modes_1d(Vp, res.modes[1], np.asarray([p]), xp=np)
            )[0][: res.n_modes]
            u = fac @ np.asarray(res.modes[0])[: res.n_modes]
            errs.append(
                np.linalg.norm(u - u_ref) / np.linalg.norm(u_ref)
            )
        print("foreign-mesh PGD errors:", errs)
        assert max(errs) < 1e-6

    def test_serving_on_foreign_mesh(self, solved):
        from pgdrome_tpu.serving import Vademecum

        V, Vp, res, *_ = solved
        vd = Vademecum([V, Vp], res, dtype=np.float64, method="xla")
        samples = np.array([[0.25], [0.75]])
        fields = np.asarray(vd.fields(samples))
        assert fields.shape == (2, V.dim())
        # sensors at points on the unstructured mesh (bucketed locate
        # under jit)
        sens = vd.sensors(np.array([[0.5, 0.5], [0.3, 0.7]]))
        resp = np.asarray(sens(samples))
        expected = np.asarray(
            eval_dofs_at_points(
                V, fields[0], np.array([[0.5, 0.5], [0.3, 0.7]])
            )
        )
        np.testing.assert_allclose(resp[0], expected, rtol=1e-9)
