"""Model-layer extras: sensor responses, derivatives, reducers, latex export.

Covers reference model.py:862-953 (evaluate_sensor_response with caching),
model.py:1088-1412 (derivation fcts + derivative evaluation),
model.py:955-1086 (reducers) and model.py:1414-1453 (save_modes_latex)."""

import os
import tempfile
import unittest

import numpy as np

from pgdrome_tpu import IntervalMesh, FunctionSpace, interpolate
from pgdrome_tpu.model import PGD


def build_pgd():
    """u(x, p, E) = (x - x²)·p·E² + x·1·E  (rank 2, smooth factors)."""
    Vx = FunctionSpace(IntervalMesh(40, 0.0, 1.0), "P", 2)
    Vp = FunctionSpace(IntervalMesh(12, 0.0, 2.0), "P", 1)
    VE = FunctionSpace(IntervalMesh(16, 0.5, 1.5), "P", 2)

    modes = [
        [interpolate(lambda x: x - x**2, Vx), interpolate(lambda x: x, Vx)],
        [interpolate(lambda p: p, Vp), interpolate(lambda p: np.ones_like(p), Vp)],
        [interpolate(lambda E: E**2, VE), interpolate(lambda E: E, VE)],
    ]
    return (
        PGD(
            name="rank2",
            n_modes=2,
            fmeshes=[Vx.mesh(), Vp.mesh(), VE.mesh()],
            pgd_modes=modes,
            name_coord=["X", "P", "E"],
            modes_info=["U", "Node", "Scalar"],
        ),
        (Vx, Vp, VE),
    )


def exact(x, p, E):
    return (x - x**2) * p * E**2 + x * E


class TestSensorResponse(unittest.TestCase):
    def setUp(self):
        self.pgd, _ = build_pgd()
        self.p, self.E = 1.25, 0.8

    def test_sensor_points(self):
        pts = np.array([0.1, 0.35, 0.62, 0.97])
        vals = self.pgd.evaluate_sensor_response(0, [1, 2], [self.p, self.E], 0, pts)
        np.testing.assert_allclose(vals, exact(pts, self.p, self.E), atol=1e-12)

    def test_cache_hit(self):
        pts = np.array([0.25, 0.5])
        self.pgd.evaluate_sensor_response(0, [1, 2], [self.p, self.E], 0, pts)
        key = (pts.astype(np.float64).tobytes(), pts.shape, 0, 0, False)
        assert key in self.pgd._eval_fixed_modes
        # second call must reuse the cache (same object)
        cached = self.pgd._eval_fixed_modes[key]
        self.pgd.evaluate_sensor_response(0, [1, 2], [1.0, 1.0], 0, pts)
        assert self.pgd._eval_fixed_modes[key] is cached

    def test_cache_no_sum_collision(self):
        # the reference hashes by sum(points) (model.py:116) so [0.25, 0.5]
        # and [0.5, 0.25] collide; the rebuild's key must not
        a = np.array([0.25, 0.5])
        b = np.array([0.5, 0.25])
        va = self.pgd.evaluate_sensor_response(0, [1, 2], [self.p, self.E], 0, a)
        vb = self.pgd.evaluate_sensor_response(0, [1, 2], [self.p, self.E], 0, b)
        np.testing.assert_allclose(va, exact(a, self.p, self.E), atol=1e-12)
        np.testing.assert_allclose(vb, exact(b, self.p, self.E), atol=1e-12)

    def test_used_num_modes_truncation(self):
        pts = np.array([0.5])
        self.pgd.used_numModes = 1
        v1 = self.pgd.evaluate_sensor_response(0, [1, 2], [self.p, self.E], 0, pts)
        # rank-1 truncation: only first mode
        expected = (0.5 - 0.25) * self.p * self.E**2
        np.testing.assert_allclose(v1, [expected], atol=1e-12)
        self.pgd.used_numModes = 2


class TestDerivative(unittest.TestCase):
    def setUp(self):
        self.pgd, _ = build_pgd()
        self.p, self.E = 1.5, 1.2

    def test_create_derivation_fct(self):
        self.pgd.create_interpolation_fcts([1, 2], 0)
        self.pgd.create_derivation_fct([1, 2], 0)
        dfs = self.pgd.mesh[2].attributes[0].derivationfct
        assert len(dfs) == 2
        # d/dE of E² is 2E (P2 → exact), of E is 1
        self.assertAlmostEqual(dfs[0](0.9), 1.8, places=10)
        self.assertAlmostEqual(dfs[1](0.9), 1.0, places=10)

    def test_evaluate_derivative(self):
        # du/dE(x; p, E) = (x - x²)·p·2E + x
        du = self.pgd.evaluate_derivative(0, [1, 2], [self.p, self.E], 0, d_dim=2)
        xs = np.array([0.2, 0.5, 0.8])
        expected = (xs - xs**2) * self.p * 2 * self.E + xs
        np.testing.assert_allclose(du(xs), expected, atol=1e-12)

    def test_evaluate_derivative_sensor_response(self):
        pts = np.array([0.3, 0.7])
        dv = self.pgd.evaluate_derivative_sensor_response(
            0, [1, 2], [self.p, self.E], 0, 2, pts
        )
        expected = (pts - pts**2) * self.p * 2 * self.E + pts
        np.testing.assert_allclose(dv, expected, atol=1e-12)

    def test_derivative_against_fixed_dim(self):
        # the reference raises "not possible in the moment"
        # (model.py:1232); implemented here: du/dx(x; p, E) as a DG field
        du = self.pgd.evaluate_derivative(0, [1, 2], [self.p, self.E], 0, d_dim=0)
        xs = np.array([0.2, 0.5, 0.8])
        expected = (1 - 2 * xs) * self.p * self.E**2 + self.E
        np.testing.assert_allclose(du(xs), expected, atol=1e-12)
        # and the sensor-response variant
        dv = self.pgd.evaluate_derivative_sensor_response(
            0, [1, 2], [self.p, self.E], 0, 0, xs
        )
        np.testing.assert_allclose(dv, expected, atol=1e-12)


class TestReducers(unittest.TestCase):
    def setUp(self):
        self.pgd, _ = build_pgd()

    def test_min_max(self):
        p, E = 1.0, 1.0
        xs = self.pgd.mesh[0].attributes[0].interpolationfct[0].function_space()
        dof_x = xs.tabulate_dof_coordinates()[:, 0]
        vals = exact(dof_x, p, E)
        self.assertAlmostEqual(
            self.pgd.evaluate_max(0, [1, 2], [p, E], 0), vals.max(), places=10
        )
        self.assertAlmostEqual(
            self.pgd.evaluate_min(0, [1, 2], [p, E], 0), vals.min(), places=10
        )
        self.assertAlmostEqual(
            self.pgd.evaluate_max_abs(0, [1, 2], [p, E], 0),
            np.abs(vals).max(),
            places=10,
        )
        self.assertAlmostEqual(
            self.pgd.evaluate_min_abs(0, [1, 2], [p, E], 0),
            np.abs(vals).min(),
            places=10,
        )

    def test_abs_value_at_pos(self):
        self.pgd.pos = 0.5
        v = self.pgd.evaluate_abs_value(0, [1, 2], [1.0, 1.0], 0)
        self.assertAlmostEqual(v, abs(exact(0.5, 1.0, 1.0)), places=10)


class TestLatexExport(unittest.TestCase):
    def test_save_modes_latex(self):
        pgd, _ = build_pgd()
        with tempfile.TemporaryDirectory() as d:
            pgd.save_modes_latex(d, 0)
            files = os.listdir(d)
            assert len(files) == 3  # one per 1D coordinate
            data = np.loadtxt(os.path.join(d, sorted(files)[0]), delimiter=",")
            assert data.shape[1] == 3  # coords + 2 modes
            # coordinates sorted ascending
            assert np.all(np.diff(data[:, 0]) >= 0)


if __name__ == "__main__":
    unittest.main()


class TestReconstructTensor(unittest.TestCase):
    def test_full_tensor(self):
        pgd, (Vx, Vp, VE) = build_pgd()
        T = pgd.reconstruct_tensor(0)
        xs = pgd.mesh[0].dataX
        ps = pgd.mesh[1].dataX
        Es = pgd.mesh[2].dataX
        X, P, E = np.meshgrid(xs, ps, Es, indexing="ij")
        np.testing.assert_allclose(T, exact(X, P, E), atol=1e-12)


class TestInterp1DKinds(unittest.TestCase):
    def test_cubic_matches_scipy(self):
        from pgdrome_tpu.model import _Interp1D
        from scipy.interpolate import interp1d

        x = np.linspace(0.0, 1.0, 11)
        y = np.sin(2.0 * x) + x**3
        ours = _Interp1D(x, y, kind="cubic")
        ref = interp1d(x, y, kind="cubic")
        q = np.array([0.05, 0.33, 0.77, 1.0])
        np.testing.assert_allclose(ours(q), ref(q), rtol=1e-12)

    def test_quadratic_accepted(self):
        from pgdrome_tpu.model import _Interp1D

        x = np.linspace(0.0, 1.0, 9)
        f = _Interp1D(x, x**2, kind="quadratic")
        # quadratic spline reproduces a quadratic exactly
        np.testing.assert_allclose(f(np.array([0.21, 0.6])), [0.21**2, 0.36],
                                   rtol=1e-10)

    def test_unknown_kind_raises(self):
        from pgdrome_tpu.model import _Interp1D

        with self.assertRaises((ValueError, NotImplementedError)):
            _Interp1D(np.linspace(0, 1, 5), np.zeros(5), kind="nope")

    def test_out_of_range_still_raises(self):
        from pgdrome_tpu.model import _Interp1D

        f = _Interp1D(np.linspace(0, 1, 5), np.zeros(5), kind="cubic")
        with self.assertRaises(ValueError):
            f(1.5)


class TestVectorAttribute(unittest.TestCase):
    def test_vector_fill_and_pxdmf_pad(self):
        # vector fill_data (the branch the reference's missing-() bug
        # silenced, model.py:1529 — deliberately fixed here) and the
        # pxdmf pad-to-3D write for mixed mesh dims
        import shutil
        import tempfile
        import xml.etree.ElementTree as et

        from pgdrome_tpu import (
            IntervalMesh, RectangleMesh, Point, VectorFunctionSpace,
            FunctionSpace, interpolate,
        )
        from pgdrome_tpu.model import PGD

        mesh2 = RectangleMesh(Point(0, 0), Point(1, 1), 3, 3)
        V2 = VectorFunctionSpace(mesh2, "P", 1)
        mesh1 = IntervalMesh(6, 0.0, 1.0)
        V1 = FunctionSpace(mesh1, "P", 1)

        modes2 = [interpolate(
            lambda p: np.stack([p[..., 0], 2.0 * p[..., 1]], axis=-1), V2
        )]
        modes1 = [interpolate(lambda x: 1.0 + x, V1)]
        pgd = PGD(
            name="Vec", n_modes=1, fmeshes=[mesh2, mesh1],
            pgd_modes=[modes2, modes1], name_coord=["X", "P"],
            modes_info=["U", "Node", "Vector"],
        )
        att = pgd.mesh[0].attributes[0]
        self.assertEqual(att.data[0].shape, (mesh2.num_vertices(), 2))
        # component values at the vertices: (x, 2y)
        xy = mesh2.coordinates()
        np.testing.assert_allclose(att.data[0][:, 0], xy[:, 0], atol=1e-14)
        np.testing.assert_allclose(att.data[0][:, 1], 2 * xy[:, 1], atol=1e-14)

        folder = tempfile.mkdtemp()
        try:
            pgd.write_pxdmf(folder)
            # vector mode checkpoint round trip (io.py read vector branch)
            from pgdrome_tpu.io import read_modes_hdf5, write_hdf5

            write_hdf5(pgd, folder)
            Vr, fcts = read_modes_hdf5(
                os.path.join(folder, "PGD1_data.h5")
            )
            self.assertEqual(max(Vr.value_size, 1), 2)
            np.testing.assert_allclose(
                fcts[0].array, modes2[0].array, atol=1e-14
            )
            root = et.parse(os.path.join(folder, "Vec.pxdmf")).getroot()
            # the 2D vector attribute is padded to 3 components (ParaView
            # convention, reference model.py:310-345)
            attrs = [a for a in root.iter("Attribute")
                     if a.get("AttributeType") == "Vector"]
            self.assertTrue(attrs, "no vector attribute written")
            dims = attrs[0].find("DataItem").get("Dimensions").split()
            self.assertEqual(int(dims[-1]), 3)
        finally:
            shutil.rmtree(folder)
