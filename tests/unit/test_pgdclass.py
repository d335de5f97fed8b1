"""PGD container built by hand from numpy arrays (no FE backend).

Mirrors reference tests/unit/test_pgdclass.py: analytic separated modes of a
truss problem u(x,E,L), checked via evaluate / evaluate_min/max and
out-of-range error handling.  Demonstrates the container is decoupled from
the FEM layer (a property the reference deliberately preserves)."""

import unittest
import numpy as np

from pgdrome_tpu.model import PGD, PGDAttribute, PGDMesh, PGDErrorComputation


class u_analytic:
    # u = 1/(2*EA) (lae*x - x²) * L*n
    def __init__(self, x=[], p={}):
        self.x = x
        self.param = p

    def __call__(self, values):
        E, L = values[0], values[1]
        return (
            0.5
            / (self.param["A"] * E)
            * (self.param["lae"] * self.x - self.x**2)
            * L
            * self.param["n"]
        )


class sig_analytic:
    def __init__(self, x=[], p={}):
        self.x = x
        self.param = p

    def __call__(self, values):
        E, L = values[0], values[1]
        return (
            0.5 / self.param["A"] * (self.param["lae"] - 2 * self.x) * L * self.param["n"]
        )


def mode_UX(x, p):
    return 1.0 / (2.0 * p["A"]) * (p["lae"] * x - x**2)


def mode_UE(E, p):
    return 1.0 / E


def mode_UL(L, p):
    return L * p["n"]


def mode_SX(x, p):
    return 1.0 / (2.0 * p["A"]) * (p["lae"] - 2 * x)


def mode_SE(E, p):
    return np.ones_like(E)


def create_example_pgd_solution(param):
    pgdtest = PGD()
    pgdtest.name = "test"
    pgdtest.numModes = 1
    pgdtest.used_numModes = 1
    grids = []

    specs = [
        ("PGD1", [1, "X", "m"], np.linspace(0, 1, 11), mode_UX, mode_SX),
        ("PGD2", [1, "E", "N/mm2"], np.linspace(0.5, 1.0, 61), mode_UE, mode_SE),
        ("PGD3", [1, "L", "-"], np.linspace(0, 1, 11), mode_UL, mode_UL),
    ]
    for name, info, xs, mu, ms in specs:
        g = PGDMesh(name)
        g.info = info
        g.numNodes = len(xs)
        g.numElements = len(xs) - 1
        g.dataX = xs
        g.dataY = np.zeros(len(xs))
        g.dataZ = np.zeros(len(xs))
        g.typElements = "Polyline"
        g.topology = [[i, i + 1] for i in range(len(xs) - 1)]
        attrs = []
        for aname, fn in [("U_x", mu), ("Sig_x", ms)]:
            a = PGDAttribute()
            a.name = aname
            a._type = "Node"
            a.field = "Scalar"
            a.data = [fn(xs, param).reshape(-1, 1)]
            attrs.append(a)
        g.attributes = attrs
        grids.append(g)
    pgdtest.mesh = grids
    return pgdtest


class TestPGD(unittest.TestCase):
    def setUp(self):
        self.param = {"A": 1, "n": 1, "lae": 1}
        self.pgd = create_example_pgd_solution(self.param)
        self.E = 0.5
        self.L = 0.4
        self.u_ana = u_analytic(x=self.pgd.mesh[0].dataX, p=self.param)([self.E, self.L])
        self.sig_ana = sig_analytic(x=self.pgd.mesh[0].dataX, p=self.param)(
            [self.E, self.L]
        )

    def test_evaluate(self):
        for at in [0, 1]:
            self.pgd.mesh[1].attributes[at].interpolationInfo = {
                "name": 0,
                "kind": "linear",
            }
            self.pgd.mesh[2].attributes[at].interpolationInfo = {
                "name": 0,
                "kind": "linear",
            }
            self.pgd.create_interpolation_fcts([1, 2], at)
            pgd_eval = self.pgd.evaluate(0, [1, 2], [self.E, self.L], at)
            if at == 0:
                np.testing.assert_almost_equal(pgd_eval.flatten(), self.u_ana, 5)
            else:
                np.testing.assert_almost_equal(pgd_eval.flatten(), self.sig_ana, 5)

    def test_evaluate_min(self):
        self.pgd.mesh[1].attributes[0].interpolationInfo = {"name": 0, "kind": "linear"}
        self.pgd.mesh[2].attributes[0].interpolationInfo = {"name": 0, "kind": "linear"}
        pgd_min = self.pgd.evaluate_min(0, [1, 2], [self.E, self.L], 0)
        pgd_max = self.pgd.evaluate_max(0, [1, 2], [self.E, self.L], 0)
        self.assertAlmostEqual(pgd_min, self.u_ana.min(), places=7)
        self.assertAlmostEqual(pgd_max, self.u_ana.max(), places=7)

    def test_check_error(self):
        self.pgd.mesh[1].attributes[0].interpolationInfo = {"name": 0, "kind": "linear"}
        self.pgd.mesh[2].attributes[0].interpolationInfo = {"name": 0, "kind": "linear"}
        with self.assertRaises(ValueError):
            self.pgd.evaluate_min(0, [1, 2], [0.2, self.L], 0)  # E=0.2 < 0.5


if __name__ == "__main__":
    unittest.main()
