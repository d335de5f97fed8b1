"""Foreign pxdmf ingest: load a checked-in fixture NOT produced by this
repo's writer (ParaView-PGD-plugin-style layout: inline XML topology/
geometry/attribute items, HDF items under non-standard dataset paths, no
`_data.h5` companion).  The reference's load_pxdmf handles arbitrary
XML/HDF item mixes (reference model.py:399-575); this pins the same
capability here.  Fixture: u(x, p) = x²·p + x·1 (two modes)."""

import os
import unittest

import numpy as np

from pgdrome_tpu.model import PGD

FIXTURE = os.path.join(
    os.path.dirname(__file__), "..", "fixtures", "foreign_pxdmf", "Foreign.pxdmf"
)


class TestForeignPxdmf(unittest.TestCase):
    def setUp(self):
        self.pgd = PGD().load_pxdmf(FIXTURE)

    def test_structure(self):
        self.assertEqual(len(self.pgd.mesh), 2)
        self.assertEqual(self.pgd.numModes, 2)
        m_x, m_p = self.pgd.mesh
        # XML-inline grid
        self.assertEqual(m_x.numNodes, 6)
        self.assertEqual(m_x.numElements, 5)
        self.assertEqual(m_x.typElements, "Polyline")
        np.testing.assert_allclose(m_x.dataX, np.linspace(0, 1, 6), atol=1e-9)
        # HDF grid with non-standard internal paths
        self.assertEqual(m_p.numNodes, 5)
        np.testing.assert_allclose(m_p.dataX, np.linspace(0, 2, 5), atol=1e-12)
        # no _data.h5 companion: fenics mesh absent, data still usable
        self.assertIsNone(m_p.fenics_mesh)

    def test_attribute_merge(self):
        # U_0/U_1 must merge into ONE attribute with two data arrays
        for mesh in self.pgd.mesh:
            self.assertEqual(len(mesh.attributes), 1)
            att = mesh.attributes[0]
            self.assertEqual(att.name, "U")
            self.assertEqual(len(att.data), 2)

    def test_evaluate_via_interp1d(self):
        # nodal interp1d path works straight off the foreign data
        for mesh in self.pgd.mesh:
            mesh.attributes[0].interpolationInfo = {"name": 0, "kind": "linear"}
        x, p = 0.5, 1.5
        # fixed dim 0 (X), free dim 1 (P): u(x_nodes) = x²·p + x
        vals = self.pgd.evaluate(0, [1], [p], 0)
        xs = self.pgd.mesh[0].dataX
        expected = xs**2 * p + xs
        np.testing.assert_allclose(
            np.asarray(vals).ravel(), expected, atol=1e-9
        )


if __name__ == "__main__":
    unittest.main()
