"""pxdmf/HDF5 persistence round trip.

Mirrors reference tests/unit/test_pgdclass_dolfin.py: build a PGD for
u(x,p,E) = x²·p·(1/E) from FE functions, write pxdmf + h5 checkpoints to a
tempdir, reload with load_pxdmf, rebuild interpolants from the `_data.h5`
checkpoints and check mode interpolants + full evaluation."""

import os
import shutil
import tempfile
import unittest

import numpy as np

from pgdrome_tpu import IntervalMesh, FunctionSpace, interpolate
from pgdrome_tpu.model import PGD


class TestPGD(unittest.TestCase):
    def setUp(self):
        mesh_x = IntervalMesh(50, 0.0, 1.0)
        V_x = FunctionSpace(mesh_x, "CG", 1)
        mesh_p = IntervalMesh(10, 0.0, 2.0)
        V_p = FunctionSpace(mesh_p, "CG", 1)
        mesh_E = IntervalMesh(10, 0.5, 1.0)
        V_E = FunctionSpace(mesh_E, "CG", 2)

        PGD_func = [list(), list(), list()]
        for nn in range(1):
            PGD_func[0].append(interpolate(lambda x: x * x, V_x))
            PGD_func[1].append(interpolate(lambda p: p, V_p))
            PGD_func[2].append(interpolate(lambda E: 1.0 / E, V_E))

        self.pgd_test = PGD(
            name="Test",
            n_modes=1,
            fmeshes=[mesh_x, mesh_p, mesh_E],
            pgd_modes=PGD_func,
            name_coord=["X", "P", "E"],
            modes_info=["U_x", "Node", "Scalar"],
            verbose=False,
        )
        self.filepathPGD = tempfile.mkdtemp()
        self.pgd_test.write_pxdmf(self.filepathPGD, False)
        self.pgd_test.write_hdf5(self.filepathPGD)

        self.E = 0.75
        self.P = 0.75

    def tearDown(self):
        shutil.rmtree(self.filepathPGD)

    def test_load_and_evaluate(self):
        pgd_load = PGD().load_pxdmf(os.path.join(self.filepathPGD, "Test.pxdmf"))

        pgd_load.mesh[0].attributes[0].interpolationInfo = {
            "name": 1,
            "family": "CG",
            "degree": 1,
            "_type": "scalar",
        }
        pgd_load.mesh[1].attributes[0].interpolationInfo = {
            "name": 1,
            "family": "CG",
            "degree": 1,
            "_type": "scalar",
        }
        pgd_load.mesh[2].attributes[0].interpolationInfo = {
            "name": 1,
            "family": "CG",
            "degree": 2,
            "_type": "scalar",
        }
        pgd_load.create_interpolation_fcts([0, 1, 2], 0)

        self.assertAlmostEqual(
            0.8**2, pgd_load.mesh[0].attributes[0].interpolationfct[0](0.8), places=3
        )
        self.assertAlmostEqual(
            0.8, pgd_load.mesh[1].attributes[0].interpolationfct[0](0.8), places=3
        )
        self.assertAlmostEqual(
            1 / 0.8, pgd_load.mesh[2].attributes[0].interpolationfct[0](0.8), places=3
        )

        evaluate = pgd_load.evaluate(0, [1, 2], [self.P, self.E], 0)
        x_set = 0.5
        self.assertAlmostEqual(
            x_set**2 * self.P * 1 / self.E, evaluate(x_set), places=1
        )

    def test_pxdmf_structure(self):
        # pxdmf XML + per-mesh viz h5 exist and parse
        import xml.etree.ElementTree as et
        import h5py

        path = os.path.join(self.filepathPGD, "Test.pxdmf")
        root = et.parse(path).getroot()
        grids = list(root.iter("Grid"))
        self.assertEqual(len(grids), 3)
        for g in grids:
            names = [e.attrib["Name"] for e in g.iter("Information")]
            self.assertIn("Dims", names)
        with h5py.File(os.path.join(self.filepathPGD, "PGD1.h5"), "r") as f:
            self.assertIn("Mesh/0/mesh/topology", f)
            self.assertIn("VisualisationVector/0", f)

    def test_data_h5_checkpoint(self):
        # the _data.h5 files fully rebuild evaluable modes
        from pgdrome_tpu.io import read_modes_hdf5

        V, fcts = read_modes_hdf5(os.path.join(self.filepathPGD, "PGD1_data.h5"))
        self.assertEqual(len(fcts), 1)
        self.assertAlmostEqual(fcts[0](0.3), 0.09, places=3)


if __name__ == "__main__":
    unittest.main()


class TestMultiAttributeHdf5(unittest.TestCase):
    def test_two_attributes_roundtrip(self):
        # >1 attribute per mesh: MODE_k datasets must not collide
        # (attribute 0 at root, further attributes under ATTR_{a})
        from pgdrome_tpu.io import read_modes_hdf5
        from pgdrome_tpu.model import PGDAttribute

        mesh_x = IntervalMesh(20, 0.0, 1.0)
        V_x = FunctionSpace(mesh_x, "CG", 1)
        modes = [[interpolate(lambda x: x, V_x)], [interpolate(lambda x: x, V_x)]]
        pgd = PGD(
            name="Two",
            n_modes=1,
            fmeshes=[mesh_x, mesh_x],
            pgd_modes=modes,
            name_coord=["X", "P"],
            modes_info=["U", "Node", "Scalar"],
            verbose=False,
        )
        # second field on the first mesh
        att2 = PGDAttribute(1, pgd.mesh[0], [interpolate(lambda x: 2.0 * x, V_x)],
                            ["V", "Node", "Scalar"])
        pgd.mesh[0].attributes.append(att2)

        folder = tempfile.mkdtemp()
        try:
            pgd.write_hdf5(folder)
            path = os.path.join(folder, pgd.mesh[0].name + "_data.h5")
            _, fcts0 = read_modes_hdf5(path, attri=0)
            _, fcts1 = read_modes_hdf5(path, attri=1)
            self.assertAlmostEqual(fcts0[0](0.3), 0.3, places=12)
            self.assertAlmostEqual(fcts1[0](0.3), 0.6, places=12)
        finally:
            shutil.rmtree(folder)
