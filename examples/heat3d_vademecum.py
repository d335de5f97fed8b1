"""3D-space PGD vademecum end to end.

Solves the parametric diffusion problem −∇·(κ∇u) = 1 on the unit cube
(BoxMesh / Kuhn tetrahedra, P1) with a 2-parameter affine separated
diffusion, verifies densely against per-sample f64 FEM, serves fields and
3D-point sensors through the Vademecum container, and round-trips the
solution through the HDF5 checkpoint — the full 3D capability path
(solve → verify → serve → persist).

The reference supports tet meshes through dolfin (reference
model.py:1621-1637) but ships no 3D solve; this is the TPU-native
framework going one dimension past the reference's asserted coverage.

Run: python examples/heat3d_vademecum.py   (~20 s on CPU)
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

from pgdrome_tpu.models.problems import (  # noqa: E402
    parametric_elliptic_3d,
    elliptic3d_dense_verifier,
)
from pgdrome_tpu.separated import SeparatedPGD  # noqa: E402
from pgdrome_tpu.serving import Vademecum  # noqa: E402
from pgdrome_tpu.model import pgd_from_result  # noqa: E402
from pgdrome_tpu import io as pio  # noqa: E402
from pgdrome_tpu.fem.mesh import BoxMesh  # noqa: E402


def main():
    # 1. build + solve: P2 tets on an 8^3 BoxMesh x 2 parameter grids
    # (any-degree 3D: quadratic tet spaces with the Keast degree-5 rule)
    t0 = time.perf_counter()
    prob, Vs = parametric_elliptic_3d(n=8, n_p=24, num_params=2,
                                      degree_x=2)
    res = SeparatedPGD(
        prob, n_max=30, tol=1e-12, tol_fp=1e-6, dtype=np.float64
    ).solve()
    print(
        f"solve: rank {res.n_modes} over a {Vs[0].dim()}-dof 3D space "
        f"in {time.perf_counter() - t0:.1f}s"
    )

    # 2. dense verification vs per-sample f64 3D FEM
    t0 = time.perf_counter()
    v = elliptic3d_dense_verifier(Vs)(res)
    print(
        f"verify: max rel L2 {v['max']:.2e} over 4 corners + random "
        f"samples ({time.perf_counter() - t0:.1f}s)"
    )
    assert v["max"] < 1e-6

    # 3. serve: field sweep + sensors at interior 3D points
    vd = Vademecum(Vs, res, dtype=np.float64, method="xla")
    rng = np.random.default_rng(0)
    samples = rng.uniform(0.05, 0.95, (2000, 2))
    t0 = time.perf_counter()
    fields = np.asarray(vd.fields(samples))
    print(
        f"fields: {fields.shape} in {time.perf_counter() - t0:.2f}s; "
        f"center-plane mean u = {fields.mean():.4f}"
    )
    sensors = vd.sensors(np.array([[0.5, 0.5, 0.5], [0.25, 0.5, 0.75]]))
    resp = np.asarray(sensors(samples))
    print(f"sensors: {resp.shape}; u(center) range "
          f"[{resp[:, 0].min():.4f}, {resp[:, 0].max():.4f}]")

    # 4. model layer + checkpoint round-trip
    pgd = pgd_from_result(res, Vs, name="heat3d")
    with tempfile.TemporaryDirectory() as td:
        pgd.write_hdf5(td)
        Vr, fcts = pio.read_modes_hdf5(os.path.join(td, "PGD1_data.h5"))
        assert isinstance(Vr.mesh(), BoxMesh)
        assert np.allclose(fcts[0].array, np.asarray(res.modes[0])[0])
        print(f"checkpoint: {len(fcts)} modes round-tripped through "
              f"{os.path.basename(td)}/PGD1_data.h5 (BoxMesh rebuilt)")
    print("OK")


if __name__ == "__main__":
    main()
