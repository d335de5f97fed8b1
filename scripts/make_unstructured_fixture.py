"""Generate tests/fixtures/unstructured_tri/Unstr_data.h5 — a FOREIGN
unstructured-triangle mode checkpoint (coordinates+cells only, no
mesh_class tag, layout as an external tool would write it).

Mesh: unit square triangulated with jittered interior vertices AND the
upper-right quadrant re-split (non-uniform density) — not reproducible by
any structured constructor.  Modes: M0 = x(1-x)y(1-y), M1 = sin(pi x)*y,
interpolated on P1 vertices.

Deterministic (seed 20260818); run once, commit the output.
"""

import os

import h5py
import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "..", "tests", "fixtures", "unstructured_tri")


def build_mesh():
    rng = np.random.default_rng(20260818)
    n = 6
    xs = np.linspace(0, 1, n + 1)
    X, Y = np.meshgrid(xs, xs, indexing="xy")
    verts = np.stack([X.ravel(), Y.ravel()], axis=1)

    def vid(i, j):
        return j * (n + 1) + i

    tris = []
    extra = []
    for j in range(n):
        for i in range(n):
            v00, v10 = vid(i, j), vid(i + 1, j)
            v01, v11 = vid(i, j + 1), vid(i + 1, j + 1)
            if xs[i] >= 0.5 and xs[j] >= 0.5:
                # refined quadrant: crossed split (4 tris + center vertex)
                cx = 0.5 * (xs[i] + xs[i + 1])
                cy = 0.5 * (xs[j] + xs[j + 1])
                cidx = (n + 1) ** 2 + len(extra)
                extra.append([cx, cy])
                tris += [
                    [v00, v10, cidx],
                    [v10, v11, cidx],
                    [v11, v01, cidx],
                    [v01, v00, cidx],
                ]
            else:
                # alternating diagonals
                if (i + j) % 2 == 0:
                    tris += [[v00, v10, v11], [v00, v11, v01]]
                else:
                    tris += [[v00, v10, v01], [v10, v11, v01]]
    verts = np.concatenate([verts, np.asarray(extra)], axis=0)
    # jitter interior grid vertices (not the added centers, to keep the
    # crossed quads convex)
    onb = (
        (np.abs(verts[:, 0]) < 1e-12)
        | (np.abs(verts[:, 0] - 1) < 1e-12)
        | (np.abs(verts[:, 1]) < 1e-12)
        | (np.abs(verts[:, 1] - 1) < 1e-12)
    )
    jit = ~onb
    jit[(n + 1) ** 2:] = False
    verts[jit] += rng.uniform(-0.012, 0.012, (int(jit.sum()), 2))
    return verts, np.asarray(tris, dtype=np.int32)


def main():
    os.makedirs(OUT, exist_ok=True)
    verts, tris = build_mesh()
    m0 = verts[:, 0] * (1 - verts[:, 0]) * verts[:, 1] * (1 - verts[:, 1])
    m1 = np.sin(np.pi * verts[:, 0]) * verts[:, 1]
    with h5py.File(os.path.join(OUT, "Unstr_data.h5"), "w") as f:
        g = f.create_group("mesh")
        g.create_dataset("coordinates", data=verts)
        g.create_dataset("cells", data=tris)
        g.attrs["tdim"] = 2
        # NOTE: no mesh_class tag — exercises the foreign/simplicial
        # fallback in io._rebuild_mesh
        f.attrs["family"] = "P"
        f.attrs["degree"] = 1
        f.attrs["value_size"] = 1
        f.create_dataset("MODE_0", data=m0)
        f.create_dataset("MODE_1", data=m1)
    print(f"wrote {OUT}/Unstr_data.h5: {len(verts)} verts, {len(tris)} tris")


if __name__ == "__main__":
    main()
