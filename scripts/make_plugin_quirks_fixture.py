"""Generate the PluginQuirks foreign-pxdmf fixture: a file emulating the
REFERENCE WRITER's exact output quirks (reference model.py:228-397),
which is what the ParaView PGD plugin ecosystem produces/consumes:

* vector attributes PADDED to 3 components and written INLINE XML
  (the writer extends 2D data with a zero z column; for 1D meshes it
  copies the single column into all three) — reference model.py:322-366;
* scalar attributes as HDF references into ``<mesh>.h5:/
  VisualisationVector/<mode>`` (the dolfin XDMFFile layout) —
  reference model.py:367-388;
* topology/geometry as HDF references into ``<mesh>.h5:/Mesh/0/mesh/
  {topology,geometry}`` (dolfin checkpoint layout) — model.py:265-311;
* MIXED grids: the space grid carries a Vector attribute while the
  parameter grids carry Scalars (the elasticity flagship's layout);
* a Center="Cell" attribute (dolfin writes DG0/cell fields this way);
  the loader must preserve the centering tag.

Fields (so tests can check values, not just structure):
  U(x,y; p,q)   = (x, y)·p  +  (y², x²)·q          (vector, 2 modes)
  W(q)          = cell-centered indicator on the q grid (1 mode)

Run from the repo root; writes into tests/fixtures/foreign_pxdmf/.
"""

import os

import h5py
import numpy as np

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "foreign_pxdmf",
)


def _tri_mesh(n):
    """(n+1)² unit-square grid split into triangles (dolfin ordering)."""
    xs = np.linspace(0.0, 1.0, n + 1)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    geom = np.stack([X.ravel(), Y.ravel()], axis=1)
    tris = []
    for i in range(n):
        for j in range(n):
            a = i * (n + 1) + j
            b = a + 1
            c = a + (n + 1)
            d = c + 1
            tris += [[a, b, d], [a, d, c]]
    return geom, np.asarray(tris, dtype=np.uint64)


def main():
    os.makedirs(OUT, exist_ok=True)
    geom_x, topo_x = _tri_mesh(2)           # 9 nodes, 8 triangles
    n_x = geom_x.shape[0]
    p_nodes = np.linspace(0.0, 2.0, 5)      # param grid p
    q_nodes = np.linspace(-1.0, 1.0, 4)     # param grid q

    # vector space modes, 3-component padded (z = 0) like the writer
    U0 = np.concatenate([geom_x, np.zeros((n_x, 1))], axis=1)
    U1 = np.concatenate(
        [geom_x[:, 1:2] ** 2, geom_x[:, 0:1] ** 2, np.zeros((n_x, 1))],
        axis=1,
    )
    # parameter scalar modes (column vectors, dolfin VisualisationVector)
    P0, P1 = p_nodes[:, None], np.ones((5, 1))
    Q0, Q1 = np.ones((4, 1)), q_nodes[:, None]
    W0 = np.arange(3, dtype=np.float64)[:, None]  # cell data on q grid

    with h5py.File(os.path.join(OUT, "QuirkX.h5"), "w") as f:
        f["Mesh/0/mesh/topology"] = topo_x
        f["Mesh/0/mesh/geometry"] = geom_x
    with h5py.File(os.path.join(OUT, "QuirkP.h5"), "w") as f:
        f["Mesh/0/mesh/topology"] = np.stack(
            [np.arange(4), np.arange(1, 5)], axis=1
        ).astype(np.uint64)
        f["Mesh/0/mesh/geometry"] = np.stack(
            [p_nodes, np.zeros(5)], axis=1
        )
        f["VisualisationVector/0"] = P0
        f["VisualisationVector/1"] = P1
    with h5py.File(os.path.join(OUT, "QuirkQ.h5"), "w") as f:
        f["Mesh/0/mesh/topology"] = np.stack(
            [np.arange(3), np.arange(1, 4)], axis=1
        ).astype(np.uint64)
        f["Mesh/0/mesh/geometry"] = np.stack(
            [q_nodes, np.zeros(4)], axis=1
        )
        f["VisualisationVector/0"] = Q0
        f["VisualisationVector/1"] = Q1
        f["CellData/0"] = W0

    def inline_vec(arr):
        return "\n" + "\n".join(
            "%.8e %.8e %.8e" % tuple(row) for row in arr
        ) + "\n          "

    xml = ['<?xml version="1.0"?>'
           '<!--pxdmf written by my own code writePXDMF.py based on my '
           'forward_models PGD class-->',
           '<!DOCTYPE Xdmf SYSTEM "Xdmf.dtd" []>',
           '<Xdmf Version="3.0" xmlns:xi="http://www.w3.org/2001/XInclude">',
           '  <Domain Name="PluginQuirks.pxdmf">']

    # ---- grid X: HDF mesh refs, vector attributes inline-XML 3-padded
    xml += [
        '    <Grid Name="QuirkX">',
        '      <Information Name="Dims" Value="2" />',
        '      <Information Name="Dim0" Value="X Y" />',
        '      <Information Name="Unit0" Value="m" />',
        f'        <Topology NumberOfElements = "{topo_x.shape[0]}" '
        'TopologyType = "Triangle" NodesPerElement = "3" >',
        f'          <DataItem Dimensions = "{topo_x.shape[0]} 3" '
        'NumberType = "UInt" Format = "HDF">'
        'QuirkX.h5:/Mesh/0/mesh/topology</DataItem>',
        '        </Topology>',
        '        <Geometry GeometryType = "XY">',
        f'          <DataItem Dimensions = "{n_x} 2" Format = "HDF">'
        'QuirkX.h5:/Mesh/0/mesh/geometry</DataItem>',
        '        </Geometry>',
    ]
    for count, arr in enumerate((U0, U1)):
        xml += [
            f'        <Attribute Name="U_{count}" AttributeType="Vector" '
            'Center="Node">',
            f'          <DataItem Dimensions="{n_x} 3" Format="XML" '
            'NumberType="float" >' + inline_vec(arr) + '</DataItem>',
            '        </Attribute>',
        ]
    xml += ['    </Grid>']

    # ---- grid P: HDF everything (scalar VisualisationVector)
    xml += [
        '    <Grid Name="QuirkP">',
        '      <Information Name="Dims" Value="1" />',
        '      <Information Name="Dim0" Value="P" />',
        '      <Information Name="Unit0" Value="-" />',
        '        <Topology NumberOfElements = "4" TopologyType = '
        '"Polyline" NodesPerElement = "2" >',
        '          <DataItem Dimensions = "4 2" NumberType = "UInt" '
        'Format = "HDF">QuirkP.h5:/Mesh/0/mesh/topology</DataItem>',
        '        </Topology>',
        '        <Geometry GeometryType = "XY">',
        '          <DataItem Dimensions = "5 2" Format = "HDF">'
        'QuirkP.h5:/Mesh/0/mesh/geometry</DataItem>',
        '        </Geometry>',
    ]
    for count in range(2):
        xml += [
            f'        <Attribute Name="U_{count}" AttributeType="Scalar" '
            'Center="Node">',
            f'          <DataItem Dimensions="5 1" Format="HDF">'
            f'QuirkP.h5:/VisualisationVector/{count}</DataItem>',
            '        </Attribute>',
        ]
    xml += ['    </Grid>']

    # ---- grid Q: scalars + a cell-centered extra attribute
    xml += [
        '    <Grid Name="QuirkQ">',
        '      <Information Name="Dims" Value="1" />',
        '      <Information Name="Dim0" Value="Q" />',
        '      <Information Name="Unit0" Value="-" />',
        '        <Topology NumberOfElements = "3" TopologyType = '
        '"Polyline" NodesPerElement = "2" >',
        '          <DataItem Dimensions = "3 2" NumberType = "UInt" '
        'Format = "HDF">QuirkQ.h5:/Mesh/0/mesh/topology</DataItem>',
        '        </Topology>',
        '        <Geometry GeometryType = "XY">',
        '          <DataItem Dimensions = "4 2" Format = "HDF">'
        'QuirkQ.h5:/Mesh/0/mesh/geometry</DataItem>',
        '        </Geometry>',
    ]
    for count in range(2):
        xml += [
            f'        <Attribute Name="U_{count}" AttributeType="Scalar" '
            'Center="Node">',
            f'          <DataItem Dimensions="4 1" Format="HDF">'
            f'QuirkQ.h5:/VisualisationVector/{count}</DataItem>',
            '        </Attribute>',
        ]
    xml += [
        '        <Attribute Name="W_0" AttributeType="Scalar" '
        'Center="Cell">',
        '          <DataItem Dimensions="3 1" Format="HDF">'
        'QuirkQ.h5:/CellData/0</DataItem>',
        '        </Attribute>',
        '    </Grid>',
        '  </Domain>',
        '</Xdmf>',
    ]

    path = os.path.join(OUT, "PluginQuirks.pxdmf")
    with open(path, "w") as f:
        f.write("\n".join(xml) + "\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
