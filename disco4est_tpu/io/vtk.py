"""VTK (.vtu) output of DG fields.

Role of the reference's `IO/d4est_vtk.c` (+ `p4est_vtk_ext.c`): write the
mesh as per-element blocks of (deg)^dim sub-cells with nodal corner values
(the "dg grid" output type), plus per-cell fields (tree, level, rank,
estimator, ...).  Host-side writer from gathered numpy arrays; ASCII XML
VTU, readable by ParaView/VisIt.
"""

from __future__ import annotations

import numpy as np

from disco4est_tpu.mesh.builder import MeshData


def write_vtu(
    path: str,
    mesh: MeshData,
    point_fields: dict | None = None,
    cell_fields: dict | None = None,
):
    """point_fields: name -> [E, nl...] nodal arrays; cell_fields: name ->
    [E] per-element arrays."""
    dim = mesh.dim
    nl = mesh.nl
    E = mesh.n_elements
    xyz = np.asarray(mesh.xyz_lobatto)  # [E, dim, nl...]
    point_fields = {
        k: np.asarray(v).reshape(E, -1) for k, v in (point_fields or {}).items()
    }
    cell_fields = dict(cell_fields or {})
    cell_fields.setdefault("tree", mesh.forest.tree)
    cell_fields.setdefault("level", mesh.forest.level)

    n_pts_per_el = nl**dim
    sub = nl - 1
    n_cells_per_el = sub**dim
    corners = 1 << dim
    cell_type = 8 if dim == 2 else 11  # VTK_PIXEL / VTK_VOXEL

    # points: [E*nl^dim, 3]
    pts = np.zeros((E * n_pts_per_el, 3))
    for d in range(dim):
        pts[:, d] = xyz[:, d].reshape(E, -1).reshape(-1)

    # connectivity per element: sub-cell corner indices in x-fastest order
    idx = np.arange(n_pts_per_el).reshape((nl,) * dim)  # axes (z, y, x)
    conn_local = []
    ranges = [range(sub)] * dim
    import itertools

    for cz in (range(sub) if dim == 3 else [0]):
        for cy in range(sub):
            for cx in range(sub):
                corner = []
                for oz in ((0, 1) if dim == 3 else [0]):
                    for oy in (0, 1):
                        for ox in (0, 1):
                            if dim == 2:
                                corner.append(idx[cy + oy, cx + ox])
                            else:
                                corner.append(idx[cz + oz, cy + oy, cx + ox])
                conn_local.append(corner)
    conn_local = np.asarray(conn_local, np.int64)  # [cells/el, corners]
    conn = (
        conn_local[None, :, :]
        + (np.arange(E) * n_pts_per_el)[:, None, None]
    ).reshape(-1, corners)

    n_points = E * n_pts_per_el
    n_cells = E * n_cells_per_el
    with open(path, "w") as f:
        f.write('<?xml version="1.0"?>\n')
        f.write(
            '<VTKFile type="UnstructuredGrid" version="0.1" '
            'byte_order="LittleEndian">\n<UnstructuredGrid>\n'
        )
        f.write(
            f'<Piece NumberOfPoints="{n_points}" NumberOfCells="{n_cells}">\n'
        )
        f.write('<Points>\n<DataArray type="Float64" NumberOfComponents="3" '
                'format="ascii">\n')
        np.savetxt(f, pts, fmt="%.12g")
        f.write("</DataArray>\n</Points>\n<Cells>\n")
        f.write('<DataArray type="Int64" Name="connectivity" format="ascii">\n')
        np.savetxt(f, conn, fmt="%d")
        f.write("</DataArray>\n")
        f.write('<DataArray type="Int64" Name="offsets" format="ascii">\n')
        np.savetxt(
            f, (np.arange(1, n_cells + 1) * corners)[:, None], fmt="%d"
        )
        f.write("</DataArray>\n")
        f.write('<DataArray type="UInt8" Name="types" format="ascii">\n')
        np.savetxt(f, np.full((n_cells, 1), cell_type), fmt="%d")
        f.write("</DataArray>\n</Cells>\n")
        if point_fields:
            f.write("<PointData>\n")
            for name, arr in point_fields.items():
                f.write(
                    f'<DataArray type="Float64" Name="{name}" format="ascii">\n'
                )
                np.savetxt(f, arr.reshape(-1, 1), fmt="%.12g")
                f.write("</DataArray>\n")
            f.write("</PointData>\n")
        if cell_fields:
            f.write("<CellData>\n")
            for name, arr in cell_fields.items():
                arr = np.asarray(arr, np.float64)
                rep = np.repeat(arr, n_cells_per_el)
                f.write(
                    f'<DataArray type="Float64" Name="{name}" format="ascii">\n'
                )
                np.savetxt(f, rep.reshape(-1, 1), fmt="%.12g")
                f.write("</DataArray>\n")
            f.write("</CellData>\n")
        f.write("</Piece>\n</UnstructuredGrid>\n</VTKFile>\n")
