"""Minimal VTU (VTK XML unstructured grid) writer.

Visualization is the reference's main observability channel (survey 5.5:
VTK writers for grids, data functions, solutions, indicator fields).  CG
functions are written as point data on the shared mesh; DG functions on a
vertex-duplicated mesh so inter-element jumps stay visible; cellwise
indicator fields as cell data.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

__all__ = ["write_vtu", "write_cell_data_vtu"]

_VTK_TYPE = {"triangle": 5, "quad": 9, "triangle6": 22,
             "biquad_quad9": 28, "lagrange_tri10": 69}


def _vtu_xml(points: np.ndarray, cells: np.ndarray, cell_type: str,
             point_data: dict, cell_data: dict) -> str:
    npts, ncells = len(points), len(cells)
    nvc = cells.shape[1]
    pts3 = np.column_stack([points, np.zeros(len(points))])
    parts = [
        '<?xml version="1.0"?>',
        '<VTKFile type="UnstructuredGrid" version="0.1" byte_order="LittleEndian">',
        "<UnstructuredGrid>",
        f'<Piece NumberOfPoints="{npts}" NumberOfCells="{ncells}">',
        "<Points>",
        '<DataArray type="Float64" NumberOfComponents="3" format="ascii">',
        " ".join(f"{v:.16g}" for v in pts3.ravel()),
        "</DataArray>",
        "</Points>",
        "<Cells>",
        '<DataArray type="Int64" Name="connectivity" format="ascii">',
        " ".join(str(i) for i in cells.ravel()),
        "</DataArray>",
        '<DataArray type="Int64" Name="offsets" format="ascii">',
        " ".join(str((i + 1) * nvc) for i in range(ncells)),
        "</DataArray>",
        '<DataArray type="UInt8" Name="types" format="ascii">',
        " ".join(str(_VTK_TYPE[cell_type]) for _ in range(ncells)),
        "</DataArray>",
        "</Cells>",
    ]
    if point_data:
        parts.append("<PointData>")
        for name, vals in point_data.items():
            parts.append(f'<DataArray type="Float64" Name="{name}" format="ascii">')
            parts.append(" ".join(f"{v:.16g}" for v in np.asarray(vals).ravel()))
            parts.append("</DataArray>")
        parts.append("</PointData>")
    if cell_data:
        parts.append("<CellData>")
        for name, vals in cell_data.items():
            parts.append(f'<DataArray type="Float64" Name="{name}" format="ascii">')
            parts.append(" ".join(f"{v:.16g}" for v in np.asarray(vals).ravel()))
            parts.append("</DataArray>")
        parts.append("</CellData>")
    parts += ["</Piece>", "</UnstructuredGrid>", "</VTKFile>"]
    return "\n".join(parts)


def write_vtu(space, dof_values: np.ndarray, filename: str, name: str = "solution") -> str:
    """Write a discrete function; returns the written path."""
    grid = space.grid
    if not filename.endswith(".vtu"):
        filename = filename + ".vtu"
    dof_values = np.asarray(dof_values)
    order = getattr(space, "order", 1)
    if order == 2 and grid.cell_type == "triangle" and space.continuous:
        # VTK quadratic triangles (type 22): corner nodes then edge
        # midpoints (0-1), (1-2), (2-0) — exactly our P2 local ordering
        # (v0, v1, v2, e01, e12, e20)
        mids = 0.5 * (grid.vertices[grid.faces[:, 0]]
                      + grid.vertices[grid.faces[:, 1]])
        points = np.concatenate([grid.vertices, mids])
        cells = np.concatenate(
            [grid.cells, grid.num_vertices + grid.cell_faces], axis=1
        ).astype(np.int64)
        xml = _vtu_xml(points, cells, "triangle6", {name: dof_values}, {})
    elif order > 1:
        # generic high-order path (CG or DG): duplicated nodal points per
        # cell; the nodal orderings match the VTK conventions —
        # P2 triangle -> type 22, Q2 quad (corners, edges, center) -> 28,
        # P3 triangle (vertices, 2 per edge along the edge, interior) ->
        # Lagrange triangle 69
        vtk_kind = {
            ("triangle", 2): "triangle6",
            ("quad", 2): "biquad_quad9",
            ("triangle", 3): "lagrange_tri10",
        }[(grid.cell_type, order)]
        nd = space.shape_count
        points = np.asarray(space.nodal_points).reshape(-1, 2)
        cells = np.arange(grid.num_cells * nd).reshape(-1, nd)
        vals = dof_values[space.cell_dofs.ravel()]
        xml = _vtu_xml(points, cells, vtk_kind, {name: vals}, {})
    elif space.continuous:
        xml = _vtu_xml(grid.vertices, grid.cells, grid.cell_type,
                       {name: dof_values}, {})
    else:
        # duplicated-vertex mesh: point p of cell c is dof cell_dofs[c, p]
        nvc = grid.vertices_per_cell
        points = grid.cell_vertices.reshape(-1, 2)
        cells = np.arange(grid.num_cells * nvc).reshape(-1, nvc)
        vals = dof_values[space.cell_dofs.ravel()]
        xml = _vtu_xml(points, cells, grid.cell_type, {name: vals}, {})
    os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
    with open(filename, "w") as fh:
        fh.write(xml)
    return filename


def write_cell_data_vtu(grid, cell_values: dict, filename: str) -> str:
    """Write P0 / indicator fields as cell data (estimator visualization,
    reference: test/linearelliptic-swipdg.hh:317-327)."""
    if not filename.endswith(".vtu"):
        filename = filename + ".vtu"
    xml = _vtu_xml(grid.vertices, grid.cells, grid.cell_type, {},
                   {k: np.asarray(v) for k, v in cell_values.items()})
    os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
    with open(filename, "w") as fh:
        fh.write(xml)
    return filename
