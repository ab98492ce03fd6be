"""Boundary classification: which boundary faces are Dirichlet vs Neumann.

Replaces Stuff::Grid::BoundaryInfo (config-driven via boundary_info configs,
reference: discreteproblem.hh:128-132, NormalBased usage in
problems/thermalblock.hh:480-484).
"""
from __future__ import annotations

from typing import Mapping, Optional, Sequence

import numpy as np

from .structured import Grid

__all__ = ["BoundaryInfo", "make_boundary_info"]


class BoundaryInfo:
    """Masks over *faces*: dirichlet_faces & neumann_faces partition the
    boundary faces of a grid."""

    def __init__(self, grid: Grid, dirichlet_faces: np.ndarray, neumann_faces: np.ndarray):
        self.grid = grid
        self.dirichlet_faces = dirichlet_faces
        self.neumann_faces = neumann_faces

    @property
    def dirichlet_vertices(self) -> np.ndarray:
        mask = np.zeros(self.grid.num_vertices, dtype=bool)
        faces = self.grid.faces[self.dirichlet_faces]
        mask[faces.ravel()] = True
        return mask

    @property
    def has_dirichlet(self) -> bool:
        return bool(self.dirichlet_faces.any())

    @property
    def has_neumann(self) -> bool:
        return bool(self.neumann_faces.any())


def _normal_direction_mask(grid: Grid, directions: Sequence[Sequence[float]], tol: float = 1e-10):
    """Boundary faces whose outward normal matches any given direction."""
    mask = np.zeros(grid.num_faces, dtype=bool)
    normals = grid.face_normals
    bnd = grid.boundary_faces
    for d in directions:
        d = np.asarray(d, dtype=float)
        d = d / np.linalg.norm(d)
        hit = np.abs(normals @ d - 1.0) < tol
        mask |= bnd & hit
    return mask


def make_boundary_info(grid: Grid, config: Optional[Mapping] = None) -> BoundaryInfo:
    """Factory mirroring Stuff::Grid::BoundaryInfoConfigs.

    config["type"] in {"stuff.grid.boundaryinfo.alldirichlet" (default),
    "...allneumann", "...normalbased"}.  Normal-based takes
    ``default`` ("dirichlet"|"neumann") plus ``dirichlet``/``neumann`` lists of
    outward normal directions (problems/thermalblock.hh:480-484 uses default
    dirichlet with neumann [-1 0] and [1 0]).
    """
    cfg = dict(config or {})
    t = str(cfg.get("type", "stuff.grid.boundaryinfo.alldirichlet")).lower()
    bnd = grid.boundary_faces
    none = np.zeros(grid.num_faces, dtype=bool)
    if t.endswith("alldirichlet"):
        return BoundaryInfo(grid, bnd.copy(), none)
    if t.endswith("allneumann"):
        return BoundaryInfo(grid, none, bnd.copy())
    if t.endswith("normalbased"):
        default = str(cfg.get("default", "dirichlet")).lower()
        neu = _normal_direction_mask(grid, cfg.get("neumann", []))
        dir_ = _normal_direction_mask(grid, cfg.get("dirichlet", []))
        if default.startswith("dirichlet"):
            dir_ = bnd & ~neu | dir_
        else:
            neu = bnd & ~dir_ | neu
        return BoundaryInfo(grid, dir_ & bnd, neu & bnd)
    raise ValueError(f"unknown boundary info type {t!r}")
