"""Boundary classification: which boundary faces are Dirichlet vs Neumann.

Replaces Stuff::Grid::BoundaryInfo (config-driven via boundary_info configs,
reference: discreteproblem.hh:128-132, NormalBased usage in
problems/thermalblock.hh:480-484).
"""
from __future__ import annotations

from typing import Mapping, Optional, Sequence

import numpy as np

from .structured import Grid

__all__ = ["BoundaryInfo", "boundary_id_faces", "make_boundary_info"]


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


def boundary_id_faces(grid: Grid) -> np.ndarray:
    """Per-face boundary id array [NF] (0 on interior faces).

    Structured cube grids get the DUNE cube-grid segment convention: one id
    per axis-aligned side, counted (min, max) per dimension — in 2D
    left=1, right=2, bottom=3, top=4 (the ids dune-grid assigns to SGrid/
    YaspGrid boundary segments, consumed by Stuff's IdBased boundary info;
    reference: block-swipdg.hh:112-119 keys its multiscale boundary config
    on such ids).  Grids may override via a precomputed ``grid.boundary_ids``
    attribute (e.g. the multiscale oversampled patches tag their artificial
    outer boundary with id 7, matching dune-grid-multiscale).
    """
    custom = getattr(grid, "boundary_ids", None)
    if custom is not None:
        return np.asarray(custom)
    ids = np.zeros(grid.num_faces, dtype=np.int64)
    bnd = grid.boundary_faces
    normals = grid.face_normals
    dim = normals.shape[1]
    for axis in range(dim):
        for sign, off in ((-1.0, 1), (1.0, 2)):
            hit = bnd & (np.abs(normals[:, axis] - sign) < 1e-10)
            ids[hit] = 2 * axis + off
    # any boundary face with a non-axis-aligned normal (unstructured grids)
    # keeps id 0; IdBased then classifies it via the ``default`` rule
    return ids


def _parse_ids(value) -> set:
    """Accept an id list, a single int, or a space/comma-separated string
    (the reference assigns plain strings: cfg["neumann"] = "7")."""
    if value is None:
        return set()
    if isinstance(value, str):
        value = value.replace(",", " ").split()
    elif np.isscalar(value):
        value = [value]
    return {int(v) for v in value}


def make_boundary_info(grid: Grid, config: Optional[Mapping] = None) -> BoundaryInfo:
    """Factory mirroring Stuff::Grid::BoundaryInfoConfigs.

    config["type"] in {"stuff.grid.boundaryinfo.alldirichlet" (default),
    "...allneumann", "...normalbased", "...idbased"}.  Normal-based takes
    ``default`` ("dirichlet"|"neumann") plus ``dirichlet``/``neumann`` lists of
    outward normal directions (problems/thermalblock.hh:480-484 uses default
    dirichlet with neumann [-1 0] and [1 0]).  Id-based takes
    ``dirichlet``/``neumann`` boundary-id lists (ints, or a string like "7" —
    the reference's multiscale boundary config idiom, block-swipdg.hh:112-119)
    plus ``default`` for unlisted ids; ids come from :func:`boundary_id_faces`.
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
    if t.endswith("idbased"):
        default = str(cfg.get("default", "dirichlet")).lower()
        ids = boundary_id_faces(grid)
        dir_ids = _parse_ids(cfg.get("dirichlet"))
        neu_ids = _parse_ids(cfg.get("neumann"))
        overlap = dir_ids & neu_ids
        if overlap:
            raise ValueError(
                f"boundary ids {sorted(overlap)} listed as both dirichlet and neumann")
        dir_ = bnd & np.isin(ids, sorted(dir_ids))
        neu = bnd & np.isin(ids, sorted(neu_ids))
        rest = bnd & ~dir_ & ~neu
        if default.startswith("dirichlet"):
            dir_ |= rest
        else:
            neu |= rest
        return BoundaryInfo(grid, dir_, neu)
    raise ValueError(f"unknown boundary info type {t!r}")
