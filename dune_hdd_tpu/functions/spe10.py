"""SPE10 model-1 permeability field (Stuff::Functions::Spe10::Model1 analog,
used by problems/spe10.hh:139-146).

The reference reads the SPE10 model-1 ASCII file ``perm_case1.dat`` (100 x 20
cells mapped onto [0,5] x [0,1]) and clamps values to
[model1_min_value, model1_max_value] = [0.001, 998.915].  The data file is not
distributed with the reference repo; when it is absent we fall back to a
*deterministic* synthetic channelized field spanning the same dynamic range
(documented deviation: SPE10 expectation tables can then only be matched in
EOC rate / estimator-efficiency structure, not raw values).
"""
from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .base import Function

__all__ = ["Spe10Model1Function", "model1_filename", "MODEL1_MIN", "MODEL1_MAX"]

model1_filename = "perm_case1.dat"
MODEL1_MIN = 0.001
MODEL1_MAX = 998.915
MODEL1_NX = 100
MODEL1_NZ = 20


def _synthetic_model1_field(nx: int = MODEL1_NX, nz: int = MODEL1_NZ) -> np.ndarray:
    """Deterministic channelized log-permeability field in [MODEL1_MIN, MODEL1_MAX].

    A sum of sinusoidal channels + smooth random (fixed-seed) background in
    log10 space, qualitatively matching SPE10 model 1's high-contrast layering.
    """
    rng = np.random.default_rng(20140513)  # fixed: OS2014-era date, deterministic
    x = (np.arange(nx) + 0.5) / nx
    z = (np.arange(nz) + 0.5) / nz
    X, Z = np.meshgrid(x, z, indexing="ij")
    log_lo, log_hi = np.log10(MODEL1_MIN), np.log10(MODEL1_MAX)
    background = 0.35 * np.sin(6.0 * np.pi * Z) + 0.2 * np.sin(3.0 * np.pi * X + 2.0)
    for k in range(1, 7):
        amp = rng.normal(0.0, 0.25 / k)
        phx, phz = rng.uniform(0, 2 * np.pi, size=2)
        background += amp * np.sin(2 * np.pi * k * X + phx) * np.sin(2 * np.pi * k * Z + phz)
    # two high-permeability channels meandering in x
    for centre, width, level in ((0.3, 0.06, 0.95), (0.72, 0.05, 0.9)):
        path = centre + 0.08 * np.sin(2.5 * np.pi * X)
        background += level * np.exp(-((Z - path) ** 2) / (2 * width**2))
    b = (background - background.min()) / (background.max() - background.min())
    return 10.0 ** (log_lo + b * (log_hi - log_lo))


def _read_model1_file(path: str, min_value: float = MODEL1_MIN,
                      max_value: float = MODEL1_MAX) -> np.ndarray:
    """Parse a perm_case1.dat-format file with dune-stuff reader parity.

    Stuff::Functions::Spe10::Model1 (consumed by the reference's
    problems/spe10.hh:152-156) reads whitespace-separated doubles (x fastest,
    then z — the SPE10 model-1 convention) and LINEARLY RESCALES them from the
    published data range [model1_min_value, model1_max_value] =
    [0.001, 998.915] into the requested [min, max]:
    ``perm = scale * raw + shift`` with
    ``scale = (max - min) / (model1_max - model1_min)`` and
    ``shift = min - scale * model1_min``.  There is NO clamping of file data —
    with the default range the transform is the identity.
    """
    if not max_value > min_value:
        raise ValueError(f"need max > min, got [{min_value}, {max_value}]")
    # token-stream parse (``datafile >> value`` loop parity): the real file's
    # line structure is irrelevant and its last line may be ragged
    with open(path) as fh:
        vals = np.array(fh.read().split(), dtype=float)
    need = MODEL1_NX * MODEL1_NZ
    if vals.size < need:
        raise ValueError(
            f"SPE10 model1 file {path!r} has {vals.size} values, need {need}"
        )
    scale = (max_value - min_value) / (MODEL1_MAX - MODEL1_MIN)
    shift = min_value - scale * MODEL1_MIN
    # file layout: x fastest, then z (SPE10 convention)
    return scale * vals[:need].reshape(MODEL1_NZ, MODEL1_NX).T + shift


class Spe10Model1Function(Function):
    """2x2 diagonal tensor field lambda(x) * I from the SPE10 model-1 data."""

    range_shape = (2, 2)

    def __init__(
        self,
        filename: str = model1_filename,
        lower_left=(0.0, 0.0),
        upper_right=(5.0, 1.0),
        min_value: float = MODEL1_MIN,
        max_value: float = MODEL1_MAX,
        name: str = "diffusion_tensor",
        search_paths: Optional[list] = None,
    ):
        self.lower = jnp.asarray(lower_left, dtype=jnp.result_type(float))
        self.upper = jnp.asarray(upper_right, dtype=jnp.result_type(float))
        self.order = 0
        self.name = name
        paths = [filename]
        for d in search_paths or [os.getcwd(), os.path.dirname(__file__), "/root/repo/data"]:
            paths.append(os.path.join(d, os.path.basename(filename)))
        field = None
        self.synthetic = True
        for p in paths:
            if os.path.isfile(p):
                # dune-stuff reader parity: linear rescale, no clamp
                field = _read_model1_file(p, min_value, max_value)
                self.synthetic = False
                break
        if field is None:
            field = np.clip(_synthetic_model1_field(), min_value, max_value)
        self.field = jnp.asarray(field)  # [NX, NZ]

    def permeability(self, x):
        rel = (x - self.lower) / (self.upper - self.lower)
        nxz = jnp.asarray([MODEL1_NX, MODEL1_NZ], dtype=x.dtype)
        ij = jnp.clip(jnp.floor(rel * nxz), 0, nxz - 1).astype(jnp.int32)
        return self.field[ij[..., 0], ij[..., 1]]

    def __call__(self, x):
        lam = self.permeability(x)
        eye = jnp.eye(2, dtype=x.dtype)
        return lam[..., None, None] * eye
