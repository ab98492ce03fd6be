"""dune_hdd_tpu — a TPU-native (JAX/XLA/Pallas) framework for parametric
linear elliptic problems with the capabilities of dune-hdd: affine parameter
decompositions, CG / SWIPDG / block-SWIPDG discretizations, ESV2007 / OS2014
a-posteriori error estimators, EOC study harnesses, and reduced-basis
(LRBMS-style) model order reduction.
"""

__version__ = "0.1.0"

from .parameters import Parameter, ParameterFunctional, ParameterType, parse_parameter
from .affine import AffineDecomposition

__all__ = [
    "Parameter",
    "ParameterFunctional",
    "ParameterType",
    "parse_parameter",
    "AffineDecomposition",
]
