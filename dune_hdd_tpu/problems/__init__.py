from .interfaces import Problem
from .default import DefaultProblem
from .esv2007 import ESV2007Problem
from .os2014 import ParametricESV2007Problem
from .mixed_boundaries import MixedBoundariesProblem
from .thermalblock import ThermalblockProblem, LocalThermalblockProblem
from .spe10 import Spe10Model1Problem
from .zero_boundary import ZeroBoundaryProblem
from .provider import ProblemsProvider

__all__ = [
    "Problem",
    "DefaultProblem",
    "ESV2007Problem",
    "ParametricESV2007Problem",
    "MixedBoundariesProblem",
    "ThermalblockProblem",
    "LocalThermalblockProblem",
    "Spe10Model1Problem",
    "ZeroBoundaryProblem",
    "ProblemsProvider",
]
