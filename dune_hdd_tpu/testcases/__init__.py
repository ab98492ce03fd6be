from .base import TestCaseBase, make_cube_hierarchy
from .esv2007 import ESV2007TestCase

__all__ = ["TestCaseBase", "make_cube_hierarchy", "ESV2007TestCase"]
from .esv2007 import ESV2007TestCase  # noqa: F811 (re-export)
from .os2014 import OS2014MultiscaleTestCase, OS2014TestCase
from .spe10 import (
    Spe10BlockModel1TestCase,
    Spe10Model1TestCase,
    Spe10ParametricBlockModel1TestCase,
    Spe10ParametricModel1TestCase,
)
from .thermalblock import BlockThermalblockTestCase, ThermalblockTestCase

__all__ += [
    "OS2014TestCase",
    "OS2014MultiscaleTestCase",
    "Spe10Model1TestCase",
    "Spe10ParametricModel1TestCase",
    "Spe10BlockModel1TestCase",
    "Spe10ParametricBlockModel1TestCase",
    "ThermalblockTestCase",
    "BlockThermalblockTestCase",
]
