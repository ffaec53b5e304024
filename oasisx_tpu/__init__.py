"""oasisx_tpu: a TPU-native (JAX/XLA/Pallas) incompressible Navier-Stokes
framework with the capabilities of ComputationalPhysiology/oasisx.

Public API mirrors the reference package surface
(/root/reference/src/oasisx/__init__.py:12-18).
"""

import logging

logging.basicConfig()
logger = logging.getLogger("oasisx_tpu")
logging.captureWarnings(capture=True)

from .bcs import DirichletBC, LocatorMethod, PressureBC  # noqa: E402
from .function import LumpedProject, Projector  # noqa: E402

__all__ = [
    "Projector",
    "LumpedProject",
    "DirichletBC",
    "LocatorMethod",
    "PressureBC",
]

try:  # fracstep is added by the solver layer
    from .fracstep import FractionalStep_AB_CN  # noqa: E402

    __all__.append("FractionalStep_AB_CN")
except ImportError:
    pass
