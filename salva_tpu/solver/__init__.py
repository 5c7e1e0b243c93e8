from . import common, dfsph, elasticity, iisph, nonpressure, surface_tension, viscosity
from .common import SolverDiagnostics, StepContext
from .elasticity import (
    Becker2009ElasticityForce,
    ElasticityState,
    build_elasticity_state,
    elasticity_coefficients,
)
from .nonpressure import CustomForce, ForceSet, MaskedCustomForce
from .surface_tension import (
    Akinci2013SurfaceTensionForce,
    He2014SurfaceTensionForce,
    WCSPHSurfaceTensionForce,
)
from .viscosity import (
    ArtificialViscosityForce,
    DFSPHViscosityForce,
    XSPHViscosityForce,
)

__all__ = [
    "common",
    "dfsph",
    "iisph",
    "nonpressure",
    "viscosity",
    "surface_tension",
    "elasticity",
    "SolverDiagnostics",
    "StepContext",
    "ForceSet",
    "CustomForce",
    "MaskedCustomForce",
    "XSPHViscosityForce",
    "ArtificialViscosityForce",
    "DFSPHViscosityForce",
    "Akinci2013SurfaceTensionForce",
    "He2014SurfaceTensionForce",
    "WCSPHSurfaceTensionForce",
    "Becker2009ElasticityForce",
    "ElasticityState",
    "build_elasticity_state",
    "elasticity_coefficients",
]
