"""Force classes: pure-data API objects that compile to jitted energy modules.

Each class mirrors a reference Force (openmmapi/include/openmm/*Force.h) at the
API level; `_compile()` replaces the reference's Force -> ForceImpl -> per-
platform Kernel pipeline (openmmapi/include/openmm/Force.h:107 createImpl,
olla/include/openmm/kernels.h) with a single step: pack parameters into device
arrays and return a differentiable energy function.
"""
from .base import Force, CompiledForce, CompileConfig
from .bonded import (HarmonicBondForce, HarmonicAngleForce,
                     PeriodicTorsionForce, RBTorsionForce, CMAPTorsionForce)
from .nonbonded import NonbondedForce
from .cmmotion import CMMotionRemover
from .thermostats import AndersenThermostat
from .barostats import (MonteCarloBarostat, RPMDMonteCarloBarostat, RPMDUpdater, MonteCarloAnisotropicBarostat,
                        MonteCarloMembraneBarostat)
from .custom import (CustomExternalForce, CustomBondForce, CustomAngleForce,
                     CustomTorsionForce, CustomNonbondedForce,
                     CustomCompoundBondForce, CustomCentroidBondForce)
from .customgb import CustomGBForce
from .customhbond import CustomHbondForce
from .customcv import CustomCVForce
from .gbsa import GBSAOBCForce
from .rmsd import RMSDForce
from .gayberne import GayBerneForce
from .custommanyparticle import CustomManyParticleForce
from .drude import DrudeForce
from .amoeba import (AmoebaVdwForce, AmoebaMultipoleForce,
                     AmoebaTorsionTorsionForce, AmoebaWcaDispersionForce,
                     AmoebaGeneralizedKirkwoodForce)
from .hippo import HippoNonbondedForce
from ..tabulated import (TabulatedFunction, Continuous1DFunction,
                         Continuous2DFunction, Continuous3DFunction,
                         Discrete1DFunction, Discrete2DFunction,
                         Discrete3DFunction)

__all__ = [
    "Force", "CompiledForce", "CompileConfig",
    "HarmonicBondForce", "HarmonicAngleForce", "PeriodicTorsionForce",
    "RBTorsionForce", "CMAPTorsionForce", "NonbondedForce", "CMMotionRemover",
    "AndersenThermostat", "MonteCarloBarostat", "RPMDMonteCarloBarostat", "RPMDUpdater", "MonteCarloAnisotropicBarostat",
    "MonteCarloMembraneBarostat",
    "CustomExternalForce", "CustomBondForce", "CustomAngleForce",
    "CustomTorsionForce", "CustomNonbondedForce", "CustomCompoundBondForce",
    "CustomCentroidBondForce", "CustomGBForce", "CustomHbondForce",
    "CustomCVForce", "GBSAOBCForce", "RMSDForce", "GayBerneForce",
    "CustomManyParticleForce", "DrudeForce", "AmoebaVdwForce",
    "AmoebaMultipoleForce", "AmoebaTorsionTorsionForce", "AmoebaWcaDispersionForce",
    "AmoebaGeneralizedKirkwoodForce", "HippoNonbondedForce",
    "TabulatedFunction", "Continuous1DFunction", "Continuous2DFunction",
    "Continuous3DFunction", "Discrete1DFunction", "Discrete2DFunction",
    "Discrete3DFunction",
]
