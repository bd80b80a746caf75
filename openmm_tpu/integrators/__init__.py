"""Integrators: pure step functions over the simulation state pytree.

API mirrors the reference integrator classes (openmmapi/include/openmm/
*Integrator.h, math in docs-source/usersguide/theory/04_integrators.rst);
each integrator contributes a `_make_step_fn(deps)` that the Context jits and
drives with lax.fori_loop — the TPU counterpart of the per-step kernel
sequences in platforms/common/src/kernels/{verlet,langevin,langevinMiddle,
brownian,noseHooverChain}.cc.
"""
from .base import Integrator, StepDeps
from .verlet import VerletIntegrator
from .langevin import (LangevinIntegrator, LangevinMiddleIntegrator,
                       BrownianIntegrator)
from .variable import VariableVerletIntegrator, VariableLangevinIntegrator
from .nose_hoover import NoseHooverChain, NoseHooverIntegrator
from .custom import CustomIntegrator
from .compound import CompoundIntegrator
from .mts import MTSIntegrator, MTSLangevinIntegrator
from .amd import AMDIntegrator, AMDForceGroupIntegrator, DualAMDIntegrator
from .drude import (DrudeLangevinIntegrator, DrudeSCFIntegrator,
                    DrudeNoseHooverIntegrator)
from .rpmd import RPMDIntegrator

__all__ = [
    "Integrator", "StepDeps", "VerletIntegrator", "LangevinIntegrator",
    "LangevinMiddleIntegrator", "BrownianIntegrator", "VariableVerletIntegrator",
    "VariableLangevinIntegrator", "NoseHooverIntegrator", "NoseHooverChain",
    "CustomIntegrator",
    "CompoundIntegrator", "MTSIntegrator", "MTSLangevinIntegrator",
    "AMDIntegrator", "AMDForceGroupIntegrator", "DualAMDIntegrator",
    "DrudeLangevinIntegrator", "DrudeSCFIntegrator", "DrudeNoseHooverIntegrator",
    "RPMDIntegrator",
]
