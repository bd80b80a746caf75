"""openmm_tpu — a TPU-native molecular dynamics framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the reference
OpenMM (/root/reference): same public object model (System / Force /
Integrator / Context / State / Platform), same force functional forms and
integrator math, same app-layer API — but the compute path is a single fused
XLA program per step driven by lax loops, with Pallas kernels on the hot
paths and jax.sharding for multi-chip scaling.

Importing this package enables jax x64 so the double-precision Reference
profile (the correctness oracle, role of platforms/reference/ in the
reference tree) is available; TPU profiles explicitly use f32/bf16 arrays.
"""
import jax as _jax

_jax.config.update("jax_enable_x64", True)

from . import unit  # noqa: E402
from .vec3 import Vec3  # noqa: E402
from .exceptions import OpenMMException  # noqa: E402
from .system import (System, VirtualSite, TwoParticleAverageSite,  # noqa: E402
                     ThreeParticleAverageSite, OutOfPlaneSite,
                     LocalCoordinatesSite)
from .state import State  # noqa: E402
from .platform import Platform  # noqa: E402
from .context import Context  # noqa: E402
from .forces import *  # noqa: E402,F401,F403
from .forces import __all__ as _forces_all  # noqa: E402
from .integrators import *  # noqa: E402,F401,F403
from .integrators import __all__ as _integrators_all  # noqa: E402
from .version import version as __version__  # noqa: E402

__all__ = ([
    "unit", "Vec3", "OpenMMException", "System", "State", "Platform",
    "Context", "VirtualSite", "TwoParticleAverageSite",
    "ThreeParticleAverageSite", "OutOfPlaneSite", "LocalCoordinatesSite",
] + list(_forces_all) + list(_integrators_all))

# the version module object, mirroring `openmm.version`
from . import version  # noqa: E402
from .serialization import XmlSerializer  # noqa: E402
from .minimize import LocalEnergyMinimizer, MinimizationReporter  # noqa: E402
from .tabulated import (TabulatedFunction, Continuous1DFunction,  # noqa: E402,F811
                        Continuous2DFunction, Continuous3DFunction,
                        Discrete1DFunction, Discrete2DFunction,
                        Discrete3DFunction)

__all__ += ["XmlSerializer", "LocalEnergyMinimizer", "MinimizationReporter"]
