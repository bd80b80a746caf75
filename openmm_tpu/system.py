"""System: particles, masses, constraints, periodic box, owned Forces, virtual sites.

TPU-native counterpart of the reference public API object
(/root/reference/openmmapi/include/openmm/System.h:66-254). The System is a
pure-Python builder; compilation to packed device arrays happens when a
Context is created (see openmm_tpu/context.py), mirroring how the reference
defers device work to ContextImpl::initialize (openmmapi/src/ContextImpl.cpp:169).
"""
from __future__ import annotations

import numpy as np

from . import unit as u
from .exceptions import OpenMMException
from .vec3 import Vec3


class VirtualSite(object):
    """Base class: a particle whose position is computed from other particles.
    Reference: openmmapi/include/openmm/VirtualSite.h:49."""

    def getNumParticles(self):
        return len(self._particles)

    def getParticle(self, index):
        return self._particles[index]


class TwoParticleAverageSite(VirtualSite):
    """r = w1*r1 + w2*r2 (VirtualSite.h:76)."""

    def __init__(self, particle1, particle2, weight1, weight2):
        self._particles = [particle1, particle2]
        self.weights = [float(weight1), float(weight2)]

    def getWeight(self, index):
        return self.weights[index]


class ThreeParticleAverageSite(VirtualSite):
    """r = w1*r1 + w2*r2 + w3*r3 (VirtualSite.h:104)."""

    def __init__(self, particle1, particle2, particle3, weight1, weight2, weight3):
        self._particles = [particle1, particle2, particle3]
        self.weights = [float(weight1), float(weight2), float(weight3)]

    def getWeight(self, index):
        return self.weights[index]


class OutOfPlaneSite(VirtualSite):
    """r = r1 + w12*r12 + w13*r13 + wcross*(r12 x r13) (VirtualSite.h:141)."""

    def __init__(self, particle1, particle2, particle3, weight12, weight13, weightCross):
        self._particles = [particle1, particle2, particle3]
        self.weight12 = float(weight12)
        self.weight13 = float(weight13)
        self.weightCross = float(weightCross)

    def getWeight12(self):
        return self.weight12

    def getWeight13(self):
        return self.weight13

    def getWeightCross(self):
        return self.weightCross


class LocalCoordinatesSite(VirtualSite):
    """r = origin + x*localPos.x + y*localPos.y + z*localPos.z where the local
    frame is built from weighted particle sums (VirtualSite.h:195)."""

    def __init__(self, particles, originWeights, xWeights, yWeights, localPosition):
        if not (len(particles) == len(originWeights) == len(xWeights) == len(yWeights)):
            raise OpenMMException("LocalCoordinatesSite: weight lists must match particles")
        self._particles = list(particles)
        self.originWeights = [float(w) for w in originWeights]
        self.xWeights = [float(w) for w in xWeights]
        self.yWeights = [float(w) for w in yWeights]
        lp = u.strip(localPosition, u.nanometer) if u.is_quantity(localPosition) else localPosition
        self.localPosition = Vec3(*[float(x) for x in lp])

    def getOriginWeights(self):
        return self.originWeights

    def getXWeights(self):
        return self.xWeights

    def getYWeights(self):
        return self.yWeights

    def getLocalPosition(self):
        return self.localPosition


class System(object):
    """The molecular system definition (System.h:66)."""

    def __init__(self):
        self._masses = []          # amu
        self._constraints = []     # (p1, p2, distance nm)
        self._forces = []
        self._vsites = {}          # particle index -> VirtualSite
        # default box: 2 nm cube (System.h constructor default)
        self._boxVectors = (Vec3(2.0, 0.0, 0.0), Vec3(0.0, 2.0, 0.0), Vec3(0.0, 0.0, 2.0))

    # -- particles ----------------------------------------------------------
    def getNumParticles(self):
        return len(self._masses)

    def addParticle(self, mass):
        self._masses.append(float(u.strip(mass, u.dalton)))
        return len(self._masses) - 1

    def getParticleMass(self, index):
        return u.Quantity(self._masses[index], u.dalton)

    def setParticleMass(self, index, mass):
        self._masses[index] = float(u.strip(mass, u.dalton))

    # -- virtual sites --------------------------------------------------------
    def setVirtualSite(self, index, virtualSite):
        self._vsites[index] = virtualSite

    def isVirtualSite(self, index):
        return index in self._vsites

    def getVirtualSite(self, index):
        if index not in self._vsites:
            raise OpenMMException("particle %d is not a virtual site" % index)
        return self._vsites[index]

    # -- constraints ------------------------------------------------------------
    def getNumConstraints(self):
        return len(self._constraints)

    def addConstraint(self, particle1, particle2, distance):
        self._constraints.append((int(particle1), int(particle2),
                                  float(u.strip(distance, u.nanometer))))
        return len(self._constraints) - 1

    def getConstraintParameters(self, index):
        p1, p2, d = self._constraints[index]
        return p1, p2, u.Quantity(d, u.nanometer)

    def setConstraintParameters(self, index, particle1, particle2, distance):
        self._constraints[index] = (int(particle1), int(particle2),
                                    float(u.strip(distance, u.nanometer)))

    def removeConstraint(self, index):
        del self._constraints[index]

    # -- forces ------------------------------------------------------------------
    def addForce(self, force):
        self._forces.append(force)
        return len(self._forces) - 1

    def getNumForces(self):
        return len(self._forces)

    def getForce(self, index):
        return self._forces[index]

    def getForces(self):
        return list(self._forces)

    def removeForce(self, index):
        del self._forces[index]

    # -- box ------------------------------------------------------------------------
    def setDefaultPeriodicBoxVectors(self, a, b, c):
        a = Vec3(*u.strip(a, u.nanometer))
        b = Vec3(*u.strip(b, u.nanometer))
        c = Vec3(*u.strip(c, u.nanometer))
        _validate_box(a, b, c)
        self._boxVectors = (a, b, c)

    def getDefaultPeriodicBoxVectors(self):
        a, b, c = self._boxVectors
        return (u.Quantity(a, u.nanometer), u.Quantity(b, u.nanometer),
                u.Quantity(c, u.nanometer))

    def usesPeriodicBoundaryConditions(self):
        for f in self._forces:
            try:
                if f.usesPeriodicBoundaryConditions():
                    return True
            except NotImplementedError:
                continue
        return False

    # -- internal packing (used by Context) -------------------------------------------
    def _masses_array(self, dtype=np.float64):
        return np.asarray(self._masses, dtype=dtype)

    def _box_array(self, dtype=np.float64):
        return np.asarray(self._boxVectors, dtype=dtype)

    def __getstate__(self):
        return self.__dict__

    def __setstate__(self, d):
        self.__dict__.update(d)


def _validate_box(a, b, c):
    """Enforce the reduced-form requirement on periodic box vectors
    (System.h setDefaultPeriodicBoxVectors docs: a parallel to x, b in xy plane,
    with the standard reduction constraints)."""
    if a.y != 0 or a.z != 0:
        raise OpenMMException("First periodic box vector must be parallel to x.")
    if b.z != 0:
        raise OpenMMException("Second periodic box vector must be in the x-y plane.")
    if a.x <= 0 or b.y <= 0 or c.z <= 0:
        raise OpenMMException("Periodic box vectors must have positive diagonal elements.")
    if (abs(b.x) > 0.5 * a.x + 1e-6 or abs(c.x) > 0.5 * a.x + 1e-6
            or abs(c.y) > 0.5 * b.y + 1e-6):
        raise OpenMMException("Periodic box vectors must be in reduced form.")
