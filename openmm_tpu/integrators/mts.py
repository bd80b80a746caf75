"""Multiple-time-step (r-RESPA) integrators, built on CustomIntegrator
exactly like the reference (wrappers/python/openmm/mtsintegrator.py:37,112):
force groups evaluated at different frequencies, innermost loop does the
position updates.
"""
from __future__ import annotations

from .. import unit as u
from ..exceptions import OpenMMException
from .custom import CustomIntegrator


class MTSIntegrator(CustomIntegrator):
    """MTSIntegrator(dt, groups) with groups = [(force_group, substeps), ...];
    e.g. [(0,1), (1,4)] evaluates group 1 four times per group-0 evaluation."""

    def __init__(self, dt, groups):
        super().__init__(dt)
        if len(groups) == 0:
            raise OpenMMException("No force groups specified")
        groups = sorted((int(g), int(n)) for g, n in groups)
        self._mts_groups = groups
        self.addPerDofVariable("x1", 0)
        self.addUpdateContextState()
        self._create_substeps(1, groups)
        self.addConstrainVelocities()

    def _create_substeps(self, parent_substeps, groups):
        group, substeps = groups[0]
        str_group, str_sub = str(group), str(substeps)
        step_ratio = substeps // parent_substeps
        if substeps % parent_substeps != 0:
            raise OpenMMException(
                "The number of substeps for each group must be a multiple of "
                "the number for the previous group")
        for _ in range(step_ratio):
            self.addComputePerDof(
                "v", "v+0.5*(dt/%s)*f%s/m" % (str_sub, str_group))
            if len(groups) == 1:
                self.addComputePerDof("x", "x+(dt/%s)*v" % str_sub)
                self.addComputePerDof("x1", "x")
                self.addConstrainPositions()
                self.addComputePerDof(
                    "v", "v+(x-x1)/(dt/%s)" % str_sub)
            else:
                self._create_substeps(substeps, groups[1:])
            self.addComputePerDof(
                "v", "v+0.5*(dt/%s)*f%s/m" % (str_sub, str_group))


class MTSLangevinIntegrator(CustomIntegrator):
    """MTS + BAOAB Langevin on the innermost step
    (mtsintegrator.py:112)."""

    def __init__(self, temperature, friction, dt, groups):
        super().__init__(dt)
        if len(groups) == 0:
            raise OpenMMException("No force groups specified")
        temperature = float(u.strip(temperature, u.kelvin))
        friction = float(u.strip(friction, u.picosecond ** -1))
        groups = sorted((int(g), int(n)) for g, n in groups)
        self._mts_groups = groups
        from ..constants import BOLTZ
        self.addGlobalVariable("a", 0.0)   # set per step from dt
        self.addGlobalVariable("b", 0.0)
        self.addGlobalVariable("kT", BOLTZ * temperature)
        self.addGlobalVariable("friction", friction)
        self.addPerDofVariable("x1", 0)
        self.addUpdateContextState()
        inner = groups[-1][1]
        self.addComputeGlobal("a", "exp(-friction*dt/%d)" % inner)
        self.addComputeGlobal("b", "sqrt(1-a^2)")
        self._create_substeps(1, groups)
        self.addConstrainVelocities()
        self._temperature = temperature
        self._friction = friction

    def getTemperature(self):
        return u.Quantity(self._temperature, u.kelvin)

    def getFriction(self):
        return u.Quantity(self._friction, u.picosecond ** -1)

    def _create_substeps(self, parent_substeps, groups):
        group, substeps = groups[0]
        str_group, str_sub = str(group), str(substeps)
        step_ratio = substeps // parent_substeps
        if substeps % parent_substeps != 0:
            raise OpenMMException(
                "The number of substeps for each group must be a multiple of "
                "the number for the previous group")
        for _ in range(step_ratio):
            self.addComputePerDof(
                "v", "v+0.5*(dt/%s)*f%s/m" % (str_sub, str_group))
            if len(groups) == 1:
                self.addComputePerDof("x", "x+0.5*(dt/%s)*v" % str_sub)
                self.addComputePerDof(
                    "v", "a*v + b*sqrt(kT/m)*gaussian")
                self.addComputePerDof("x", "x+0.5*(dt/%s)*v" % str_sub)
                self.addComputePerDof("x1", "x")
                self.addConstrainPositions()
                self.addComputePerDof("v", "v+(x-x1)/(dt/%s)" % str_sub)
            else:
                self._create_substeps(substeps, groups[1:])
            self.addComputePerDof(
                "v", "v+0.5*(dt/%s)*f%s/m" % (str_sub, str_group))
