"""Accelerated molecular dynamics (aMD) integrators, built on
CustomIntegrator like the reference (wrappers/python/openmm/amd.py:38-99):
the potential is boosted below a threshold E by dV = (E-V)^2/(alpha+E-V),
realized by rescaling forces when V < E.
"""
from __future__ import annotations

from .. import unit as u
from .custom import CustomIntegrator

_E = u.kilojoule_per_mole


class AMDIntegrator(CustomIntegrator):
    """Boost applied to the total potential energy (amd.py:38)."""

    def __init__(self, dt, alpha, E):
        super().__init__(dt)
        self.addGlobalVariable("alpha", u.strip(alpha, _E))
        self.addGlobalVariable("E", u.strip(E, _E))
        self.addPerDofVariable("oldx", 0)
        self.addUpdateContextState()
        self.addComputePerDof("v", "v+dt*fprime/m; "
                              "fprime=f*((1-modify) + modify*(alpha/(alpha+E-energy))^2); "
                              "modify=step(E-energy)")
        self.addComputePerDof("oldx", "x")
        self.addComputePerDof("x", "x+dt*v")
        self.addConstrainPositions()
        self.addComputePerDof("v", "(x-oldx)/dt")

    def getAlpha(self):
        return u.Quantity(self.getGlobalVariableByName("alpha"), _E)

    def setAlpha(self, alpha):
        self.setGlobalVariableByName("alpha", u.strip(alpha, _E))

    def getE(self):
        return u.Quantity(self.getGlobalVariableByName("E"), _E)

    def setE(self, E):
        self.setGlobalVariableByName("E", u.strip(E, _E))

    def getEffectiveEnergy(self, energy):
        """Energy + boost dV for the current parameters (amd.py)."""
        energy = u.strip(energy, _E)
        alpha = self.getGlobalVariableByName("alpha")
        E = self.getGlobalVariableByName("E")
        if energy > E:
            return u.Quantity(energy, _E)
        return u.Quantity(energy + (E - energy) ** 2 / (alpha + E - energy), _E)


class AMDForceGroupIntegrator(CustomIntegrator):
    """Boost applied to one force group only (amd.py:99)."""

    def __init__(self, dt, group, alphaGroup, EGroup):
        super().__init__(dt)
        g = str(int(group))
        self.addGlobalVariable("alphaGroup", u.strip(alphaGroup, _E))
        self.addGlobalVariable("EGroup", u.strip(EGroup, _E))
        self.addPerDofVariable("oldx", 0)
        self.addUpdateContextState()
        self.addComputePerDof(
            "v", "v+dt*fprime/m; "
            "fprime=fother + fg*((1-modify) + modify*(alphaGroup/(alphaGroup+EGroup-energy%s))^2); "
            "fother=f-fg; fg=f%s; modify=step(EGroup-energy%s)" % (g, g, g))
        self.addComputePerDof("oldx", "x")
        self.addComputePerDof("x", "x+dt*v")
        self.addConstrainPositions()
        self.addComputePerDof("v", "(x-oldx)/dt")
        self._group = int(group)

    def getAlphaGroup(self):
        return u.Quantity(self.getGlobalVariableByName("alphaGroup"), _E)

    def setAlphaGroup(self, alpha):
        self.setGlobalVariableByName("alphaGroup", u.strip(alpha, _E))

    def getEGroup(self):
        return u.Quantity(self.getGlobalVariableByName("EGroup"), _E)

    def setEGroup(self, E):
        self.setGlobalVariableByName("EGroup", u.strip(E, _E))

    def getEffectiveEnergy(self, totalEnergy, groupEnergy):
        totalEnergy = u.strip(totalEnergy, _E)
        groupEnergy = u.strip(groupEnergy, _E)
        alpha = self.getGlobalVariableByName("alphaGroup")
        E = self.getGlobalVariableByName("EGroup")
        if groupEnergy > E:
            return u.Quantity(totalEnergy, _E)
        return u.Quantity(totalEnergy + (E - groupEnergy) ** 2
                          / (alpha + E - groupEnergy), _E)


class DualAMDIntegrator(CustomIntegrator):
    """Boost on the total energy AND an extra boost on one group (amd.py)."""

    def __init__(self, dt, group, alphaTotal, ETotal, alphaGroup, EGroup):
        super().__init__(dt)
        g = str(int(group))
        self.addGlobalVariable("alphaTotal", u.strip(alphaTotal, _E))
        self.addGlobalVariable("ETotal", u.strip(ETotal, _E))
        self.addGlobalVariable("alphaGroup", u.strip(alphaGroup, _E))
        self.addGlobalVariable("EGroup", u.strip(EGroup, _E))
        self.addPerDofVariable("oldx", 0)
        self.addUpdateContextState()
        self.addComputePerDof(
            "v", "v+dt*fprime/m; "
            "fprime=fprime1 + fprime2; "
            "fprime2=fg*((1-modifyGroup) + modifyGroup*(alphaGroup/(alphaGroup+EGroup-energy%s))^2); "
            "fprime1=fother*((1-modifyTotal) + modifyTotal*(alphaTotal/(alphaTotal+ETotal-energy))^2); "
            "fother=f-fg; fg=f%s; "
            "modifyTotal=step(ETotal-energy); modifyGroup=step(EGroup-energy%s)"
            % (g, g, g))
        self.addComputePerDof("oldx", "x")
        self.addComputePerDof("x", "x+dt*v")
        self.addConstrainPositions()
        self.addComputePerDof("v", "(x-oldx)/dt")
