"""State: an immutable snapshot of a Context.

Counterpart of the reference State/StateBuilder
(/root/reference/openmmapi/include/openmm/State.h:55,155): time, positions,
velocities, forces, kinetic/potential energy, global parameters, parameter
derivatives, periodic box, integrator vars. Data is stored as numpy arrays in
MD units; accessors return unit-bearing Quantities unless asNumpy semantics
apply (the python wrappers' getPositions(asNumpy=True) behavior).
"""
from __future__ import annotations

import numpy as np

from . import unit as u
from .exceptions import OpenMMException
from .vec3 import Vec3


class State(object):
    # data-type flags, matching State::DataType (State.h:62-71)
    Positions = 1
    Velocities = 2
    Forces = 4
    Energy = 8
    Parameters = 16
    ParameterDerivatives = 32
    IntegratorParameters = 64

    def __init__(self, time=0.0, positions=None, velocities=None, forces=None,
                 kineticEnergy=None, potentialEnergy=None, parameters=None,
                 paramDerivs=None, boxVectors=None, integratorParams=None,
                 stepCount=0):
        self._time = float(time)
        self._positions = positions
        self._velocities = velocities
        self._forces = forces
        self._ke = kineticEnergy
        self._pe = potentialEnergy
        self._parameters = parameters
        self._paramDerivs = paramDerivs
        self._box = boxVectors
        self._integratorParams = integratorParams
        self._stepCount = int(stepCount)

    # -- accessors -------------------------------------------------------------
    def getTime(self):
        return u.Quantity(self._time, u.picosecond)

    def getStepCount(self):
        return self._stepCount

    def getPeriodicBoxVectors(self, asNumpy=False):
        if self._box is None:
            raise OpenMMException("box vectors not available in this State")
        if asNumpy:
            return u.Quantity(np.asarray(self._box), u.nanometer)
        a, b, c = self._box
        return (Vec3(*a), Vec3(*b), Vec3(*c)) * u.nanometer

    def getPeriodicBoxVolume(self):
        if self._box is None:
            raise OpenMMException("box vectors not available in this State")
        b = np.asarray(self._box)
        return u.Quantity(float(abs(np.linalg.det(b))), u.nanometer ** 3)

    def _vec_array(self, arr, unit, asNumpy):
        if arr is None:
            raise OpenMMException("this data was not requested when the State was created")
        if asNumpy:
            return u.Quantity(np.asarray(arr), unit)
        return u.Quantity([Vec3(*row) for row in np.asarray(arr)], unit)

    def getPositions(self, asNumpy=False):
        return self._vec_array(self._positions, u.nanometer, asNumpy)

    def getVelocities(self, asNumpy=False):
        return self._vec_array(self._velocities, u.nanometer / u.picosecond, asNumpy)

    def getForces(self, asNumpy=False):
        return self._vec_array(self._forces, u.kilojoule_per_mole / u.nanometer, asNumpy)

    def getKineticEnergy(self):
        if self._ke is None:
            raise OpenMMException("energy was not requested when the State was created")
        return u.Quantity(float(self._ke), u.kilojoule_per_mole)

    def getPotentialEnergy(self):
        if self._pe is None:
            raise OpenMMException("energy was not requested when the State was created")
        return u.Quantity(float(self._pe), u.kilojoule_per_mole)

    def getParameters(self):
        if self._parameters is None:
            raise OpenMMException("parameters were not requested when the State was created")
        return dict(self._parameters)

    def getEnergyParameterDerivatives(self):
        if self._paramDerivs is None:
            raise OpenMMException("parameter derivatives were not requested")
        return dict(self._paramDerivs)

    def getIntegratorParameters(self):
        if self._integratorParams is None:
            raise OpenMMException("integrator parameters were not requested")
        return dict(self._integratorParams)

    def getDataTypes(self):
        types = 0
        if self._positions is not None:
            types |= State.Positions
        if self._velocities is not None:
            types |= State.Velocities
        if self._forces is not None:
            types |= State.Forces
        if self._ke is not None:
            types |= State.Energy
        if self._parameters is not None:
            types |= State.Parameters
        if self._paramDerivs is not None:
            types |= State.ParameterDerivatives
        if self._integratorParams is not None:
            types |= State.IntegratorParameters
        return types
