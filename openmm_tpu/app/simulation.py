"""Simulation: ties Topology + System + Integrator + Context with a
reporter-aware stepping loop (counterpart of
wrappers/python/openmm/app/simulation.py:60-240: step chunks toward the next
report time, one batched getState feeding all due reporters,
minimizeEnergy, runForClockTime with periodic checkpoints,
saveCheckpoint/saveState)."""
from __future__ import annotations

import datetime
import sys
import time

from .. import unit as u
from ..context import Context
from ..platform import Platform
from ..state import State


class Simulation(object):
    def __init__(self, topology, system, integrator, platform=None,
                 platformProperties=None, state=None):
        self.topology = topology
        if isinstance(system, str):
            from ..serialization import XmlSerializer
            with open(system) as f:
                system = XmlSerializer.deserialize(f.read())
        self.system = system
        if isinstance(integrator, str):
            from ..serialization import XmlSerializer
            with open(integrator) as f:
                integrator = XmlSerializer.deserialize(f.read())
        self.integrator = integrator
        self.currentStep = 0
        self.reporters = []
        if platform is None:
            self.context = Context(system, integrator)
        elif platformProperties is None:
            self.context = Context(system, integrator, platform)
        else:
            self.context = Context(system, integrator, platform,
                                   platformProperties)
        if state is not None:
            with open(state) as f:
                from ..serialization import XmlSerializer
                self.context.setState(XmlSerializer.deserialize(f.read()))
        else:
            # without a restored state, the topology box (when present)
            # overrides the System default; applying it after state= would
            # clobber a restored NPT box (the reference never sets the box
            # from topology here — simulation.py:102-110)
            box = (topology.getPeriodicBoxVectors()
                   if topology is not None else None)
            if box is not None:
                self.context.setPeriodicBoxVectors(
                    *box.value_in_unit(u.nanometer))

    def minimizeEnergy(self, tolerance=10.0, maxIterations=0):
        from ..minimize import LocalEnergyMinimizer
        LocalEnergyMinimizer.minimize(self.context, tolerance, maxIterations)

    def step(self, steps):
        self._simulate(endStep=self.currentStep + steps)

    def runForClockTime(self, time_limit, checkpointFile=None, stateFile=None,
                        checkpointInterval=None):
        if u.is_quantity(time_limit):
            time_limit = time_limit.value_in_unit(u.second)
        if checkpointInterval is not None and u.is_quantity(checkpointInterval):
            checkpointInterval = checkpointInterval.value_in_unit(u.second)
        end_time = time.time() + time_limit
        while time.time() < end_time:
            if checkpointInterval is None:
                next_time = end_time
            else:
                next_time = min(time.time() + checkpointInterval, end_time)
            self._simulate(endTime=next_time)
            if checkpointFile is not None:
                self.saveCheckpoint(checkpointFile)
            if stateFile is not None:
                self.saveState(stateFile)

    def saveCheckpoint(self, file):
        if isinstance(file, str):
            with open(file, "wb") as f:
                f.write(self.context.createCheckpoint())
        else:
            file.write(self.context.createCheckpoint())

    def loadCheckpoint(self, file):
        if isinstance(file, str):
            with open(file, "rb") as f:
                self.context.loadCheckpoint(f.read())
        else:
            self.context.loadCheckpoint(file.read())
        self.currentStep = self.context.getStepCount()

    def saveState(self, file):
        from ..serialization import XmlSerializer
        state = self.context.getState(
            getPositions=True, getVelocities=True, getParameters=True,
            getIntegratorParameters=True)
        xml = XmlSerializer.serialize(state)
        if isinstance(file, str):
            with open(file, "w") as f:
                f.write(xml)
        else:
            file.write(xml)

    def loadState(self, file):
        from ..serialization import XmlSerializer
        if isinstance(file, str):
            with open(file) as f:
                xml = f.read()
        else:
            xml = file.read()
        self.context.setState(XmlSerializer.deserialize(xml))
        self.currentStep = self.context.getStepCount()

    def _simulate(self, endStep=None, endTime=None):
        if endStep is None:
            endStep = sys.maxsize
        nextReport = [None] * len(self.reporters)
        while self.currentStep < endStep and (endTime is None
                                              or time.time() < endTime):
            nextSteps = endStep - self.currentStep
            anyReport = False
            for i, reporter in enumerate(self.reporters):
                nextReport[i] = reporter.describeNextReport(self)
                if isinstance(nextReport[i], dict):
                    steps = nextReport[i]["steps"]
                else:
                    steps = nextReport[i][0]
                if 0 < steps <= nextSteps:
                    nextSteps = steps
                    anyReport = True
            stepsToGo = nextSteps
            while stepsToGo > 10 and (endTime is None
                                      or time.time() < endTime):
                self.integrator.step(10)
                stepsToGo -= 10
            self.integrator.step(stepsToGo)
            self.currentStep += nextSteps
            if anyReport:
                # compute the union of requirements for all due reporters
                wrapped = []
                unwrapped = []
                for i, reporter in enumerate(self.reporters):
                    rep = nextReport[i]
                    if isinstance(rep, dict):
                        steps = rep["steps"]
                        include = rep.get("include", [])
                        flags = (("positions" in include), ("velocities" in include),
                                 ("forces" in include), ("energy" in include))
                        wrap = rep.get("periodic", None)
                    else:
                        steps = rep[0]
                        flags = tuple(rep[1:5])
                        wrap = rep[5] if len(rep) > 5 else None
                    if steps == nextSteps:
                        if wrap is None:
                            wrap = self.system.usesPeriodicBoundaryConditions()
                        (wrapped if wrap else unwrapped).append(
                            (reporter, flags))
                for group, enforce in ((wrapped, True), (unwrapped, False)):
                    if not group:
                        continue
                    types = 0
                    for _, flags in group:
                        if flags[0]:
                            types |= State.Positions
                        if flags[1]:
                            types |= State.Velocities
                        if flags[2]:
                            types |= State.Forces
                        if flags[3]:
                            types |= State.Energy
                    state = self.context.getState(
                        types, enforcePeriodicBox=enforce)
                    for reporter, _ in group:
                        reporter.report(self, state)
