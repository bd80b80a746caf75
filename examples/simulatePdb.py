"""simulatePdb: the canonical app-layer workflow — load a PDB, parameterize
it with a force field, minimize, and run NPT-ready Langevin dynamics with
reporters.

Counterpart of the reference's examples/simulatePdb.py, using the shipped
JSON force-field conversions of the same parameter sets.

Run:  python examples/simulatePdb.py [input.pdb]
"""
import sys

from openmm_tpu import unit
from openmm_tpu.app import (PME, ForceField, HBonds, PDBFile, PDBReporter,
                            Simulation, StateDataReporter)
from openmm_tpu.integrators import LangevinMiddleIntegrator

pdb_path = sys.argv[1] if len(sys.argv) > 1 else "input.pdb"
pdb = PDBFile(pdb_path)
forcefield = ForceField("amber14-all.json", "amber14-tip3pfb.json")
system = forcefield.createSystem(pdb.topology, nonbondedMethod=PME,
                                 nonbondedCutoff=1 * unit.nanometer,
                                 constraints=HBonds)
integrator = LangevinMiddleIntegrator(300 * unit.kelvin,
                                      1 / unit.picosecond,
                                      0.004 * unit.picoseconds)
simulation = Simulation(pdb.topology, system, integrator)
simulation.context.setPositions(pdb.positions)
simulation.minimizeEnergy()
simulation.reporters.append(PDBReporter("output.pdb", 1000))
simulation.reporters.append(StateDataReporter(sys.stdout, 1000, step=True,
                                              potentialEnergy=True,
                                              temperature=True))
simulation.step(10000)
