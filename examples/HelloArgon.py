"""HelloArgon: the smallest possible simulation — three argon atoms
interacting through Lennard-Jones, integrated with Verlet NVE.

The openmm_tpu counterpart of the reference's examples/HelloArgon.cpp
(main at HelloArgon.cpp:69): build a System by hand, add a NonbondedForce,
run dynamics, and print a PDB trajectory to stdout.

Run:  python examples/HelloArgon.py > argon.pdb
"""
import sys

import openmm_tpu as mm
from openmm_tpu import unit


def write_pdb_frame(frame_num, state, out=sys.stdout):
    """Minimal PDB frame writer (HelloArgon.cpp writePdbFrame)."""
    positions = state.getPositions().value_in_unit(unit.angstrom)
    out.write("MODEL     %d\n" % frame_num)
    for i, (x, y, z) in enumerate(positions):
        out.write("ATOM  %5d  AR   AR     1    " % (i + 1))
        out.write("%8.3f%8.3f%8.3f  1.00  0.00\n" % (x, y, z))
    out.write("ENDMDL\n")


def main():
    system = mm.System()
    nonbond = mm.NonbondedForce()
    system.addForce(nonbond)

    positions = []
    for i in range(3):
        system.addParticle(39.95)                 # argon mass (amu)
        # sigma = 0.3350 nm, epsilon (well depth) = 0.996 kJ/mol
        nonbond.addParticle(0.0, 0.3350, 0.996)
        positions.append(mm.Vec3(0.5 * i, 0.0, 0.0))  # 5 A apart on a line

    integrator = mm.VerletIntegrator(0.004)       # 4 fs, NVE
    context = mm.Context(system, integrator)
    context.setPositions(positions)

    print("REMARK  Using platform %s"
          % context.getPlatform().getName(), file=sys.stderr)

    frame = 1
    while True:
        state = context.getState(getPositions=True, getEnergy=True)
        time_ps = state.getTime().value_in_unit(unit.picosecond)
        write_pdb_frame(frame, state)
        if time_ps >= 10.0:
            break
        integrator.step(10)
        frame += 1


if __name__ == "__main__":
    main()
