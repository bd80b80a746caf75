"""HelloWaterBox: a periodic box of TIP3P water with PME electrostatics and
rigid (SETTLE-constrained) molecules, integrated NVE.

Counterpart of the reference's examples/HelloWaterBox.cpp: where the C++
example hand-builds every molecule, this uses the shipped
`tip3p_water_box` builder and prints a PDB trajectory to stdout.

Run:  python examples/HelloWaterBox.py > water.pdb
"""
import sys

import openmm_tpu as mm
from openmm_tpu import unit
from openmm_tpu.models import tip3p_water_box

ATOM_NAMES = [" O  ", " H1 ", " H2 "]


def write_pdb_frame(frame_num, time_ps, state, out=sys.stdout):
    positions = state.getPositions().value_in_unit(unit.angstrom)
    out.write("MODEL     %d\n" % frame_num)
    out.write("REMARK 250 time=%.3f picoseconds\n" % time_ps)
    for i, (x, y, z) in enumerate(positions):
        out.write("HETATM%5d %4s HOH  %4d    " % (
            i + 1, ATOM_NAMES[i % 3], 1 + i // 3))
        out.write("%8.3f%8.3f%8.3f  1.00  0.00            \n" % (x, y, z))
    out.write("ENDMDL\n")


def main():
    # 5x5x5 waters at liquid density; PME + dispersion correction + SETTLE
    system, positions = tip3p_water_box(n_waters=125)

    integrator = mm.VerletIntegrator(0.001)  # 1 fs, NVE
    context = mm.Context(system, integrator)
    context.setPositions(positions)
    context.applyConstraints()
    context.setVelocitiesToTemperature(300.0 * unit.kelvin, randomSeed=1)

    print("REMARK  Using platform %s"
          % context.getPlatform().getName(), file=sys.stderr)

    for frame in range(1, 21):
        state = context.getState(getPositions=True, getEnergy=True)
        time_ps = state.getTime().value_in_unit(unit.picosecond)
        e_tot = (state.getPotentialEnergy() + state.getKineticEnergy()) \
            .value_in_unit(unit.kilojoule_per_mole)
        print("REMARK  t=%6.3f ps  E_total=%12.3f kJ/mol"
              % (time_ps, e_tot), file=sys.stderr)
        write_pdb_frame(frame, time_ps, state)
        integrator.step(50)


if __name__ == "__main__":
    main()
