"""Shared test utilities: finite-difference energy-force consistency and
assertion helpers, modeled on the reference's AssertionUtilities.h
(ASSERT_EQUAL_TOL, ASSERT_USUALLY_EQUAL_TOL) and the energy-force test
pattern used across tests/Test*.h."""
import numpy as np

import openmm_tpu as mm
from openmm_tpu import unit


def assert_equal_tol(expected, found, tol):
    expected = float(unit.strip(expected))
    found = float(unit.strip(found))
    denom = max(abs(expected), 1.0) if abs(expected) > 1e-10 else 1.0
    assert abs(expected - found) / denom <= tol, \
        f"expected {expected}, found {found} (tol {tol})"


def assert_equal_vec(expected, found, tol):
    e = np.asarray(unit.strip(expected), float)
    f = np.asarray(unit.strip(found), float)
    scale = max(np.max(np.abs(e)), 1.0)
    assert np.max(np.abs(e - f)) <= tol * scale, \
        f"expected {e}, found {f} (tol {tol})"


def check_energy_force_consistency(context, tol=1e-4, delta=1e-4):
    """Move positions along the normalized force direction and compare the
    energy change to -F·dx (the standard finite-difference gate, e.g.
    tests/TestNonbondedForce.h)."""
    state = context.getState(getPositions=True, getForces=True, getEnergy=True)
    pos = state.getPositions(asNumpy=True).value_in_unit(unit.nanometer)
    f = state.getForces(asNumpy=True).value_in_unit(
        unit.kilojoule_per_mole / unit.nanometer)
    norm = np.sqrt(np.sum(f * f))
    if norm == 0:
        return
    d = f / norm
    step = 0.5 * delta
    context.setPositions(pos + step * d)
    e1 = context.getState(getEnergy=True).getPotentialEnergy().value_in_unit(
        unit.kilojoule_per_mole)
    context.setPositions(pos - step * d)
    e2 = context.getState(getEnergy=True).getPotentialEnergy().value_in_unit(
        unit.kilojoule_per_mole)
    context.setPositions(pos)
    fd_force = (e2 - e1) / delta
    assert abs(fd_force - norm) / norm < tol, \
        f"force magnitude {norm} vs finite difference {fd_force}"


def reference_platform():
    return mm.Platform.getPlatformByName("Reference")


def tpu_platform():
    return mm.Platform.getPlatformByName("TPU")
