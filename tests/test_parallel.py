"""Multi-device sharding tests on the virtual 8-CPU mesh — the analog of the
reference's two-context multi-GPU consistency test
(platforms/cuda/tests/TestCudaNonbondedForce.cpp:37 testParallelComputation)."""
import numpy as np
import pytest

import jax

import openmm_tpu as mm
from openmm_tpu import unit as u
from openmm_tpu.models import tip3p_water_box
from openmm_tpu.parallel import make_mesh, set_default_mesh

from helpers import reference_platform


@pytest.fixture
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8)
    yield mesh
    set_default_mesh(None)


def test_sharded_energy_matches_single(mesh8):
    system, positions = tip3p_water_box(n_waters=27)
    # single-device energy
    set_default_mesh(None)
    ctx1 = mm.Context(system, mm.VerletIntegrator(0.001), reference_platform())
    ctx1.setPositions(positions)
    st1 = ctx1.getState(getEnergy=True, getForces=True)
    e1 = st1.getPotentialEnergy()._value
    f1 = st1.getForces(asNumpy=True)._value
    # sharded energy
    set_default_mesh(mesh8)
    ctx2 = mm.Context(system, mm.VerletIntegrator(0.001), reference_platform())
    ctx2.setPositions(positions)
    st2 = ctx2.getState(getEnergy=True, getForces=True)
    e2 = st2.getPotentialEnergy()._value
    f2 = st2.getForces(asNumpy=True)._value
    assert abs(e1 - e2) < 1e-8 * max(abs(e1), 1.0), (e1, e2)
    assert np.max(np.abs(f1 - f2)) < 1e-6


def test_sharded_dynamics_runs(mesh8):
    set_default_mesh(mesh8)
    system, positions = tip3p_water_box(n_waters=27)
    integ = mm.LangevinMiddleIntegrator(300.0, 1.0, 0.001)
    ctx = mm.Context(system, integ, reference_platform())
    ctx.setPositions(positions)
    ctx.applyConstraints()
    ctx.setVelocitiesToTemperature(300.0, randomSeed=1)
    integ.step(10)
    st = ctx.getState(getEnergy=True)
    assert np.isfinite(st.getPotentialEnergy()._value)


def test_sharded_neighbor_hot_path_matches_single(mesh8):
    """Neighbor-list-scale system (n >= 1024): the rows tile sweep itself is
    sharded over row blocks (shard_map), not just the small-system N^2 path.
    Counterpart of CudaParallelKernels.cpp:66-248 force decomposition."""
    system, positions = tip3p_water_box(n_waters=512)
    assert system.getNumParticles() >= 1024
    set_default_mesh(None)
    ctx1 = mm.Context(system, mm.VerletIntegrator(0.001),
                      mm.Platform.getPlatformByName("CPU"))
    ctx1.setPositions(positions)
    st1 = ctx1.getState(getEnergy=True, getForces=True)
    e1 = st1.getPotentialEnergy()._value
    f1 = st1.getForces(asNumpy=True)._value

    set_default_mesh(mesh8)
    ctx2 = mm.Context(system, mm.VerletIntegrator(0.001),
                      mm.Platform.getPlatformByName("CPU"))
    ctx2.setPositions(positions)
    st2 = ctx2.getState(getEnergy=True, getForces=True)
    e2 = st2.getPotentialEnergy()._value
    f2 = st2.getForces(asNumpy=True)._value
    set_default_mesh(None)

    scale = np.abs(f1).max()
    assert abs(e1 - e2) < 1e-5 * max(abs(e1), 1.0), (e1, e2)
    assert np.max(np.abs(f1 - f2)) < 1e-6 * scale
