"""Persistent tile-candidate lists: skin correctness, motion-predicate
rebuilds, capacity-overflow escalation, and parameter-update invalidation.

Models the reference's rebuild-on-motion + overflow-retry design
(platforms/cuda/src/kernels/findInteractingBlocks.cu:55-79,
openmmapi/src/ContextImpl.cpp:298-307)."""
import os

import numpy as np
import pytest

import openmm_tpu as mm
from openmm_tpu.models import tip3p_water_box


def make_ctx(n_waters=400, seed=1, **props):
    system, positions = tip3p_water_box(n_waters=n_waters)
    integ = mm.LangevinMiddleIntegrator(300.0, 1.0, 0.002)
    ctx = mm.Context(system, integ, mm.Platform.getPlatformByName("CPU"))
    ctx.setPositions(positions)
    ctx.applyConstraints()
    ctx.setVelocitiesToTemperature(300.0, randomSeed=seed)
    return system, integ, ctx


def test_stale_list_matches_fresh_build():
    """After steps within the skin, forces from the persisted (stale) list
    must match a fresh inline build to accumulation tolerance."""
    import jax
    system, integ, ctx = make_ctx()
    integ.step(17)
    s = ctx._state
    pe, ef = ctx._deps._force_fn_factory(-1)
    with jax.default_device(ctx._device):
        e1, f1 = jax.jit(lambda: ef(s["positions"], s["box"], ctx._params,
                                    s["gp"], s["faux"]))()
        e2, f2 = jax.jit(lambda: ef(s["positions"], s["box"], ctx._params,
                                    s["gp"], None))()
    f1, f2 = np.asarray(f1), np.asarray(f2)
    scale = np.abs(f1).max()
    assert abs(float(e1 - e2)) < 1e-4 * abs(float(e1))
    assert np.abs(f1 - f2).max() < 2e-5 * scale


def test_rebuild_fires_on_motion():
    """ref_pos must track rebuilds: after enough steps the reference
    positions in the aux state differ from the initial build."""
    system, integ, ctx = make_ctx()
    i_nb = [i for i, m in enumerate(ctx._modules) if m.needs_aux][0]
    integ.step(1)
    ref0 = np.asarray(ctx._state["faux"][str(i_nb)]["ref_pos"])
    assert np.isfinite(ref0).all()          # first build happened
    integ.step(400)                         # far beyond skin/2 of motion
    ref1 = np.asarray(ctx._state["faux"][str(i_nb)]["ref_pos"])
    assert np.abs(ref1 - ref0).max() > 0.0  # at least one rebuild fired
    e = ctx.getState(getEnergy=True).getPotentialEnergy()._value
    assert np.isfinite(e)


def test_overflow_escalation_recovers():
    """An undersized candidate budget must be grown host-side and the chunk
    re-run, producing a finite trajectory (ContextImpl.cpp:298-307)."""
    os.environ["OMM_TPU_NL_MARGIN"] = "0.05"
    try:
        system, integ, ctx = make_ctx(seed=3)
        integ.step(30)
        e = ctx.getState(getEnergy=True).getPotentialEnergy()._value
        assert np.isfinite(e)
        nb = [f for f in system.getForces()
              if isinstance(f, mm.NonbondedForce)][0]
        assert getattr(nb, "_nl_scale", 1.0) > 1.0
    finally:
        del os.environ["OMM_TPU_NL_MARGIN"]


def test_update_parameters_invalidates_cache():
    """updateParametersInContext must not leave stale parameter planes in
    the persisted tile state (NonbondedForce.h:570 semantics)."""
    system, integ, ctx = make_ctx(n_waters=400)
    integ.step(5)
    nb = [f for f in system.getForces() if isinstance(f, mm.NonbondedForce)][0]
    e_before = ctx.getState(getEnergy=True).getPotentialEnergy()._value
    # scale all charges to zero: Coulomb disappears
    for i in range(nb.getNumParticles()):
        c, s, e = nb.getParticleParameters(i)
        nb.setParticleParameters(i, 0.0, s, e)
    for i in range(nb.getNumExceptions()):
        p1, p2, cp, s, e = nb.getExceptionParameters(i)
        nb.setExceptionParameters(i, p1, p2, 0.0, s, e)
    nb.updateParametersInContext(ctx)
    e_after = ctx.getState(getEnergy=True).getPotentialEnergy()._value
    assert abs(e_after - e_before) > 1000.0   # electrostatics gone
    assert np.isfinite(e_after)
