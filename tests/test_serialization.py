"""XML serialization round-trip tests (pattern of serialization/tests/)."""
import math

import numpy as np
import pytest

import openmm_tpu as mm
from openmm_tpu import unit as u
from openmm_tpu.serialization import XmlSerializer

from helpers import reference_platform


def _energy(system, positions):
    ctx = mm.Context(system, mm.VerletIntegrator(0.001), reference_platform())
    ctx.setPositions(positions)
    return ctx.getState(getEnergy=True).getPotentialEnergy()._value


def test_system_roundtrip():
    from openmm_tpu.models import tip3p_water_box
    system, positions = tip3p_water_box(n_waters=8)
    hb = mm.HarmonicBondForce()
    hb.addBond(0, 3, 0.5, 100.0)
    system.addForce(hb)
    xml = XmlSerializer.serialize(system)
    system2 = XmlSerializer.deserialize(xml)
    assert system2.getNumParticles() == system.getNumParticles()
    assert system2.getNumConstraints() == system.getNumConstraints()
    assert system2.getNumForces() == system.getNumForces()
    e1 = _energy(system, positions)
    e2 = _energy(system2, positions)
    assert abs(e1 - e2) < 1e-6 * max(1.0, abs(e1))


def test_virtual_site_roundtrip():
    system = mm.System()
    for _ in range(3):
        system.addParticle(1.0)
    system.addParticle(0.0)
    system.setVirtualSite(3, mm.TwoParticleAverageSite(0, 1, 0.4, 0.6))
    xml = XmlSerializer.serialize(system)
    system2 = XmlSerializer.deserialize(xml)
    assert system2.isVirtualSite(3)
    vs = system2.getVirtualSite(3)
    assert vs.getParticle(0) == 0 and vs.getParticle(1) == 1
    assert abs(vs.getWeight(0) - 0.4) < 1e-12


def test_custom_forces_roundtrip():
    system = mm.System()
    system.addParticle(1.0)
    system.addParticle(1.0)
    cb = mm.CustomBondForce("k*(r-r0)^2")
    cb.addGlobalParameter("k", 10.0)
    cb.addPerBondParameter("r0")
    cb.addBond(0, 1, [1.1])
    system.addForce(cb)
    cnb = mm.CustomNonbondedForce("a1*a2/r")
    cnb.addPerParticleParameter("a")
    cnb.addParticle([1.0])
    cnb.addParticle([2.0])
    cnb.addExclusion(0, 1)
    system.addForce(cnb)
    xml = XmlSerializer.serialize(system)
    system2 = XmlSerializer.deserialize(xml)
    cb2 = system2.getForce(0)
    assert cb2.getEnergyFunction() == "k*(r-r0)^2"
    assert cb2.getNumBonds() == 1
    cnb2 = system2.getForce(1)
    assert cnb2.getNumExclusions() == 1


def test_integrator_roundtrip():
    integ = mm.LangevinMiddleIntegrator(310.0, 2.0, 0.004)
    integ.setConstraintTolerance(1e-6)
    xml = XmlSerializer.serialize(integ)
    integ2 = XmlSerializer.deserialize(xml)
    assert type(integ2) is mm.LangevinMiddleIntegrator
    assert abs(integ2.getTemperature()._value - 310.0) < 1e-10
    assert abs(integ2.getStepSize()._value - 0.004) < 1e-12
    assert abs(integ2.getConstraintTolerance() - 1e-6) < 1e-15


def test_state_roundtrip():
    system = mm.System()
    system.addParticle(1.0)
    system.addParticle(2.0)
    nb = mm.NonbondedForce()
    nb.addParticle(0.5, 0.3, 0.5)
    nb.addParticle(-0.5, 0.3, 0.5)
    system.addForce(nb)
    ctx = mm.Context(system, mm.VerletIntegrator(0.002), reference_platform())
    ctx.setPositions([mm.Vec3(0, 0, 0), mm.Vec3(1, 0, 0)])
    ctx.setVelocities([mm.Vec3(0.1, 0, 0), mm.Vec3(0, 0.2, 0)])
    ctx.setTime(3.5)
    st = ctx.getState(getPositions=True, getVelocities=True, getEnergy=True,
                      getParameters=True)
    xml = XmlSerializer.serialize(st)
    st2 = XmlSerializer.deserialize(xml)
    assert abs(st2.getTime()._value - 3.5) < 1e-10
    p1 = st.getPositions(asNumpy=True)._value
    p2 = st2.getPositions(asNumpy=True)._value
    assert np.max(np.abs(p1 - p2)) < 1e-12
    assert abs(st.getPotentialEnergy()._value
               - st2.getPotentialEnergy()._value) < 1e-10
    # restore into a fresh context
    ctx2 = mm.Context(system, mm.VerletIntegrator(0.002), reference_platform())
    ctx2.setState(st2)
    assert abs(ctx2.getTime()._value - 3.5) < 1e-10


def test_simulation_save_state(tmp_path):
    from openmm_tpu.app import Simulation, Topology, Element
    system = mm.System()
    system.addParticle(1.0)
    nb = mm.NonbondedForce()
    nb.addParticle(0.0, 0.3, 0.1)
    system.addForce(nb)
    top = Topology()
    ch = top.addChain()
    res = top.addResidue("UNK", ch)
    top.addAtom("X", Element.getBySymbol("C"), res)
    sim = Simulation(top, system, mm.VerletIntegrator(0.001),
                     mm.Platform.getPlatformByName("Reference"))
    sim.context.setPositions([mm.Vec3(0.5, 0.5, 0.5)])
    sim.step(7)
    path = str(tmp_path / "state.xml")
    sim.saveState(path)
    sim2 = Simulation(top, system, mm.VerletIntegrator(0.001),
                      mm.Platform.getPlatformByName("Reference"))
    sim2.loadState(path)
    assert sim2.context.getStepCount() == 7


def test_extended_forces_roundtrip():
    hb = mm.CustomHbondForce("k*(distance(d1,a1)-r0)^2")
    hb.addPerDonorParameter("k")
    hb.addPerAcceptorParameter("r0")
    hb.addDonor(0, 1, 2, [10.0])
    hb.addAcceptor(3, 4, -1, [0.2])
    hb.addExclusion(0, 0)
    hb.setNonbondedMethod(mm.CustomHbondForce.CutoffNonPeriodic)
    hb.setCutoffDistance(0.7)

    mp = mm.CustomManyParticleForce(3, "C*(1+3*cos(angle(p1,p2,p3)))")
    mp.addGlobalParameter("C", 2.5)
    for _ in range(4):
        mp.addParticle([], 0)
    mp.addExclusion(0, 1)

    cv = mm.CustomCVForce("v1^2 + 2*v2")
    inner1 = mm.CustomBondForce("r")
    inner1.addBond(0, 1, [])
    inner2 = mm.RMSDForce([mm.Vec3(0, 0, 0), mm.Vec3(0.1, 0, 0)], [0, 1])
    cv.addCollectiveVariable("v1", inner1)
    cv.addCollectiveVariable("v2", inner2)

    aniso = mm.MonteCarloAnisotropicBarostat([1.0, 1.5, 2.0], 300.0,
                                             True, False, True, 17)
    aniso.setRandomNumberSeed(42)
    mem = mm.MonteCarloMembraneBarostat(
        1.0, 5.0, 310.0, mm.MonteCarloMembraneBarostat.XYIsotropic,
        mm.MonteCarloMembraneBarostat.ZFree, 31)

    for force in (hb, mp, cv, aniso, mem):
        xml = XmlSerializer.serialize(force)
        force2 = XmlSerializer.deserialize(xml)
        assert XmlSerializer.serialize(force2) == xml

    hb2 = XmlSerializer.deserialize(XmlSerializer.serialize(hb))
    assert hb2.getNumDonors() == 1 and hb2.getNumAcceptors() == 1
    assert hb2.getDonorParameters(0) == (0, 1, 2, [10.0])
    aniso2 = XmlSerializer.deserialize(XmlSerializer.serialize(aniso))
    assert aniso2.getScaleY() is False
    assert aniso2.getRandomNumberSeed() == 42
    assert aniso2.getFrequency() == 17


def test_extended_integrators_roundtrip():
    nh = mm.NoseHooverIntegrator(320.0, 40.0, 0.002, 4, 3, 5)
    dl = mm.DrudeLangevinIntegrator(300.0, 5.0, 1.0, 20.0, 0.001)
    dl.setMaxDrudeDistance(0.02)
    scf = mm.DrudeSCFIntegrator(0.0005)
    rp = mm.RPMDIntegrator(8, 300.0, 1.0, 0.0005)
    ci = mm.CustomIntegrator(0.001)
    ci.addGlobalVariable("a", 3.5)
    ci.addPerDofVariable("x1", 0.0)
    ci.addUpdateContextState()
    ci.addComputePerDof("v", "v+dt*f/m")
    ci.beginIfBlock("a > 2")
    ci.addComputeGlobal("a", "a-1")
    ci.endBlock()
    ci.addComputePerDof("x", "x+dt*v")
    ci.addConstrainPositions()

    for integ in (nh, dl, scf, rp, ci):
        xml = XmlSerializer.serialize(integ)
        integ2 = XmlSerializer.deserialize(xml)
        assert XmlSerializer.serialize(integ2) == xml

    ci2 = XmlSerializer.deserialize(XmlSerializer.serialize(ci))
    assert ci2.getNumComputations() == ci.getNumComputations()
    assert ci2.getGlobalVariableByName("a") == 3.5
    nh2 = XmlSerializer.deserialize(XmlSerializer.serialize(nh))
    assert nh2._chain_length == 4 and nh2._n_ys == 5

    # a deserialized CustomIntegrator must actually run
    system = mm.System()
    system.addParticle(1.0)
    ctx = mm.Context(system, ci2, mm.Platform.getPlatformByName("Reference"))
    ctx.setPositions([mm.Vec3(0, 0, 0)])
    ci2.step(2)


def test_amoeba_forces_roundtrip():
    vdw = mm.AmoebaVdwForce()
    vdw.addParticle(0, 0.35, 0.5, 1.0)
    vdw.addParticle(0, 0.28, 0.1, 0.91)
    vdw.setParticleExclusions(0, [1])
    vdw.setCutoffDistance(1.2)

    mp = mm.AmoebaMultipoleForce()
    mp.addMultipole(0.5, [0, 0, 0.01], [0.0] * 9,
                    mm.AmoebaMultipoleForce.ZThenX, 1, -1, -1,
                    0.39, 0.3, 0.001)
    mp.addMultipole(-0.5, [0, 0, 0], [0.0] * 9,
                    mm.AmoebaMultipoleForce.NoAxisType, -1, -1, -1,
                    0.39, 0.3, 0.0008)
    mp.setCovalentMap(0, mm.AmoebaMultipoleForce.Covalent12, [1])
    mp.setPolarizationType(mm.AmoebaMultipoleForce.Extrapolated)

    tt = mm.AmoebaTorsionTorsionForce()
    tt.addTorsionTorsion(0, 1, 2, 3, 4, 5, 0)
    xs = [-180.0, -60.0, 60.0, 180.0]
    grid = [[[a1, a2, 0.1 * a1 + 0.2 * a2, 0.1, 0.2, 0.0] for a2 in xs]
            for a1 in xs]
    tt.setTorsionTorsionGrid(0, grid)

    wca = mm.AmoebaWcaDispersionForce()
    wca.addParticle(0.2, 0.4)
    wca.setDispoff(0.3)

    rb = mm.RPMDMonteCarloBarostat(2.5, 10)

    for force in (vdw, mp, tt, wca, rb):
        xml = XmlSerializer.serialize(force)
        force2 = XmlSerializer.deserialize(xml)
        assert XmlSerializer.serialize(force2) == xml, type(force).__name__
    mp2 = XmlSerializer.deserialize(XmlSerializer.serialize(mp))
    assert mp2.getCovalentMap(0, mm.AmoebaMultipoleForce.Covalent12) == [1]
    assert mp2.getMultipoleParameters(0)[0] == 0.5


def test_gk_and_hippo_roundtrip():
    """System XML round-trip for the GK and HIPPO force proxies."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_hippo import build_water_system
    from openmm_tpu.serialization import XmlSerializer

    system, hippo = build_water_system(2)
    s2 = XmlSerializer.deserialize(XmlSerializer.serialize(system))
    h2 = [f for f in s2.getForces()
          if isinstance(f, mm.HippoNonbondedForce)][0]
    assert h2.getNumParticles() == 6
    assert h2.getNumExceptions() == 6
    assert h2.getParticleParameters(0)[:1] == hippo.getParticleParameters(0)[:1]

    gk_sys = mm.System()
    gk_sys.addParticle(1.0)
    mp = mm.AmoebaMultipoleForce()
    mp.addMultipole(-0.5, [0, 0, 0], [0.0] * 9, 5, -1, -1, -1, 0.39, 0.3,
                    0.0)
    gk = mm.AmoebaGeneralizedKirkwoodForce()
    gk.addParticle(-0.5, 0.15, 0.69)
    gk_sys.addForce(mp)
    gk_sys.addForce(gk)
    s3 = XmlSerializer.deserialize(XmlSerializer.serialize(gk_sys))
    g2 = [f for f in s3.getForces()
          if isinstance(f, mm.AmoebaGeneralizedKirkwoodForce)][0]
    c, r, sf = g2.getParticleParameters(0)
    assert abs(r._value - 0.15) < 1e-12 and sf == 0.69
