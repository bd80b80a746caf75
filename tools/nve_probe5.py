"""Round-5 NVE heating discriminator probes (TPU fast path).

The long-window measurement (tools/nve_tpu.py) established a constant
~6.6e-8 kT/dof/STEP injection on rigid TIP3P water: independent of dt
(per-ns rate doubles at dt/2), of NL skin, and of the PME engine.  That
magnitude is ~eps_f32 * (KE/dof)/kT per step -- the signature of a biased
velocity-scale rounding once per step.  This probe discriminates the
remaining suspects by system/config:

  SYS=argon  : LJ fluid, no constraints, no charges, no exceptions.
               Clean -> SETTLE/velocity-recovery path.  Dirty -> the
               shared integrator core (kick/commit/recovery).
  SYS=water  : rigid TIP3P (the established protocol), for A/B toggles.
  VCOMP=0    : strip the vel_lo compensation plane (pure-f32 leapfrog
               velocity) to test whether the compensation chain itself
               is the injector.
  T=150      : temperature scan: eps*KE-relative injection predicts a
               T-INdependent normalized drift; absolute injection
               (e.g. position-noise/dt) predicts drift ~ 1/T.

Usage: PS=20 SYS=argon python tools/nve_probe5.py
"""
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import openmm_tpu as mm
from openmm_tpu.constants import BOLTZ
from openmm_tpu.forces.nonbonded import NonbondedForce
from openmm_tpu.models import tip3p_water_box
from openmm_tpu.system import System
from openmm_tpu.vec3 import Vec3


def argon_box(n_side=17, rho=12.0, temperature=300.0):
    """Supercritical LJ argon on a jittered cubic lattice.

    rho in atoms/nm^3 (12 ~ reduced density 0.45 for sigma=0.335 nm):
    dense enough for steady collisions, dilute enough that a lattice
    start cannot overlap.
    """
    n = n_side ** 3
    box_l = (n / rho) ** (1.0 / 3.0)
    system = System()
    system.setDefaultPeriodicBoxVectors(Vec3(box_l, 0, 0), Vec3(0, box_l, 0),
                                        Vec3(0, 0, box_l))
    nb = NonbondedForce()
    nb.setNonbondedMethod(NonbondedForce.CutoffPeriodic)
    nb.setCutoffDistance(min(0.9, 0.49 * box_l))
    nb.setUseSwitchingFunction(True)
    nb.setSwitchingDistance(0.9 * nb.getCutoffDistance()._value)
    nb.setUseDispersionCorrection(False)
    system.addForce(nb)
    rng = np.random.RandomState(7)
    spacing = box_l / n_side
    positions = []
    for ix in range(n_side):
        for iy in range(n_side):
            for iz in range(n_side):
                system.addParticle(39.95)
                nb.addParticle(0.0, 0.335, 0.996)
                p = (np.array([ix, iy, iz], float) + 0.5) * spacing \
                    + (rng.rand(3) - 0.5) * 0.05
                positions.append(Vec3(*p))
    return system, positions


def main():
    sysname = os.environ.get("SYS", "water")
    dt_fs = float(os.environ.get("DT", "1.0"))
    meas_ps = float(os.environ.get("PS", "20"))
    settle_ps = float(os.environ.get("SETTLE_PS", "5"))
    temperature = float(os.environ.get("T", "300"))
    vcomp = os.environ.get("VCOMP", "1") == "1"
    plat = os.environ.get("PLAT", "TPU")

    if sysname == "argon":
        system, positions = argon_box(
            n_side=int(os.environ.get("NSIDE", "17")),
            temperature=temperature)
        if os.environ.get("SWITCH", "1") == "0":
            system.getForce(0).setUseSwitchingFunction(False)
    else:
        waters = int(os.environ.get("WATERS", "1728"))
        system, positions = tip3p_water_box(n_waters=waters)
        nb = [f for f in system.getForces()
              if isinstance(f, NonbondedForce)][0]
        rc = nb.getCutoffDistance()._value
        nb.setUseSwitchingFunction(True)
        nb.setSwitchingDistance(0.9 * rc)
        nb.setEwaldErrorTolerance(1e-5)
        if os.environ.get("CHARGES", "1") == "0":
            # rigid-but-neutral water: SETTLE active, electrostatics gone
            for i in range(nb.getNumParticles()):
                _, sig, eps_ = nb.getParticleParameters(i)
                nb.setParticleParameters(i, 0.0, sig, eps_)
            for i in range(nb.getNumExceptions()):
                p1, p2, _, sig, eps_ = nb.getExceptionParameters(i)
                nb.setExceptionParameters(i, p1, p2, 0.0, sig, eps_)
            nb.setNonbondedMethod(NonbondedForce.CutoffPeriodic)

    integ = mm.VerletIntegrator(0.001 * dt_fs)
    if not vcomp:
        integ._supports_vel_compensation = False
    ctx = mm.Context(system, integ, mm.Platform.getPlatformByName(plat))
    ctx.setPositions(positions)
    ctx.applyConstraints()
    ctx.setVelocitiesToTemperature(temperature, randomSeed=2)

    n = system.getNumParticles()
    dof = 3 * n - system.getNumConstraints() - 3
    kT = BOLTZ * temperature
    steps_per_ps = int(round(1000.0 / dt_fs))

    t0 = time.time()
    integ.step(int(settle_ps * steps_per_ps))
    print("cfg: sys=%s n=%d dof=%d T=%g dt=%g vcomp=%d   equil %.0f s"
          % (sysname, n, dof, temperature, dt_fs, vcomp, time.time() - t0))

    n_samp = 50
    chunk = int(meas_ps * steps_per_ps / n_samp)
    es, ts = [], []
    t0 = time.time()
    for i in range(n_samp):
        integ.step(chunk)
        st = ctx.getState(getEnergy=True)
        es.append(st.getPotentialEnergy()._value
                  + st.getKineticEnergy()._value)
        ts.append(ctx.getTime()._value)
    es = np.asarray(es)
    ts = np.asarray(ts)
    A = np.vstack([ts / 1000.0, np.ones_like(ts)]).T
    coef, _, _, _ = np.linalg.lstsq(A, es, rcond=None)
    resid = es - A @ coef
    se = (np.sqrt(np.sum(resid ** 2) / (len(es) - 2))
          / np.sqrt(np.sum((ts / 1000.0 - np.mean(ts / 1000.0)) ** 2)))
    per_ns = coef[0] / (dof * kT)
    per_step = per_ns / (1e6 / dt_fs)
    h = len(es) // 2
    s1 = np.polyfit(ts[:h] / 1000.0, es[:h], 1)[0] / (dof * kT)
    s2 = np.polyfit(ts[h:] / 1000.0, es[h:], 1)[0] / (dof * kT)
    print("window=%.0f ps wall=%.0f s" % (meas_ps, time.time() - t0))
    print("drift = %+.3e +- %.3e kT/dof/ns  (%+.2e kT/dof/step)"
          % (per_ns, se / (dof * kT), per_step))
    print("half slopes: %+.3e / %+.3e" % (s1, s2))


if __name__ == "__main__":
    main()
