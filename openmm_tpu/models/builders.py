"""Programmatic system builders for tests and benchmarks."""
from __future__ import annotations

import math

import numpy as np

from .. import unit as u
from ..forces import NonbondedForce
from ..system import System
from ..vec3 import Vec3

# TIP3P parameters (app/data/tip3p.xml in the reference)
TIP3P_O_CHARGE = -0.834
TIP3P_H_CHARGE = 0.417
TIP3P_O_SIGMA = 0.31507524065751241
TIP3P_O_EPSILON = 0.635968
TIP3P_OH_DISTANCE = 0.09572
TIP3P_ANGLE = 104.52 * math.pi / 180.0
WATER_NUMBER_DENSITY = 33.37  # molecules / nm^3 at ~300 K


def argon_gas(n=3, spacing=0.5):
    """HelloArgon (examples/HelloArgon.cpp): LJ argon atoms on a line."""
    system = System()
    nb = NonbondedForce()
    system.addForce(nb)
    positions = []
    for a in range(n):
        system.addParticle(39.95)
        nb.addParticle(0.0, 0.3350, 0.996)
        positions.append(Vec3(0.5 * a, 0.0, 0.0))
    return system, positions


def tip3p_water_box(n_waters=216, nonbonded_method=NonbondedForce.PME,
                    cutoff=0.9, constraints=True, jitter_seed=1234):
    """A cubic TIP3P water box on a perturbed lattice at liquid density
    (HelloWaterBox.cpp equivalent). Returns (system, positions list)."""
    n_side = int(round(n_waters ** (1.0 / 3.0)))
    while n_side ** 3 < n_waters:
        n_side += 1
    n_waters = n_side ** 3
    box_l = (n_waters / WATER_NUMBER_DENSITY) ** (1.0 / 3.0)
    spacing = box_l / n_side

    system = System()
    system.setDefaultPeriodicBoxVectors(Vec3(box_l, 0, 0), Vec3(0, box_l, 0),
                                        Vec3(0, 0, box_l))
    nb = NonbondedForce()
    nb.setNonbondedMethod(nonbonded_method)
    nb.setCutoffDistance(min(cutoff, 0.49 * box_l))
    nb.setUseDispersionCorrection(True)
    system.addForce(nb)

    d_oh = TIP3P_OH_DISTANCE
    theta = TIP3P_ANGLE
    d_hh = 2.0 * d_oh * math.sin(0.5 * theta)
    rng = np.random.RandomState(jitter_seed)
    positions = []
    for ix in range(n_side):
        for iy in range(n_side):
            for iz in range(n_side):
                o = system.addParticle(15.99943)
                h1 = system.addParticle(1.007947)
                h2 = system.addParticle(1.007947)
                nb.addParticle(TIP3P_O_CHARGE, TIP3P_O_SIGMA, TIP3P_O_EPSILON)
                nb.addParticle(TIP3P_H_CHARGE, 1.0, 0.0)
                nb.addParticle(TIP3P_H_CHARGE, 1.0, 0.0)
                nb.addException(o, h1, 0.0, 1.0, 0.0)
                nb.addException(o, h2, 0.0, 1.0, 0.0)
                nb.addException(h1, h2, 0.0, 1.0, 0.0)
                if constraints:
                    system.addConstraint(o, h1, d_oh)
                    system.addConstraint(o, h2, d_oh)
                    system.addConstraint(h1, h2, d_hh)
                base = (np.array([ix, iy, iz], float) + 0.5) * spacing \
                    + (rng.rand(3) - 0.5) * 0.02
                # random orientation
                axis = rng.randn(3)
                axis /= np.linalg.norm(axis)
                ref = np.array([
                    [0.0, 0.0, 0.0],
                    [d_oh, 0.0, 0.0],
                    [d_oh * math.cos(theta), d_oh * math.sin(theta), 0.0]])
                ang = rng.rand() * 2 * math.pi
                c, s = math.cos(ang), math.sin(ang)
                K = np.array([[0, -axis[2], axis[1]],
                              [axis[2], 0, -axis[0]],
                              [-axis[1], axis[0], 0]])
                R = np.eye(3) + s * K + (1 - c) * (K @ K)
                pts = ref @ R.T + base
                for row in pts:
                    positions.append(Vec3(*row))
    return system, positions
