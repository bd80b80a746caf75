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


def test_distributed_fft_matches_fftn(mesh8):
    """parallel/fft.py: z-sharded 2-D FFTs + all-to-all transpose + z FFT
    must reproduce jnp.fft.fftn exactly (SURVEY §2.10 P7)."""
    import jax.numpy as jnp
    from openmm_tpu.parallel import fft as pfft

    rng = np.random.RandomState(0)
    nz, nx, ny = 16, 16, 12
    q = jnp.asarray(rng.randn(nz, nx, ny).astype(np.float32))
    ref = np.fft.fftn(np.asarray(q, np.float64))
    got = np.asarray(pfft.fft3_zsharded(mesh8, q))
    assert np.abs(got - ref).max() < 1e-3 * np.abs(ref).max()
    # roundtrip through the inverse
    back = np.asarray(pfft.ifft3_to_zsharded(
        mesh8, pfft.fft3_zsharded(mesh8, q)).real)
    assert np.abs(back - np.asarray(q)).max() < 1e-5


def test_pme_convolve_sharded_matches_dense(mesh8):
    """Sharded PME convolution (energy + potential grid) vs the in-core
    z-slab convolution (ops/pme_zslab.convolve_potential)."""
    import jax.numpy as jnp
    from openmm_tpu.parallel import fft as pfft
    from openmm_tpu.ops import pme as pme_mod
    from openmm_tpu.ops.pme_zslab import convolve_potential

    rng = np.random.RandomState(1)
    grid = (16, 16, 16)
    box = jnp.asarray(np.diag([2.0, 2.0, 2.0]).astype(np.float32))
    q = jnp.asarray(rng.randn(*grid).astype(np.float32))
    md = pme_mod.make_pme_recip_data(grid, 5)
    bx = jnp.asarray(md["bsq_x"].astype(np.float32))
    by = jnp.asarray(md["bsq_y"].astype(np.float32))
    bz = jnp.asarray(md["bsq_z"].astype(np.float32))
    alpha = 3.0
    phi_ref, e_ref = convolve_potential(q, box, grid, alpha, bx, by, bz)

    # build the same spectral kernel the z-slab engine folds in
    import math
    from openmm_tpu.ops import geometry as geom
    from openmm_tpu.constants import ONE_4PI_EPS0
    nx, ny, nz = grid
    f32 = jnp.float32
    bi = geom.box_inverse(box).astype(f32)
    vol = geom.box_volume(box).astype(f32)
    mx = jnp.fft.fftfreq(nx, 1.0 / nx).astype(f32)
    my = jnp.fft.fftfreq(ny, 1.0 / ny).astype(f32)
    mz = jnp.fft.fftfreq(nz, 1.0 / nz).astype(f32)
    kv = (mz[:, None, None, None] * bi.T[None, None, None, 2, :]
          + mx[None, :, None, None] * bi.T[None, None, None, 0, :]
          + my[None, None, :, None] * bi.T[None, None, None, 1, :])
    m2 = jnp.sum(kv * kv, axis=-1)
    m2s = jnp.where(m2 > 0, m2, 1.0)
    kern = jnp.where(m2 > 0,
                     jnp.exp(-(math.pi ** 2) * m2s / alpha ** 2) / m2s, 0.0)
    B = (bz[:, None, None] * bx[None, :, None] * by[None, None, :]).astype(f32)
    Kt = (ONE_4PI_EPS0 / (2.0 * math.pi * vol)) * kern * B

    phi, e = pfft.pme_convolve_sharded(mesh8, q, Kt)
    assert abs(float(e) - float(e_ref)) < 1e-3 * max(1.0, abs(float(e_ref)))
    assert np.abs(np.asarray(phi) - np.asarray(phi_ref)).max() \
        < 1e-3 * np.abs(np.asarray(phi_ref)).max()


def test_pallas_tile_kernel_sharded(mesh8):
    """The Pallas tile kernel (interpret mode) sharded over ROW BLOCKS via
    shard_map must match the single-device sweep exactly — the TPU-profile
    direct-space program under the setAtomBlockRange partition."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_pallas_kernel import water_like, ALPHA, CUTOFF, KRF, CRF
    import jax.numpy as jnp
    from openmm_tpu.ops import pallas_pairs as PP

    pos, box, q, sig, eps, excl, n = water_like(n_mol=729)
    args = (jnp.asarray(pos), jnp.asarray(box), jnp.asarray(q),
            jnp.asarray(sig), jnp.asarray(eps), jnp.asarray(excl), n,
            CUTOFF)
    e1, f1, o1 = PP.direct_ef_pallas(*args, max_cols=64,
                                     mode=PP.MODE_EWALD, alpha=ALPHA,
                                     sort_cell=0.7, interpret=True)
    e2, f2, o2 = PP.direct_ef_pallas(*args, max_cols=64,
                                     mode=PP.MODE_EWALD, alpha=ALPHA,
                                     sort_cell=0.7, interpret=True,
                                     mesh=mesh8)
    assert int(o1) == int(o2) == 0
    assert abs(float(e1 - e2)) < 1e-4 * max(1.0, abs(float(e1)))
    f1 = np.asarray(f1)[:n]
    f2 = np.asarray(f2)[:n]
    assert np.abs(f1 - f2).max() < 1e-5 * max(1.0, np.abs(f1).max())
