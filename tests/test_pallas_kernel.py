"""Pallas direct-space tile kernel vs the XLA row kernel (interpret mode on
CPU): energies and analytic forces must agree for the Ewald-direct and
reaction-field electrostatics modes."""
import jax.numpy as jnp
import numpy as np
import pytest

from openmm_tpu.ops import pairs as P
from openmm_tpu.ops import pallas_pairs as PP

ONE4PI = 138.93545764446428
ALPHA = 3.12341
CUTOFF = 0.7
KRF = (1.0 / CUTOFF ** 3) * (78.3 - 1.0) / (2.0 * 78.3 + 1.0)
CRF = (1.0 / CUTOFF) * 3.0 * 78.3 / (2.0 * 78.3 + 1.0)


def water_like(n_mol=1728, seed=4, box_l=3.8):
    # box width must satisfy the compacted-column engine's one-image
    # condition: box/2 >= cutoff + block extent (see pallas_pairs docstring)
    rng = np.random.RandomState(seed)
    n = 3 * n_mol
    n_pad = ((n + 63) // 64) * 64
    box = np.diag([box_l, box_l, box_l]).astype(np.float32)
    pos = np.zeros((n_pad, 3), np.float32)
    # jittered lattice: realistic uniform density (clustered random placement
    # has unbounded per-block neighbor counts)
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
    excl = P.build_exclusion_table(n_pad, excl_pairs)
    return pos, box, q, sig, eps, excl, n


def xla_ef(mode):
    def ef(r2, pi, pj):
        inv_r2 = 1.0 / r2
        r = jnp.sqrt(r2)
        inv_r = 1.0 / r
        s = 0.5 * (pi["sigma"] + pj["sigma"])
        e4 = 4.0 * jnp.sqrt(pi["epsilon"] * pj["epsilon"])
        s6 = (s * s * inv_r2) ** 3
        e_lj = e4 * s6 * (s6 - 1.0)
        de_lj = -3.0 * e4 * s6 * (2.0 * s6 - 1.0) * inv_r2
        qq = ONE4PI * pi["charge"] * pj["charge"]
        if mode == PP.MODE_EWALD:
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
        else:
            e_c = qq * (inv_r + KRF * r2 - CRF)
            de_c = qq * (-0.5 * inv_r2 * inv_r + KRF)
        e = e_lj + e_c
        de = de_lj + de_c
        inside = r2 < CUTOFF * CUTOFF
        return jnp.where(inside, e, 0.0), jnp.where(inside, de, 0.0)
    return ef


@pytest.mark.parametrize("use_shift", [False, True],
                         ids=["perpair-image", "baked-shift"])
@pytest.mark.parametrize("mode", [PP.MODE_EWALD, PP.MODE_RF],
                         ids=["ewald", "rf"])
def test_pallas_matches_row_kernel(mode, use_shift):
    # the shift variant needs box/2 > cutoff + both block extents; use a
    # larger box (same density) there so the build-time validity check holds
    if use_shift:
        pos, box, q, sig, eps, excl, n = water_like(n_mol=4096, box_l=5.2)
    else:
        pos, box, q, sig, eps, excl, n = water_like()
    per_atom = {"charge": jnp.asarray(q), "sigma": jnp.asarray(sig),
                "epsilon": jnp.asarray(eps)}
    e1, f1, o1 = P.pair_energy_force_rows(
        jnp.asarray(pos), jnp.asarray(box), xla_ef(mode), per_atom,
        jnp.asarray(excl), n, CUTOFF, max_cols=64, block=64, periodic=True,
        sort_cell=0.7)
    e2, f2, o2 = PP.direct_ef_pallas(
        jnp.asarray(pos), jnp.asarray(box), jnp.asarray(q), jnp.asarray(sig),
        jnp.asarray(eps), jnp.asarray(excl), n, CUTOFF, max_cols=64,
        mode=mode, alpha=ALPHA, krf=KRF, crf=CRF, sort_cell=0.7,
        col_cap=2048, interpret=True, use_shift=use_shift)
    assert int(o1) == int(o2) == 0
    assert abs(float(e1 - e2)) < 1e-4 * max(1.0, abs(float(e1)))
    f1 = np.asarray(f1)[:n]
    f2 = np.asarray(f2)[:n]
    scale = np.abs(f1).max()
    assert np.abs(f1 - f2).max() < 1e-4 * scale
