"""Z-slab forward-only PME vs the dense differentiable reference path
(interpret mode on CPU): energies and analytic forces must agree, including
after sub-cell drift on a stale z-state (the persistence contract)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openmm_tpu.ops import pme as pme_mod
from openmm_tpu.ops import pme_zslab as zs

GRID = (24, 24, 24)
ORDER = 5
ALPHA = 2.7
BOX = 3.0


def setup(n_mol=220, seed=11):
    rng = np.random.RandomState(seed)
    n = 3 * n_mol
    box = jnp.asarray(np.diag([BOX, BOX, BOX]).astype(np.float32))
    side = int(np.ceil(n_mol ** (1.0 / 3.0)))
    g = (np.stack(np.meshgrid(*[np.arange(side)] * 3, indexing="ij"),
                  axis=-1).reshape(-1, 3)[:n_mol] + 0.5) * (BOX / side)
    centers = g + rng.uniform(-0.06, 0.06, size=(n_mol, 3))
    pos = np.zeros((n, 3), np.float32)
    pos[0::3] = centers
    pos[1::3] = centers + [0.0957, 0, 0]
    pos[2::3] = centers + [-0.024, 0.0927, 0]
    q = np.zeros(n, np.float32)
    q[0::3] = -0.834
    q[1::3] = 0.417
    q[2::3] = 0.417
    md = pme_mod.make_pme_recip_data(GRID, ORDER)
    bsq = tuple(jnp.asarray(md[k].astype(np.float32))
                for k in ("bsq_x", "bsq_y", "bsq_z"))
    return jnp.asarray(pos), jnp.asarray(q), box, bsq


def ref_ef(pos, q, box, bsq):
    def e_fn(p):
        return pme_mod.pme_reciprocal_energy(
            p, q, box, GRID, ORDER, ALPHA, bsq[0], bsq[1], bsq[2],
            jnp.float32)
    e, g = jax.value_and_grad(e_fn)(pos)
    return e, -g


def zslab_ef(pos, q, box, bsq, state=None, cfg=None):
    if cfg is None:
        cfg = zs.zslab_config(pos.shape[0], GRID)
    if state is None:
        state = zs.build_z_state(pos, box, q, GRID, cfg)
    assert int(state["overflow"]) == 0
    return zs.pme_recip_ef(pos, q, box, GRID, ORDER, ALPHA,
                           bsq[0], bsq[1], bsq[2], state, cfg,
                           interpret=True)


def test_zslab_matches_reference():
    pos, q, box, bsq = setup()
    e1, f1 = ref_ef(pos, q, box, bsq)
    e2, f2 = zslab_ef(pos, q, box, bsq)
    assert abs(float(e1) - float(e2)) < 2e-4 * abs(float(e1))
    f1, f2 = np.asarray(f1), np.asarray(f2)
    scale = np.abs(f1).max()
    assert np.abs(f1 - f2).max() < 2e-4 * scale


def test_zslab_stale_state_drift():
    """Atoms drifting within a cell must still evaluate exactly on the
    persisted z-order (rebuild-on-motion contract)."""
    pos, q, box, bsq = setup()
    cfg = zs.zslab_config(pos.shape[0], GRID)
    state = zs.build_z_state(pos, box, q, GRID, cfg)
    rng = np.random.RandomState(3)
    drift = rng.uniform(-0.04, 0.04, size=pos.shape).astype(np.float32)
    pos2 = pos + jnp.asarray(drift)
    e1, f1 = ref_ef(pos2, q, box, bsq)
    e2, f2 = zslab_ef(pos2, q, box, bsq, state=state, cfg=cfg)
    assert abs(float(e1) - float(e2)) < 2e-4 * abs(float(e1))
    f1, f2 = np.asarray(f1), np.asarray(f2)
    assert np.abs(f1 - f2).max() < 2e-4 * np.abs(f1).max()


def test_zslab_skin_scale_drift():
    """Drift LARGER than one z cell (the production skin-0.25 regime:
    skin/2 = 0.125 nm vs 0.125 nm cells) must stay exact when the config
    carries the matching drift_cells margin — the round-3 skin bump broke
    the hardcoded one-cell margin exactly here (silent charge loss, then
    the K2 span poison)."""
    pos, q, box, bsq = setup()
    cfg = zs.zslab_config(pos.shape[0], GRID, drift_cells=2)
    assert cfg["drift_cells"] == 2
    state = zs.build_z_state(pos, box, q, GRID, cfg)
    assert int(state["overflow"]) == 0
    rng = np.random.RandomState(5)
    # worst case z drift ~1.25 cells, the skin/2 + one-step bound
    drift = rng.uniform(-0.155, 0.155, size=pos.shape).astype(np.float32)
    pos2 = pos + jnp.asarray(drift)
    e1, f1 = ref_ef(pos2, q, box, bsq)
    e2, f2 = zslab_ef(pos2, q, box, bsq, state=state, cfg=cfg)
    assert np.isfinite(float(e2))
    assert abs(float(e1) - float(e2)) < 2e-4 * abs(float(e1))
    f1, f2 = np.asarray(f1), np.asarray(f2)
    assert np.abs(f1 - f2).max() < 2e-4 * np.abs(f1).max()
