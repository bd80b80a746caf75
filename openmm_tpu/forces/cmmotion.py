"""CMMotionRemover: periodically zero the center-of-mass velocity.

Counterpart of openmmapi/include/openmm/CMMotionRemover.h + kernel
platforms/common/src/kernels/removeCM.cc, realized as an updateContextState
hook executed inside the jitted step (lax.cond on step % frequency).
"""
from __future__ import annotations

import jax.numpy as jnp
import jax

from .base import CompiledForce, Force


class CMMotionRemover(Force):
    def __init__(self, frequency=1):
        super().__init__()
        self._frequency = int(frequency)

    def getFrequency(self):
        return self._frequency

    def setFrequency(self, freq):
        self._frequency = int(freq)

    def _compile(self, system, cfg):
        freq = self._frequency
        masses_np = system._masses_array(cfg.dtype)
        masses = jnp.asarray(masses_np)
        total_mass = jnp.sum(masses)

        def update_state_fn(deps, state, params_list, aux):
            # mass-weighted reduction as a (1,n)x(n,3) matmul and the frozen
            # mask folded into a multiplicative (n,) factor: avoids the
            # (n,1)-broadcast layout tax measured on TPU (SURVEY §10).
            # BRANCHLESS step-frequency gate: a lax.cond here costs ~1 ms in
            # the fused step (thunk dispatch + state pass-through), while the
            # reduction itself is microseconds — so compute always, multiply
            # by the 0/1 "fires this step" factor (round-4 profile).
            moving_f = (deps.inv_masses != 0).astype(masses.dtype)
            vel = state["velocities"]
            mom = jnp.einsum("n,nd->d", masses, vel,
                             precision=jax.lax.Precision.HIGHEST)
            v_cm = mom / total_mass
            do = ((state["step"] % freq) == 0).astype(masses.dtype)
            vel = vel - (do * moving_f)[:, None] * v_cm[None, :]
            state = dict(state)
            state["velocities"] = vel
            return state, aux

        # no energy_fn: contributes nothing to the potential, so keeping it
        # out of the fused value_and_grad saves a zero-gradient lane
        return CompiledForce(name=self.getName(), force_group=self.getForceGroup(),
                             params={}, energy_fn=None,
                             update_state_fn=update_state_fn)
