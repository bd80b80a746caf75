"""CustomHbondForce: donor-acceptor interactions over distances/angles/
dihedrals of donor and acceptor atom groups (CustomHbondForce.h; kernel
customHbondForce.cc). All donor x acceptor pairs evaluate as one dense
(D, A) sweep; placeholders a1..a3/d1..d3 are coordinate arrays and
distance/angle/dihedral are vector functions (same scheme as
CustomCompoundBondForce).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import unit as u
from ..exceptions import OpenMMException
from ..expressions import compile_energy_expression
from ..ops import geometry as geom
from .base import CompiledForce, Force
from .custom import _CustomMixin, _point_functions


class CustomHbondForce(Force, _CustomMixin):
    NoCutoff = 0
    CutoffNonPeriodic = 1
    CutoffPeriodic = 2

    def __init__(self, energy):
        super().__init__()
        self._init_custom(energy)
        self._per_donor = []
        self._per_acceptor = []
        self._donors = []      # ((d1,d2,d3), params)
        self._acceptors = []   # ((a1,a2,a3), params)
        self._exclusions = []  # (donor, acceptor)
        self._method = CustomHbondForce.NoCutoff
        self._cutoff = 1.0

    def getNumPerDonorParameters(self):
        return len(self._per_donor)

    def addPerDonorParameter(self, name):
        self._per_donor.append(str(name))
        return len(self._per_donor) - 1

    def getPerDonorParameterName(self, index):
        return self._per_donor[index]

    def getNumPerAcceptorParameters(self):
        return len(self._per_acceptor)

    def addPerAcceptorParameter(self, name):
        self._per_acceptor.append(str(name))
        return len(self._per_acceptor) - 1

    def getPerAcceptorParameterName(self, index):
        return self._per_acceptor[index]

    def getNumDonors(self):
        return len(self._donors)

    def addDonor(self, d1, d2, d3, parameters=()):
        self._donors.append(((int(d1), int(d2), int(d3)),
                             [float(u.strip(p)) for p in parameters]))
        return len(self._donors) - 1

    def getDonorParameters(self, index):
        (d1, d2, d3), params = self._donors[index]
        return d1, d2, d3, list(params)

    def setDonorParameters(self, index, d1, d2, d3, parameters=()):
        self._donors[index] = ((int(d1), int(d2), int(d3)),
                               [float(u.strip(p)) for p in parameters])

    def getNumAcceptors(self):
        return len(self._acceptors)

    def addAcceptor(self, a1, a2, a3, parameters=()):
        self._acceptors.append(((int(a1), int(a2), int(a3)),
                                [float(u.strip(p)) for p in parameters]))
        return len(self._acceptors) - 1

    def getAcceptorParameters(self, index):
        (a1, a2, a3), params = self._acceptors[index]
        return a1, a2, a3, list(params)

    def setAcceptorParameters(self, index, a1, a2, a3, parameters=()):
        self._acceptors[index] = ((int(a1), int(a2), int(a3)),
                                  [float(u.strip(p)) for p in parameters])

    def getNumExclusions(self):
        return len(self._exclusions)

    def addExclusion(self, donor, acceptor):
        self._exclusions.append((int(donor), int(acceptor)))
        return len(self._exclusions) - 1

    def getExclusionParticles(self, index):
        return self._exclusions[index]

    def getNonbondedMethod(self):
        return self._method

    def setNonbondedMethod(self, method):
        self._method = int(method)

    def getCutoffDistance(self):
        return u.Quantity(self._cutoff, u.nanometer)

    def setCutoffDistance(self, distance):
        self._cutoff = float(u.strip(distance, u.nanometer))

    def usesPeriodicBoundaryConditions(self):
        return self._method == CustomHbondForce.CutoffPeriodic

    def updateParametersInContext(self, context):
        context._update_force_parameters(self)

    def _pack_params(self, cfg):
        nd = len(self._donors)
        na = len(self._acceptors)
        dp = (np.asarray([d[1] for d in self._donors], np.float64)
              .astype(cfg.dtype) if nd and self._per_donor
              else np.zeros((nd, len(self._per_donor)), cfg.dtype))
        ap = (np.asarray([a[1] for a in self._acceptors], np.float64)
              .astype(cfg.dtype) if na and self._per_acceptor
              else np.zeros((na, len(self._per_acceptor)), cfg.dtype))
        return {"dpar": jnp.asarray(dp), "apar": jnp.asarray(ap)}

    def _compile(self, system, cfg):
        nd = len(self._donors)
        na = len(self._acceptors)
        d_idx = (np.asarray([d[0] for d in self._donors], np.int32)
                 if nd else np.zeros((0, 3), np.int32))
        a_idx = (np.asarray([a[0] for a in self._acceptors], np.int32)
                 if na else np.zeros((0, 3), np.int32))
        d_idx_j = jnp.asarray(np.maximum(d_idx, 0))
        a_idx_j = jnp.asarray(np.maximum(a_idx, 0))
        params = self._pack_params(cfg)
        base_fns = self._compiled_functions(cfg.dtype)
        periodic = self._method == CustomHbondForce.CutoffPeriodic
        use_cutoff = self._method != CustomHbondForce.NoCutoff
        cutoff = self._cutoff
        expr = self._energy_expr
        excl_mask_np = np.zeros((nd, na), bool)
        for (d, a) in self._exclusions:
            excl_mask_np[d, a] = True
        excl_mask = jnp.asarray(excl_mask_np)

        def energy_fn(pos, box, p, gp):
            if nd == 0 or na == 0:
                return jnp.zeros((), cfg.accum_dtype)
            b = box if periodic else None
            fns = dict(base_fns)
            fns.update(_point_functions(b))
            expr_fn = compile_energy_expression(expr, fns)
            env = {}
            for k in range(3):
                env["d%d" % (k + 1)] = pos[d_idx_j[:, k]][:, None, :]
                env["a%d" % (k + 1)] = pos[a_idx_j[:, k]][None, :, :]
            for k, name in enumerate(self._per_donor):
                env[name] = p["dpar"][:, k][:, None]
            for k, name in enumerate(self._per_acceptor):
                env[name] = p["apar"][:, k][None, :]
            for k, v in gp.items():
                env[k] = v
            e = jnp.broadcast_to(expr_fn(env), (nd, na))
            mask = ~excl_mask
            if use_cutoff:
                dr = pos[d_idx_j[:, 0]][:, None, :] - pos[a_idx_j[:, 0]][None, :, :]
                if b is not None:
                    dr = geom.periodic_delta(dr, b)
                r2 = jnp.sum(dr * dr, -1)
                mask = mask & (r2 < cutoff * cutoff)
            e = jnp.where(mask, e, 0.0)
            return jnp.sum(e.astype(cfg.accum_dtype))

        return CompiledForce(name=self.getName(), force_group=self.getForceGroup(),
                             params=params, energy_fn=energy_fn,
                             uses_pbc=periodic,
                             global_defaults=self._gp_defaults(),
                             requested_derivs=tuple(self._deriv_requests))
