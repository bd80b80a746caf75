"""LocalEnergyMinimizer: L-BFGS energy minimization with constraint penalties.

Counterpart of openmmapi/src/LocalEnergyMinimizer.cpp:36-196 (vendored
libraries/lbfgs there): minimize E(x) + sum_c (k/2)(r_c - d_c)^2 with k
escalated until constraints hold to tolerance, then re-apply exact
constraints. The L-BFGS two-loop recursion and Armijo/Wolfe backtracking are
implemented here directly (numpy host loop, jitted energy/gradient on
device).
"""
from __future__ import annotations

import numpy as np

from . import unit as u


class LocalEnergyMinimizer(object):
    @staticmethod
    def minimize(context, tolerance=10.0, maxIterations=0, reporter=None):
        tolerance = float(u.strip(tolerance,
                                  u.kilojoule_per_mole / u.nanometer))
        system = context.getSystem()
        n = system.getNumParticles()
        constraints = [(p1, p2, d) for (p1, p2, d) in system._constraints]
        working_tol = max(tolerance, 1e-4)
        k_penalty = 100.0 / max(context._integrator.getConstraintTolerance(), 1e-10)
        free = np.array([system.getParticleMass(i)._value > 0
                         for i in range(n)])

        x0 = np.asarray(context.getState(getPositions=True)
                        .getPositions(asNumpy=True)._value, np.float64)

        eval_fn = context._make_position_energy_fn()

        def objective(x):
            pos = x.reshape(n, 3)
            e, g = eval_fn(pos)
            e = float(e)
            g = -np.asarray(g, np.float64)  # gradient = -force
            if constraints:
                for (p1, p2, d) in constraints:
                    delta = pos[p1] - pos[p2]
                    r = np.linalg.norm(delta)
                    viol = r - d
                    e += 0.5 * k_penalty * viol * viol
                    gdir = k_penalty * viol * delta / max(r, 1e-12)
                    g[p1] += gdir
                    g[p2] -= gdir
            g[~free] = 0.0
            return e, g.reshape(-1)

        max_iter = maxIterations if maxIterations > 0 else 10 * n

        for outer in range(6):
            x = _lbfgs(objective, x0.reshape(-1).copy(), working_tol,
                       max_iter, reporter)
            x0 = x.reshape(n, 3)
            if not constraints:
                break
            max_err = 0.0
            for (p1, p2, d) in constraints:
                r = np.linalg.norm(x0[p1] - x0[p2])
                max_err = max(max_err, abs(r - d) / d)
            if max_err < 2 * context._integrator.getConstraintTolerance():
                break
            k_penalty *= 10.0
        context.setPositions(x0)
        if constraints:
            context.applyConstraints()


def _lbfgs(objective, x, gtol, max_iter, reporter=None, memory=12):
    f, g = objective(x)
    s_list, y_list, rho_list = [], [], []
    n_particles = len(x) // 3
    for it in range(max_iter):
        gnorm = np.sqrt(np.sum(g * g) / max(n_particles, 1))
        if reporter is not None:
            try:
                if reporter.report(it, x.reshape(-1, 3), gnorm, dict()):
                    break
            except Exception:
                pass
        if gnorm < gtol:
            break
        # two-loop recursion
        q = g.copy()
        alphas = []
        for s, y, rho in zip(reversed(s_list), reversed(y_list),
                             reversed(rho_list)):
            a = rho * np.dot(s, q)
            alphas.append(a)
            q -= a * y
        if y_list:
            gamma = np.dot(s_list[-1], y_list[-1]) / np.dot(y_list[-1],
                                                            y_list[-1])
        else:
            gamma = 1.0 / max(np.linalg.norm(g), 1.0)
        z = gamma * q
        for (s, y, rho), a in zip(zip(s_list, y_list, rho_list),
                                  reversed(alphas)):
            b = rho * np.dot(y, z)
            z += (a - b) * s
        d = -z
        # backtracking line search with Armijo condition
        dg = np.dot(d, g)
        if dg >= 0:   # not a descent direction; reset
            d = -g
            dg = -np.dot(g, g)
            s_list, y_list, rho_list = [], [], []
        step = 1.0
        # cap the initial displacement at 0.1 nm per atom
        max_disp = np.max(np.abs(d)) + 1e-300
        step = min(step, 0.1 / max_disp)
        success = False
        for _ in range(30):
            x_new = x + step * d
            f_new, g_new = objective(x_new)
            if np.isfinite(f_new) and f_new <= f + 1e-4 * step * dg:
                success = True
                break
            step *= 0.5
        if not success:
            break
        s = x_new - x
        yv = g_new - g
        sy = np.dot(s, yv)
        if sy > 1e-12:
            s_list.append(s)
            y_list.append(yv)
            rho_list.append(1.0 / sy)
            if len(s_list) > memory:
                s_list.pop(0)
                y_list.pop(0)
                rho_list.pop(0)
        if abs(f - f_new) < 1e-12 * max(1.0, abs(f)):
            x, f, g = x_new, f_new, g_new
            break
        x, f, g = x_new, f_new, g_new
    return x


class MinimizationReporter(object):
    """Callback interface (openmmapi/include/openmm/MinimizationReporter.h)."""

    def report(self, iteration, x, grad, args):
        return False
