"""Physical constants in MD units (nm, ps, dalton, kJ/mol, e, K).

Values match the reference's SimTKOpenMMRealType.h
(/root/reference/platforms/reference/include/SimTKOpenMMRealType.h:65-89).
"""
import math

AVOGADRO = 6.02214076e23
E_CHARGE = 1.602176634e-19
BOLTZMANN_SI = 1.380649e-23                      # J/K
KILO = 1e3
RGAS = BOLTZMANN_SI * AVOGADRO                   # J/(mol K)
BOLTZ = RGAS / KILO                              # kJ/(mol K) — kB in MD units
EPSILON0 = 1e-6 * 8.8541878128e-12 / (E_CHARGE * E_CHARGE * AVOGADRO)
ONE_4PI_EPS0 = 1.0 / (4.0 * math.pi * EPSILON0)  # kJ nm / (mol e^2) ≈ 138.9354576
