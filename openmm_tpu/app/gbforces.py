"""Amber implicit-solvent GB models as CustomGBForce builders (behavioral
counterpart of wrappers/python/openmm/app/internal/customgbforces.py and its
wiring in amber_file_parser.py:1054-1135): HCT (igb=1), OBC1 (igb=2), OBC2
(igb=5), GBn (igb=7) and GBn2 (igb=8), with mbondi radius sets, the GBn neck
correction (tables in data/gbn_neck_tables.json, published in Mongan et al.
2006), Debye-Hueckel salt screening, and the ACE surface-area term.

All models share the same pipeline: a pairwise descreening integral I, an
effective Born radius B = 1/(1/rho - f(I)), and the GB energy over B. They
differ only in f (HCT: identity; OBC/GBn: tanh rescalings) and in whether I
gains the neck correction.
"""
from __future__ import annotations

import json
import math
import os

from .. import unit as u
from ..forces import CustomGBForce, GBSAOBCForce
from ..tabulated import Discrete2DFunction

GB_OFFSET = 0.009           # nm, the standard dielectric offset
GBN2_OFFSET = 0.0195141     # nm, GBn2's refit offset

_DATA = os.path.join(os.path.dirname(__file__), "data")

# ---------------------------------------------------------------------------
# intrinsic radius sets (Bondi 1964 + the mbondi modifications of Amber)
# values in nm
# ---------------------------------------------------------------------------
_BONDI = {"C": 0.17, "H": 0.12, "D": 0.12, "N": 0.155, "O": 0.15, "F": 0.15,
          "Si": 0.21, "P": 0.185, "S": 0.18, "Cl": 0.17}
_DEFAULT_RADIUS = 0.15


def _bonded_map(topology):
    bonded = {}
    for a1, a2 in topology.bonds():
        bonded.setdefault(a1, []).append(a2)
        bonded.setdefault(a2, []).append(a1)
    return bonded


def bondi_radii(topology):
    return [_BONDI.get(a.element.symbol if a.element else "", _DEFAULT_RADIUS)
            for a in topology.atoms()]


def mbondi_radii(topology):
    """H radius depends on the bonded heavy atom (Amber 'mbondi')."""
    bonded = _bonded_map(topology)
    out = []
    for a in topology.atoms():
        sym = a.element.symbol if a.element else ""
        if sym in ("H", "D"):
            partner = bonded.get(a, [None])[0]
            psym = (partner.element.symbol
                    if partner is not None and partner.element else "")
            if psym in ("C", "N"):
                out.append(0.13)
            elif psym in ("O", "S"):
                out.append(0.08)
            else:
                out.append(0.12)
        else:
            out.append(_BONDI.get(sym, _DEFAULT_RADIUS))
    return out


def mbondi2_radii(topology):
    """mbondi2: only N-bound hydrogens get the larger 0.13 radius."""
    bonded = _bonded_map(topology)
    out = []
    for a in topology.atoms():
        sym = a.element.symbol if a.element else ""
        if sym in ("H", "D"):
            partner = bonded.get(a, [None])[0]
            psym = (partner.element.symbol
                    if partner is not None and partner.element else "")
            out.append(0.13 if psym == "N" else 0.12)
        else:
            out.append(_BONDI.get(sym, _DEFAULT_RADIUS))
    return out


def mbondi3_radii(topology):
    """mbondi3 (GBn2 companion): ARG HH/HE hydrogens 0.117 nm.

    Note: published mbondi3 also sets carboxylate oxygens to 0.14 nm, but the
    reference implementation's carboxylate test compares an Atom object
    against an Element (customgbforces.py:221) and so never fires; its GBn2
    golden forces encode plain mbondi2 oxygen radii. We match that behavior
    for ecosystem compatibility."""
    out = mbondi2_radii(topology)
    for i, a in enumerate(topology.atoms()):
        if a.residue.name == "ARG" and (a.name.startswith("HH")
                                        or a.name.startswith("HE")):
            out[i] = 0.117
    return out


# screening factors per element: (classic, GBn, GBn2, GBn2-nucleic)
_SCREEN = {
    "H": (0.85, 1.09085413633, 1.425952, 1.696538),
    "D": (0.85, 1.09085413633, 1.425952, 1.696538),
    "C": (0.72, 0.48435382330, 1.058554, 1.268902),
    "N": (0.79, 0.700147318409, 0.733599, 1.4259728),
    "O": (0.85, 1.06557401132, 1.061039, 0.1840098),
    "F": (0.88, 0.5, 0.5, 0.5),
    "P": (0.86, 0.5, 0.5, 1.5450597),
    "S": (0.96, 0.602256336067, -0.703469, 0.05),
}
_SCREEN_DEFAULT = (0.8, 0.5, 0.5, 0.5)

# GBn2 per-element tanh coefficients (alpha, beta, gamma), protein / nucleic
_GBN2_ABG = {
    "H": (0.788440, 0.798699, 0.437334), "D": (0.788440, 0.798699, 0.437334),
    "C": (0.733756, 0.506378, 0.205844), "N": (0.503364, 0.316828, 0.192915),
    "O": (0.867814, 0.876635, 0.387882), "S": (0.867814, 0.876635, 0.387882),
}
_GBN2_ABG_NUCLEIC = {
    "H": (0.537050, 0.362861, 0.116704), "D": (0.537050, 0.362861, 0.116704),
    "C": (0.331670, 0.196842, 0.093422), "N": (0.686311, 0.463189, 0.138722),
    "O": (0.606344, 0.463006, 0.142262), "S": (0.606344, 0.463006, 0.142262),
    "P": (0.418365, 0.290054, 0.1064245),
}
_GBN2_ABG_DEFAULT = (1.0, 0.8, 4.851)
_NUCLEIC_RESIDUES = frozenset(
    ["A", "C", "G", "U", "DA", "DC", "DG", "DT"])


def standard_gb_parameters(model, topology):
    """Per-atom [radius, screen(, alpha, beta, gamma)] for a GB model, from
    the topology alone (used when the source file carries no radii)."""
    if model == "HCT":
        radii = mbondi_radii(topology)
        col = 0
    elif model in ("OBC1", "OBC2"):
        radii = mbondi2_radii(topology)
        col = 0
    elif model == "GBn":
        radii = bondi_radii(topology)
        col = 1
    elif model == "GBn2":
        radii = mbondi3_radii(topology)
        col = None
    else:
        raise ValueError("unknown GB model: " + str(model))
    out = []
    for a, r in zip(topology.atoms(), radii):
        sym = a.element.symbol if a.element else ""
        sc = _SCREEN.get(sym, _SCREEN_DEFAULT)
        if model == "GBn2":
            if a.residue.name in _NUCLEIC_RESIDUES:
                abg = _GBN2_ABG_NUCLEIC.get(sym, _GBN2_ABG_DEFAULT)
                out.append([r, sc[3]] + list(abg))
            else:
                abg = _GBN2_ABG.get(sym, _GBN2_ABG_DEFAULT)
                out.append([r, sc[2]] + list(abg))
        else:
            out.append([r, sc[col]])
    return out


# ---------------------------------------------------------------------------
# force construction
# ---------------------------------------------------------------------------
_I_HCT = ("select(step(r+sr2-or1),"
          " 0.5*(1/L-1/U+0.25*(r-sr2^2/r)*(1/(U^2)-1/(L^2))+0.5*log(L/U)/r),"
          " 0);"
          "U=r+sr2; L=max(or1, D); D=abs(r-sr2)")


def _neck_tables(unique_radii, offset):
    """Bilinear lookup of the published 21x21 neck tables at each unique
    radius pair; grid covers radius+offset in [0.1, 0.2] nm, 0.005 nm step."""
    with open(os.path.join(_DATA, "gbn_neck_tables.json")) as f:
        tables = json.load(f)
    n = len(unique_radii)
    pos = [(r + offset - 0.1) * 200.0 for r in unique_radii]
    i1, i2, w1, w2 = [], [], [], []
    for p in pos:
        if p <= 0:
            i1.append(0); i2.append(0); w1.append(1.0); w2.append(0.0)
        elif p >= 20:
            i1.append(20); i2.append(0); w1.append(1.0); w2.append(0.0)
        else:
            lo = int(math.floor(p))
            i1.append(lo); i2.append(lo + 1)
            w1.append(lo + 1 - p); w2.append(1.0 - (lo + 1 - p))
    out = {}
    for key in ("d0", "m0"):
        full = tables[key]
        vals = []
        for a in range(n):
            for b in range(n):
                vals.append(
                    w1[a] * w1[b] * full[i1[a] * 21 + i1[b]]
                    + w1[a] * w2[b] * full[i1[a] * 21 + i2[b]]
                    + w2[a] * w1[b] * full[i2[a] * 21 + i1[b]]
                    + w2[a] * w2[b] * full[i2[a] * 21 + i2[b]])
        out[key] = vals
    return out


def build_gb_force(model, charges, gb_params, solventDielectric=78.5,
                   soluteDielectric=1.0, SA=None, cutoff=None, kappa=0.0):
    """Assemble the CustomGBForce for `model`.

    charges: per-atom charges. gb_params: per-atom [radius, screen, ...] as
    from standard_gb_parameters (radius NOT offset yet; offsetting and
    screen*offset-radius scaling happen here).
    """
    if kappa < 0:
        raise ValueError("kappa/ionic strength must be >= 0")
    offset = GBN2_OFFSET if model == "GBn2" else GB_OFFSET
    force = CustomGBForce()
    force.addPerParticleParameter("charge")
    force.addPerParticleParameter("or")
    force.addPerParticleParameter("sr")
    if model == "GBn2":
        force.addPerParticleParameter("alpha")
        force.addPerParticleParameter("beta")
        force.addPerParticleParameter("gamma")

    rows = []
    for q, p in zip(charges, gb_params):
        orad = p[0] - offset
        rows.append([q, orad, p[1] * orad] + list(p[2:]))

    if model in ("GBn", "GBn2"):
        force.addPerParticleParameter("radindex")
        unique = sorted({row[1] for row in rows})
        index = {r: i for i, r in enumerate(unique)}
        tabs = _neck_tables(unique, offset)
        n = len(unique)
        force.addTabulatedFunction(
            "getd0", Discrete2DFunction(n, n, tabs["d0"]))
        force.addTabulatedFunction(
            "getm0", Discrete2DFunction(n, n, tabs["m0"]))
        neck_scale = 0.826836 if model == "GBn2" else 0.361825
        force.addComputedValue(
            "I",
            "Ivdw+neckScale*Ineck;"
            "Ineck=step(radius1+radius2+neckCut-r)*getm0(radindex1,radindex2)"
            "/(1+100*(r-getd0(radindex1,radindex2))^2"
            "+0.3*1000000*(r-getd0(radindex1,radindex2))^6);"
            "Ivdw=" + _I_HCT + ";"
            "radius1=or1+offset; radius2=or2+offset;"
            "neckScale=%.16g; neckCut=0.68; offset=%.16g"
            % (neck_scale, offset),
            CustomGBForce.ParticlePairNoExclusions)
        for row in rows:
            row.append(index[row[1]])
    else:
        force.addComputedValue("I", _I_HCT,
                               CustomGBForce.ParticlePairNoExclusions)

    if model == "HCT":
        force.addComputedValue("B", "1/(1/or-I)", CustomGBForce.SingleParticle)
    elif model == "OBC1":
        force.addComputedValue(
            "B", "1/(1/or-tanh(0.8*psi+2.909125*psi^3)/radius);"
            "psi=I*or; radius=or+offset; offset=%.16g" % offset,
            CustomGBForce.SingleParticle)
    elif model == "OBC2":
        force.addComputedValue(
            "B", "1/(1/or-tanh(psi-0.8*psi^2+4.85*psi^3)/radius);"
            "psi=I*or; radius=or+offset; offset=%.16g" % offset,
            CustomGBForce.SingleParticle)
    elif model == "GBn":
        force.addComputedValue(
            "B", "1/(1/or-tanh(1.09511284*psi-1.907992938*psi^2"
            "+2.50798245*psi^3)/radius);"
            "psi=I*or; radius=or+offset; offset=%.16g" % offset,
            CustomGBForce.SingleParticle)
    elif model == "GBn2":
        force.addComputedValue(
            "B", "1/(1/or-tanh(alpha*psi-beta*psi^2+gamma*psi^3)/radius);"
            "psi=I*or; radius=or+offset; offset=%.16g" % offset,
            CustomGBForce.SingleParticle)

    consts = ("; solventDielectric=%.16g; soluteDielectric=%.16g;"
              " kappa=%.16g; offset=%.16g"
              % (solventDielectric, soluteDielectric, kappa, offset))
    if cutoff is not None:
        consts += "; cutoff=%.16g" % cutoff
    if kappa > 0:
        force.addEnergyTerm(
            "-0.5*138.935485*(1/soluteDielectric"
            "-exp(-kappa*B)/solventDielectric)*charge^2/B" + consts,
            CustomGBForce.SingleParticle)
    else:
        force.addEnergyTerm(
            "-0.5*138.935485*(1/soluteDielectric-1/solventDielectric)"
            "*charge^2/B" + consts, CustomGBForce.SingleParticle)
    if SA == "ACE":
        force.addEnergyTerm(
            "28.3919551*(radius+0.14)^2*(radius/B)^6; radius=or+offset"
            + consts, CustomGBForce.SingleParticle)
    elif SA is not None:
        raise ValueError("Unknown surface area method: " + str(SA))
    pair_core = ("charge1*charge2/f;"
                 "f=sqrt(r^2+B1*B2*exp(-r^2/(4*B1*B2)))")
    diel = ("(1/soluteDielectric-exp(-kappa*f)/solventDielectric)"
            if kappa > 0
            else "(1/soluteDielectric-1/solventDielectric)")
    if cutoff is None:
        force.addEnergyTerm("-138.935485*" + diel + "*" + pair_core + consts,
                            CustomGBForce.ParticlePairNoExclusions)
    else:
        force.addEnergyTerm(
            "-138.935485*" + diel + "*charge1*charge2*(1/f-%.16g);"
            "f=sqrt(r^2+B1*B2*exp(-r^2/(4*B1*B2)))" % (1.0 / cutoff) + consts,
            CustomGBForce.ParticlePairNoExclusions)

    for row in rows:
        force.addParticle(row)
    return force


def compute_kappa(saltConc, solventDielectric=78.5, temperature=298.15):
    """Debye screening kappa (1/nm) from a salt concentration in mol/L,
    including Amber's 0.73 ion-exclusion factor."""
    saltConc = float(u.strip(saltConc, u.mole / u.liter))
    temperature = float(u.strip(temperature, u.kelvin))
    return 7.3 * 50.33355 * math.sqrt(
        saltConc / solventDielectric / temperature)


def add_implicit_solvent(system, topology, model, charges, radii=None,
                         screens=None, solventDielectric=78.5,
                         soluteDielectric=1.0, SA=None, cutoff=None,
                         kappa=0.0):
    """Attach the GB force for `model` to `system`. radii/screens override
    the standard parameter tables (e.g. prmtop RADII/SCREEN; screens are
    honored for HCT/OBC only — GBn/GBn2 always use their refit screens,
    matching sander/pmemd behavior)."""
    params = standard_gb_parameters(model, topology)
    if radii is not None:
        for p, r in zip(params, radii):
            p[0] = float(r)
    if screens is not None and model in ("HCT", "OBC1", "OBC2"):
        for p, s in zip(params, screens):
            p[1] = float(s)
    if model == "OBC2" and kappa == 0.0:
        gb = GBSAOBCForce()
        gb.setSoluteDielectric(soluteDielectric)
        gb.setSolventDielectric(solventDielectric)
        if SA is None:
            gb.setSurfaceAreaEnergy(0)
        for q, p in zip(charges, params):
            gb.addParticle(q, p[0], p[1])
        if cutoff is not None:
            gb.setNonbondedMethod(GBSAOBCForce.CutoffNonPeriodic)
            gb.setCutoffDistance(cutoff)
        system.addForce(gb)
        return gb
    gb = build_gb_force(model, charges, params, solventDielectric,
                        soluteDielectric, SA, cutoff, kappa)
    if cutoff is not None:
        gb.setNonbondedMethod(CustomGBForce.CutoffNonPeriodic)
        gb.setCutoffDistance(cutoff)
    system.addForce(gb)
    return gb
