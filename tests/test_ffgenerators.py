"""Registry-based ForceField generator sections: Custom*, LennardJones/
NBFIX, CMAP, Drude, AMOEBA family (reference forcefield.py:2013-5889)."""
import os
import tempfile

import numpy as np
import pytest

import openmm_tpu as mm
from openmm_tpu import app
from openmm_tpu import forces as mmforces
from openmm_tpu.app.element import Element


def _dimer_topology(n_res=2):
    top = app.Topology()
    ch = top.addChain()
    C = Element.getBySymbol("C")
    for _ in range(n_res):
        res = top.addResidue("DIM", ch)
        a1 = top.addAtom("C1", C, res)
        a2 = top.addAtom("C2", C, res)
        top.addBond(a1, a2)
    return top


CUSTOM_XML = """<ForceField>
 <AtomTypes>
  <Type name="A" class="CA" element="C" mass="12.0"/>
  <Type name="B" class="CB" element="C" mass="12.0"/>
 </AtomTypes>
 <Residues>
  <Residue name="DIM">
   <Atom name="C1" type="A"/>
   <Atom name="C2" type="B"/>
   <Bond atomName1="C1" atomName2="C2"/>
  </Residue>
 </Residues>
 <CustomBondForce energy="0.5*kk*(r-r0)^2">
  <GlobalParameter name="gscale" defaultValue="1.0"/>
  <PerBondParameter name="r0"/>
  <PerBondParameter name="kk"/>
  <Bond class1="CA" class2="CB" r0="0.15" kk="1000.0"/>
 </CustomBondForce>
 <LennardJonesForce lj14scale="0.5">
  <Atom type="A" sigma="0.3" epsilon="0.5"/>
  <Atom type="B" sigma="0.32" epsilon="0.4"/>
  <NBFixPair type1="A" type2="B" sigma="0.4" epsilon="1.0"/>
 </LennardJonesForce>
 <NonbondedForce coulomb14scale="0.8333" lj14scale="0.5">
  <Atom type="A" charge="0.0" sigma="1.0" epsilon="0.0"/>
  <Atom type="B" charge="0.0" sigma="1.0" epsilon="0.0"/>
 </NonbondedForce>
</ForceField>"""


def _write_xml(text):
    f = tempfile.NamedTemporaryFile("w", suffix=".xml", delete=False)
    f.write(text)
    f.close()
    return f.name


def test_custom_bond_and_nbfix_sections():
    """LennardJonesForce NBFIX lookup table + CustomBondForce from XML
    reproduce a hand-computed energy."""
    ff = app.ForceField(_write_xml(CUSTOM_XML))
    top = _dimer_topology()
    system = ff.createSystem(top)
    names = {f.getName() for f in system.getForces()}
    assert "LennardJones" in names
    assert "CustomBondForce" in names
    pos = np.array([[0, 0, 0], [0.15, 0, 0],
                    [0.5, 0, 0], [0.65, 0, 0]], float)
    ctx = mm.Context(system, mm.VerletIntegrator(0.001),
                     mm.Platform.getPlatformByName("Reference"))
    ctx.setPositions(pos)
    e = float(ctx.getState(getEnergy=True).getPotentialEnergy()._value)

    def lj(sig, eps, r):
        return 4 * eps * ((sig / r) ** 12 - (sig / r) ** 6)

    types = ["A", "B", "A", "B"]
    params = {"A": (0.3, 0.5), "B": (0.32, 0.4)}
    expected = 0.0
    for i, j in [(0, 2), (0, 3), (1, 2), (1, 3)]:
        r = abs(pos[j, 0] - pos[i, 0])
        if types[i] == types[j]:
            s, eps = params[types[i]]
        else:
            s, eps = 0.4, 1.0          # NBFIX override
        expected += lj(s, eps, r)
    assert abs(e - expected) < 1e-4, (e, expected)


def test_registered_template_generator():
    """registerTemplateGenerator supplies a template when matching fails
    (the ML-potential integration hook, reference forcefield.py:504)."""
    ff = app.ForceField(_write_xml(CUSTOM_XML))
    top = app.Topology()
    ch = top.addChain()
    C = Element.getBySymbol("C")
    res = top.addResidue("UNK", ch)
    a1 = top.addAtom("X1", C, res)
    a2 = top.addAtom("X2", C, res)
    a3 = top.addAtom("X3", C, res)
    top.addBond(a1, a2)
    top.addBond(a2, a3)
    calls = []

    def generator(forcefield, residue):
        calls.append(residue.name)
        from openmm_tpu.app.forcefield import _Template, _TemplateAtom
        t = _Template("UNK")
        for nm in ("X1", "X2", "X3"):
            t.atoms.append(_TemplateAtom(nm, "A", C, {}))
        for (i, j) in ((0, 1), (1, 2)):
            t.bonds.append((i, j))
            t.atoms[i].bondedTo.append(j)
            t.atoms[j].bondedTo.append(i)
        forcefield.registerResidueTemplate(t)
        return True

    ff.registerTemplateGenerator(generator)
    system = ff.createSystem(top)
    assert calls == ["UNK"]
    assert system.getNumParticles() == 3


CMAP_XML = """<ForceField>
 <AtomTypes>
  <Type name="A" class="CA" element="C" mass="12.0"/>
 </AtomTypes>
 <Residues>
  <Residue name="CHN">
   <Atom name="C1" type="A"/><Atom name="C2" type="A"/>
   <Atom name="C3" type="A"/><Atom name="C4" type="A"/>
   <Atom name="C5" type="A"/>
   <Bond atomName1="C1" atomName2="C2"/>
   <Bond atomName1="C2" atomName2="C3"/>
   <Bond atomName1="C3" atomName2="C4"/>
   <Bond atomName1="C4" atomName2="C5"/>
  </Residue>
 </Residues>
 <CMAPTorsionForce>
  <Map>
   0.0 1.0 2.0 1.0
   1.0 2.0 3.0 2.0
   2.0 3.0 4.0 3.0
   1.0 2.0 3.0 2.0
  </Map>
  <Torsion map="0" type1="A" type2="A" type3="A" type4="A" type5="A"/>
 </CMAPTorsionForce>
</ForceField>"""


def test_cmap_section():
    ff = app.ForceField(_write_xml(CMAP_XML))
    top = app.Topology()
    ch = top.addChain()
    C = Element.getBySymbol("C")
    res = top.addResidue("CHN", ch)
    atoms = [top.addAtom("C%d" % (i + 1), C, res) for i in range(5)]
    for i in range(4):
        top.addBond(atoms[i], atoms[i + 1])
    system = ff.createSystem(top)
    cmaps = [f for f in system.getForces()
             if isinstance(f, mmforces.CMAPTorsionForce)]
    assert len(cmaps) == 1
    assert cmaps[0].getNumMaps() == 1
    assert cmaps[0].getNumTorsions() == 1
    # energy evaluates through the spline path
    rng = np.random.RandomState(0)
    pos = rng.uniform(0, 0.3, (5, 3))
    ctx = mm.Context(system, mm.VerletIntegrator(0.001),
                     mm.Platform.getPlatformByName("Reference"))
    ctx.setPositions(pos)
    e = float(ctx.getState(getEnergy=True).getPotentialEnergy()._value)
    assert np.isfinite(e)


AMOEBA_WATER_POS = np.array([
    [-8.7387270e-01, 5.3220410e-01, 7.4214000e-03],
    [-9.6050090e-01, 5.1173410e-01, -2.2202700e-02],
    [-8.5985900e-01, 4.9658230e-01, 1.0283390e-01],
    [9.1767100e-02, -7.8956650e-01, 4.3804200e-01],
    [1.2333420e-01, -7.0267430e-01, 4.2611550e-01],
    [1.7267090e-01, -8.2320810e-01, 4.8124750e-01],
    [8.6290110e-01, 6.2153500e-02, 4.1280850e-01],
    [8.6385200e-01, 1.2684730e-01, 3.3887060e-01],
    [9.5063550e-01, 5.3173300e-02, 4.4799160e-01],
    [5.0844930e-01, 2.8684740e-01, -6.9293750e-01],
    [6.0459330e-01, 3.0620510e-01, -7.0100130e-01],
    [5.0590640e-01, 1.8880920e-01, -6.8813470e-01]])


def _amoeba_water_topology(n_waters=4):
    top = app.Topology()
    ch = top.addChain()
    O = Element.getBySymbol("O")
    H = Element.getBySymbol("H")
    for _ in range(n_waters):
        res = top.addResidue("HOH", ch)
        o = top.addAtom("O", O, res)
        h1 = top.addAtom("H1", H, res)
        h2 = top.addAtom("H2", H, res)
        top.addBond(o, h1)
        top.addBond(o, h2)
    from openmm_tpu.vec3 import Vec3
    top.setPeriodicBoxVectors([Vec3(1.8643, 0, 0), Vec3(0, 1.8643, 0),
                               Vec3(0, 0, 1.8643)])
    return top


class TestAmoebaGenerators:
    @pytest.fixture(scope="class")
    def system(self):
        ff = app.ForceField("amoeba2013.json")
        top = _amoeba_water_topology()
        return ff.createSystem(
            top, nonbondedMethod=app.forcefield.PME, nonbondedCutoff=0.7,
            polarization="mutual", mutualInducedTargetEpsilon=1e-6,
            aEwald=5.4459052, pmeGridDimensions=[20, 20, 20])

    def test_force_inventory(self, system):
        names = sorted(set(f.getName() for f in system.getForces()))
        for expected in ("AmoebaBond", "AmoebaAngle",
                         "AmoebaMultipoleForce", "AmoebaVdwForce"):
            assert expected in names, names

    def test_multipole_parameters(self, system):
        mp = [f for f in system.getForces()
              if isinstance(f, mmforces.AmoebaMultipoleForce)][0]
        assert mp.getNumMultipoles() == 12
        # AMOEBA-2013 water oxygen (amoeba2013.xml Multipole type 247)
        (q, dip, quad, axis, z, x, y, thole, pdamp, pol) = \
            mp.getMultipoleParameters(0)
        assert abs(q - (-0.51966)) < 1e-6
        assert axis == mmforces.AmoebaMultipoleForce.Bisector
        assert {z, x} == {1, 2}
        assert abs(pol - 8.37e-4) < 1e-9
        # covalent maps: O bonded to both hydrogens
        assert sorted(mp.getCovalentMap(
            0, mmforces.AmoebaMultipoleForce.Covalent12)) == [1, 2]
        assert sorted(mp.getCovalentMap(
            0, mmforces.AmoebaMultipoleForce.PolarizationCovalent11)) \
            == [0, 1, 2]

    def test_vdw_parameters(self, system):
        vdw = [f for f in system.getForces()
               if isinstance(f, mmforces.AmoebaVdwForce)][0]
        assert vdw.getNumParticles() == 12
        parent, sig, eps, red = vdw.getParticleParameters(1)
        assert parent == 0            # hydrogen reduces onto oxygen
        assert red < 1.0
        excl = vdw.getParticleExclusions(0)
        assert set(excl) == {0, 1, 2}

    def test_energy_evaluates(self, system):
        ctx = mm.Context(system, mm.VerletIntegrator(0.001),
                         mm.Platform.getPlatformByName("Reference"))
        ctx.setPositions(AMOEBA_WATER_POS)
        st = ctx.getState(getEnergy=True, getForces=True)
        e = float(st.getPotentialEnergy()._value)
        f = np.asarray(st.getForces(asNumpy=True)._value)
        assert np.isfinite(e)
        assert np.isfinite(f).all()


def test_drude_charmm_polar_parses():
    """charmm_polar_2019 (Drude force field) loads through the registry."""
    ff = app.ForceField("charmm_polar_2019.json")
    from openmm_tpu.app.ffgenerators import DrudeGenerator
    assert any(isinstance(g, DrudeGenerator) for g in ff._forces)


def test_swm4ndp_loads():
    ff = app.ForceField("swm4ndp.json")
    assert len(ff._atomTypes) == 4


def test_amoeba_gk_generator():
    """amoeba2013_gk.json wires AmoebaGeneralizedKirkwoodForce into the
    System (Bondi radii x1.03, shct 0.69, charges from the multipole force;
    reference forcefield.py:5359-5617), and the GK energy evaluates."""
    from openmm_tpu.forces.amoeba import AmoebaGeneralizedKirkwoodForce
    ff = app.ForceField("amoeba2013.json", "amoeba2013_gk.json")
    top = _amoeba_water_topology()
    top.setPeriodicBoxVectors(None)
    system = ff.createSystem(top, nonbondedMethod=app.forcefield.NoCutoff,
                             polarization="direct")
    gks = [f for f in system.getForces()
           if isinstance(f, AmoebaGeneralizedKirkwoodForce)]
    assert len(gks) == 1
    gk = gks[0]
    assert gk.getNumParticles() == system.getNumParticles()
    c, r, s = gk.getParticleParameters(0)
    assert abs(r._value - 0.152 * 1.03) < 1e-6   # oxygen Bondi radius
    assert s == 0.69
    import numpy as np
    ctx = mm.Context(system, mm.VerletIntegrator(0.001),
                     mm.Platform.getPlatformByName("Reference"))
    pos = np.asarray(AMOEBA_WATER_POS, np.float64)
    ctx.setPositions(pos)
    e = ctx.getState(getEnergy=True).getPotentialEnergy()._value
    assert np.isfinite(e)
    # solvation should be attractive for a polar cluster
    assert e < 0.0 or abs(e) < 1e3
