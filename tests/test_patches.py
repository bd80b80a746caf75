"""ForceField <Patch> support (scenarios of TestPatches.py): parse,
template application, and the two-terminal-patch ala_ala_ala build with
golden charges (TestPatches.py:185-272)."""
from io import StringIO

import numpy as np

import openmm_tpu as mm
from openmm_tpu import unit as u
from openmm_tpu.app import ForceField, PDBFile

SYS = "/root/reference/wrappers/python/tests/systems/"

PATCH_XML = """
<ForceField>
 <AtomTypes>
  <Type name="A type" class="A class" element="O" mass="15.99943"/>
  <Type name="B type" class="B class" element="H" mass="1.007947"/>
  <Type name="C type" class="C class" element="H" mass="1.007947"/>
  <Type name="D type" class="D class" element="C" mass="12.010000"/>
 </AtomTypes>
 <Residues>
  <Residue name="RES">
   <Atom name="A" type="A type"/>
   <Atom name="B" type="B type"/>
   <Atom name="C" type="C type"/>
   <Bond atomName1="A" atomName2="B"/>
   <Bond atomName1="B" atomName2="C"/>
   <ExternalBond atomName="C"/>
  </Residue>
 </Residues>
 <Patches>
  <Patch name="Test">
    <AddAtom name="D" type="D type"/>
    <ChangeAtom name="B" type="A type"/>
    <RemoveAtom name="A"/>
    <AddBond atomName1="B" atomName2="D"/>
    <RemoveBond atomName1="A" atomName2="B"/>
    <AddExternalBond atomName="D"/>
    <RemoveExternalBond atomName="C"/>
    <ApplyToResidue name="RES"/>
  </Patch>
 </Patches>
</ForceField>"""


def test_parse_and_apply_patch():
    ff = ForceField(StringIO(PATCH_XML))
    assert len(ff._patches) == 1
    patch = ff._patches["Test"]
    template = ff._templates["RES"]
    (t,) = patch.createPatchedTemplates([template])
    names = {a.name: a for a in t.atoms}
    assert set(names) == {"B", "C", "D"}
    assert names["B"].type == "A type"
    assert names["D"].type == "D type"
    index = {a.name: i for i, a in enumerate(t.atoms)}
    bonds = {frozenset(b) for b in t.bonds}
    assert frozenset((index["B"], index["C"])) in bonds
    assert frozenset((index["B"], index["D"])) in bonds
    assert len(t.bonds) == 2
    assert t.externalBonds == [index["D"]]


ALA_XML = """
<ForceField>
 <AtomTypes>
  <Type name="N" class="N" element="N" mass="14.00672"/>
  <Type name="H" class="H" element="H" mass="1.007947"/>
  <Type name="CT" class="CT" element="C" mass="12.01078"/>
  <Type name="H1" class="H1" element="H" mass="1.007947"/>
  <Type name="HC" class="HC" element="H" mass="1.007947"/>
  <Type name="C" class="C" element="C" mass="12.01078"/>
  <Type name="O" class="O" element="O" mass="15.99943"/>
  <Type name="O2" class="O2" element="O" mass="15.99943"/>
  <Type name="N3" class="N3" element="N" mass="14.00672"/>
 </AtomTypes>
 <Residues>
  <Residue name="ALA">
   <Atom name="N" type="N"/>
   <Atom name="H" type="H"/>
   <Atom name="CA" type="CT"/>
   <Atom name="HA" type="H1"/>
   <Atom name="CB" type="CT"/>
   <Atom name="HB1" type="HC"/>
   <Atom name="HB2" type="HC"/>
   <Atom name="HB3" type="HC"/>
   <Atom name="C" type="C"/>
   <Atom name="O" type="O"/>
   <Bond from="0" to="1"/>
   <Bond from="0" to="2"/>
   <Bond from="2" to="3"/>
   <Bond from="2" to="4"/>
   <Bond from="2" to="8"/>
   <Bond from="4" to="5"/>
   <Bond from="4" to="6"/>
   <Bond from="4" to="7"/>
   <Bond from="8" to="9"/>
   <ExternalBond from="0"/>
   <ExternalBond from="8"/>
   <AllowPatch name="CTER"/>
   <AllowPatch name="NTER"/>
  </Residue>
 </Residues>
 <Patches>
  <Patch name="CTER">
    <AddAtom name="OXT" type="O2"/>
    <ChangeAtom name="O" type="O2"/>
    <AddBond atomName1="C" atomName2="OXT"/>
    <RemoveExternalBond atomName="C"/>
  </Patch>
  <Patch name="NTER">
    <RemoveAtom name="H"/>
    <AddAtom name="H1" type="H"/>
    <AddAtom name="H2" type="H"/>
    <AddAtom name="H3" type="H"/>
    <ChangeAtom name="N" type="N3"/>
    <RemoveBond atomName1="N" atomName2="H"/>
    <AddBond atomName1="N" atomName2="H1"/>
    <AddBond atomName1="N" atomName2="H2"/>
    <AddBond atomName1="N" atomName2="H3"/>
    <RemoveExternalBond atomName="N"/>
  </Patch>
 </Patches>
 <NonbondedForce coulomb14scale="0.833333" lj14scale="0.5">
  <Atom type="N" charge="-0.4157" sigma="0.324999852378" epsilon="0.71128"/>
  <Atom type="H" charge="0.2719" sigma="0.106907846177" epsilon="0.0656888"/>
  <Atom type="CT" charge="0.0337" sigma="0.339966950842" epsilon="0.4577296"/>
  <Atom type="H1" charge="0.0823" sigma="0.247135304412" epsilon="0.0656888"/>
  <Atom type="HC" charge="0.0603" sigma="0.264953278775" epsilon="0.0656888"/>
  <Atom type="C" charge="0.5973" sigma="0.339966950842" epsilon="0.359824"/>
  <Atom type="O" charge="-0.5679" sigma="0.295992190115" epsilon="0.87864"/>
  <Atom type="O2" charge="-0.8055" sigma="0.295992190115" epsilon="0.87864"/>
  <Atom type="N3" charge="0.1414" sigma="0.324999852378" epsilon="0.71128"/>
 </NonbondedForce>
</ForceField>"""


def test_terminal_patches_build_ala_ala_ala():
    """Golden per-atom charges after NTER + CTER patches
    (TestPatches.py testAlaAlaAla)."""
    ff = ForceField(StringIO(ALA_XML))
    pdb = PDBFile(SYS + "ala_ala_ala.pdb")
    system = ff.createSystem(pdb.topology)
    nb = next(f for f in system.getForces()
              if type(f).__name__ == "NonbondedForce")
    expected = [0.1414, 0.2719, 0.2719, 0.2719, 0.0337, 0.0823, 0.0337,
                0.0603, 0.0603, 0.0603, 0.5973, -0.5679,
                -0.4157, 0.2719, 0.0337, 0.0823, 0.0337, 0.0603, 0.0603,
                0.0603, 0.5973, -0.5679,
                0.5973, -0.8055, -0.8055, -0.4157, 0.2719, 0.0337, 0.0823,
                0.0337, 0.0603, 0.0603, 0.0603]
    assert system.getNumParticles() == len(expected)
    for i in range(system.getNumParticles()):
        q = u.strip(nb.getParticleParameters(i)[0])
        assert abs(q - expected[i]) < 1e-12, (i, q, expected[i])
