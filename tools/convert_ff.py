"""Convert a force-field parameter XML (the reference distribution's data
schema) into openmm-tpu's compact JSON parameter format.

The numeric content of these files is published scientific data (Amber,
CHARMM force-field parameter sets); this tool re-expresses that data in our
own container format (see ForceField._load_json for the loader).

Usage: python tools/convert_ff.py IN.xml [IN2.xml ...] OUT.json
Multiple inputs are merged (the way <Include> directives merge them).
"""
from __future__ import annotations

import json
import sys
import xml.etree.ElementTree as ET


def convert(paths):
    out = {
        "format": "openmm-tpu-ff-1",
        "provenance": ("parameters converted from the published force-field "
                       "distribution files: " + ", ".join(paths)),
        "atom_types": [],
        "residues": {},
        "bonds": [],
        "angles": [],
        "propers": [],
        "impropers": [],
        "rb_torsions": [],
        "nonbonded": None,
        "gbsa": None,
        "scripts": [],
    }

    def key_spec(node, n):
        """Per-slot (kind, value) where kind is 'type'/'class'/None."""
        spec = []
        for i in range(1, n + 1):
            t = node.attrib.get("type%d" % i)
            c = node.attrib.get("class%d" % i)
            if t is not None:
                spec.append(None if t == "" else ["type", t])
            elif c is not None:
                spec.append(None if c == "" else ["class", c])
            else:
                spec.append(None)
        return spec

    def torsion_terms(node):
        terms = []
        i = 1
        while ("periodicity%d" % i) in node.attrib:
            terms.append([int(node.attrib["periodicity%d" % i]),
                          float(node.attrib["phase%d" % i]),
                          float(node.attrib["k%d" % i])])
            i += 1
        return terms

    for path in paths:
        root = ET.parse(path).getroot()
        for types in root.findall("AtomTypes"):
            for t in types.findall("Type"):
                out["atom_types"].append([
                    t.attrib["name"], t.attrib.get("class", t.attrib["name"]),
                    float(t.attrib["mass"]), t.attrib.get("element")])
        for residues in root.findall("Residues"):
            for res in residues.findall("Residue"):
                r = {"atoms": [], "bonds": [], "external": [],
                     "virtual_sites": []}
                names = {}
                for child in res:
                    if child.tag == "Atom":
                        extra = {k: float(v) for k, v in child.attrib.items()
                                 if k not in ("name", "type")}
                        names[child.attrib["name"]] = len(r["atoms"])
                        r["atoms"].append([child.attrib["name"],
                                           child.attrib["type"], extra])
                    elif child.tag == "Bond":
                        if "atomName1" in child.attrib:
                            i = names[child.attrib["atomName1"]]
                            j = names[child.attrib["atomName2"]]
                        else:
                            i = int(child.attrib["from"])
                            j = int(child.attrib["to"])
                        r["bonds"].append([i, j])
                    elif child.tag == "ExternalBond":
                        if "atomName" in child.attrib:
                            i = names[child.attrib["atomName"]]
                        else:
                            i = int(child.attrib["from"])
                        r["external"].append(i)
                    elif child.tag == "VirtualSite":
                        r["virtual_sites"].append(dict(child.attrib))
                out["residues"][res.attrib["name"]] = r
        for section in root.findall("HarmonicBondForce"):
            for b in section.findall("Bond"):
                out["bonds"].append([key_spec(b, 2),
                                     float(b.attrib["length"]),
                                     float(b.attrib["k"])])
        for section in root.findall("HarmonicAngleForce"):
            for a in section.findall("Angle"):
                out["angles"].append([key_spec(a, 3),
                                      float(a.attrib["angle"]),
                                      float(a.attrib["k"])])
        for section in root.findall("PeriodicTorsionForce"):
            ordering = section.attrib.get("ordering", "default")
            for t in section.findall("Proper"):
                out["propers"].append([key_spec(t, 4), torsion_terms(t)])
            for t in section.findall("Improper"):
                out["impropers"].append([key_spec(t, 4), torsion_terms(t),
                                         ordering])
        for section in root.findall("RBTorsionForce"):
            for t in section.findall("Proper"):
                cs = [float(t.attrib.get("c%d" % i, 0)) for i in range(6)]
                out["rb_torsions"].append([key_spec(t, 4), cs])
        for section in root.findall("NonbondedForce"):
            if out["nonbonded"] is None:
                out["nonbonded"] = {
                    "coulomb14scale": float(
                        section.attrib.get("coulomb14scale", 0.833333)),
                    "lj14scale": float(section.attrib.get("lj14scale", 0.5)),
                    "useChargeFromResidue": False,
                    "atoms": [],
                }
            for a in section.findall("UseAttributeFromResidue"):
                if a.attrib["name"] == "charge":
                    out["nonbonded"]["useChargeFromResidue"] = True
            for a in section.findall("Atom"):
                kind = "type" if "type" in a.attrib else "class"
                out["nonbonded"]["atoms"].append([
                    kind, a.attrib.get("type", a.attrib.get("class")),
                    float(a.attrib.get("charge", 0.0)),
                    float(a.attrib.get("sigma", 1.0)),
                    float(a.attrib.get("epsilon", 0.0))])
        for section in root.findall("GBSAOBCForce"):
            if out["gbsa"] is None:
                out["gbsa"] = {"atoms": []}
            for a in section.findall("Atom"):
                kind = "type" if "type" in a.attrib else "class"
                out["gbsa"]["atoms"].append([
                    kind, a.attrib.get("type", a.attrib.get("class")),
                    float(a.attrib.get("charge", 0.0)),
                    float(a.attrib["radius"]), float(a.attrib["scale"])])
        # every other generator section (CMAP, LennardJones/NBFIX, Custom*,
        # Drude, the AMOEBA family) plus Patches rides through as serialized
        # parameter XML, parsed at load time by the PARSERS registry
        handled = {"Info", "AtomTypes", "Residues", "HarmonicBondForce",
                   "HarmonicAngleForce", "PeriodicTorsionForce",
                   "RBTorsionForce", "NonbondedForce", "GBSAOBCForce",
                   "Include", "Script"}
        for child in root:
            if child.tag not in handled:
                out.setdefault("sections", []).append(
                    ET.tostring(child, encoding="unicode"))
    return out


def main():
    *inputs, output = sys.argv[1:]
    data = convert(inputs)
    with open(output, "w") as f:
        json.dump(data, f, separators=(",", ":"))
    print("wrote %s (%d types, %d residues, %d bonds, %d angles, "
          "%d propers, %d impropers)" % (
              output, len(data["atom_types"]), len(data["residues"]),
              len(data["bonds"]), len(data["angles"]), len(data["propers"]),
              len(data["impropers"])))


if __name__ == "__main__":
    main()
