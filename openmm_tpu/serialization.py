"""XmlSerializer: XML (de)serialization of System/Force/Integrator/State.

Schema-compatible with the reference's serialization proxies
(serialization/src/*Proxy.cpp: SystemProxy tag layout at SystemProxy.cpp:47-104,
NonbondedForceProxy attributes at NonbondedForceProxy.cpp:45-96, StateProxy
fields) so Systems/States serialized by either implementation can be read by
the other — the portability contract noted in SURVEY §2.8.
"""
from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np
from xml.dom import minidom

from . import forces as F
from . import integrators as I
from . import unit as u
from .exceptions import OpenMMException
from .state import State
from .system import (LocalCoordinatesSite, OutOfPlaneSite, System,
                     ThreeParticleAverageSite, TwoParticleAverageSite)
from .tabulated import (Continuous1DFunction, Continuous2DFunction,
                        Continuous3DFunction, Discrete1DFunction,
                        Discrete2DFunction, Discrete3DFunction)
from .vec3 import Vec3
from .version import short_version


def _fmt(x):
    return repr(float(x))


class XmlSerializer(object):
    @staticmethod
    def serialize(obj):
        el = _serialize_object(obj)
        el.set("version", el.get("version", "1"))
        el.set("openmmVersion", short_version)
        rough = ET.tostring(el, encoding="unicode")
        return minidom.parseString(rough).toprettyxml(indent="\t")

    @staticmethod
    def deserialize(xml):
        root = ET.fromstring(xml)
        return _deserialize_object(root)

    # aliases matching the reference C++ template API
    serializeSystem = serialize
    deserializeSystem = deserialize


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------
def _serialize_object(obj):
    if isinstance(obj, System):
        return _ser_system(obj)
    if isinstance(obj, State):
        return _ser_state(obj)
    if isinstance(obj, I.Integrator):
        return _ser_integrator(obj)
    if isinstance(obj, F.Force):
        el = ET.Element("Force")
        _ser_force_into(el, obj)
        return el
    raise OpenMMException("cannot serialize %r" % (obj,))


def _deserialize_object(root):
    tag = root.tag
    if tag == "System":
        return _de_system(root)
    if tag == "State":
        return _de_state(root)
    if tag == "Integrator":
        return _de_integrator(root)
    if tag == "Force":
        return _de_force(root)
    raise OpenMMException("cannot deserialize <%s>" % tag)


# ---------------------------------------------------------------------------
# System (SystemProxy.cpp:47-104)
# ---------------------------------------------------------------------------
def _ser_system(system):
    el = ET.Element("System")
    el.set("type", "System")
    el.set("version", "1")
    box = ET.SubElement(el, "PeriodicBoxVectors")
    (a, b, c) = [v.value_in_unit(u.nanometer)
                 for v in system.getDefaultPeriodicBoxVectors()]
    for name, v in (("A", a), ("B", b), ("C", c)):
        ET.SubElement(box, name, x=_fmt(v[0]), y=_fmt(v[1]), z=_fmt(v[2]))
    particles = ET.SubElement(el, "Particles")
    for i in range(system.getNumParticles()):
        p = ET.SubElement(particles, "Particle",
                          mass=_fmt(system.getParticleMass(i)._value))
        if system.isVirtualSite(i):
            site = system.getVirtualSite(i)
            if isinstance(site, TwoParticleAverageSite):
                ET.SubElement(p, "TwoParticleAverageSite",
                              p1=str(site.getParticle(0)),
                              p2=str(site.getParticle(1)),
                              w1=_fmt(site.getWeight(0)),
                              w2=_fmt(site.getWeight(1)))
            elif isinstance(site, ThreeParticleAverageSite):
                ET.SubElement(p, "ThreeParticleAverageSite",
                              p1=str(site.getParticle(0)),
                              p2=str(site.getParticle(1)),
                              p3=str(site.getParticle(2)),
                              w1=_fmt(site.getWeight(0)),
                              w2=_fmt(site.getWeight(1)),
                              w3=_fmt(site.getWeight(2)))
            elif isinstance(site, OutOfPlaneSite):
                ET.SubElement(p, "OutOfPlaneSite",
                              p1=str(site.getParticle(0)),
                              p2=str(site.getParticle(1)),
                              p3=str(site.getParticle(2)),
                              w12=_fmt(site.getWeight12()),
                              w13=_fmt(site.getWeight13()),
                              wc=_fmt(site.getWeightCross()))
            elif isinstance(site, LocalCoordinatesSite):
                lp = site.getLocalPosition()
                sn = ET.SubElement(p, "LocalCoordinatesSite",
                                   pos1=_fmt(lp[0]), pos2=_fmt(lp[1]),
                                   pos3=_fmt(lp[2]))
                wo = site.getOriginWeights()
                wx = site.getXWeights()
                wy = site.getYWeights()
                for j in range(site.getNumParticles()):
                    idx = str(j + 1)
                    sn.set("p" + idx, str(site.getParticle(j)))
                    sn.set("wo" + idx, _fmt(wo[j]))
                    sn.set("wx" + idx, _fmt(wx[j]))
                    sn.set("wy" + idx, _fmt(wy[j]))
    constraints = ET.SubElement(el, "Constraints")
    for i in range(system.getNumConstraints()):
        p1, p2, d = system.getConstraintParameters(i)
        ET.SubElement(constraints, "Constraint", p1=str(p1), p2=str(p2),
                      d=_fmt(d._value))
    forces = ET.SubElement(el, "Forces")
    for force in system.getForces():
        fel = ET.SubElement(forces, "Force")
        _ser_force_into(fel, force)
    return el


def _de_system(root):
    system = System()
    box = root.find("PeriodicBoxVectors")
    if box is not None:
        vecs = []
        for name in ("A", "B", "C"):
            n = box.find(name)
            vecs.append(Vec3(float(n.get("x")), float(n.get("y")),
                             float(n.get("z"))))
        system.setDefaultPeriodicBoxVectors(*vecs)
    vsites = []
    for i, p in enumerate(root.find("Particles")):
        system.addParticle(float(p.get("mass")))
        for child in p:
            vsites.append((i, child))
    for i, child in vsites:
        t = child.tag
        g = child.get
        if t == "TwoParticleAverageSite":
            system.setVirtualSite(i, TwoParticleAverageSite(
                int(g("p1")), int(g("p2")), float(g("w1")), float(g("w2"))))
        elif t == "ThreeParticleAverageSite":
            system.setVirtualSite(i, ThreeParticleAverageSite(
                int(g("p1")), int(g("p2")), int(g("p3")),
                float(g("w1")), float(g("w2")), float(g("w3"))))
        elif t == "OutOfPlaneSite":
            system.setVirtualSite(i, OutOfPlaneSite(
                int(g("p1")), int(g("p2")), int(g("p3")),
                float(g("w12")), float(g("w13")), float(g("wc"))))
        elif t == "LocalCoordinatesSite":
            particles, wo, wx, wy = [], [], [], []
            j = 1
            while g("p%d" % j) is not None:
                particles.append(int(g("p%d" % j)))
                wo.append(float(g("wo%d" % j)))
                wx.append(float(g("wx%d" % j)))
                wy.append(float(g("wy%d" % j)))
                j += 1
            system.setVirtualSite(i, LocalCoordinatesSite(
                particles, wo, wx, wy,
                Vec3(float(g("pos1")), float(g("pos2")), float(g("pos3")))))
    cons = root.find("Constraints")
    if cons is not None:
        for c in cons:
            system.addConstraint(int(c.get("p1")), int(c.get("p2")),
                                 float(c.get("d")))
    forces = root.find("Forces")
    if forces is not None:
        for fel in forces:
            system.addForce(_de_force(fel))
    return system


# ---------------------------------------------------------------------------
# Forces
# ---------------------------------------------------------------------------
def _common_force_attrs(el, force):
    el.set("forceGroup", str(force.getForceGroup()))
    el.set("name", force.getName())


def _restore_common(el, force):
    force.setForceGroup(int(el.get("forceGroup", "0")))
    if el.get("name"):
        force.setName(el.get("name"))


def _ser_globals(el, force):
    gp = ET.SubElement(el, "GlobalParameters")
    for i in range(force.getNumGlobalParameters()):
        ET.SubElement(gp, "Parameter", name=force.getGlobalParameterName(i),
                      default=_fmt(force.getGlobalParameterDefaultValue(i)))
    dv = ET.SubElement(el, "EnergyParameterDerivatives")
    for i in range(force.getNumEnergyParameterDerivatives()):
        ET.SubElement(dv, "Parameter",
                      name=force.getEnergyParameterDerivativeName(i))


def _de_globals(el, force):
    gp = el.find("GlobalParameters")
    if gp is not None:
        for p in gp:
            force.addGlobalParameter(p.get("name"), float(p.get("default")))
    dv = el.find("EnergyParameterDerivatives")
    if dv is not None:
        for p in dv:
            force.addEnergyParameterDerivative(p.get("name"))


def _ser_functions(el, force):
    fns = ET.SubElement(el, "Functions")
    for i in range(force.getNumTabulatedFunctions()):
        fn = force.getTabulatedFunction(i)
        fel = ET.SubElement(fns, "Function",
                            name=force.getTabulatedFunctionName(i))
        _ser_tabulated_into(fel, fn)


def _de_functions(el, force):
    fns = el.find("Functions")
    if fns is not None:
        for fel in fns:
            force.addTabulatedFunction(fel.get("name"), _de_tabulated(fel))


def _ser_tabulated_into(el, fn):
    if isinstance(fn, Continuous1DFunction):
        values, mn, mx = fn.getFunctionParameters()
        el.set("type", "Continuous1D")
        el.set("min", _fmt(mn))
        el.set("max", _fmt(mx))
        el.set("periodic", str(int(fn.getPeriodic())))
        vals = ET.SubElement(el, "Values")
        for v in values:
            ET.SubElement(vals, "Value", v=_fmt(v))
    elif isinstance(fn, Continuous2DFunction):
        (xs, ys, values, xmin, xmax, ymin, ymax) = fn.getFunctionParameters()
        el.set("type", "Continuous2D")
        for k, v in (("xsize", xs), ("ysize", ys)):
            el.set(k, str(v))
        for k, v in (("xmin", xmin), ("xmax", xmax), ("ymin", ymin),
                     ("ymax", ymax)):
            el.set(k, _fmt(v))
        el.set("periodic", str(int(fn.getPeriodic())))
        vals = ET.SubElement(el, "Values")
        for v in values:
            ET.SubElement(vals, "Value", v=_fmt(v))
    elif isinstance(fn, Continuous3DFunction):
        (xs, ys, zs, values, xmin, xmax, ymin, ymax, zmin, zmax) = \
            fn.getFunctionParameters()
        el.set("type", "Continuous3D")
        for k, v in (("xsize", xs), ("ysize", ys), ("zsize", zs)):
            el.set(k, str(v))
        for k, v in (("xmin", xmin), ("xmax", xmax), ("ymin", ymin),
                     ("ymax", ymax), ("zmin", zmin), ("zmax", zmax)):
            el.set(k, _fmt(v))
        el.set("periodic", str(int(fn.getPeriodic())))
        vals = ET.SubElement(el, "Values")
        for v in values:
            ET.SubElement(vals, "Value", v=_fmt(v))
    elif isinstance(fn, Discrete1DFunction):
        el.set("type", "Discrete1D")
        vals = ET.SubElement(el, "Values")
        for v in fn.getFunctionParameters():
            ET.SubElement(vals, "Value", v=_fmt(v))
    elif isinstance(fn, Discrete2DFunction):
        xs, ys, values = fn.getFunctionParameters()
        el.set("type", "Discrete2D")
        el.set("xsize", str(xs))
        el.set("ysize", str(ys))
        vals = ET.SubElement(el, "Values")
        for v in values:
            ET.SubElement(vals, "Value", v=_fmt(v))
    elif isinstance(fn, Discrete3DFunction):
        xs, ys, zs, values = fn.getFunctionParameters()
        el.set("type", "Discrete3D")
        el.set("xsize", str(xs))
        el.set("ysize", str(ys))
        el.set("zsize", str(zs))
        vals = ET.SubElement(el, "Values")
        for v in values:
            ET.SubElement(vals, "Value", v=_fmt(v))
    else:
        raise OpenMMException("cannot serialize function %r" % fn)


def _de_tabulated(el):
    t = el.get("type")
    values = [float(v.get("v")) for v in el.find("Values")]
    periodic = bool(int(el.get("periodic", "0")))
    if t == "Continuous1D":
        return Continuous1DFunction(values, float(el.get("min")),
                                    float(el.get("max")), periodic)
    if t == "Continuous2D":
        return Continuous2DFunction(
            int(el.get("xsize")), int(el.get("ysize")), values,
            float(el.get("xmin")), float(el.get("xmax")),
            float(el.get("ymin")), float(el.get("ymax")), periodic)
    if t == "Continuous3D":
        return Continuous3DFunction(
            int(el.get("xsize")), int(el.get("ysize")), int(el.get("zsize")),
            values, float(el.get("xmin")), float(el.get("xmax")),
            float(el.get("ymin")), float(el.get("ymax")),
            float(el.get("zmin")), float(el.get("zmax")), periodic)
    if t == "Discrete1D":
        return Discrete1DFunction(values)
    if t == "Discrete2D":
        return Discrete2DFunction(int(el.get("xsize")), int(el.get("ysize")),
                                  values)
    if t == "Discrete3D":
        return Discrete3DFunction(int(el.get("xsize")), int(el.get("ysize")),
                                  int(el.get("zsize")), values)
    raise OpenMMException("unknown function type %s" % t)


def _ser_force_into(el, force):
    name = type(force).__name__
    el.set("type", name)
    el.set("version", "1")
    _common_force_attrs(el, force)
    fn = _FORCE_SERIALIZERS.get(name)
    if fn is None:
        raise OpenMMException("cannot serialize force type %s" % name)
    fn(el, force)


def _de_force(el):
    name = el.get("type")
    fn = _FORCE_DESERIALIZERS.get(name)
    if fn is None:
        raise OpenMMException("cannot deserialize force type %s" % name)
    force = fn(el)
    _restore_common(el, force)
    return force


# --- standard bonded ---------------------------------------------------------
def _ser_harmonic_bond(el, force):
    el.set("usesPeriodic", str(int(force.usesPeriodicBoundaryConditions())))
    bonds = ET.SubElement(el, "Bonds")
    for i in range(force.getNumBonds()):
        p1, p2, d, k = force.getBondParameters(i)
        ET.SubElement(bonds, "Bond", p1=str(p1), p2=str(p2),
                      d=_fmt(d._value), k=_fmt(k._value))


def _de_harmonic_bond(el):
    force = F.HarmonicBondForce()
    force.setUsesPeriodicBoundaryConditions(bool(int(el.get("usesPeriodic", "0"))))
    for b in el.find("Bonds"):
        force.addBond(int(b.get("p1")), int(b.get("p2")),
                      float(b.get("d")), float(b.get("k")))
    return force


def _ser_harmonic_angle(el, force):
    el.set("usesPeriodic", str(int(force.usesPeriodicBoundaryConditions())))
    angles = ET.SubElement(el, "Angles")
    for i in range(force.getNumAngles()):
        p1, p2, p3, a, k = force.getAngleParameters(i)
        ET.SubElement(angles, "Angle", p1=str(p1), p2=str(p2), p3=str(p3),
                      a=_fmt(a._value), k=_fmt(k._value))


def _de_harmonic_angle(el):
    force = F.HarmonicAngleForce()
    force.setUsesPeriodicBoundaryConditions(bool(int(el.get("usesPeriodic", "0"))))
    for a in el.find("Angles"):
        force.addAngle(int(a.get("p1")), int(a.get("p2")), int(a.get("p3")),
                       float(a.get("a")), float(a.get("k")))
    return force


def _ser_periodic_torsion(el, force):
    el.set("usesPeriodic", str(int(force.usesPeriodicBoundaryConditions())))
    tors = ET.SubElement(el, "Torsions")
    for i in range(force.getNumTorsions()):
        p1, p2, p3, p4, per, phase, k = force.getTorsionParameters(i)
        ET.SubElement(tors, "Torsion", p1=str(p1), p2=str(p2), p3=str(p3),
                      p4=str(p4), periodicity=str(per),
                      phase=_fmt(phase._value), k=_fmt(k._value))


def _de_periodic_torsion(el):
    force = F.PeriodicTorsionForce()
    force.setUsesPeriodicBoundaryConditions(bool(int(el.get("usesPeriodic", "0"))))
    for t in el.find("Torsions"):
        force.addTorsion(int(t.get("p1")), int(t.get("p2")), int(t.get("p3")),
                         int(t.get("p4")), int(t.get("periodicity")),
                         float(t.get("phase")), float(t.get("k")))
    return force


def _ser_rb_torsion(el, force):
    el.set("usesPeriodic", str(int(force.usesPeriodicBoundaryConditions())))
    tors = ET.SubElement(el, "Torsions")
    for i in range(force.getNumTorsions()):
        params = force.getTorsionParameters(i)
        attrs = {"p%d" % (j + 1): str(params[j]) for j in range(4)}
        for j in range(6):
            attrs["c%d" % j] = _fmt(params[4 + j]._value)
        ET.SubElement(tors, "Torsion", **attrs)


def _de_rb_torsion(el):
    force = F.RBTorsionForce()
    force.setUsesPeriodicBoundaryConditions(bool(int(el.get("usesPeriodic", "0"))))
    for t in el.find("Torsions"):
        force.addTorsion(*[int(t.get("p%d" % (j + 1))) for j in range(4)],
                         *[float(t.get("c%d" % j)) for j in range(6)])
    return force


def _ser_cmap(el, force):
    el.set("usesPeriodic", str(int(force.usesPeriodicBoundaryConditions())))
    maps = ET.SubElement(el, "Maps")
    for i in range(force.getNumMaps()):
        size, energy = force.getMapParameters(i)
        m = ET.SubElement(maps, "Map", size=str(size))
        m.text = " ".join(_fmt(e) for e in energy.value_in_unit(
            u.kilojoule_per_mole))
    tors = ET.SubElement(el, "Torsions")
    for i in range(force.getNumTorsions()):
        params = force.getTorsionParameters(i)
        attrs = {"map": str(params[0])}
        labels = ["a1", "a2", "a3", "a4", "b1", "b2", "b3", "b4"]
        for lbl, v in zip(labels, params[1:]):
            attrs[lbl] = str(v)
        ET.SubElement(tors, "Torsion", **attrs)


def _de_cmap(el):
    force = F.CMAPTorsionForce()
    force.setUsesPeriodicBoundaryConditions(bool(int(el.get("usesPeriodic", "0"))))
    for m in el.find("Maps"):
        force.addMap(int(m.get("size")), [float(x) for x in m.text.split()])
    for t in el.find("Torsions"):
        force.addTorsion(int(t.get("map")),
                         *[int(t.get(lbl)) for lbl in
                           ("a1", "a2", "a3", "a4", "b1", "b2", "b3", "b4")])
    return force


# --- nonbonded (NonbondedForceProxy.cpp:45-96 schema) -------------------------
def _ser_nonbonded(el, force):
    el.set("method", str(force.getNonbondedMethod()))
    el.set("cutoff", _fmt(force.getCutoffDistance()._value))
    el.set("useSwitchingFunction", str(int(force.getUseSwitchingFunction())))
    el.set("switchingDistance", _fmt(force.getSwitchingDistance()._value))
    el.set("ewaldTolerance", _fmt(force.getEwaldErrorTolerance()))
    el.set("rfDielectric", _fmt(force.getReactionFieldDielectric()))
    el.set("dispersionCorrection", str(int(force.getUseDispersionCorrection())))
    el.set("exceptionsUsePeriodic",
           str(int(force.getExceptionsUsePeriodicBoundaryConditions())))
    el.set("includeDirectSpace", str(int(force.getIncludeDirectSpace())))
    alpha, nx, ny, nz = force.getPMEParameters()
    el.set("alpha", _fmt(alpha))
    el.set("nx", str(nx))
    el.set("ny", str(ny))
    el.set("nz", str(nz))
    alpha, nx, ny, nz = force.getLJPMEParameters()
    el.set("ljAlpha", _fmt(alpha))
    el.set("ljnx", str(nx))
    el.set("ljny", str(ny))
    el.set("ljnz", str(nz))
    el.set("recipForceGroup", str(force.getReciprocalSpaceForceGroup()))
    gp = ET.SubElement(el, "GlobalParameters")
    for i in range(force.getNumGlobalParameters()):
        ET.SubElement(gp, "Parameter", name=force.getGlobalParameterName(i),
                      default=_fmt(force.getGlobalParameterDefaultValue(i)))
    po = ET.SubElement(el, "ParticleOffsets")
    for i in range(force.getNumParticleParameterOffsets()):
        param, particle, q, sig, eps = force.getParticleParameterOffset(i)
        ET.SubElement(po, "Offset", parameter=param, particle=str(particle),
                      q=_fmt(q), sig=_fmt(sig), eps=_fmt(eps))
    eo = ET.SubElement(el, "ExceptionOffsets")
    for i in range(force.getNumExceptionParameterOffsets()):
        param, exc, q, sig, eps = force.getExceptionParameterOffset(i)
        ET.SubElement(eo, "Offset", parameter=param, exception=str(exc),
                      q=_fmt(q), sig=_fmt(sig), eps=_fmt(eps))
    particles = ET.SubElement(el, "Particles")
    for i in range(force.getNumParticles()):
        q, sig, eps = force.getParticleParameters(i)
        ET.SubElement(particles, "Particle", q=_fmt(q._value),
                      sig=_fmt(sig._value), eps=_fmt(eps._value))
    exceptions = ET.SubElement(el, "Exceptions")
    for i in range(force.getNumExceptions()):
        p1, p2, q, sig, eps = force.getExceptionParameters(i)
        ET.SubElement(exceptions, "Exception", p1=str(p1), p2=str(p2),
                      q=_fmt(q._value), sig=_fmt(sig._value),
                      eps=_fmt(eps._value))


def _de_nonbonded(el):
    force = F.NonbondedForce()
    force.setNonbondedMethod(int(el.get("method")))
    force.setCutoffDistance(float(el.get("cutoff")))
    force.setUseSwitchingFunction(bool(int(el.get("useSwitchingFunction", "0"))))
    force.setSwitchingDistance(float(el.get("switchingDistance", "-1")))
    force.setEwaldErrorTolerance(float(el.get("ewaldTolerance", "5e-4")))
    force.setReactionFieldDielectric(float(el.get("rfDielectric", "78.3")))
    force.setUseDispersionCorrection(bool(int(el.get("dispersionCorrection", "1"))))
    force.setExceptionsUsePeriodicBoundaryConditions(
        bool(int(el.get("exceptionsUsePeriodic", "0"))))
    force.setIncludeDirectSpace(bool(int(el.get("includeDirectSpace", "1"))))
    force.setPMEParameters(float(el.get("alpha", "0")), int(el.get("nx", "0")),
                           int(el.get("ny", "0")), int(el.get("nz", "0")))
    force.setLJPMEParameters(float(el.get("ljAlpha", "0")),
                             int(el.get("ljnx", "0")), int(el.get("ljny", "0")),
                             int(el.get("ljnz", "0")))
    force.setReciprocalSpaceForceGroup(int(el.get("recipForceGroup", "-1")))
    gp = el.find("GlobalParameters")
    if gp is not None:
        for p in gp:
            force.addGlobalParameter(p.get("name"), float(p.get("default")))
    for p in el.find("Particles"):
        force.addParticle(float(p.get("q")), float(p.get("sig")),
                          float(p.get("eps")))
    for e in el.find("Exceptions"):
        force.addException(int(e.get("p1")), int(e.get("p2")),
                           float(e.get("q")), float(e.get("sig")),
                           float(e.get("eps")))
    po = el.find("ParticleOffsets")
    if po is not None:
        for o in po:
            force.addParticleParameterOffset(
                o.get("parameter"), int(o.get("particle")), float(o.get("q")),
                float(o.get("sig")), float(o.get("eps")))
    eo = el.find("ExceptionOffsets")
    if eo is not None:
        for o in eo:
            force.addExceptionParameterOffset(
                o.get("parameter"), int(o.get("exception")), float(o.get("q")),
                float(o.get("sig")), float(o.get("eps")))
    return force


# --- GBSA, misc ----------------------------------------------------------------
def _ser_gbsa(el, force):
    el.set("method", str(force.getNonbondedMethod()))
    el.set("cutoff", _fmt(force.getCutoffDistance()._value))
    el.set("soluteDielectric", _fmt(force.getSoluteDielectric()))
    el.set("solventDielectric", _fmt(force.getSolventDielectric()))
    el.set("surfaceAreaEnergy", _fmt(force.getSurfaceAreaEnergy()._value))
    particles = ET.SubElement(el, "Particles")
    for i in range(force.getNumParticles()):
        q, r, s = force.getParticleParameters(i)
        ET.SubElement(particles, "Particle", q=_fmt(q._value),
                      r=_fmt(r._value), scale=_fmt(s))


def _de_gbsa(el):
    force = F.GBSAOBCForce()
    force.setNonbondedMethod(int(el.get("method", "0")))
    force.setCutoffDistance(float(el.get("cutoff", "1")))
    force.setSoluteDielectric(float(el.get("soluteDielectric", "1")))
    force.setSolventDielectric(float(el.get("solventDielectric", "78.3")))
    force.setSurfaceAreaEnergy(float(el.get("surfaceAreaEnergy", "2.25936")))
    for p in el.find("Particles"):
        force.addParticle(float(p.get("q")), float(p.get("r")),
                          float(p.get("scale")))
    return force


def _ser_cmm(el, force):
    el.set("frequency", str(force.getFrequency()))


def _de_cmm(el):
    return F.CMMotionRemover(int(el.get("frequency", "1")))


def _ser_andersen(el, force):
    el.set("temperature", _fmt(force.getDefaultTemperature()._value))
    el.set("frequency", _fmt(force.getDefaultCollisionFrequency()._value))
    el.set("randomSeed", str(force.getRandomNumberSeed()))


def _de_andersen(el):
    force = F.AndersenThermostat(float(el.get("temperature")),
                                 float(el.get("frequency")))
    force.setRandomNumberSeed(int(el.get("randomSeed", "0")))
    return force


def _ser_mc_barostat(el, force):
    el.set("pressure", _fmt(force.getDefaultPressure()._value))
    el.set("temperature", _fmt(force.getDefaultTemperature()._value))
    el.set("frequency", str(force.getFrequency()))
    el.set("randomSeed", str(force.getRandomNumberSeed()))


def _de_mc_barostat(el):
    force = F.MonteCarloBarostat(float(el.get("pressure")),
                                 float(el.get("temperature")),
                                 int(el.get("frequency", "25")))
    force.setRandomNumberSeed(int(el.get("randomSeed", "0")))
    return force


def _ser_rmsd(el, force):
    particles = ET.SubElement(el, "Particles")
    for p in force.getParticles():
        ET.SubElement(particles, "Particle", index=str(p))
    refs = ET.SubElement(el, "ReferencePositions")
    for r in force.getReferencePositions().value_in_unit(u.nanometer):
        ET.SubElement(refs, "Position", x=_fmt(r[0]), y=_fmt(r[1]),
                      z=_fmt(r[2]))


def _de_rmsd(el):
    refs = [Vec3(float(p.get("x")), float(p.get("y")), float(p.get("z")))
            for p in el.find("ReferencePositions")]
    particles = [int(p.get("index")) for p in el.find("Particles")]
    return F.RMSDForce(refs, particles)


# --- custom forces ---------------------------------------------------------------
def _ser_custom_bonded(el, force, n_atoms, per_name_fn, term_iter):
    el.set("energy", force.getEnergyFunction())
    el.set("usesPeriodic", str(int(force.usesPeriodicBoundaryConditions())))
    _ser_globals(el, force)
    _ser_functions(el, force)
    pp = ET.SubElement(el, "PerTermParameters")
    for name in per_name_fn():
        ET.SubElement(pp, "Parameter", name=name)
    terms = ET.SubElement(el, "Terms")
    for atoms, params in term_iter():
        t = ET.SubElement(terms, "Term")
        for j, a in enumerate(atoms):
            t.set("p%d" % (j + 1), str(a))
        t.set("params", " ".join(_fmt(x) for x in params))


def _ser_custom_bond(el, force):
    _ser_custom_bonded(
        el, force, 2,
        lambda: [force.getPerBondParameterName(i)
                 for i in range(force.getNumPerBondParameters())],
        lambda: [((force.getBondParameters(i)[0], force.getBondParameters(i)[1]),
                  force.getBondParameters(i)[2])
                 for i in range(force.getNumBonds())])


def _de_custom_bond(el):
    force = F.CustomBondForce(el.get("energy"))
    force.setUsesPeriodicBoundaryConditions(bool(int(el.get("usesPeriodic", "0"))))
    _de_globals(el, force)
    _de_functions(el, force)
    for p in el.find("PerTermParameters"):
        force.addPerBondParameter(p.get("name"))
    for t in el.find("Terms"):
        params = [float(x) for x in t.get("params").split()] \
            if t.get("params") else []
        force.addBond(int(t.get("p1")), int(t.get("p2")), params)
    return force


def _ser_custom_external(el, force):
    el.set("energy", force.getEnergyFunction())
    _ser_globals(el, force)
    _ser_functions(el, force)
    pp = ET.SubElement(el, "PerTermParameters")
    for i in range(force.getNumPerParticleParameters()):
        ET.SubElement(pp, "Parameter",
                      name=force.getPerParticleParameterName(i))
    terms = ET.SubElement(el, "Terms")
    for i in range(force.getNumParticles()):
        particle, params = force.getParticleParameters(i)
        ET.SubElement(terms, "Term", p1=str(particle),
                      params=" ".join(_fmt(x) for x in params))


def _de_custom_external(el):
    force = F.CustomExternalForce(el.get("energy"))
    _de_globals(el, force)
    _de_functions(el, force)
    for p in el.find("PerTermParameters"):
        force.addPerParticleParameter(p.get("name"))
    for t in el.find("Terms"):
        params = [float(x) for x in t.get("params").split()] \
            if t.get("params") else []
        force.addParticle(int(t.get("p1")), params)
    return force


def _ser_custom_nonbonded(el, force):
    el.set("energy", force.getEnergyFunction())
    el.set("method", str(force.getNonbondedMethod()))
    el.set("cutoff", _fmt(force.getCutoffDistance()._value))
    el.set("useSwitchingFunction", str(int(force.getUseSwitchingFunction())))
    el.set("switchingDistance", _fmt(force.getSwitchingDistance()._value))
    el.set("useLongRangeCorrection", str(int(force.getUseLongRangeCorrection())))
    _ser_globals(el, force)
    _ser_functions(el, force)
    pp = ET.SubElement(el, "PerParticleParameters")
    for i in range(force.getNumPerParticleParameters()):
        ET.SubElement(pp, "Parameter",
                      name=force.getPerParticleParameterName(i))
    particles = ET.SubElement(el, "Particles")
    for i in range(force.getNumParticles()):
        ET.SubElement(particles, "Particle", params=" ".join(
            _fmt(x) for x in force.getParticleParameters(i)))
    exclusions = ET.SubElement(el, "Exclusions")
    for i in range(force.getNumExclusions()):
        p1, p2 = force.getExclusionParticles(i)
        ET.SubElement(exclusions, "Exclusion", p1=str(p1), p2=str(p2))
    groups = ET.SubElement(el, "InteractionGroups")
    for i in range(force.getNumInteractionGroups()):
        set1, set2 = force.getInteractionGroupParameters(i)
        g = ET.SubElement(groups, "InteractionGroup")
        ET.SubElement(g, "Set1", indices=" ".join(str(x) for x in set1))
        ET.SubElement(g, "Set2", indices=" ".join(str(x) for x in set2))


def _de_custom_nonbonded(el):
    force = F.CustomNonbondedForce(el.get("energy"))
    force.setNonbondedMethod(int(el.get("method", "0")))
    force.setCutoffDistance(float(el.get("cutoff", "1")))
    force.setUseSwitchingFunction(bool(int(el.get("useSwitchingFunction", "0"))))
    force.setSwitchingDistance(float(el.get("switchingDistance", "-1")))
    force.setUseLongRangeCorrection(
        bool(int(el.get("useLongRangeCorrection", "0"))))
    _de_globals(el, force)
    _de_functions(el, force)
    for p in el.find("PerParticleParameters"):
        force.addPerParticleParameter(p.get("name"))
    for p in el.find("Particles"):
        params = [float(x) for x in p.get("params").split()] \
            if p.get("params") else []
        force.addParticle(params)
    for e in el.find("Exclusions"):
        force.addExclusion(int(e.get("p1")), int(e.get("p2")))
    groups = el.find("InteractionGroups")
    if groups is not None:
        for g in groups:
            set1 = [int(x) for x in g.find("Set1").get("indices").split()]
            set2 = [int(x) for x in g.find("Set2").get("indices").split()]
            force.addInteractionGroup(set1, set2)
    return force


_FORCE_SERIALIZERS = {
    "HarmonicBondForce": _ser_harmonic_bond,
    "HarmonicAngleForce": _ser_harmonic_angle,
    "PeriodicTorsionForce": _ser_periodic_torsion,
    "RBTorsionForce": _ser_rb_torsion,
    "CMAPTorsionForce": _ser_cmap,
    "NonbondedForce": _ser_nonbonded,
    "GBSAOBCForce": _ser_gbsa,
    "CMMotionRemover": _ser_cmm,
    "AndersenThermostat": _ser_andersen,
    "MonteCarloBarostat": _ser_mc_barostat,
    "RMSDForce": _ser_rmsd,
    "CustomBondForce": _ser_custom_bond,
    "CustomExternalForce": _ser_custom_external,
    "CustomNonbondedForce": _ser_custom_nonbonded,
}
_FORCE_DESERIALIZERS = {
    "HarmonicBondForce": _de_harmonic_bond,
    "HarmonicAngleForce": _de_harmonic_angle,
    "PeriodicTorsionForce": _de_periodic_torsion,
    "RBTorsionForce": _de_rb_torsion,
    "CMAPTorsionForce": _de_cmap,
    "NonbondedForce": _de_nonbonded,
    "GBSAOBCForce": _de_gbsa,
    "CMMotionRemover": _de_cmm,
    "AndersenThermostat": _de_andersen,
    "MonteCarloBarostat": _de_mc_barostat,
    "RMSDForce": _de_rmsd,
    "CustomBondForce": _de_custom_bond,
    "CustomExternalForce": _de_custom_external,
    "CustomNonbondedForce": _de_custom_nonbonded,
}


# ---------------------------------------------------------------------------
# Integrators
# ---------------------------------------------------------------------------
def _ser_integrator(integ):
    el = ET.Element("Integrator")
    name = type(integ).__name__
    el.set("type", name)
    el.set("version", "1")
    el.set("stepSize", _fmt(integ.getStepSize()._value))
    el.set("constraintTolerance", _fmt(integ.getConstraintTolerance()))
    el.set("integrationForceGroups", str(integ.getIntegrationForceGroups()))
    for attr, getter in (("temperature", "getTemperature"),
                         ("friction", "getFriction"),
                         ("errorTol", "getErrorTolerance"),
                         ("maxStepSize", "getMaximumStepSize"),
                         ("randomSeed", "getRandomNumberSeed"),
                         ("drudeTemperature", "getDrudeTemperature"),
                         ("drudeFriction", "getDrudeFriction"),
                         ("maxDrudeDistance", "getMaxDrudeDistance"),
                         ("minimizationErrorTolerance",
                          "getMinimizationErrorTolerance"),
                         ("numCopies", "getNumCopies"),
                         ("applyThermostat", "getApplyThermostat")):
        if hasattr(integ, getter):
            val = getattr(integ, getter)()
            if isinstance(val, bool):
                el.set(attr, str(int(val)))
            elif isinstance(val, int):
                el.set(attr, str(val))
            else:
                el.set(attr, _fmt(u.strip(val)))
    if name == "NoseHooverIntegrator":
        el.set("collisionFrequency", _fmt(integ._frequency))
        el.set("chainLength", str(integ._chain_length))
        el.set("numMTS", str(integ._n_mts))
        el.set("numYoshidaSuzuki", str(integ._n_ys))
    if name == "CustomIntegrator":
        el.set("kineticEnergy", integ.getKineticEnergyExpression())
        gv = ET.SubElement(el, "GlobalVariables")
        for i in range(integ.getNumGlobalVariables()):
            ET.SubElement(gv, "Variable",
                          name=integ.getGlobalVariableName(i),
                          value=_fmt(integ.getGlobalVariable(i)))
        import numpy as _np
        pv = ET.SubElement(el, "PerDofVariables")
        for i in range(integ.getNumPerDofVariables()):
            # values are only materialised once bound to a context; store the
            # scalar initial value otherwise (CustomIntegrator.h behavior)
            try:
                vals = _np.asarray(integ.getPerDofVariable(i, asNumpy=True))
                values = " ".join(_fmt(x) for x in vals.ravel())
            except Exception:
                values = ""
            ET.SubElement(pv, "Variable",
                          name=integ.getPerDofVariableName(i),
                          initial=_fmt(integ._perdof_vars[i][1]),
                          values=values)
        steps = ET.SubElement(el, "Computations")
        for i in range(integ.getNumComputations()):
            stype, var, expr = integ.getComputationStep(i)
            ET.SubElement(steps, "Computation", type=str(stype),
                          variable=var, expression=expr)
    return el


def _de_integrator(el):
    t = el.get("type")
    step = float(el.get("stepSize", "0.001"))
    if t == "VerletIntegrator":
        integ = I.VerletIntegrator(step)
    elif t == "LangevinIntegrator":
        integ = I.LangevinIntegrator(float(el.get("temperature")),
                                     float(el.get("friction")), step)
    elif t == "LangevinMiddleIntegrator":
        integ = I.LangevinMiddleIntegrator(float(el.get("temperature")),
                                           float(el.get("friction")), step)
    elif t == "BrownianIntegrator":
        integ = I.BrownianIntegrator(float(el.get("temperature")),
                                     float(el.get("friction")), step)
    elif t == "VariableVerletIntegrator":
        integ = I.VariableVerletIntegrator(float(el.get("errorTol")))
    elif t == "VariableLangevinIntegrator":
        integ = I.VariableLangevinIntegrator(float(el.get("temperature")),
                                             float(el.get("friction")),
                                             float(el.get("errorTol")))
    elif t == "NoseHooverIntegrator":
        integ = I.NoseHooverIntegrator(
            float(el.get("temperature", "298")),
            float(el.get("collisionFrequency", "50")), step,
            int(el.get("chainLength", "3")), int(el.get("numMTS", "3")),
            int(el.get("numYoshidaSuzuki", "7")))
    elif t == "DrudeLangevinIntegrator":
        integ = I.DrudeLangevinIntegrator(
            float(el.get("temperature")), float(el.get("friction")),
            float(el.get("drudeTemperature")),
            float(el.get("drudeFriction")), step)
        integ.setMaxDrudeDistance(float(el.get("maxDrudeDistance", "0")))
    elif t == "DrudeSCFIntegrator":
        integ = I.DrudeSCFIntegrator(step)
        integ.setMinimizationErrorTolerance(
            float(el.get("minimizationErrorTolerance", "1")))
    elif t == "RPMDIntegrator":
        integ = I.RPMDIntegrator(int(el.get("numCopies")),
                                 float(el.get("temperature")),
                                 float(el.get("friction")), step)
        integ.setApplyThermostat(bool(int(el.get("applyThermostat", "1"))))
    elif t == "CustomIntegrator":
        integ = I.CustomIntegrator(step)
        integ.setKineticEnergyExpression(
            el.get("kineticEnergy", "m*v*v/2"))
        gv = el.find("GlobalVariables")
        if gv is not None:
            for v in gv:
                integ.addGlobalVariable(v.get("name"),
                                        float(v.get("value")))
        pv = el.find("PerDofVariables")
        if pv is not None:
            import numpy as _np
            for v in pv:
                vals = _np.array([float(x)
                                  for x in v.get("values", "").split()])
                integ.addPerDofVariable(v.get("name"),
                                        float(v.get("initial", "0")))
                if vals.size:
                    integ.setPerDofVariableByName(
                        v.get("name"), vals.reshape(-1, 3))
        steps = el.find("Computations")
        if steps is not None:
            for s in steps:
                integ._steps.append((int(s.get("type")),
                                     s.get("variable", ""),
                                     s.get("expression", "")))
    else:
        raise OpenMMException("cannot deserialize integrator type %s" % t)
    integ.setConstraintTolerance(float(el.get("constraintTolerance", "1e-5")))
    integ.setIntegrationForceGroups(int(el.get("integrationForceGroups", "-1")))
    if el.get("randomSeed") is not None and hasattr(integ, "setRandomNumberSeed"):
        integ.setRandomNumberSeed(int(float(el.get("randomSeed"))))
    return integ


# ---------------------------------------------------------------------------
# State (StateProxy.cpp fields)
# ---------------------------------------------------------------------------
def _ser_state(state):
    el = ET.Element("State")
    el.set("type", "State")
    el.set("version", "1")
    el.set("time", _fmt(state.getTime()._value))
    el.set("stepCount", str(state.getStepCount()))
    types = state.getDataTypes()
    if state._box is not None:
        box = ET.SubElement(el, "PeriodicBoxVectors")
        import numpy as np
        bv = np.asarray(state._box)
        for name, v in (("A", bv[0]), ("B", bv[1]), ("C", bv[2])):
            ET.SubElement(box, name, x=_fmt(v[0]), y=_fmt(v[1]), z=_fmt(v[2]))
    if types & State.Parameters:
        params = ET.SubElement(el, "Parameters")
        for k, v in state.getParameters().items():
            params.set(k, _fmt(v))
    if types & State.Energy:
        ET.SubElement(el, "Energies",
                      KineticEnergy=_fmt(state.getKineticEnergy()._value),
                      PotentialEnergy=_fmt(state.getPotentialEnergy()._value))
    if types & State.IntegratorParameters:
        ip = ET.SubElement(el, "IntegratorParameters")
        for k, v in state.getIntegratorParameters().items():
            ip.set(k, _fmt(v))
    for name, flag, getter in (
            ("Positions", State.Positions, "getPositions"),
            ("Velocities", State.Velocities, "getVelocities"),
            ("Forces", State.Forces, "getForces")):
        if types & flag:
            sec = ET.SubElement(el, name)
            arr = getattr(state, getter)(asNumpy=True)._value
            for row in arr:
                ET.SubElement(sec, name[:-1] if name != "Velocities"
                              else "Velocity",
                              x=_fmt(row[0]), y=_fmt(row[1]), z=_fmt(row[2]))
    return el


def _de_state(el):
    import numpy as np
    kw = {"time": float(el.get("time", "0")),
          "stepCount": int(el.get("stepCount", "0"))}
    box = el.find("PeriodicBoxVectors")
    if box is not None:
        kw["boxVectors"] = np.asarray(
            [[float(box.find(n).get(c)) for c in "xyz"] for n in "ABC"])
    params = el.find("Parameters")
    if params is not None:
        kw["parameters"] = {k: float(v) for k, v in params.attrib.items()}
    energies = el.find("Energies")
    if energies is not None:
        kw["kineticEnergy"] = float(energies.get("KineticEnergy"))
        kw["potentialEnergy"] = float(energies.get("PotentialEnergy"))
    ip = el.find("IntegratorParameters")
    if ip is not None:
        kw["integratorParams"] = {k: float(v) for k, v in ip.attrib.items()}
    for name, key in (("Positions", "positions"), ("Velocities", "velocities"),
                      ("Forces", "forces")):
        sec = el.find(name)
        if sec is not None:
            kw[key] = np.asarray([[float(row.get(c)) for c in "xyz"]
                                  for row in sec])
    return State(**kw)


# --- additional custom-force proxies -----------------------------------------
def _ser_custom_angle(el, force):
    _ser_custom_bonded(
        el, force, 3,
        lambda: [force.getPerAngleParameterName(i)
                 for i in range(force.getNumPerAngleParameters())],
        lambda: [(force.getAngleParameters(i)[:3],
                  force.getAngleParameters(i)[3])
                 for i in range(force.getNumAngles())])


def _de_custom_angle(el):
    force = F.CustomAngleForce(el.get("energy"))
    force.setUsesPeriodicBoundaryConditions(bool(int(el.get("usesPeriodic", "0"))))
    _de_globals(el, force)
    _de_functions(el, force)
    for p in el.find("PerTermParameters"):
        force.addPerAngleParameter(p.get("name"))
    for t in el.find("Terms"):
        params = [float(x) for x in t.get("params").split()] \
            if t.get("params") else []
        force.addAngle(int(t.get("p1")), int(t.get("p2")), int(t.get("p3")),
                       params)
    return force


def _ser_custom_torsion(el, force):
    _ser_custom_bonded(
        el, force, 4,
        lambda: [force.getPerTorsionParameterName(i)
                 for i in range(force.getNumPerTorsionParameters())],
        lambda: [(force.getTorsionParameters(i)[:4],
                  force.getTorsionParameters(i)[4])
                 for i in range(force.getNumTorsions())])


def _de_custom_torsion(el):
    force = F.CustomTorsionForce(el.get("energy"))
    force.setUsesPeriodicBoundaryConditions(bool(int(el.get("usesPeriodic", "0"))))
    _de_globals(el, force)
    _de_functions(el, force)
    for p in el.find("PerTermParameters"):
        force.addPerTorsionParameter(p.get("name"))
    for t in el.find("Terms"):
        params = [float(x) for x in t.get("params").split()] \
            if t.get("params") else []
        force.addTorsion(int(t.get("p1")), int(t.get("p2")),
                         int(t.get("p3")), int(t.get("p4")), params)
    return force


def _ser_custom_compound(el, force):
    el.set("particles", str(force.getNumParticlesPerBond()))
    _ser_custom_bonded(
        el, force, force.getNumParticlesPerBond(),
        lambda: [force.getPerBondParameterName(i)
                 for i in range(force.getNumPerBondParameters())],
        lambda: [tuple(force.getBondParameters(i))
                 for i in range(force.getNumBonds())])


def _de_custom_compound(el):
    n = int(el.get("particles"))
    force = F.CustomCompoundBondForce(n, el.get("energy"))
    force.setUsesPeriodicBoundaryConditions(bool(int(el.get("usesPeriodic", "0"))))
    _de_globals(el, force)
    _de_functions(el, force)
    for p in el.find("PerTermParameters"):
        force.addPerBondParameter(p.get("name"))
    for t in el.find("Terms"):
        params = [float(x) for x in t.get("params").split()] \
            if t.get("params") else []
        atoms = [int(t.get("p%d" % (k + 1))) for k in range(n)]
        force.addBond(atoms, params)
    return force


def _ser_custom_centroid(el, force):
    el.set("groupsPerBond", str(force.getNumGroupsPerBond()))
    el.set("energy", force.getEnergyFunction())
    el.set("usesPeriodic", str(int(force.usesPeriodicBoundaryConditions())))
    _ser_globals(el, force)
    _ser_functions(el, force)
    pp = ET.SubElement(el, "PerTermParameters")
    for i in range(force.getNumPerBondParameters()):
        ET.SubElement(pp, "Parameter", name=force.getPerBondParameterName(i))
    groups = ET.SubElement(el, "Groups")
    for i in range(force.getNumGroups()):
        particles, weights = force.getGroupParameters(i)
        ET.SubElement(groups, "Group",
                      particles=" ".join(str(x) for x in particles),
                      weights=" ".join(_fmt(w) for w in weights))
    terms = ET.SubElement(el, "Terms")
    for i in range(force.getNumBonds()):
        g, params = force.getBondParameters(i)
        ET.SubElement(terms, "Term", groups=" ".join(str(x) for x in g),
                      params=" ".join(_fmt(x) for x in params))


def _de_custom_centroid(el):
    n = int(el.get("groupsPerBond"))
    force = F.CustomCentroidBondForce(n, el.get("energy"))
    force.setUsesPeriodicBoundaryConditions(bool(int(el.get("usesPeriodic", "0"))))
    _de_globals(el, force)
    _de_functions(el, force)
    for p in el.find("PerTermParameters"):
        force.addPerBondParameter(p.get("name"))
    for g in el.find("Groups"):
        particles = [int(x) for x in g.get("particles").split()]
        weights = ([float(x) for x in g.get("weights").split()]
                   if g.get("weights") else None)
        force.addGroup(particles, weights)
    for t in el.find("Terms"):
        groups = [int(x) for x in t.get("groups").split()]
        params = [float(x) for x in t.get("params").split()] \
            if t.get("params") else []
        force.addBond(groups, params)
    return force


def _ser_custom_gb(el, force):
    el.set("method", str(force.getNonbondedMethod()))
    el.set("cutoff", _fmt(force.getCutoffDistance()._value))
    _ser_globals(el, force)
    _ser_functions(el, force)
    pp = ET.SubElement(el, "PerParticleParameters")
    for i in range(force.getNumPerParticleParameters()):
        ET.SubElement(pp, "Parameter",
                      name=force.getPerParticleParameterName(i))
    values = ET.SubElement(el, "ComputedValues")
    for i in range(force.getNumComputedValues()):
        name, expr, t = force.getComputedValueParameters(i)
        ET.SubElement(values, "Value", name=name, expression=expr,
                      type=str(t))
    terms = ET.SubElement(el, "EnergyTerms")
    for i in range(force.getNumEnergyTerms()):
        expr, t = force.getEnergyTermParameters(i)
        ET.SubElement(terms, "Term", expression=expr, type=str(t))
    particles = ET.SubElement(el, "Particles")
    for i in range(force.getNumParticles()):
        ET.SubElement(particles, "Particle", params=" ".join(
            _fmt(x) for x in force.getParticleParameters(i)))
    exclusions = ET.SubElement(el, "Exclusions")
    for i in range(force.getNumExclusions()):
        p1, p2 = force.getExclusionParticles(i)
        ET.SubElement(exclusions, "Exclusion", p1=str(p1), p2=str(p2))


def _de_custom_gb(el):
    force = F.CustomGBForce()
    force.setNonbondedMethod(int(el.get("method", "0")))
    force.setCutoffDistance(float(el.get("cutoff", "1")))
    _de_globals(el, force)
    _de_functions(el, force)
    for p in el.find("PerParticleParameters"):
        force.addPerParticleParameter(p.get("name"))
    for v in el.find("ComputedValues"):
        force.addComputedValue(v.get("name"), v.get("expression"),
                               int(v.get("type")))
    for t in el.find("EnergyTerms"):
        force.addEnergyTerm(t.get("expression"), int(t.get("type")))
    for p in el.find("Particles"):
        params = [float(x) for x in p.get("params").split()] \
            if p.get("params") else []
        force.addParticle(params)
    for e in el.find("Exclusions"):
        force.addExclusion(int(e.get("p1")), int(e.get("p2")))
    return force


def _ser_gayberne(el, force):
    el.set("method", str(force.getNonbondedMethod()))
    el.set("cutoff", _fmt(force.getCutoffDistance()._value))
    el.set("useSwitchingFunction", str(int(force.getUseSwitchingFunction())))
    el.set("switchingDistance", _fmt(force.getSwitchingDistance()._value))
    particles = ET.SubElement(el, "Particles")
    for i in range(force.getNumParticles()):
        p = force.getParticleParameters(i)
        ET.SubElement(particles, "Particle", sigma=_fmt(p[0]),
                      epsilon=_fmt(p[1]), xparticle=str(p[2]),
                      yparticle=str(p[3]), sx=_fmt(p[4]), sy=_fmt(p[5]),
                      sz=_fmt(p[6]), ex=_fmt(p[7]), ey=_fmt(p[8]),
                      ez=_fmt(p[9]))
    exceptions = ET.SubElement(el, "Exceptions")
    for i in range(force.getNumExceptions()):
        p1, p2, sig, eps = force.getExceptionParameters(i)
        ET.SubElement(exceptions, "Exception", p1=str(p1), p2=str(p2),
                      sigma=_fmt(sig), epsilon=_fmt(eps))


def _de_gayberne(el):
    force = F.GayBerneForce()
    force.setNonbondedMethod(int(el.get("method", "0")))
    force.setCutoffDistance(float(el.get("cutoff", "1")))
    force.setUseSwitchingFunction(bool(int(el.get("useSwitchingFunction", "0"))))
    force.setSwitchingDistance(float(el.get("switchingDistance", "-1")))
    for p in el.find("Particles"):
        force.addParticle(float(p.get("sigma")), float(p.get("epsilon")),
                          int(p.get("xparticle")), int(p.get("yparticle")),
                          float(p.get("sx")), float(p.get("sy")),
                          float(p.get("sz")), float(p.get("ex")),
                          float(p.get("ey")), float(p.get("ez")))
    for e in el.find("Exceptions"):
        force.addException(int(e.get("p1")), int(e.get("p2")),
                           float(e.get("sigma")), float(e.get("epsilon")))
    return force


def _ser_drude(el, force):
    particles = ET.SubElement(el, "Particles")
    for i in range(force.getNumParticles()):
        p = force.getParticleParameters(i)
        ET.SubElement(particles, "Particle", particle=str(p[0]),
                      particle1=str(p[1]), particle2=str(p[2]),
                      particle3=str(p[3]), particle4=str(p[4]),
                      charge=_fmt(p[5]), polarizability=_fmt(p[6]),
                      aniso12=_fmt(p[7]), aniso34=_fmt(p[8]))
    pairs = ET.SubElement(el, "ScreenedPairs")
    for i in range(force.getNumScreenedPairs()):
        p1, p2, thole = force.getScreenedPairParameters(i)
        ET.SubElement(pairs, "Pair", particle1=str(p1), particle2=str(p2),
                      thole=_fmt(thole))


def _de_drude(el):
    force = F.DrudeForce()
    for p in el.find("Particles"):
        force.addParticle(int(p.get("particle")), int(p.get("particle1")),
                          int(p.get("particle2")), int(p.get("particle3")),
                          int(p.get("particle4")), float(p.get("charge")),
                          float(p.get("polarizability")),
                          float(p.get("aniso12")), float(p.get("aniso34")))
    for pr in el.find("ScreenedPairs"):
        force.addScreenedPair(int(pr.get("particle1")),
                              int(pr.get("particle2")),
                              float(pr.get("thole")))
    return force


_FORCE_SERIALIZERS.update({
    "CustomAngleForce": _ser_custom_angle,
    "CustomTorsionForce": _ser_custom_torsion,
    "CustomCompoundBondForce": _ser_custom_compound,
    "CustomCentroidBondForce": _ser_custom_centroid,
    "CustomGBForce": _ser_custom_gb,
    "GayBerneForce": _ser_gayberne,
    "DrudeForce": _ser_drude,
})
_FORCE_DESERIALIZERS.update({
    "CustomAngleForce": _de_custom_angle,
    "CustomTorsionForce": _de_custom_torsion,
    "CustomCompoundBondForce": _de_custom_compound,
    "CustomCentroidBondForce": _de_custom_centroid,
    "CustomGBForce": _de_custom_gb,
    "GayBerneForce": _de_gayberne,
    "DrudeForce": _de_drude,
})


# --- CustomHbondForce (CustomHbondForceProxy.cpp schema analog) -------------
def _ser_custom_hbond(el, force):
    el.set("energy", force.getEnergyFunction())
    el.set("method", str(force.getNonbondedMethod()))
    el.set("cutoff", _fmt(force.getCutoffDistance()._value))
    _ser_globals(el, force)
    _ser_functions(el, force)
    pd = ET.SubElement(el, "PerDonorParameters")
    for i in range(force.getNumPerDonorParameters()):
        ET.SubElement(pd, "Parameter", name=force.getPerDonorParameterName(i))
    pa = ET.SubElement(el, "PerAcceptorParameters")
    for i in range(force.getNumPerAcceptorParameters()):
        ET.SubElement(pa, "Parameter",
                      name=force.getPerAcceptorParameterName(i))
    donors = ET.SubElement(el, "Donors")
    for i in range(force.getNumDonors()):
        d1, d2, d3, params = force.getDonorParameters(i)
        ET.SubElement(donors, "Donor", d1=str(d1), d2=str(d2), d3=str(d3),
                      params=" ".join(_fmt(x) for x in params))
    acceptors = ET.SubElement(el, "Acceptors")
    for i in range(force.getNumAcceptors()):
        a1, a2, a3, params = force.getAcceptorParameters(i)
        ET.SubElement(acceptors, "Acceptor", a1=str(a1), a2=str(a2),
                      a3=str(a3),
                      params=" ".join(_fmt(x) for x in params))
    ex = ET.SubElement(el, "Exclusions")
    for i in range(force.getNumExclusions()):
        d, a = force.getExclusionParticles(i)
        ET.SubElement(ex, "Exclusion", donor=str(d), acceptor=str(a))


def _de_custom_hbond(el):
    force = F.CustomHbondForce(el.get("energy"))
    force.setNonbondedMethod(int(el.get("method", "0")))
    force.setCutoffDistance(float(el.get("cutoff", "1")))
    _de_globals(el, force)
    _de_functions(el, force)
    for p in el.find("PerDonorParameters"):
        force.addPerDonorParameter(p.get("name"))
    for p in el.find("PerAcceptorParameters"):
        force.addPerAcceptorParameter(p.get("name"))
    for d in el.find("Donors"):
        params = [float(x) for x in d.get("params").split()] \
            if d.get("params") else []
        force.addDonor(int(d.get("d1")), int(d.get("d2")), int(d.get("d3")),
                       params)
    for a in el.find("Acceptors"):
        params = [float(x) for x in a.get("params").split()] \
            if a.get("params") else []
        force.addAcceptor(int(a.get("a1")), int(a.get("a2")),
                          int(a.get("a3")), params)
    for e in el.find("Exclusions"):
        force.addExclusion(int(e.get("donor")), int(e.get("acceptor")))
    return force


# --- CustomManyParticleForce -------------------------------------------------
def _ser_custom_manyparticle(el, force):
    el.set("energy", force.getEnergyFunction())
    el.set("particlesPerSet", str(force.getNumParticlesPerSet()))
    el.set("method", str(force.getNonbondedMethod()))
    el.set("permutationMode", str(force.getPermutationMode()))
    el.set("cutoff", _fmt(force.getCutoffDistance()._value))
    _ser_globals(el, force)
    _ser_functions(el, force)
    pp = ET.SubElement(el, "PerParticleParameters")
    for i in range(force.getNumPerParticleParameters()):
        ET.SubElement(pp, "Parameter",
                      name=force.getPerParticleParameterName(i))
    particles = ET.SubElement(el, "Particles")
    for i in range(force.getNumParticles()):
        params, ptype = force.getParticleParameters(i)
        ET.SubElement(particles, "Particle", type=str(ptype),
                      params=" ".join(_fmt(x) for x in params))
    filters = ET.SubElement(el, "TypeFilters")
    for i in range(force.getNumParticlesPerSet()):
        types = force.getTypeFilter(i)
        ET.SubElement(filters, "Filter", index=str(i),
                      types=" ".join(str(t) for t in types))
    ex = ET.SubElement(el, "Exclusions")
    for i in range(force.getNumExclusions()):
        p1, p2 = force.getExclusionParticles(i)
        ET.SubElement(ex, "Exclusion", p1=str(p1), p2=str(p2))


def _de_custom_manyparticle(el):
    force = F.CustomManyParticleForce(int(el.get("particlesPerSet")),
                                      el.get("energy"))
    force.setNonbondedMethod(int(el.get("method", "0")))
    force.setPermutationMode(int(el.get("permutationMode", "0")))
    force.setCutoffDistance(float(el.get("cutoff", "1")))
    _de_globals(el, force)
    _de_functions(el, force)
    for p in el.find("PerParticleParameters"):
        force.addPerParticleParameter(p.get("name"))
    for p in el.find("Particles"):
        params = [float(x) for x in p.get("params").split()] \
            if p.get("params") else []
        force.addParticle(params, int(p.get("type", "0")))
    filters = el.find("TypeFilters")
    if filters is not None:
        for f in filters:
            types = [int(t) for t in f.get("types").split()] \
                if f.get("types") else []
            if types:
                force.setTypeFilter(int(f.get("index")), types)
    for e in el.find("Exclusions"):
        force.addExclusion(int(e.get("p1")), int(e.get("p2")))
    return force


# --- CustomCVForce -----------------------------------------------------------
def _ser_custom_cv(el, force):
    el.set("energy", force.getEnergyFunction())
    _ser_globals(el, force)
    _ser_functions(el, force)
    cvs = ET.SubElement(el, "CollectiveVariables")
    for i in range(force.getNumCollectiveVariables()):
        cel = ET.SubElement(cvs, "Variable",
                            name=force.getCollectiveVariableName(i))
        inner = ET.SubElement(cel, "Force")
        _ser_force_into(inner, force.getCollectiveVariable(i))


def _de_custom_cv(el):
    force = F.CustomCVForce(el.get("energy"))
    _de_globals(el, force)
    _de_functions(el, force)
    cvs = el.find("CollectiveVariables")
    if cvs is not None:
        for cel in cvs:
            inner = _de_force(cel.find("Force"))
            force.addCollectiveVariable(cel.get("name"), inner)
    return force


# --- anisotropic / membrane barostats ----------------------------------------
def _ser_aniso_barostat(el, force):
    p = force.getDefaultPressure()._value
    el.set("pressureX", _fmt(p[0]))
    el.set("pressureY", _fmt(p[1]))
    el.set("pressureZ", _fmt(p[2]))
    el.set("temperature", _fmt(force.getDefaultTemperature()._value))
    el.set("scaleX", str(int(force.getScaleX())))
    el.set("scaleY", str(int(force.getScaleY())))
    el.set("scaleZ", str(int(force.getScaleZ())))
    el.set("frequency", str(force.getFrequency()))
    el.set("randomSeed", str(force.getRandomNumberSeed()))


def _de_aniso_barostat(el):
    force = F.MonteCarloAnisotropicBarostat(
        [float(el.get("pressureX")), float(el.get("pressureY")),
         float(el.get("pressureZ"))],
        float(el.get("temperature")),
        bool(int(el.get("scaleX", "1"))), bool(int(el.get("scaleY", "1"))),
        bool(int(el.get("scaleZ", "1"))), int(el.get("frequency", "25")))
    force.setRandomNumberSeed(int(el.get("randomSeed", "0")))
    return force


def _ser_membrane_barostat(el, force):
    el.set("pressure", _fmt(force.getDefaultPressure()._value))
    el.set("surfaceTension", _fmt(force.getDefaultSurfaceTension()._value))
    el.set("temperature", _fmt(force.getDefaultTemperature()._value))
    el.set("xymode", str(force.getXYMode()))
    el.set("zmode", str(force.getZMode()))
    el.set("frequency", str(force.getFrequency()))
    el.set("randomSeed", str(force.getRandomNumberSeed()))


def _de_membrane_barostat(el):
    force = F.MonteCarloMembraneBarostat(
        float(el.get("pressure")), float(el.get("surfaceTension")),
        float(el.get("temperature")), int(el.get("xymode", "0")),
        int(el.get("zmode", "0")), int(el.get("frequency", "25")))
    force.setRandomNumberSeed(int(el.get("randomSeed", "0")))
    return force


_FORCE_SERIALIZERS.update({
    "CustomHbondForce": _ser_custom_hbond,
    "CustomManyParticleForce": _ser_custom_manyparticle,
    "CustomCVForce": _ser_custom_cv,
    "MonteCarloAnisotropicBarostat": _ser_aniso_barostat,
    "MonteCarloMembraneBarostat": _ser_membrane_barostat,
})
_FORCE_DESERIALIZERS.update({
    "CustomHbondForce": _de_custom_hbond,
    "CustomManyParticleForce": _de_custom_manyparticle,
    "CustomCVForce": _de_custom_cv,
    "MonteCarloAnisotropicBarostat": _de_aniso_barostat,
    "MonteCarloMembraneBarostat": _de_membrane_barostat,
})


# --- AMOEBA plugin proxies ----------------------------------------------------
def _ser_amoeba_vdw(el, force):
    el.set("method", str(force.getNonbondedMethod()))
    el.set("cutoff", _fmt(u.strip(force.getCutoffDistance())))
    el.set("sigmaCombiningRule", force.getSigmaCombiningRule())
    el.set("epsilonCombiningRule", force.getEpsilonCombiningRule())
    el.set("useDispersionCorrection",
           str(int(force.getUseDispersionCorrection())))
    particles = ET.SubElement(el, "Particles")
    for i in range(force.getNumParticles()):
        parent, sigma, eps, red = force.getParticleParameters(i)
        pel = ET.SubElement(particles, "Particle", parent=str(parent),
                            sigma=_fmt(sigma), epsilon=_fmt(eps),
                            reduction=_fmt(red))
        pel.set("exclusions", " ".join(
            str(x) for x in force.getParticleExclusions(i)))


def _de_amoeba_vdw(el):
    force = F.AmoebaVdwForce()
    force.setNonbondedMethod(int(el.get("method", "0")))
    force.setCutoffDistance(float(el.get("cutoff", "1")))
    force.setSigmaCombiningRule(el.get("sigmaCombiningRule", "CUBIC-MEAN"))
    force.setEpsilonCombiningRule(el.get("epsilonCombiningRule", "HHG"))
    force.setUseDispersionCorrection(
        bool(int(el.get("useDispersionCorrection", "0"))))
    for i, pel in enumerate(el.find("Particles")):
        force.addParticle(int(pel.get("parent")), float(pel.get("sigma")),
                          float(pel.get("epsilon")),
                          float(pel.get("reduction")))
        if pel.get("exclusions"):
            force.setParticleExclusions(
                i, [int(x) for x in pel.get("exclusions").split()])
    return force


def _ser_amoeba_multipole(el, force):
    el.set("method", str(force.getNonbondedMethod()))
    el.set("cutoff", _fmt(u.strip(force.getCutoffDistance())))
    el.set("polarizationType", str(force.getPolarizationType()))
    el.set("mutualInducedMaxIterations",
           str(force.getMutualInducedMaxIterations()))
    el.set("mutualInducedTargetEpsilon",
           _fmt(force.getMutualInducedTargetEpsilon()))
    el.set("extrapolationCoefficients", " ".join(
        _fmt(c) for c in force.getExtrapolationCoefficients()))
    particles = ET.SubElement(el, "Particles")
    for i in range(force.getNumMultipoles()):
        (q, dip, quad, axis, az, ax, ay, thole, damp,
         pol) = force.getMultipoleParameters(i)
        pel = ET.SubElement(particles, "Particle", charge=_fmt(q),
                            dipole=" ".join(_fmt(x) for x in dip),
                            quadrupole=" ".join(_fmt(x) for x in quad),
                            axisType=str(axis), atomZ=str(az), atomX=str(ax),
                            atomY=str(ay), thole=_fmt(thole), damp=_fmt(damp),
                            polarity=_fmt(pol))
        for tid, atoms in sorted(force._covalent[i].items()):
            ET.SubElement(pel, "Covalent", type=str(tid),
                          atoms=" ".join(str(x) for x in atoms))


def _de_amoeba_multipole(el):
    force = F.AmoebaMultipoleForce()
    force.setNonbondedMethod(int(el.get("method", "0")))
    force.setCutoffDistance(float(el.get("cutoff", "1")))
    force.setPolarizationType(int(el.get("polarizationType", "0")))
    force.setMutualInducedMaxIterations(
        int(el.get("mutualInducedMaxIterations", "60")))
    force.setMutualInducedTargetEpsilon(
        float(el.get("mutualInducedTargetEpsilon", "1e-5")))
    if el.get("extrapolationCoefficients"):
        force.setExtrapolationCoefficients(
            [float(x) for x in el.get("extrapolationCoefficients").split()])
    for i, pel in enumerate(el.find("Particles")):
        force.addMultipole(
            float(pel.get("charge")),
            [float(x) for x in pel.get("dipole").split()],
            [float(x) for x in pel.get("quadrupole").split()],
            int(pel.get("axisType")), int(pel.get("atomZ")),
            int(pel.get("atomX")), int(pel.get("atomY")),
            float(pel.get("thole")), float(pel.get("damp")),
            float(pel.get("polarity")))
        for cel in pel:
            force.setCovalentMap(i, int(cel.get("type")),
                                 [int(x) for x in cel.get("atoms").split()])
    return force


def _ser_amoeba_torsiontorsion(el, force):
    el.set("periodic", str(int(force.usesPeriodicBoundaryConditions())))
    torsions = ET.SubElement(el, "TorsionTorsions")
    for i in range(force.getNumTorsionTorsions()):
        (p1, p2, p3, p4, p5, chiral,
         grid) = force.getTorsionTorsionParameters(i)
        ET.SubElement(torsions, "TorsionTorsion", p1=str(p1), p2=str(p2),
                      p3=str(p3), p4=str(p4), p5=str(p5), chiral=str(chiral),
                      grid=str(grid))
    grids = ET.SubElement(el, "Grids")
    for i in range(force.getNumTorsionTorsionGrids()):
        g = np.asarray(force.getTorsionTorsionGrid(i), np.float64)
        gel = ET.SubElement(grids, "Grid", nx=str(g.shape[0]),
                            ny=str(g.shape[1]), nv=str(g.shape[2]))
        gel.text = " ".join(_fmt(x) for x in g.ravel())


def _de_amoeba_torsiontorsion(el):
    force = F.AmoebaTorsionTorsionForce()
    force.setUsesPeriodicBoundaryConditions(
        bool(int(el.get("periodic", "0"))))
    for t in el.find("TorsionTorsions"):
        force.addTorsionTorsion(int(t.get("p1")), int(t.get("p2")),
                                int(t.get("p3")), int(t.get("p4")),
                                int(t.get("p5")), int(t.get("chiral")),
                                int(t.get("grid")))
    for i, gel in enumerate(el.find("Grids")):
        shape = (int(gel.get("nx")), int(gel.get("ny")), int(gel.get("nv")))
        vals = np.array([float(x) for x in gel.text.split()]).reshape(shape)
        force.setTorsionTorsionGrid(i, vals)
    return force


def _ser_amoeba_wca(el, force):
    for attr, getter in (("epso", "getEpso"), ("epsh", "getEpsh"),
                         ("rmino", "getRmino"), ("rminh", "getRminh"),
                         ("awater", "getAwater"), ("slevy", "getSlevy"),
                         ("shctd", "getShctd"), ("dispoff", "getDispoff")):
        el.set(attr, _fmt(getattr(force, getter)()))
    particles = ET.SubElement(el, "Particles")
    for i in range(force.getNumParticles()):
        radius, eps = force.getParticleParameters(i)
        ET.SubElement(particles, "Particle", radius=_fmt(u.strip(radius)),
                      epsilon=_fmt(u.strip(eps)))


def _de_amoeba_wca(el):
    force = F.AmoebaWcaDispersionForce()
    for attr, setter in (("epso", "setEpso"), ("epsh", "setEpsh"),
                         ("rmino", "setRmino"), ("rminh", "setRminh"),
                         ("awater", "setAwater"), ("slevy", "setSlevy"),
                         ("shctd", "setShctd"), ("dispoff", "setDispoff")):
        if el.get(attr) is not None:
            getattr(force, setter)(float(el.get(attr)))
    for pel in el.find("Particles"):
        force.addParticle(float(pel.get("radius")),
                          float(pel.get("epsilon")))
    return force


def _ser_rpmd_barostat(el, force):
    el.set("pressure", _fmt(u.strip(force.getDefaultPressure(), u.bar)))
    el.set("frequency", str(force.getFrequency()))
    el.set("randomSeed", str(force.getRandomNumberSeed()))


def _de_rpmd_barostat(el):
    force = F.RPMDMonteCarloBarostat(float(el.get("pressure")),
                                     int(el.get("frequency", "25")))
    force.setRandomNumberSeed(int(el.get("randomSeed", "0")))
    return force


def _ser_amoeba_gk(el, force):
    el.set("solventDielectric", _fmt(force.getSolventDielectric()))
    el.set("soluteDielectric", _fmt(force.getSoluteDielectric()))
    el.set("includeCavityTerm", str(force.getIncludeCavityTerm()))
    el.set("probeRadius", _fmt(u.strip(force.getProbeRadius())))
    el.set("surfaceAreaFactor", _fmt(force.getSurfaceAreaFactor()))
    particles = ET.SubElement(el, "Particles")
    for i in range(force.getNumParticles()):
        c, r, sf = force.getParticleParameters(i)
        ET.SubElement(particles, "Particle", charge=_fmt(u.strip(c)),
                      radius=_fmt(u.strip(r)), scaleFactor=_fmt(sf))


def _de_amoeba_gk(el):
    force = F.AmoebaGeneralizedKirkwoodForce()
    force.setSolventDielectric(float(el.get("solventDielectric", "78.3")))
    force.setSoluteDielectric(float(el.get("soluteDielectric", "1.0")))
    force.setIncludeCavityTerm(int(el.get("includeCavityTerm", "1")))
    force.setProbeRadius(float(el.get("probeRadius", "0.14")))
    force.setSurfaceAreaFactor(float(el.get("surfaceAreaFactor",
                                            "-170.351730667")))
    for pel in el.find("Particles"):
        force.addParticle(float(pel.get("charge")),
                          float(pel.get("radius")),
                          float(pel.get("scaleFactor")))
    return force


def _ser_hippo(el, force):
    el.set("method", str(force.getNonbondedMethod()))
    el.set("cutoff", _fmt(u.strip(force.getCutoffDistance())))
    el.set("switchingDistance",
           _fmt(u.strip(force.getSwitchingDistance())))
    el.set("extrapolationCoefficients", " ".join(
        _fmt(c) for c in force.getExtrapolationCoefficients()))
    particles = ET.SubElement(el, "Particles")
    for i in range(force.getNumParticles()):
        (c, d, q, core, alpha, eps, damping, c6, pk, pq, pa, pol, at, az,
         ax, ay) = force.getParticleParameters(i)
        ET.SubElement(
            particles, "Particle", charge=_fmt(c),
            dipole=" ".join(_fmt(x) for x in d),
            quadrupole=" ".join(_fmt(x) for x in q),
            coreCharge=_fmt(core), alpha=_fmt(alpha), epsilon=_fmt(eps),
            damping=_fmt(damping), c6=_fmt(c6), pauliK=_fmt(pk),
            pauliQ=_fmt(pq), pauliAlpha=_fmt(pa), polarizability=_fmt(pol),
            axisType=str(at), atomZ=str(az), atomX=str(ax), atomY=str(ay))
    exceptions = ET.SubElement(el, "Exceptions")
    for i in range(force.getNumExceptions()):
        (p1, p2, mm_, dm, dd, disp, rep, ct) = \
            force.getExceptionParameters(i)
        ET.SubElement(exceptions, "Exception", p1=str(p1), p2=str(p2),
                      multipoleMultipoleScale=_fmt(mm_),
                      dipoleMultipoleScale=_fmt(dm),
                      dipoleDipoleScale=_fmt(dd), dispersionScale=_fmt(disp),
                      repulsionScale=_fmt(rep), chargeTransferScale=_fmt(ct))


def _de_hippo(el):
    force = F.HippoNonbondedForce()
    force.setNonbondedMethod(int(el.get("method", "0")))
    force.setCutoffDistance(float(el.get("cutoff", "1.0")))
    force.setSwitchingDistance(float(el.get("switchingDistance", "0.9")))
    if el.get("extrapolationCoefficients"):
        force.setExtrapolationCoefficients(
            [float(x) for x in el.get("extrapolationCoefficients").split()])
    for pel in el.find("Particles"):
        force.addParticle(
            float(pel.get("charge")),
            [float(x) for x in pel.get("dipole").split()],
            [float(x) for x in pel.get("quadrupole").split()],
            float(pel.get("coreCharge")), float(pel.get("alpha")),
            float(pel.get("epsilon")), float(pel.get("damping")),
            float(pel.get("c6")), float(pel.get("pauliK")),
            float(pel.get("pauliQ")), float(pel.get("pauliAlpha")),
            float(pel.get("polarizability")), int(pel.get("axisType")),
            int(pel.get("atomZ")), int(pel.get("atomX")),
            int(pel.get("atomY")))
    for eel in el.find("Exceptions"):
        force.addException(
            int(eel.get("p1")), int(eel.get("p2")),
            float(eel.get("multipoleMultipoleScale")),
            float(eel.get("dipoleMultipoleScale")),
            float(eel.get("dipoleDipoleScale")),
            float(eel.get("dispersionScale")),
            float(eel.get("repulsionScale")),
            float(eel.get("chargeTransferScale")))
    return force


_FORCE_SERIALIZERS.update({
    "AmoebaVdwForce": _ser_amoeba_vdw,
    "AmoebaMultipoleForce": _ser_amoeba_multipole,
    "AmoebaTorsionTorsionForce": _ser_amoeba_torsiontorsion,
    "AmoebaWcaDispersionForce": _ser_amoeba_wca,
    "AmoebaGeneralizedKirkwoodForce": _ser_amoeba_gk,
    "HippoNonbondedForce": _ser_hippo,
    "RPMDMonteCarloBarostat": _ser_rpmd_barostat,
})
_FORCE_DESERIALIZERS.update({
    "AmoebaVdwForce": _de_amoeba_vdw,
    "AmoebaMultipoleForce": _de_amoeba_multipole,
    "AmoebaTorsionTorsionForce": _de_amoeba_torsiontorsion,
    "AmoebaWcaDispersionForce": _de_amoeba_wca,
    "AmoebaGeneralizedKirkwoodForce": _de_amoeba_gk,
    "HippoNonbondedForce": _de_hippo,
    "RPMDMonteCarloBarostat": _de_rpmd_barostat,
})
