"""openmm_tpu.app — the application layer: topology/file formats/force fields/
simulation driver/reporters (counterpart of wrappers/python/openmm/app/)."""
from .element import Element
from .topology import Topology, Chain, Residue, Atom
from .pdbfile import PDBFile
from .forcefield import ForceField, HBonds, AllBonds, HAngles, NoCutoff, \
    CutoffNonPeriodic, CutoffPeriodic, Ewald, PME, LJPME, \
    HCT, OBC1, OBC2, GBn, GBn2
from .simulation import Simulation
from .statedatareporter import StateDataReporter
from .dcdreporter import DCDReporter, DCDFile
from .pdbreporter import PDBReporter
from .checkpointreporter import CheckpointReporter
from .modeller import Modeller
from .metadynamics import Metadynamics, BiasVariable
from .simulatedtempering import SimulatedTempering
from .amberprmtopfile import AmberPrmtopFile
from .amberinpcrdfile import AmberInpcrdFile
from .charmmfiles import CharmmPsfFile, CharmmParameterSet, CharmmCrdFile
from .gromacsgrofile import GromacsGroFile
from .gromacstopfile import GromacsTopFile
from .pdbxfile import PDBxFile
from .pdbxreporter import PDBxReporter
from .desmonddmsfile import DesmondDMSFile

__all__ = [
    "Element", "Topology", "Chain", "Residue", "Atom", "PDBFile",
    "ForceField", "Simulation", "StateDataReporter", "DCDReporter", "DCDFile",
    "PDBReporter", "CheckpointReporter", "Modeller",
    "Metadynamics", "BiasVariable", "SimulatedTempering",
    "AmberPrmtopFile", "AmberInpcrdFile",
    "CharmmPsfFile", "CharmmParameterSet", "CharmmCrdFile", "GromacsGroFile",
    "GromacsTopFile", "PDBxFile", "PDBxReporter", "DesmondDMSFile",
    "HBonds", "AllBonds", "HAngles", "NoCutoff", "CutoffNonPeriodic",
    "CutoffPeriodic", "Ewald", "PME", "LJPME",
    "HCT", "OBC1", "OBC2", "GBn", "GBn2",
]
