"""Native helper extension: builds src/native.c on first import (cc -O2,
cached next to the source) and exposes match_residue / parse_doubles.
Callers must handle `native is None` with pure-Python fallbacks.

This plays the role of the reference's compiled app-layer helpers
(app/internal/compiled.pyx built by its setup.py): the template graph
matcher and bulk numeric parsing are host-side hot spots at production
system sizes."""
from __future__ import annotations

import importlib.util
import os
import subprocess
import sysconfig

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "native.c")
_EXT = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
_SO = os.path.join(_HERE, "_omm_tpu_native" + _EXT)

native = None


def _build():
    include = sysconfig.get_paths()["include"]
    cc = os.environ.get("CC", "cc")
    cmd = [cc, "-O2", "-shared", "-fPIC", "-I", include, _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    spec = importlib.util.spec_from_file_location("_omm_tpu_native", _SO)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


try:
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        _build()
    native = _load()
except Exception:   # no compiler / sandbox — pure-Python fallbacks engage
    native = None


def parse_doubles(text):
    """Whitespace-separated numbers -> float64 ndarray (native when
    available)."""
    import numpy as np
    if isinstance(text, str):
        text = text.encode()
    if native is not None:
        return np.frombuffer(native.parse_doubles(text), dtype=np.float64)
    return np.array(text.split(), dtype=np.float64)
