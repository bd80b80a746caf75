"""Platform: named engine configurations.

The reference's Platform/OLLA stratum (olla/src/Platform.cpp:151-330, kernel
registry olla/include/openmm/kernels.h) exists to select and drive one of
several hand-written backends. In the TPU-native design the backend is always
XLA; a Platform here is a *precision / execution profile* that the Context
uses when tracing its fused step function:

- "Reference": float64 everywhere, dense O(N^2) neighbor path — the
  correctness oracle (role of platforms/reference/ in the reference tree).
- "TPU": mixed precision (float32 positions/forces, float64-free), tiled
  neighbor list + Pallas kernels where profitable. Works on any JAX backend;
  on CPU it runs the same program XLA:TPU would.
- "CPU": alias of TPU profile pinned to the host platform (useful for tests).

Properties follow the reference's typed property maps (CudaPlatform.cpp:65-122):
Precision (single|mixed|double), DeterministicForces (always true under XLA).
"""
from __future__ import annotations

from .exceptions import OpenMMException

_registry = {}


class Platform(object):
    def __init__(self, name, speed, defaults):
        self._name = name
        self._speed = speed
        self._defaults = dict(defaults)

    def getName(self):
        return self._name

    def getSpeed(self):
        return self._speed

    def getPropertyNames(self):
        return list(self._defaults)

    def getPropertyDefaultValue(self, prop):
        if prop not in self._defaults:
            raise OpenMMException("unknown platform property: %s" % prop)
        return self._defaults[prop]

    def setPropertyDefaultValue(self, prop, value):
        if prop not in self._defaults:
            raise OpenMMException("unknown platform property: %s" % prop)
        self._defaults[prop] = value

    def getPropertyValue(self, context, prop):
        return context._properties.get(prop, self.getPropertyDefaultValue(prop))

    def supportsDoublePrecision(self):
        return True

    # -- registry (Platform.cpp:151-210) -------------------------------------
    @staticmethod
    def getNumPlatforms():
        return len(_registry)

    @staticmethod
    def getPlatform(index_or_name):
        if isinstance(index_or_name, int):
            return list(_registry.values())[index_or_name]
        return Platform.getPlatformByName(index_or_name)

    @staticmethod
    def getPlatformByName(name):
        if name not in _registry:
            raise OpenMMException("There is no registered Platform called \"%s\"" % name)
        return _registry[name]

    @staticmethod
    def registerPlatform(platform):
        _registry[platform.getName()] = platform

    @staticmethod
    def findPlatform(kernelNames=()):
        # the TPU platform is only "available" when a non-CPU JAX backend
        # exists (Platform::findPlatform availability semantics); otherwise
        # its Pallas kernels cannot compile
        import jax
        try:
            has_accel = any(d.platform not in ("cpu",)
                            for d in jax.devices())
        except Exception:
            has_accel = False
        best = None
        for p in _registry.values():
            if p.getName() == "TPU" and not has_accel:
                continue
            if best is None or p.getSpeed() > best.getSpeed():
                best = p
        if best is None:
            raise OpenMMException("No Platform registered")
        return best

    @staticmethod
    def getDefaultPluginsDirectory():
        return ""

    @staticmethod
    def loadPluginsFromDirectory(directory):
        return []

    @staticmethod
    def getPluginLoadFailures():
        return []

    @staticmethod
    def getOpenMMVersion():
        from .version import short_version
        return short_version


Platform.registerPlatform(Platform("Reference", 1.0, {
    "Precision": "double",
    "DeterministicForces": "true",
}))
Platform.registerPlatform(Platform("CPU", 10.0, {
    "Precision": "mixed",
    "DeterministicForces": "true",
    "Threads": "0",
}))
Platform.registerPlatform(Platform("TPU", 100.0, {
    "Precision": "mixed",
    "DeterministicForces": "true",
    "DeviceIndex": "0",
}))
