"""Prebuilt example and benchmark systems (counterpart of the reference's
examples/HelloArgon.cpp, HelloWaterBox.cpp and the benchmark.py system zoo)."""
from .builders import argon_gas, tip3p_water_box

__all__ = ["argon_gas", "tip3p_water_box"]
