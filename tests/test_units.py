"""Units package tests (counterpart of wrappers/python/tests/TestUnits.py)."""
import math

import numpy as np
import pytest

from openmm_tpu import unit as u


def test_basic_conversion():
    q = 2.5 * u.nanometer
    assert abs(q.value_in_unit(u.angstrom) - 25.0) < 1e-12
    assert abs((1.0 * u.angstrom).value_in_unit(u.nanometer) - 0.1) < 1e-14


def test_incompatible_raises():
    with pytest.raises(TypeError):
        (1.0 * u.nanometer).value_in_unit(u.picosecond)


def test_energy_mass_equivalence():
    # 1 dalton*nm^2/ps^2 == 1 kJ/mol (the MD unit identity)
    q = 1.0 * u.dalton * u.nanometer ** 2 / u.picosecond ** 2
    assert abs(q.value_in_unit(u.kilojoule_per_mole) - 1.0) < 1e-10


def test_calorie_conversion():
    q = 1.0 * u.kilocalorie_per_mole
    assert abs(q.value_in_unit(u.kilojoule_per_mole) - 4.184) < 1e-12


def test_md_unit_system_strip():
    assert abs(u.strip(3.0 * u.angstrom) - 0.3) < 1e-14
    assert abs(u.strip(1.0 * u.kilocalorie_per_mole) - 4.184) < 1e-12
    assert abs(u.strip(300.0 * u.kelvin) - 300.0) < 1e-12
    # raw values pass through
    assert u.strip(1.25) == 1.25


def test_quantity_arithmetic():
    a = 2.0 * u.nanometer
    b = 5.0 * u.angstrom
    assert abs((a + b).value_in_unit(u.nanometer) - 2.5) < 1e-12
    assert abs((a - b).value_in_unit(u.nanometer) - 1.5) < 1e-12
    c = a / (2.0 * u.picosecond)
    assert abs(c.value_in_unit(u.nanometer / u.picosecond) - 1.0) < 1e-12
    d = a * a
    assert abs(d.value_in_unit(u.nanometer ** 2) - 4.0) < 1e-12


def test_array_quantities():
    arr = u.Quantity(np.array([[1.0, 2.0, 3.0]]), u.angstrom)
    out = arr.value_in_unit(u.nanometer)
    assert np.allclose(out, [[0.1, 0.2, 0.3]])


def test_angles():
    assert abs((180.0 * u.degree).value_in_unit(u.radian) - math.pi) < 1e-12


def test_constants():
    R = u.MOLAR_GAS_CONSTANT_R.value_in_unit(u.kilojoule_per_mole / u.kelvin)
    assert abs(R - 8.31446261815324e-3) < 1e-15


def test_comparisons():
    assert 1.0 * u.nanometer > 5.0 * u.angstrom
    assert abs((1.0 * u.nanometer - 10.0 * u.angstrom).value_in_unit(u.nanometer)) < 1e-12


def test_dimensionless_collapse():
    q = (2.0 * u.nanometer) / (1.0 * u.nanometer)
    assert q == 2.0


def test_sqrt():
    q = u.sqrt(4.0 * u.nanometer ** 2)
    assert abs(q.value_in_unit(u.nanometer) - 2.0) < 1e-12
