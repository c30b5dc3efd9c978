import numpy as np

from tnl_lbm_tpu.utils import Lattice


def make_lat():
    return Lattice(
        global_size=(64, 32, 16),
        phys_origin=(0.0, -1.0, 2.0),
        phys_dl=0.01,
        phys_dt=0.001,
        phys_viscosity=1e-5,
    )


def test_viscosity_roundtrip():
    lat = make_lat()
    nu = lat.lbm_viscosity()
    assert np.isclose(nu, 0.001 / 0.01**2 * 1e-5)
    assert np.isclose(lat.lbm2phys_viscosity(nu), lat.phys_viscosity)


def test_point_roundtrip():
    lat = make_lat()
    p_phys = lat.lbm2phys_point([3, 4, 5])
    assert np.allclose(lat.phys2lbm_point(p_phys), [3, 4, 5])
    # reference convention: site i at origin + (i - 0.5) * dl (lattice.h:63-66)
    assert np.isclose(lat.lbm2phys_x(1), 0.0 + 0.5 * 0.01)


def test_velocity_force_roundtrip():
    lat = make_lat()
    assert np.isclose(lat.lbm2phys_velocity(lat.phys2lbm_velocity(3.2)), 3.2)
    assert np.isclose(lat.lbm2phys_force(lat.phys2lbm_force(0.7)), 0.7)
