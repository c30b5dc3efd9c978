import numpy as np
import pytest

from tnl_lbm_tpu.models import D2Q9, D3Q7, D3Q27


@pytest.mark.parametrize("lat", [D3Q27, D2Q9, D3Q7], ids=lambda latt: latt.name)
def test_basic_invariants(lat):
    # weights sum to 1, velocities sum to 0
    assert np.isclose(lat.w.sum(), 1.0)
    assert (lat.c.sum(axis=0) == 0).all()
    # opposite is an involution and negates c
    assert (lat.opp[lat.opp] == np.arange(lat.Q)).all()
    assert (lat.c[lat.opp] == -lat.c).all()
    # rest particle first
    assert (lat.c[0] == 0).all()
    # all directions unique
    assert len({tuple(v) for v in lat.c.tolist()}) == lat.Q


@pytest.mark.parametrize("lat", [D3Q27, D2Q9, D3Q7], ids=lambda latt: latt.name)
def test_second_moment_isotropy(lat):
    # sum_q w_q c_qa c_qb = cs^2 delta_ab
    cs2 = 1.0 / lat.i_cs2
    m2 = np.einsum("q,qa,qb->ab", lat.w, lat.c, lat.c)
    assert np.allclose(m2, cs2 * np.eye(lat.D), atol=1e-14)


def test_d3q27_enum_order_matches_reference():
    # spot-check the enum order of reference defs.h:273-305
    assert D3Q27.names[0] == "zzz"
    assert D3Q27.idx("pzz") == 1
    assert D3Q27.idx("zzm") == 6
    assert D3Q27.idx("ppz") == 7
    assert D3Q27.idx("zmp") == 18
    assert D3Q27.idx("ppp") == 19
    assert D3Q27.idx("mpp") == 26
    # attribute access sugar
    assert D3Q27.ppp == 19
    assert D2Q9.pp == 5


def test_mirror_permutation():
    m = D3Q27.mirror(2)  # flip z
    assert m[D3Q27.idx("ppp")] == D3Q27.idx("ppm")
    assert m[D3Q27.idx("zzz")] == D3Q27.idx("zzz")
    assert m[D3Q27.idx("zzp")] == D3Q27.idx("zzm")
    my = D2Q9.mirror(1)
    assert my[D2Q9.idx("pp")] == D2Q9.idx("pm")


def test_d3q7_weights():
    assert np.isclose(D3Q7.w[0], 0.25)
    assert np.allclose(D3Q7.w[1:], 0.125)
    assert D3Q7.i_cs2 == 4
