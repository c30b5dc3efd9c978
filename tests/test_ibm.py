"""IBM: dirac kernel properties, interpolation/spreading duality, coupling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tnl_lbm_tpu.ibm import IBM, dirac_delta
from tnl_lbm_tpu.ibm.generators import points_cylinder, points_rectangle, points_sphere
from tnl_lbm_tpu.models import D3Q27
from tnl_lbm_tpu.ops import collision as col
from tnl_lbm_tpu.sim import Domain, LBMConfig, initial_dfs, make_step
from tnl_lbm_tpu.utils import Lattice


@pytest.mark.parametrize("name", ["phi1", "phi2", "phi3", "phi4"])
def test_dirac_partition_of_unity(name):
    # sum over integer shifts == 1 for any sub-grid offset
    for frac in (0.0, 0.25, 0.5, 0.77):
        r = jnp.arange(-4, 5) + frac
        total = float(jnp.sum(dirac_delta(name, r)))
        assert np.isclose(total, 1.0, atol=1e-6), (name, frac, total)


def make_units(n=(24, 16, 16)):
    return Lattice(global_size=n, phys_origin=(0, 0, 0), phys_dl=1.0, phys_dt=1.0, phys_viscosity=0.05)


def test_interpolation_of_linear_field_is_exact():
    units = make_units()
    pts = points_sphere(center=(12.0, 8.0, 8.0), radius=3.0, sigma=1.0)
    # the hat kernel (phi3) reproduces linear fields exactly
    ibm = IBM(units, pts, dirac="phi3")
    # linear field u = a + b.x is reproduced exactly by a 1st-order kernel
    X, Y, Z = 24, 16, 16
    gx, gy, gz = np.meshgrid(np.arange(X), np.arange(Y), np.arange(Z), indexing="ij")
    field = jnp.asarray(np.stack([0.1 + 0.01 * gx, 0.02 * gy, 0.2 - 0.03 * gz]), jnp.float32)
    u_l = np.asarray(ibm.interpolate(field))
    # lattice coordinate of point p maps to array index p (phys2lbm with dl=1
    # shifts by +0.5; our sites sit at integer indices = lbm coords)
    expect = np.stack([
        0.1 + 0.01 * ibm.ll_lat[:, 0],
        0.02 * ibm.ll_lat[:, 1],
        0.2 - 0.03 * ibm.ll_lat[:, 2],
    ], axis=-1)
    assert np.allclose(u_l, expect, atol=1e-4)


def test_spread_conserves_total():
    units = make_units()
    pts = points_rectangle(center=(12.0, 8.0, 8.0), width=6.0, height=6.0, sigma=1.0)
    ibm = IBM(units, pts, dirac="phi2")
    vals = jnp.asarray(np.random.default_rng(0).standard_normal((ibm.m, 3)), jnp.float32)
    field = ibm.spread(vals, (24, 16, 16))
    # partition of unity => total spread value equals total point value
    np.testing.assert_allclose(np.asarray(field.sum(axis=(1, 2, 3))), np.asarray(vals.sum(axis=0)), rtol=1e-4)


def test_ibm_method_auto_and_explicit_limit():
    """'auto' picks the operator by cloud size; an explicit 'modified'
    request beyond the dense-A limit raises instead of silently switching
    operators (ADVICE r2)."""
    units = make_units()
    pts = points_sphere(center=(12.0, 8.0, 8.0), radius=3.0, sigma=1.0)
    assert IBM(units, pts).method == "modified"  # default auto, small cloud
    big = np.random.default_rng(0).uniform(2, 14, size=(40, 3))
    old = IBM.DENSE_A_MAX_POINTS
    try:
        IBM.DENSE_A_MAX_POINTS = 10
        assert IBM(units, big, method="auto").method == "original"
        with pytest.raises(ValueError, match="modified"):
            IBM(units, big, method="modified")
    finally:
        IBM.DENSE_A_MAX_POINTS = old


@pytest.mark.parametrize("method", ["modified", "original"])
def test_ibm_enforces_no_slip_at_points(method):
    """Uniform flow + IBM sphere: after a few steps the interpolated velocity
    at the Lagrangian points must be strongly suppressed vs the free stream."""
    units = make_units()
    X, Y, Z = units.global_size
    dom = Domain(lat=D3Q27, units=units, map=np.zeros((X, Y, Z), np.uint8), periodic=(True,) * 3)
    pts = points_sphere(center=(10.0, 8.0, 8.0), radius=3.0, sigma=1.2)
    ibm = IBM(units, pts, dirac="phi2", method=method, max_iters=50)

    u0 = 0.05
    cfg = LBMConfig(
        lat=D3Q27, collision=col.collide_cum, compute_dtype=jnp.float32,
        forcing_hook=ibm.forcing_hook(),
    )
    step = make_step(cfg, dom)
    jstep = jax.jit(lambda f: step(f, 0.05)[0])
    f = initial_dfs(cfg, dom, u0=(u0, 0.0, 0.0))
    for _ in range(40):
        f = jstep(f)
    _, rho, u = step(f, 0.05)
    u_pts = np.asarray(ibm.interpolate(u))
    assert np.abs(u_pts).max() < 0.25 * u0, np.abs(u_pts).max()
    assert np.isfinite(np.asarray(u)).all()
    # drag force diagnostic is finite and opposes the flow
    force = ibm.compute_forces(u, rho)
    total = ibm.integrate_force(force)
    assert np.isfinite(total).all()


def test_generators_shapes_and_spacing():
    pts_s = points_sphere((0, 0, 0), 3.0, 0.8)
    pts_c = points_cylinder((0, 0, 0), 4.0, 10.0, 1.0)
    pts_r = points_rectangle((0, 0, 0), 5.0, 5.0, 1.0)
    assert (np.linalg.norm(pts_s, axis=1) - 3.0 < 1e-9).all()
    assert len(pts_c) > 30 and len(pts_r) >= 36
    units = make_units()
    ibm = IBM(units, pts_s, dirac="phi3")
    dmin, dmax = ibm.min_max_spacing()
    assert 0.1 < dmin <= dmax < 3.0


def test_cg_reports_iterations_and_residual():
    """The CG solve logs iterations + relative residual and converges to the
    configured tolerance (reference lagrange_3D.hpp:661-668, maxIter 10000 /
    residue 3e-4 at :899-906)."""
    import jax.numpy as jnp

    from tnl_lbm_tpu.ibm.generators import points_cylinder
    from tnl_lbm_tpu.ibm.lagrange import IBM
    from tnl_lbm_tpu.utils import Lattice

    units = Lattice(global_size=(32, 32, 32), phys_origin=(0, 0, 0),
                    phys_dl=1 / 32, phys_dt=1e-3, phys_viscosity=1e-3)
    pts = points_cylinder((0.5, 0.5, 0.5), diameter=0.4, length=0.4, sigma=0.05)
    ibm = IBM(units, pts)
    assert ibm.max_iters == 10000  # reference default
    u = jnp.zeros((3, 32, 32, 32)).at[0].set(0.05)
    rho = jnp.ones((32, 32, 32))
    ibm.compute_forces(u, rho)
    iters = int(ibm.last_cg_iters)
    rel = float(ibm.last_cg_residual)
    assert 0 < iters < ibm.max_iters
    assert rel <= ibm.tol


def test_ibm_consts_enter_jit_as_parameters_not_inline():
    """The hook-consts protocol (round 3): A/weights/nodes must reach a
    jitted step as ARGUMENTS.  Closed over, they inline into the lowered
    HLO as dense constants - the round-2 large-cloud remote-compile
    ceiling.  Lowering with hook_consts as an argument must produce an
    HLO dump far smaller than A itself; the result must be unchanged."""
    units = make_units()
    X, Y, Z = units.global_size
    dom = Domain(lat=D3Q27, units=units,
                 map=np.zeros((X, Y, Z), np.uint8), periodic=(True,) * 3)
    # ~1.6k points -> A is ~10 MB
    pts = points_sphere(center=(10.0, 8.0, 8.0), radius=5.0, sigma=0.55)
    ibm = IBM(units, pts, dirac="phi2", max_iters=10)
    a_bytes = ibm.A.size * 4
    assert a_bytes > 4_000_000, f"cloud too small for the test ({a_bytes}B)"

    hook = ibm.forcing_hook()
    cfg = LBMConfig(lat=D3Q27, collision=col.collide_cum,
                    compute_dtype=jnp.float32, forcing_hook=hook)
    step = make_step(cfg, dom)
    f0 = initial_dfs(cfg, dom, u0=(0.05, 0.0, 0.0))

    lowered = jax.jit(
        lambda f, hc: step(f, 0.05, hook_consts=hc)[0]
    ).lower(f0, hook.consts)
    hlo_len = len(lowered.as_text())
    assert hlo_len < a_bytes, (
        f"HLO {hlo_len}B vs A {a_bytes}B - consts look inlined")

    # parity: consts-as-argument == consts-from-closure
    f_arg = jax.jit(lambda f, hc: step(f, 0.05, hook_consts=hc)[0])(f0, hook.consts)
    f_clo = step(f0, 0.05)[0]
    assert float(jnp.abs(f_arg - f_clo).max()) < 1e-6


def test_ibm_dense_A_positive_definite_at_subgrid_spacing():
    """The point-point matrix uses the hat LL kernel (reference
    diracDeltaTypeLL = 1, lagrange_3D.h:115) independently of the
    interpolation dirac.  With the interpolation kernel (phi2) instead, a
    sub-grid-spaced cloud yields an INDEFINITE A and the CG force solve
    diverges - the round-3 sim_ibm blow-up."""
    units = make_units()
    pts = points_cylinder((12.0, 8.0, 8.0), diameter=6.0, length=8.0, sigma=0.7)
    ibm = IBM(units, pts, dirac="phi2")
    w = np.linalg.eigvalsh(np.asarray(ibm.A, np.float64))
    assert w.min() > 0, f"A not SPD: min eig {w.min()}"
    # and the wide kernel really is indefinite there (guards the default)
    bad = IBM(units, pts, dirac="phi2", dirac_ll="phi2")
    wb = np.linalg.eigvalsh(np.asarray(bad.A, np.float64))
    assert wb.min() < 0
