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
    """'auto' keeps the historical operator choice by cloud size ('modified'
    up to DENSE_A_MAX_POINTS, 'original' beyond - the operators differ, so
    the threshold is physics, not memory).  Since the round-5 sparse
    rework an EXPLICIT 'modified' request works at any size (the hat A is
    ELLPACK, not a dense [m, m] matrix)."""
    units = make_units()
    pts = points_sphere(center=(12.0, 8.0, 8.0), radius=3.0, sigma=1.0)
    assert IBM(units, pts).method == "modified"  # default auto, small cloud
    big = np.random.default_rng(0).uniform(2, 14, size=(40, 3))
    old = IBM.DENSE_A_MAX_POINTS
    try:
        IBM.DENSE_A_MAX_POINTS = 10
        assert IBM(units, big, method="auto").method == "original"
        ibm = IBM(units, big, method="modified")  # no cap: sparse build
        assert ibm.method == "modified" and ibm.E_idx is not None
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
    # dense cloud -> node-space Gram B is a ~10 MB dense [u, u] matrix
    pts = points_sphere(center=(10.0, 8.0, 8.0), radius=5.0, sigma=0.3)
    ibm = IBM(units, pts, dirac="phi2", method="original", max_iters=10)
    a_bytes = max(x.size * x.dtype.itemsize
                  for x in ibm.hook_consts().values() if x is not None)
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

    # parity: consts-as-argument == consts-from-closure.  Not bitwise: the
    # two compilations fuse differently and the truncated (10-iteration)
    # CG on a sub-grid-spaced cloud amplifies last-bit differences; the
    # bound is ~30 f32 eps of the DF scale.
    f_arg = jax.jit(lambda f, hc: step(f, 0.05, hook_consts=hc)[0])(f0, hook.consts)
    f_clo = step(f0, 0.05)[0]
    assert float(jnp.abs(f_arg - f_clo).max()) < 1e-4


def test_ibm_dense_A_positive_definite_at_subgrid_spacing():
    """The point-point matrix uses the hat LL kernel (reference
    diracDeltaTypeLL = 1, lagrange_3D.h:115) independently of the
    interpolation dirac.  With the interpolation kernel (phi2) instead, a
    sub-grid-spaced cloud yields an INDEFINITE A and the CG force solve
    diverges - the round-3 sim_ibm blow-up."""
    units = make_units()
    pts = points_cylinder((12.0, 8.0, 8.0), diameter=6.0, length=8.0, sigma=0.7)
    ibm = IBM(units, pts, dirac="phi2")
    w = np.linalg.eigvalsh(ibm.dense_A())
    assert w.min() > 0, f"A not SPD: min eig {w.min()}"
    # and the wide kernel really is indefinite there (guards the default)
    bad = IBM(units, pts, dirac="phi2", dirac_ll="phi2")
    wb = np.linalg.eigvalsh(bad.dense_A())
    assert wb.min() < 0


@pytest.mark.parametrize("method", ["modified", "original"])
def test_ibm_compact_solve_matches_generic(method):
    """The round-5 compact operators (ELLPACK matvecs, ibm/sparse.py +
    lagrange.py:_solve_compact) must reproduce the generic gather/scatter
    path: same interpolation convention, same CG, same spread - only the
    operator layout differs.  Well-posed (>= grid spacing) cloud: both
    CG solves converge, so the answers must agree to summation-order
    noise."""
    units = make_units()
    pts = points_sphere(center=(10.0, 8.0, 8.0), radius=4.0, sigma=1.2)
    ibm = IBM(units, pts, dirac="phi2", method=method, max_iters=400, tol=1e-6)
    rng = np.random.default_rng(3)
    u_star = jnp.asarray(rng.standard_normal((3,) + tuple(units.global_size)) * 0.01,
                         jnp.float32)
    rho = jnp.ones(units.global_size, jnp.float32)
    f_fast = ibm.compute_forces(u_star, rho)
    c = ibm.hook_consts()
    c["uflat"] = None  # mask the compact keys -> generic fallback
    f_generic = ibm.compute_forces(u_star, rho, consts=c)
    scale = float(jnp.abs(f_generic).max())
    err = float(jnp.abs(f_fast - f_generic).max())
    assert scale > 0
    assert err < 5e-5 * scale + 5e-8, (err, scale)


def test_ibm_node_space_truncated_cg_matches_legacy_class():
    """Sub-grid-spaced cloud -> node-space dense Gram (the MXU fast path).
    The system W W^T x = b is intrinsically ill-conditioned there (normal
    equations square cond(W)); the reference regularizes by truncating CG
    (maxIter), and the node-space iteration searches the W^T-image of the
    SAME Krylov space - so at the same iteration budget it must deliver
    forces of the same scale and a no-slip correction at least as good,
    not bitwise-equal trajectories."""
    units = make_units()
    pts = points_sphere(center=(10.0, 8.0, 8.0), radius=5.0, sigma=0.35)
    ibm = IBM(units, pts, dirac="phi2", method="original", max_iters=50)
    assert ibm.space == "node" and ibm.B is not None
    rng = np.random.default_rng(3)
    u_star = jnp.asarray(rng.standard_normal((3,) + tuple(units.global_size)) * 0.01,
                         jnp.float32)
    rho = jnp.ones(units.global_size, jnp.float32)
    f_fast = ibm.compute_forces(u_star, rho)
    c = ibm.hook_consts()
    c["uflat"] = None
    f_generic = ibm.compute_forces(u_star, rho, consts=c)

    def noslip_ratio(force):
        u_corr = u_star + force / 2.0  # rho == 1
        return (float(jnp.abs(ibm.interpolate(u_corr)).max())
                / float(jnp.abs(ibm.interpolate(u_star)).max()))

    s_fast = float(jnp.abs(f_fast).max())
    s_gen = float(jnp.abs(f_generic).max())
    assert np.isfinite(s_fast) and np.isfinite(s_gen)
    assert 0.5 < s_fast / s_gen < 2.0, (s_fast, s_gen)
    # truncated solve still suppresses the point velocities, and the
    # node-space filter is no worse than the legacy one (+20% slack)
    assert noslip_ratio(f_fast) < max(0.25, 1.2 * noslip_ratio(f_generic))


def test_neighbor_pairs_brute_force():
    """Bucket-grid neighbor search == brute force, including flat clouds
    spanning <3 cells per axis (the linear-id aliasing regression)."""
    from tnl_lbm_tpu.ibm.sparse import neighbor_pairs

    rng = np.random.default_rng(1)
    for extent in ((20.0, 20.0, 20.0), (30.0, 4.0, 2.5)):
        pts = rng.uniform(0, extent, (400, 3))
        ks, ls = neighbor_pairs(pts, 1.7)
        got = list(zip(ks.tolist(), ls.tolist()))
        assert len(got) == len(set(got)), "duplicate pairs"
        d = np.abs(pts[:, None] - pts[None, :])
        ref = set(zip(*np.nonzero((d < 1.7).all(-1))))
        assert set(got) == ref
