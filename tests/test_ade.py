"""ADE (D3Q7) lattice: diffusion physics, advection, transfer flags, coupling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tnl_lbm_tpu.models import D3Q7, D3Q27
from tnl_lbm_tpu.ops import collision_ade as ade
from tnl_lbm_tpu.ops import equilibrium as eqlib
from tnl_lbm_tpu.sim import Domain, LBMConfig
from tnl_lbm_tpu.sim.step_ade import ADEGEO, make_ade_step, transfer_direction_flags
from tnl_lbm_tpu.utils import Lattice


def periodic_ade_domain(n=32):
    units = Lattice(global_size=(n, 8, 8), phys_origin=(0, 0, 0), phys_dl=1.0, phys_dt=1.0)
    return Domain(lat=D3Q7, units=units, map=np.zeros((n, 8, 8), np.uint8), periodic=(True,) * 3)


def gaussian_phi(n, sigma=3.0):
    x = np.arange(n) - n / 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    return jnp.asarray(np.broadcast_to(g[:, None, None], (n, 8, 8)).copy())


def test_pure_diffusion_variance_growth():
    n, D = 64, 0.05
    dom = periodic_ade_domain(n)
    cfg = LBMConfig(lat=D3Q7, collision=ade.collide_srt_ade, compute_dtype=jnp.float64)
    step = make_ade_step(cfg, dom)
    phi0 = gaussian_phi(n)
    u = jnp.zeros((3, n, 8, 8))
    g = eqlib.eq_quadratic(D3Q7, phi0, u)

    jstep = jax.jit(lambda g: step(g, u, D))
    total0 = float(phi0.sum())
    x = np.arange(n) - n / 2

    def variance(phi):
        p = np.asarray(phi)[:, 0, 0]
        p = p / p.sum()
        mean = (x * p).sum()
        return ((x - mean) ** 2 * p).sum()

    var0 = variance(phi0)
    steps = 200
    for _ in range(steps):
        g, phi = jstep(g)
    assert np.isclose(float(phi.sum()), total0, rtol=1e-12)
    var1 = variance(phi)
    # sigma^2 grows by 2 D t for 1D diffusion
    assert np.isclose(var1 - var0, 2 * D * steps, rtol=0.02), (var0, var1)


def test_advection_moves_blob():
    n = 64
    dom = periodic_ade_domain(n)
    cfg = LBMConfig(lat=D3Q7, collision=ade.collide_clbm_ade, compute_dtype=jnp.float64)
    step = make_ade_step(cfg, dom)
    phi0 = gaussian_phi(n)
    vx = 0.08
    u = jnp.broadcast_to(jnp.asarray([vx, 0, 0]).reshape(3, 1, 1, 1), (3, n, 8, 8))
    g = eqlib.eq_quadratic(D3Q7, phi0, u)
    jstep = jax.jit(lambda g: step(g, u, 0.01))
    steps = 100
    for _ in range(steps):
        g, phi = jstep(g)
    x = np.arange(n)
    p = np.asarray(phi)[:, 0, 0]
    centroid = (x * p).sum() / p.sum()
    assert np.isclose(centroid, n / 2 + vx * steps, atol=0.5)


def test_wall_body_keeps_phi_finite_and_bounded():
    n = 16
    units = Lattice(global_size=(n, 8, 8), phys_origin=(0, 0, 0), phys_dl=1.0, phys_dt=1.0)
    m = np.zeros((n, 8, 8), np.uint8)
    m[0] = ADEGEO.WALL_BODY
    m[-1] = ADEGEO.WALL
    dom = Domain(lat=D3Q7, units=units, map=m, periodic=(False, True, True))
    cfg = LBMConfig(lat=D3Q7, collision=ade.collide_mrt_ade, compute_dtype=jnp.float64)
    step = make_ade_step(cfg, dom)
    phi0 = jnp.ones((n, 8, 8)) * 0.5
    u = jnp.zeros((3, n, 8, 8))
    g = eqlib.eq_quadratic(D3Q7, phi0, u)
    for _ in range(20):
        g, phi = step(g, u, 0.02)
    assert np.isfinite(np.asarray(phi)).all()


def test_transfer_direction_flags():
    m = np.zeros((6, 4, 4), np.uint8)
    m[3:] = ADEGEO.SOLID
    flags = transfer_direction_flags(D3Q7, m)
    # only links crossing the x = 2/3 interface are flagged
    pzz = D3Q7.idx("pzz") - 1
    mzz = D3Q7.idx("mzz") - 1
    assert flags[pzz][2].all() and flags[mzz][3].all()
    assert not flags[pzz][0].any() and not flags[D3Q7.idx("zpz") - 1].any()


def test_coupled_nse_ade_runs_and_conserves_scalar(tmp_path):
    from tnl_lbm_tpu.ops import collision as col3
    from tnl_lbm_tpu.sim.coupled import CoupledSimulation

    n = 16
    units = Lattice(global_size=(n, 8, 8), phys_origin=(0, 0, 0), phys_dl=1.0, phys_dt=1.0,
                    phys_viscosity=0.02)
    nse_dom = Domain(lat=D3Q27, units=units, map=np.zeros((n, 8, 8), np.uint8), periodic=(True,) * 3)
    ade_dom = Domain(lat=D3Q7, units=units, map=np.zeros((n, 8, 8), np.uint8), periodic=(True,) * 3)
    cfg = LBMConfig(lat=D3Q27, collision=col3.collide_cum, compute_dtype=jnp.float64)
    ade_cfg = LBMConfig(lat=D3Q7, collision=ade.collide_clbm_ade, compute_dtype=jnp.float64)

    class Sim(CoupledSimulation):
        def body_force(self, t):
            return np.array([1e-5, 0.0, 0.0])

        def initial_phi(self):
            return gaussian_phi(n)[:, :8, :8] * 1.0

    sim = Sim(cfg, nse_dom, ade_cfg, ade_dom, ade_diffusion=0.01,
              sim_id="coupled_t", results_parent=tmp_path, phys_final_time=1e9)
    assert sim.can_compute()
    sim.sim_init()
    phi_total0 = float(jnp.sum(sim.phi))
    sim._advance(20)
    assert np.isfinite(np.asarray(sim.phi)).all()
    assert np.isclose(float(jnp.sum(sim.phi)), phi_total0, rtol=1e-12)
    assert float(jnp.abs(sim.u).max()) > 0  # flow developed and advects phi
    sim._lock.release()


def _rand_g(cfg, dom, seed=0):
    rng = np.random.default_rng(seed)
    phi = jnp.asarray(0.5 + 0.1 * rng.standard_normal(dom.shape), cfg.compute_dtype)
    u = jnp.asarray(0.02 * rng.standard_normal((3,) + dom.shape), cfg.compute_dtype)
    return eqlib.eq_quadratic(cfg.lat, phi, u).astype(cfg.compute_dtype), u


def test_fused_ade_kernel_matches_xla():
    """Pallas D3Q7 kernel (interpret mode) == XLA ADE step, across the
    supported BC set incl. the 2-halo Peclet outflow pull."""
    import pytest

    from tnl_lbm_tpu.kernels.fused_ade import make_fused_ade_step, supports_ade
    from tnl_lbm_tpu.ops import collision_ade as cade

    X, Y, Z = 8, 16, 8
    m = np.zeros((X, Y, Z), np.uint8)
    m[:, 0] = ADEGEO.WALL
    m[:, -1] = ADEGEO.WALL_BODY
    m[:, :, 0] = ADEGEO.SYM_BOTTOM
    m[:, :, -1] = ADEGEO.SYM_TOP
    m[0, 1:-1, 1:-1] = ADEGEO.INFLOW
    m[-1, 1:-1, 1:-1] = ADEGEO.OUTFLOW_PE
    m[5, 5, 5] = ADEGEO.NOTHING
    units = Lattice(global_size=(X, Y, Z), phys_origin=(0, 0, 0), phys_dl=1.0, phys_dt=1.0)
    dom = Domain(lat=D3Q7, units=units, map=m)
    for name, collide in ade.COLLISIONS_D3Q7.items():
        cfg = LBMConfig(lat=D3Q7, collision=collide, eq=eqlib.eq_quadratic,
                        compute_dtype=jnp.float32)
        assert supports_ade(dom)
        step_ref = make_ade_step(cfg, dom)
        step_fused = make_fused_ade_step(cfg, dom, tile=(8, 8), tiles_per_program=1)
        g, u = _rand_g(cfg, dom, seed=3)
        g1, g2 = g, g
        for _ in range(3):
            g1, phi1 = step_ref(g1, u, 0.02, phi_in=0.3)
            g2, phi2 = step_fused(g2, u, 0.02, phi_in=0.3)
        assert float(jnp.abs(g1 - g2).max()) < 1e-6, name
        assert float(jnp.abs(phi1 - phi2).max()) < 1e-6, name


@pytest.mark.slow
def test_fused_ade_transfer_and_variable_diffusion_match_xla():
    """Conjugate TRANSFER_* BCs (packed interface-flag bit-field) and a
    per-site diffusion field on the fused kernel == XLA step (reference
    d3q7/bc.h:142-189, lbm_data.h:133-165)."""
    from tnl_lbm_tpu.kernels.fused_ade import make_fused_ade_step, supports_ade
    from tnl_lbm_tpu.sim.step_ade import transfer_direction_flags

    X, Y, Z = 16, 16, 16
    m = np.zeros((X, Y, Z), np.uint8)
    m[:, 0] = m[:, -1] = ADEGEO.WALL
    # a solid slab with conjugate-transfer interfaces on both sides
    m[6:10, 2:-2, 2:-2] = ADEGEO.SOLID
    m[5, 2:-2, 2:-2] = ADEGEO.TRANSFER_FS
    m[6, 2:-2, 2:-2] = ADEGEO.TRANSFER_SF
    m[10, 2:-2, 2:-2] = ADEGEO.TRANSFER_SW
    units = Lattice(global_size=(X, Y, Z), phys_origin=(0, 0, 0), phys_dl=1.0, phys_dt=1.0)
    dom = Domain(lat=D3Q7, units=units, map=m, periodic=(True, False, False))
    assert supports_ade(dom)
    rng = np.random.default_rng(7)
    nu_field = jnp.asarray(0.01 + 0.02 * rng.random((X, Y, Z)), jnp.float32)
    tcoef = 0.4
    tdirs = jnp.asarray(transfer_direction_flags(D3Q7, m))
    for name, collide in ade.COLLISIONS_D3Q7.items():
        cfg = LBMConfig(lat=D3Q7, collision=collide, eq=eqlib.eq_quadratic,
                        compute_dtype=jnp.float32)
        step_ref = make_ade_step(cfg, dom)
        step_fused = make_fused_ade_step(cfg, dom, tile=(8, 8), tiles_per_program=1,
                                         variable_diffusion=True,
                                         transfer_coeff=tcoef)
        g, u = _rand_g(cfg, dom, seed=9)
        g1, g2 = g, g
        for _ in range(3):
            g1, phi1 = step_ref(g1, u, nu_field, transfer_dirs=tdirs,
                                transfer_coeff=tcoef)
            g2, phi2 = step_fused(g2, u, nu_field)
        assert float(jnp.abs(g1 - g2).max()) < 1e-6, name
        assert float(jnp.abs(phi1 - phi2).max()) < 1e-6, name


def test_outflow_pe_pull_offset_reads_x_minus_2():
    """Regression: the Peclet-outflow pull reaches x-2, which a 1-wide halo
    pad sliced into an empty array before the 2-wide pad fix."""
    from tnl_lbm_tpu.sim.step_ade import _pull_offset

    n = 8
    g = jnp.asarray(np.arange(7 * n * 4 * 4, dtype=np.float64).reshape(7, n, 4, 4))
    out = _pull_offset(D3Q7, g, (False, False, False), (n, 4, 4), -1)
    assert out.shape == (7, n, 4, 4)
    # component pzz (c=(1,0,0)): out(x) = g(x - 2), edge-clamped
    q = D3Q7.idx("pzz")
    np.testing.assert_array_equal(np.asarray(out[q][4]), np.asarray(g[q][2]))
    np.testing.assert_array_equal(np.asarray(out[q][0]), np.asarray(g[q][0]))


def test_coupled_fused_matches_xla(tmp_path):
    """CoupledSimulation(use_fused=True) (fused NSE + fused ADE kernels in
    one dispatch) matches the XLA coupled driver."""
    from tnl_lbm_tpu.ops import collision as col3
    from tnl_lbm_tpu.sim.coupled import CoupledSimulation

    n = 8
    units = Lattice(global_size=(n, 16, 16), phys_origin=(0, 0, 0), phys_dl=1.0, phys_dt=1.0,
                    phys_viscosity=0.02)
    nse_dom = Domain(lat=D3Q27, units=units, map=np.zeros((n, 16, 16), np.uint8), periodic=(True,) * 3)
    ade_dom = Domain(lat=D3Q7, units=units, map=np.zeros((n, 16, 16), np.uint8), periodic=(True,) * 3)
    cfg = LBMConfig(lat=D3Q27, collision=col3.collide_cum_well, eq=eqlib.eq_well,
                    well=True, compute_dtype=jnp.float32)
    ade_cfg = LBMConfig(lat=D3Q7, collision=ade.collide_clbm_ade, compute_dtype=jnp.float32)

    class Sim(CoupledSimulation):
        def body_force(self, t):
            return np.array([1e-4, 0.0, 0.0])

        def initial_phi(self):
            x = np.arange(n) - n / 2
            g = np.exp(-(x**2) / 8.0)
            return jnp.asarray(np.broadcast_to(g[:, None, None], (n, 16, 16)).copy(),
                               jnp.float32)

    res = []
    for sid, fused in (("cf_xla", False), ("cf_fused", True)):
        sim = Sim(cfg, nse_dom, ade_cfg, ade_dom, ade_diffusion=0.01,
                  sim_id=sid, results_parent=tmp_path, phys_final_time=1e9,
                  use_fused=fused)
        assert sim.can_compute()
        sim.sim_init()
        if fused:
            assert sim._ade_fused
        sim._advance(6)
        res.append((np.asarray(sim.f), np.asarray(sim.g), np.asarray(sim.phi)))
        sim._lock.release()
    for a, b in zip(res[0], res[1]):
        np.testing.assert_allclose(a, b, atol=2e-6)


def test_coupled_kernel_selection_reported_and_aa_degrade_warns(tmp_path):
    """CoupledSimulation records which kernel sim_init picked
    (``coupled_kernel``) and warns at config time when a requested A-A
    pattern degrades to the two-kernel A-B path (transfer BCs)."""
    import logging

    from tnl_lbm_tpu.ops import collision as col
    from tnl_lbm_tpu.sim.coupled import CoupledSimulation

    n = 8
    units = Lattice(global_size=(n, 16, 16), phys_origin=(0, 0, 0),
                    phys_dl=1.0, phys_dt=1.0, phys_viscosity=0.02)
    cfg = LBMConfig(lat=D3Q27, collision=col.collide_cum_well, eq=eqlib.eq_well,
                    well=True, streaming="AA")
    ade_cfg = LBMConfig(lat=D3Q7, collision=ade.collide_clbm_ade, streaming="AA")

    def run(ma, sid):
        nse_dom = Domain(lat=D3Q27, units=units, map=np.zeros((n, 16, 16), np.uint8),
                         periodic=(True,) * 3)
        ade_dom = Domain(lat=D3Q7, units=units, map=ma, periodic=(True,) * 3)
        sim = CoupledSimulation(cfg, nse_dom, ade_cfg, ade_dom,
                                sim_id=sid, results_parent=tmp_path,
                                use_fused=True)
        assert sim.can_compute()
        sim.sim_init()
        sim._lock.release()
        return sim

    # plain map: the one-kernel A-A coupled pair is selected
    sim = run(np.zeros((n, 16, 16), np.uint8), "ck_plain")
    assert sim.coupled_kernel == "one-kernel-AA"

    # transfer BCs: A-A one-kernel unavailable -> two-kernel + warning
    # (the package logger does not propagate; capture with a direct handler)
    ma = np.zeros((n, 16, 16), np.uint8)
    ma[5, 4:-4, 4:-4] = ADEGEO.TRANSFER_FS
    ma[6, 4:-4, 4:-4] = ADEGEO.TRANSFER_SF
    records = []

    class Capture(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    h = Capture(level=logging.WARNING)
    logging.getLogger("tnl_lbm_tpu.main").addHandler(h)
    try:
        sim = run(ma, "ck_transfer")
    finally:
        logging.getLogger("tnl_lbm_tpu.main").removeHandler(h)
    assert sim.coupled_kernel == "two-kernel"
    assert any("TWO-kernel" in m for m in records)


@pytest.mark.slow
def test_coupled_checkpoint_resume_preserves_scalar(tmp_path):
    """Checkpoint/resume must restore the ADE lattice too (the reference
    saves all DF buffers, state.hpp:677-727)."""
    from tnl_lbm_tpu.ops import collision as col3
    from tnl_lbm_tpu.sim.coupled import CoupledSimulation

    n = 16
    units = Lattice(global_size=(n, 8, 8), phys_origin=(0, 0, 0), phys_dl=1.0, phys_dt=1.0,
                    phys_viscosity=0.02)
    nse_dom = Domain(lat=D3Q27, units=units, map=np.zeros((n, 8, 8), np.uint8), periodic=(True,) * 3)
    ade_dom = Domain(lat=D3Q7, units=units, map=np.zeros((n, 8, 8), np.uint8), periodic=(True,) * 3)
    cfg = LBMConfig(lat=D3Q27, collision=col3.collide_cum, compute_dtype=jnp.float64)
    ade_cfg = LBMConfig(lat=D3Q7, collision=ade.collide_clbm_ade, compute_dtype=jnp.float64)

    class Sim(CoupledSimulation):
        def body_force(self, t):
            return np.array([1e-5, 0.0, 0.0])

        def initial_phi(self):
            return gaussian_phi(n)[:, :8, :8] * 1.0

    sim = Sim(cfg, nse_dom, ade_cfg, ade_dom, ade_diffusion=0.01,
              sim_id="ck", results_parent=tmp_path, phys_final_time=1e9)
    assert sim.can_compute()
    sim.sim_init()
    sim._advance(5)
    sim.save_state()
    g0 = np.asarray(sim.g)
    phi0 = np.asarray(sim.phi)
    sim._lock.release()

    sim2 = Sim(cfg, nse_dom, ade_cfg, ade_dom, ade_diffusion=0.01,
               sim_id="ck", results_parent=tmp_path, phys_final_time=1e9)
    assert sim2.can_compute()
    sim2.sim_init()
    np.testing.assert_allclose(np.asarray(sim2.g), g0)
    np.testing.assert_allclose(np.asarray(sim2.phi), phi0)
    assert sim2.iterations == 5
    sim2._lock.release()


def test_variable_diffusion_field():
    """Per-site diffusion coefficient (reference ADE_Data variable
    diffusion, lbm_data.h:133-165): two independent halves of a periodic
    domain diffuse at their own rates."""
    n = 64
    units = Lattice(global_size=(n, 8, 8), phys_origin=(0, 0, 0), phys_dl=1.0, phys_dt=1.0)
    dom = Domain(lat=D3Q7, units=units, map=np.zeros((n, 8, 8), np.uint8), periodic=(True,) * 3)
    cfg = LBMConfig(lat=D3Q7, collision=ade.collide_mrt_ade, compute_dtype=jnp.float64)
    step = make_ade_step(cfg, dom)

    # delta spikes at the center of each z-half; diffusion along z differs
    # per half via the nu field (blocks are far apart along x? use x-halves)
    phi0 = np.zeros((n, 8, 8))
    phi0[n // 4] = 1.0          # spike in half A (slow)
    phi0[3 * n // 4] = 1.0      # spike in half B (fast)
    u0 = jnp.zeros((3, n, 8, 8))
    g = cfg.eq(D3Q7, jnp.asarray(phi0), u0)

    D_slow, D_fast = 0.01, 0.1
    nu_field = np.full((n, 8, 8), D_slow)
    nu_field[n // 2 :] = D_fast
    nu_field = jnp.asarray(nu_field)

    for _ in range(60):
        g, phi = step(g, u0, nu_field)
    phi = np.asarray(phi)[:, 0, 0]

    def var_around(center):
        idx = (np.arange(n) - center + n // 2) % n - n // 2
        sel = np.abs(idx) < n // 4
        w = phi[(center + idx[sel]) % n]
        return float((w * idx[sel] ** 2).sum() / w.sum())

    v_slow = var_around(n // 4)
    v_fast = var_around(3 * n // 4)
    # var = 2 D t for 1D diffusion; ratio should track D ratio
    assert v_fast > 4 * v_slow, (v_slow, v_fast)
    assert np.isclose(v_slow, 2 * D_slow * 60, rtol=0.15), v_slow
    assert np.isclose(v_fast, 2 * D_fast * 60, rtol=0.15), v_fast


@pytest.mark.slow
def test_single_coupled_kernel_matches_two_kernel_path():
    """ONE NSE+ADE kernel (fused_coupled.py, reference kernels.h:102-176)
    == the two-kernel fused path, incl. transfer BCs + variable diffusion."""
    from tnl_lbm_tpu.kernels.fused import make_fused_step
    from tnl_lbm_tpu.kernels.fused_ade import make_fused_ade_step
    from tnl_lbm_tpu.kernels.fused_coupled import make_fused_coupled_step
    from tnl_lbm_tpu.ops import collision as col3
    from tnl_lbm_tpu.ops.boundary import GEO

    X, Y, Z = 16, 16, 16
    mn = np.zeros((X, Y, Z), np.uint8)
    mn[:, 0] = mn[:, -1] = GEO.WALL
    ma = np.zeros((X, Y, Z), np.uint8)
    ma[:, 0] = ma[:, -1] = ADEGEO.WALL
    ma[6:10, 4:-4, 4:-4] = ADEGEO.SOLID
    ma[5, 4:-4, 4:-4] = ADEGEO.TRANSFER_FS
    ma[6, 4:-4, 4:-4] = ADEGEO.TRANSFER_SF
    units = Lattice(global_size=(X, Y, Z), phys_origin=(0, 0, 0), phys_dl=1.0, phys_dt=1.0)
    nse_dom = Domain(lat=D3Q27, units=units, map=mn, periodic=(True, False, False))
    ade_dom = Domain(lat=D3Q7, units=units, map=ma, periodic=(True, False, False))
    cfg = LBMConfig(lat=D3Q27, collision=col3.collide_cum_well, eq=eqlib.eq_well,
                    well=True, compute_dtype=jnp.float32)
    ade_cfg = LBMConfig(lat=D3Q7, collision=ade.collide_clbm_ade,
                        compute_dtype=jnp.float32)

    rng = np.random.default_rng(17)
    nu_field = jnp.asarray(0.01 + 0.02 * rng.random((X, Y, Z)), jnp.float32)
    tcoef = 0.3
    force = jnp.asarray([1e-5, 0, 0], jnp.float32)

    nse_step = make_fused_step(cfg, nse_dom, tile=(8, 8))
    ade_step = make_fused_ade_step(ade_cfg, ade_dom, tile=(8, 8),
                                   variable_diffusion=True, transfer_coeff=tcoef)
    one = make_fused_coupled_step(cfg, nse_dom, ade_cfg, ade_dom, tile=(8, 8),
                                  tiles_per_program=1,
                                  variable_diffusion=True, transfer_coeff=tcoef)

    rho0 = jnp.asarray(1 + 0.01 * rng.standard_normal((X, Y, Z)), jnp.float32)
    u0 = jnp.asarray(0.02 * rng.standard_normal((3, X, Y, Z)), jnp.float32)
    f = cfg.eq(cfg.lat, rho0, u0).astype(jnp.float32)
    phi0 = jnp.asarray(rng.random((X, Y, Z)), jnp.float32)
    g = ade_cfg.eq(ade_cfg.lat, phi0, u0).astype(jnp.float32)

    f1, g1 = f, g
    f2, g2 = f, g
    for _ in range(3):
        f1, rho1, u1 = nse_step(f1, 0.02, force=force)
        g1, phi1 = ade_step(g1, u1, nu_field)
        f2, g2, rho2, u2, phi2 = one(f2, g2, 0.02, nu_field, force=force)
    assert float(jnp.abs(f1 - f2).max()) < 1e-6
    assert float(jnp.abs(g1 - g2).max()) < 1e-6
    assert float(jnp.abs(phi1 - phi2).max()) < 1e-6
    assert float(jnp.abs(u1 - u2).max()) < 1e-6


def test_sharded_coupled_matches_single_device(tmp_path):
    """Distributed dual-lattice NSE+ADE (reference multi-GPU State_NSE_ADE):
    CoupledSimulation on a 4x2 mesh == single-device run, incl. conjugate
    transfer BCs."""
    import jax

    from tnl_lbm_tpu.ops import collision as col3
    from tnl_lbm_tpu.sim.coupled import CoupledSimulation

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from jax.sharding import Mesh

    from tnl_lbm_tpu.parallel.sharded import ShardPlan

    X, Y, Z = 16, 16, 8
    units = Lattice(global_size=(X, Y, Z), phys_origin=(0, 0, 0),
                    phys_dl=1.0, phys_dt=1.0, phys_viscosity=0.02)
    mn = np.zeros((X, Y, Z), np.uint8)
    ma = np.zeros((X, Y, Z), np.uint8)
    ma[6:10, 4:-4, :] = ADEGEO.SOLID
    ma[5, 4:-4, :] = ADEGEO.TRANSFER_FS
    ma[6, 4:-4, :] = ADEGEO.TRANSFER_SF
    nse_dom = Domain(lat=D3Q27, units=units, map=mn, periodic=(True,) * 3)
    ade_dom = Domain(lat=D3Q7, units=units, map=ma, periodic=(True,) * 3)
    cfg = LBMConfig(lat=D3Q27, collision=col3.collide_cum_well,
                    eq=eqlib.eq_well, well=True, compute_dtype=jnp.float32)
    ade_cfg = LBMConfig(lat=D3Q7, collision=ade.collide_clbm_ade,
                        compute_dtype=jnp.float32)

    class Sim(CoupledSimulation):
        def body_force(self, t):
            return np.array([1e-4, 0.0, 0.0])

        def initial_phi(self):
            x = np.zeros((X, Y, Z), np.float32)
            x[2:6] = 1.0
            return jnp.asarray(x)

    def run(plan, tag, fused=False, expect_kernel=None):
        sim = Sim(cfg, nse_dom, ade_cfg, ade_dom,
                  ade_diffusion=5e-3, transfer_coeff=0.3,
                  sim_id=f"coupshard_{tag}", results_parent=tmp_path,
                  phys_final_time=4.0, plan=plan, use_fused=fused)
        sim.sim_init()
        if expect_kernel is not None:
            assert sim.coupled_kernel == expect_kernel
        sim._advance(4)
        return (np.asarray(jax.device_get(sim.f)),
                np.asarray(jax.device_get(sim.g)),
                np.asarray(jax.device_get(sim.phi)))

    f1, g1, phi1 = run(None, "single")
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2), ("x", "y"))
    plan = ShardPlan(mesh=mesh, spatial_axes=("x", "y", None))
    fN, gN, phiN = run(plan, "mesh42", expect_kernel="sharded")
    assert float(np.abs(f1 - fN).max()) < 5e-6
    assert float(np.abs(g1 - gN).max()) < 5e-6
    assert float(np.abs(phi1 - phiN).max()) < 5e-6
    # round 3: use_fused picks the sharded Pallas ADE kernel (and the
    # fused NSE step) - same physics, incl. the conjugate transfer BCs
    fF, gF, phiF = run(plan, "mesh42f", fused=True,
                       expect_kernel="sharded-fused")
    assert float(np.abs(f1 - fF).max()) < 5e-6
    assert float(np.abs(g1 - gF).max()) < 5e-6
    assert float(np.abs(phi1 - phiF).max()) < 5e-6


@pytest.mark.slow
def test_coupled_aa_pair_matches_xla():
    """A-A coupled kernels (even + odd, both lattices per dispatch) == the
    XLA coupled A-A steps."""
    from tnl_lbm_tpu.kernels.fused_coupled import make_fused_coupled_step_aa
    from tnl_lbm_tpu.ops import collision as col3
    from tnl_lbm_tpu.ops.boundary import GEO
    from tnl_lbm_tpu.sim import make_step

    X, Y, Z = 8, 16, 8
    mn = np.zeros((X, Y, Z), np.uint8)
    mn[:, 0] = mn[:, -1] = GEO.WALL
    ma = np.zeros((X, Y, Z), np.uint8)
    ma[:, 0] = ma[:, -1] = ADEGEO.WALL
    ma[4, 8, 4] = ADEGEO.NOTHING
    units = Lattice(global_size=(X, Y, Z), phys_origin=(0, 0, 0), phys_dl=1.0, phys_dt=1.0)
    nse_dom = Domain(lat=D3Q27, units=units, map=mn, periodic=(True, False, True))
    ade_dom = Domain(lat=D3Q7, units=units, map=ma, periodic=(True, False, True))
    cfg = LBMConfig(lat=D3Q27, collision=col3.collide_cum_well, eq=eqlib.eq_well,
                    well=True, streaming="AA", compute_dtype=jnp.float32)
    ade_cfg = LBMConfig(lat=D3Q7, collision=ade.collide_clbm_ade,
                        streaming="AA", compute_dtype=jnp.float32)

    rng = np.random.default_rng(29)
    nu_field = jnp.asarray(0.01 + 0.02 * rng.random((X, Y, Z)), jnp.float32)
    force = jnp.asarray([1e-5, 0, 0], jnp.float32)

    nse_ref = make_step(cfg, nse_dom)
    ade_ref = make_ade_step(ade_cfg, ade_dom)
    pair = make_fused_coupled_step_aa(cfg, nse_dom, ade_cfg, ade_dom,
                                      tile_even=(8, 8), tile_odd=(8, 8),
                                      tiles_per_program=1,
                                      variable_diffusion=True)

    rho0 = jnp.asarray(1 + 0.01 * rng.standard_normal((X, Y, Z)), jnp.float32)
    u0 = jnp.asarray(0.02 * rng.standard_normal((3, X, Y, Z)), jnp.float32)
    f1 = f2 = cfg.eq(cfg.lat, rho0, u0).astype(jnp.float32)
    phi0 = jnp.asarray(rng.random((X, Y, Z)), jnp.float32)
    g1 = g2 = ade_cfg.eq(ade_cfg.lat, phi0, u0).astype(jnp.float32)

    for it in range(4):
        par = it % 2
        f1, rho1, u1 = nse_ref(f1, 0.02, force=force, parity=par)
        g1, phi1 = ade_ref(g1, u1, nu_field, parity=par)
        f2, g2, rho2, u2, phi2 = pair(f2, g2, 0.02, nu_field, force=force,
                                      parity=par)
        assert float(jnp.abs(f1 - f2).max()) < 1e-6, f"step {it} (f)"
        assert float(jnp.abs(g1 - g2).max()) < 1e-6, f"step {it} (g)"
    assert float(jnp.abs(u1 - u2).max()) < 1e-6
    assert float(jnp.abs(phi1 - phi2).max()) < 1e-6
