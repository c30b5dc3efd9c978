"""Pallas fused kernel == XLA reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tnl_lbm_tpu.kernels.fused import make_fused_step, supports
from tnl_lbm_tpu.models import D3Q27
from tnl_lbm_tpu.ops import collision as col
from tnl_lbm_tpu.ops import equilibrium as eqlib
from tnl_lbm_tpu.ops.boundary import GEO
from tnl_lbm_tpu.sim import Domain, LBMConfig, make_step
from tnl_lbm_tpu.utils import Lattice


def duct_domain(X=8, Y=16, Z=8):
    m = np.zeros((X, Y, Z), np.uint8)
    m[:, 0] = m[:, -1] = GEO.WALL
    m[:, :, 0] = m[:, :, -1] = GEO.WALL
    units = Lattice((X, Y, Z), (0, 0, 0), 1.0, 1.0)
    return Domain(lat=D3Q27, units=units, map=m, periodic=(True, False, False))


def rand_f(dom, cfg, seed=0):
    rng = np.random.default_rng(seed)
    rho = jnp.asarray(1 + 0.01 * rng.standard_normal(dom.shape), jnp.float32)
    u = jnp.asarray(0.02 * rng.standard_normal((3,) + dom.shape), jnp.float32)
    return cfg.eq(cfg.lat, rho, u).astype(cfg.compute_dtype)


def _collide_kbc_n1(lat, f, rho, u, nu, force=None):
    from tnl_lbm_tpu.ops.collision_kbc import collide_kbc

    return collide_kbc(lat, f, rho, u, nu, force=force, variant="N1")


@pytest.mark.parametrize(
    "collision,eq,well",
    [
        (col.collide_cum_well, eqlib.eq_well, True),
        pytest.param(col.collide_cum, eqlib.eq_quadratic, False,
                     marks=pytest.mark.slow),
        # every other operator family dispatches through the same
        # cfg.collision call inside the kernel - one representative each
        pytest.param(_collide_kbc_n1, eqlib.eq_quadratic, False,
                     marks=pytest.mark.slow),
        pytest.param(col.collide_mrt_les, eqlib.eq_quadratic, False,
                     marks=pytest.mark.slow),
        pytest.param(col.collide_clbm_well, eqlib.eq_well, True,
                     marks=pytest.mark.slow),
    ],
    ids=["CUM_WELL", "CUM", "KBC_N1", "MRT_LES", "CLBM_WELL"],
)
def test_fused_matches_xla_step_duct(collision, eq, well):
    dom = duct_domain()
    cfg = LBMConfig(lat=D3Q27, collision=collision, eq=eq, well=well)
    assert supports(dom)
    step_ref = make_step(cfg, dom)
    step_fused = make_fused_step(cfg, dom, tile=(8, 8))
    f = rand_f(dom, cfg)
    force = jnp.asarray([1e-5, 0, 0], jnp.float32)
    f1, rho1, u1 = step_ref(f, 0.02, force=force)
    f2, rho2, u2 = step_fused(f, 0.02, force=force)
    assert float(jnp.abs(f1 - f2).max()) < 1e-6
    assert float(jnp.abs(rho1 - rho2).max()) < 2e-6
    assert float(jnp.abs(u1 - u2).max()) < 1e-6


def test_fused_matches_xla_with_high_precision_rho():
    """LBMConfig.high_precision_rho reaches BOTH the XLA moments and the
    in-kernel Pallas Neumaier sum (reference USE_HIGH_PRECISION_RHO,
    d3q27/common.h:19-28) - the paths must still agree bitwise-tightly."""
    dom = duct_domain()
    cfg = LBMConfig(lat=D3Q27, collision=col.collide_cum,
                    eq=eqlib.eq_quadratic, high_precision_rho=True)
    step_ref = make_step(cfg, dom)
    step_fused = make_fused_step(cfg, dom, tile=(8, 8))
    f = rand_f(dom, cfg)
    f1, rho1, u1 = step_ref(f, 0.02)
    f2, rho2, u2 = step_fused(f, 0.02)
    assert float(jnp.abs(f1 - f2).max()) < 1e-6
    assert float(jnp.abs(rho1 - rho2).max()) < 2e-6
    # and the flag changes the f32 sum where compensation matters: a
    # deliberately ill-conditioned DF set sums differently without it
    from tnl_lbm_tpu.ops import moments as mom

    rng = np.random.default_rng(3)
    bad = jnp.asarray(
        np.stack([np.full(dom.shape, (-1.0) ** q * 0.3, np.float32)
                  + 1e-7 * rng.standard_normal(dom.shape).astype(np.float32)
                  for q in range(27)]))
    exact = np.asarray(jnp.sum(bad.astype(jnp.float64), axis=0))
    err_hp = np.abs(np.asarray(
        mom.density(D3Q27, bad, high_precision=True)) - exact).max()
    err_plain = np.abs(np.asarray(
        mom.density(D3Q27, bad, high_precision=False)) - exact).max()
    assert err_hp <= err_plain


def test_fused_channel_with_inflow_outflow():
    X, Y, Z = 8, 8, 8
    m = np.zeros((X, Y, Z), np.uint8)
    m[:, 0] = m[:, -1] = GEO.WALL
    m[:, :, 0] = m[:, :, -1] = GEO.WALL
    m[0, 1:-1, 1:-1] = GEO.INFLOW_LEFT
    m[-1, 1:-1, 1:-1] = GEO.OUTFLOW_RIGHT
    units = Lattice((X, Y, Z), (0, 0, 0), 1.0, 1.0)
    dom = Domain(lat=D3Q27, units=units, map=m)
    cfg = LBMConfig(lat=D3Q27, collision=col.collide_cum, eq=eqlib.eq_inv_cum)
    step_ref = make_step(cfg, dom)
    step_fused = make_fused_step(cfg, dom, tile=(8, 8))
    f = rand_f(dom, cfg, seed=3)
    u_in = jnp.asarray([0.03, 0.0, 0.0], jnp.float32)
    f1 = f
    f2 = f
    for _ in range(2):
        f1, rho1, u1 = step_ref(f1, 0.02, u_in=u_in)
        f2, rho2, u2 = step_fused(f2, 0.02, u_in=u_in)
    assert float(jnp.abs(f1 - f2).max()) < 1e-6
    assert float(jnp.abs(u1 - u2).max()) < 1e-6


def test_fused_rejects_unsupported_codes():
    dom = duct_domain()
    dom.map[3, 3, 3] = GEO.FLUID_NEAR_WALL
    cfg = LBMConfig(lat=D3Q27, collision=col.collide_cum)
    assert not supports(dom)
    with pytest.raises(NotImplementedError):
        make_fused_step(cfg, dom)


def test_fused_aa_rejects_interp_outflow():
    """OUTFLOW_RIGHT_INTERP is A-B only (sim/step.py:64), in the fused
    kernels too."""
    from tnl_lbm_tpu.kernels.fused_aa import make_fused_step_aa

    dom = duct_domain()
    dom.map[-1, 3:-3, 3:-3] = GEO.OUTFLOW_RIGHT_INTERP
    assert supports(dom) and not supports(dom, "AA")
    cfg = LBMConfig(lat=D3Q27, collision=col.collide_cum, streaming="AA")
    with pytest.raises(NotImplementedError):
        make_fused_step_aa(cfg, dom)


@pytest.mark.slow
def test_fused_interp_outflow_matches_xla():
    """sim_2/sim_3-style channel: moment inflow + Geier interpolated
    outflow on the fused path (reference streaming_AB.h:209-242,
    bc.h:138-143)."""
    X, Y, Z = 16, 8, 8
    m = np.zeros((X, Y, Z), np.uint8)
    m[:, 0] = m[:, -1] = GEO.WALL
    m[:, :, 0] = m[:, :, -1] = GEO.WALL
    m[0, 1:-1, 1:-1] = GEO.INFLOW_LEFT
    m[-1, 1:-1, 1:-1] = GEO.OUTFLOW_RIGHT_INTERP
    units = Lattice((X, Y, Z), (0, 0, 0), 1.0, 1.0)
    dom = Domain(lat=D3Q27, units=units, map=m)
    for cfg in (
        LBMConfig(lat=D3Q27, collision=col.collide_cum, eq=eqlib.eq_inv_cum),
        LBMConfig(lat=D3Q27, collision=col.collide_cum_well, eq=eqlib.eq_well,
                  well=True),
    ):
        step_ref = make_step(cfg, dom)
        step_fused = make_fused_step(cfg, dom, tile=(8, 8))
        u_in = jnp.asarray([0.03, 0.0, 0.0], jnp.float32)
        f1 = f2 = rand_f(dom, cfg, seed=31)
        for it in range(3):
            f1, rho1, u1 = step_ref(f1, 0.02, u_in=u_in)
            f2, rho2, u2 = step_fused(f2, 0.02, u_in=u_in)
            assert float(jnp.abs(f1 - f2).max()) < 1e-6, f"step {it}"
        assert float(jnp.abs(rho1 - rho2).max()) < 2e-6
        assert float(jnp.abs(u1 - u2).max()) < 1e-6


@pytest.mark.parametrize("periodic", [
    pytest.param((True, True, True), marks=pytest.mark.slow),
    pytest.param((True, False, False), marks=pytest.mark.slow)],
    ids=["torus", "duct"])
def test_fused_aa_pair_matches_xla_aa(periodic):
    from tnl_lbm_tpu.kernels.fused_aa import make_fused_step_aa

    X, Y, Z = 8, 16, 8
    m = np.zeros((X, Y, Z), np.uint8)
    if not periodic[1]:
        m[:, 0] = m[:, -1] = GEO.WALL
        m[:, :, 0] = m[:, :, -1] = GEO.WALL
        m[5, 5, 5] = GEO.NOTHING
    units = Lattice((X, Y, Z), (0, 0, 0), 1.0, 1.0)
    dom = Domain(lat=D3Q27, units=units, map=m, periodic=periodic)
    cfg = LBMConfig(lat=D3Q27, collision=col.collide_cum_well, eq=eqlib.eq_well,
                    well=True, streaming="AA")
    step_ref = make_step(cfg, dom)
    step_aa = make_fused_step_aa(cfg, dom, tile_even=(8, 8), tile_odd=(8, 8))
    f1 = f2 = rand_f(dom, cfg, seed=5)
    force = jnp.asarray([1e-5, 0, 0], jnp.float32)
    for it in range(4):
        f1, rho1, u1 = step_ref(f1, 0.02, force=force, parity=it % 2)
        f2, rho2, u2 = step_aa(f2, 0.02, force=force, parity=it % 2)
        assert float(jnp.abs(f1 - f2).max()) < 1e-6, f"step {it}"
    assert float(jnp.abs(rho1 - rho2).max()) < 2e-6
    assert float(jnp.abs(u1 - u2).max()) < 1e-6


@pytest.mark.slow
def test_fused_aa_channel_inflow_outflow():
    from tnl_lbm_tpu.kernels.fused_aa import make_fused_step_aa

    X, Y, Z = 8, 8, 8
    m = np.zeros((X, Y, Z), np.uint8)
    m[:, 0] = m[:, -1] = GEO.WALL
    m[:, :, 0] = m[:, :, -1] = GEO.WALL
    m[0, 1:-1, 1:-1] = GEO.INFLOW_LEFT
    m[-1, 1:-1, 1:-1] = GEO.OUTFLOW_RIGHT
    units = Lattice((X, Y, Z), (0, 0, 0), 1.0, 1.0)
    dom = Domain(lat=D3Q27, units=units, map=m)
    cfg = LBMConfig(lat=D3Q27, collision=col.collide_cum, eq=eqlib.eq_inv_cum,
                    streaming="AA")
    step_ref = make_step(cfg, dom)
    step_aa = make_fused_step_aa(cfg, dom, tile_even=(8, 8), tile_odd=(8, 8))
    u_in = jnp.asarray([0.03, 0.0, 0.0], jnp.float32)
    f1 = f2 = rand_f(dom, cfg, seed=7)
    for it in range(2):
        f1, rho1, u1 = step_ref(f1, 0.02, u_in=u_in, parity=it % 2)
        f2, rho2, u2 = step_aa(f2, 0.02, u_in=u_in, parity=it % 2)
        assert float(jnp.abs(f1 - f2).max()) < 1e-6, f"step {it}"
    assert float(jnp.abs(u1 - u2).max()) < 1e-6


@pytest.mark.parametrize("periodic", [(True, True, True), (True, False, False)],
                         ids=["torus", "duct"])
@pytest.mark.slow
def test_fused_pair_aa_matches_xla(periodic):
    """Persistent-pad pair (even writes the odd kernel's padded layout
    directly) == two XLA A-A steps."""
    from tnl_lbm_tpu.kernels.fused_aa import make_fused_pair_aa

    X, Y, Z = 16, 16, 16
    m = np.zeros((X, Y, Z), np.uint8)
    if not periodic[1]:
        m[:, 0] = m[:, -1] = GEO.WALL
        m[:, :, 0] = m[:, :, -1] = GEO.WALL
    units = Lattice((X, Y, Z), (0, 0, 0), 1.0, 1.0)
    dom = Domain(lat=D3Q27, units=units, map=m, periodic=periodic)
    cfg = LBMConfig(lat=D3Q27, collision=col.collide_cum_well, eq=eqlib.eq_well,
                    well=True, streaming="AA")
    step_ref = make_step(cfg, dom)
    pair = make_fused_pair_aa(cfg, dom, tile_even=(8, 8), k_even=2,
                              tile_odd=(8, 8), k_odd=1)
    f1 = f2 = rand_f(dom, cfg, seed=9)
    force = jnp.asarray([1e-5, 0, 0], jnp.float32)
    for it in range(4):
        f1, rho1, u1 = step_ref(f1, 0.02, force=force, parity=it % 2)
    for _ in range(2):
        f2, rho2, u2 = pair(f2, 0.02, force=force)
    assert float(jnp.abs(f1 - f2).max()) < 1e-6
    assert float(jnp.abs(rho1 - rho2).max()) < 2e-6
    assert float(jnp.abs(u1 - u2).max()) < 1e-6


@pytest.mark.parametrize("periodic", [(True, True, True), (True, False, False)],
                         ids=["torus", "duct"])
@pytest.mark.slow
def test_fused_pair2_aa_matches_xla(periodic):
    """One-kernel pair on persistent-padded state == two XLA A-A steps."""
    from tnl_lbm_tpu.kernels.fused_aa import (
        from_padded_aa, make_fused_pair2_aa, to_padded_aa,
    )

    X, Y, Z = 16, 16, 16
    m = np.zeros((X, Y, Z), np.uint8)
    if not periodic[1]:
        m[:, 0] = m[:, -1] = GEO.WALL
        m[:, :, 0] = m[:, :, -1] = GEO.WALL
        m[4, 4, 4] = GEO.NOTHING
    units = Lattice((X, Y, Z), (0, 0, 0), 1.0, 1.0)
    dom = Domain(lat=D3Q27, units=units, map=m, periodic=periodic)
    cfg = LBMConfig(lat=D3Q27, collision=col.collide_cum_well, eq=eqlib.eq_well,
                    well=True, streaming="AA")
    step_ref = make_step(cfg, dom)
    pair2 = make_fused_pair2_aa(cfg, dom, tile=(8, 8))
    f1 = rand_f(dom, cfg, seed=13)
    force = jnp.asarray([1e-5, 0, 0], jnp.float32)
    fp = to_padded_aa(f1, dom.periodic)
    for it in range(4):
        f1, rho1, u1 = step_ref(f1, 0.02, force=force, parity=it % 2)
    for _ in range(2):
        fp, rho2, u2 = pair2(fp, 0.02, force=force)
    f2 = from_padded_aa(fp)
    assert float(jnp.abs(f1 - f2).max()) < 1e-6
    assert float(jnp.abs(rho1 - rho2).max()) < 2e-6
    assert float(jnp.abs(u1 - u2).max()) < 1e-6


@pytest.mark.slow
def test_sitemajor_kernel_matches_xla_step():
    from tnl_lbm_tpu.kernels.fused import from_sitemajor, make_fused_step_sitemajor, to_sitemajor

    dom = duct_domain()
    cfg = LBMConfig(lat=D3Q27, collision=col.collide_cum_well, eq=eqlib.eq_well, well=True)
    step_ref = make_step(cfg, dom)
    step_sm = make_fused_step_sitemajor(cfg, dom, tile=(8, 8))
    f = rand_f(dom, cfg)
    force = jnp.asarray([1e-5, 0, 0], jnp.float32)
    f1, rho1, u1 = step_ref(f, 0.02, force=force)
    fs2, rho2, u2 = step_sm(to_sitemajor(f), 0.02, force=force)
    f2 = from_sitemajor(fs2, 27)
    assert float(jnp.abs(f1 - f2).max()) < 1e-6
    assert float(jnp.abs(rho1 - rho2).max()) < 2e-6
    # round-trip of the layout transforms
    assert float(jnp.abs(from_sitemajor(to_sitemajor(f), 27) - f).max()) == 0.0


@pytest.mark.parametrize("streaming", [
    pytest.param("AB", marks=pytest.mark.slow),
    pytest.param("AA", marks=pytest.mark.slow)])
def test_hooked_fused_matches_xla(streaming):
    """Forcing-hook configs on the fused path (u* pass + force-field
    kernel, kernels/hooked.py) == the hooked XLA step."""
    from tnl_lbm_tpu.kernels.hooked import make_hooked_fused_step

    def hook(lat, rho, u, nu, fluid):
        # velocity-dependent per-site force (IBM/non-Newtonian stand-in)
        return jnp.where(fluid, -0.01 * u * rho, jnp.zeros_like(u))

    dom = duct_domain()
    cfg = LBMConfig(lat=D3Q27, collision=col.collide_cum_well, eq=eqlib.eq_well,
                    well=True, streaming=streaming, forcing_hook=hook)
    step_ref = make_step(cfg, dom)
    step_fused = make_hooked_fused_step(
        cfg, dom, **({"tile": (8, 8)} if streaming == "AB"
                     else {"tile_even": (8, 8), "tile_odd": (8, 8)}))
    f1 = f2 = rand_f(dom, cfg, seed=21)
    force = jnp.asarray([1e-5, 0, 0], jnp.float32)
    for it in range(4):
        f1, rho1, u1 = step_ref(f1, 0.02, force=force, parity=it % 2)
        f2, rho2, u2 = step_fused(f2, 0.02, force=force, parity=it % 2)
        assert float(jnp.abs(f1 - f2).max()) < 1e-6, f"step {it}"
    assert float(jnp.abs(rho1 - rho2).max()) < 2e-6
    assert float(jnp.abs(u1 - u2).max()) < 1e-6


@pytest.mark.slow
def test_hooked_fused_nn_rheology():
    """Non-Newtonian Carreau-Yasuda forcing hook rides the fused path."""
    from tnl_lbm_tpu.kernels.hooked import make_hooked_fused_step
    from tnl_lbm_tpu.ops.non_newtonian import CarreauYasuda, make_nn_forcing_hook

    dom = duct_domain()
    model = CarreauYasuda(nu0=0.1, lam=1.0, a=2.0, n=0.5)
    cfg = LBMConfig(lat=D3Q27, collision=col.collide_cum_well, eq=eqlib.eq_well,
                    well=True, forcing_hook=make_nn_forcing_hook(model))
    step_ref = make_step(cfg, dom)
    step_fused = make_hooked_fused_step(cfg, dom, tile=(8, 8))
    f1 = f2 = rand_f(dom, cfg, seed=23)
    force = jnp.asarray([1e-5, 0, 0], jnp.float32)
    for _ in range(3):
        f1, rho1, u1 = step_ref(f1, 0.02, force=force)
        f2, rho2, u2 = step_fused(f2, 0.02, force=force)
    assert float(jnp.abs(f1 - f2).max()) < 1e-6
    assert float(jnp.abs(u1 - u2).max()) < 1e-6


def test_fused_aa_srt_fast_parity():
    """Fast-tier A-A kernel mechanics (even opposite-write, odd
    ring-recompute push, walls + NOTHING): the streaming/push logic is
    operator-independent, so SRT keeps the interpret-mode compile cheap;
    the cumulant A-A variants run in the slow tier.  BGK (factorized,
    constant-free) is the cheapest Pallas-safe operator - SRT captures a
    [Q] weight constant, which pallas_call rejects."""
    from tnl_lbm_tpu.kernels.fused_aa import make_fused_step_aa

    X, Y, Z = 8, 16, 8
    m = np.zeros((X, Y, Z), np.uint8)
    m[:, 0] = m[:, -1] = GEO.WALL
    m[5, 5, 5] = GEO.NOTHING
    units = Lattice((X, Y, Z), (0, 0, 0), 1.0, 1.0)
    dom = Domain(lat=D3Q27, units=units, map=m, periodic=(True, False, True))
    cfg = LBMConfig(lat=D3Q27, collision=col.collide_bgk, streaming="AA")
    step_ref = make_step(cfg, dom)
    step_aa = make_fused_step_aa(cfg, dom, tile_even=(8, 8), tile_odd=(8, 8))
    f1 = f2 = rand_f(dom, cfg, seed=19)
    force = jnp.asarray([1e-5, 0, 0], jnp.float32)
    for it in range(2):
        f1, rho1, u1 = step_ref(f1, 0.02, force=force, parity=it % 2)
        f2, rho2, u2 = step_aa(f2, 0.02, force=force, parity=it % 2)
        assert float(jnp.abs(f1 - f2).max()) < 1e-6, f"step {it}"
    assert float(jnp.abs(u1 - u2).max()) < 1e-6


@pytest.mark.slow
def test_fused_kbc_entropic_matches_xla():
    """KBC + entropic equilibrium on the fused path: the in-kernel entropic
    eq (sqrt product form) must drive INFLOW/OUTFLOW_EQ sites exactly like
    the XLA step."""
    from tnl_lbm_tpu.ops.collision_kbc import COLLISIONS_KBC

    X, Y, Z = 8, 8, 8
    m = np.zeros((X, Y, Z), np.uint8)
    m[:, 0] = m[:, -1] = GEO.WALL
    m[0, 1:-1, :] = GEO.INFLOW
    m[-1, 1:-1, :] = GEO.OUTFLOW_EQ
    units = Lattice((X, Y, Z), (0, 0, 0), 1.0, 1.0)
    dom = Domain(lat=D3Q27, units=units, map=m, periodic=(False, False, True))
    cfg = LBMConfig(lat=D3Q27, collision=COLLISIONS_KBC["KBC_N1"],
                    eq=eqlib.eq_entropic)
    step_ref = make_step(cfg, dom)
    step_fused = make_fused_step(cfg, dom, tile=(8, 8))
    u_in = jnp.asarray([0.03, 0.0, 0.0], jnp.float32)
    f1 = f2 = rand_f(dom, cfg, seed=37)
    for it in range(2):
        f1, rho1, u1 = step_ref(f1, 0.02, u_in=u_in)
        f2, rho2, u2 = step_fused(f2, 0.02, u_in=u_in)
        assert float(jnp.abs(f1 - f2).max()) < 1e-5, f"step {it}"
    assert float(jnp.abs(u1 - u2).max()) < 1e-5


def test_autotune_cpu_returns_default(tmp_path, monkeypatch):
    """Autotuner (reference block_size_optimizer analog): CPU returns the
    default untimed; cache round-trips winners."""
    from tnl_lbm_tpu.kernels import autotune as at

    monkeypatch.setenv("TNL_AUTOTUNE_CACHE", str(tmp_path / "tune.json"))
    calls = []

    def timer(c):
        calls.append(c)
        return 1.0

    out = at.autotune("k1", [(1,), (2,)], timer, default=(9,))
    assert out == (9,) and calls == []  # CPU: untimed default
    # cache behavior is device-independent: seed a winner and read it back
    at._store({f"{at.device_kind()}|k2": [4, 8, 2]})
    assert at.autotune("k2", [], timer, default=None) == (4, 8, 2)


@pytest.mark.parametrize(
    "Z", [12, pytest.param(20, marks=pytest.mark.slow)])
def test_fused_lane_padded_z_matches_xla(Z):
    """Arbitrary Z extents on the manual-DMA kernels: the padded-lane logic
    (lane pad to the 128 multiple + clamp at the true Z, round-3 VERDICT
    item 1) exercised under interpret mode via FORCE_LANE_PAD with
    LANE shrunk to 16 so tiny lattices hit the ragged case.  SRT_WELL
    collision: the lane-pad logic is collision-agnostic and the cumulant
    trace dominates compile time (cum parity has its own tests)."""
    import dataclasses

    from tnl_lbm_tpu.kernels import fused as fused_mod
    from tnl_lbm_tpu.kernels.fused_aa import (
        from_padded_aa,
        make_fused_pair2_aa,
        make_fused_step_aa,
        to_padded_aa,
    )

    old_force, old_lane = fused_mod.FORCE_LANE_PAD, fused_mod.LANE
    fused_mod.FORCE_LANE_PAD, fused_mod.LANE = True, 16
    try:
        X, Y = 8, 8
        m = np.zeros((X, Y, Z), np.uint8)
        m[:, 0] = m[:, -1] = GEO.WALL
        m[:, :, 0] = m[:, :, -1] = GEO.WALL
        m[2, 3, 3] = GEO.NOTHING
        units = Lattice((X, Y, Z), (0, 0, 0), 1.0, 1.0)
        dom = Domain(lat=D3Q27, units=units, map=m, periodic=(True, False, False))
        cfg = LBMConfig(lat=D3Q27, collision=col.collide_srt_well,
                        eq=eqlib.eq_well, well=True)
        force = jnp.asarray([1e-5, 0, 0], jnp.float32)
        f0 = rand_f(dom, cfg)

        # A-B manual-DMA kernel
        ref = make_step(cfg, dom)
        fused = make_fused_step(cfg, dom, tile=(8, 8))
        f1, r1, u1 = ref(f0, 0.02, force=force)
        f2, r2, u2 = fused(f0, 0.02, force=force)
        assert float(jnp.abs(f1 - f2).max()) < 1e-6
        assert float(jnp.abs(u1 - u2).max()) < 1e-6

        cfa = dataclasses.replace(cfg, streaming="AA")
        ref_aa = make_step(cfa, dom)
        ref_states = []
        fa = f0
        for par in (0, 1):
            fa, ra, ua = ref_aa(fa, 0.02, force=force, parity=par)
            ref_states.append(fa)
        if Z == 20:  # slow variant: also the standalone A-A even/odd kernels
            step_aa = make_fused_step_aa(cfa, dom, tile_even=(8, 8), tile_odd=(8, 8))
            fb = f0
            for par in (0, 1):
                fb, rb, ub = step_aa(fb, 0.02, force=force, parity=par)
                assert float(jnp.abs(ref_states[par] - fb).max()) < 1e-6, f"parity {par}"
            assert float(jnp.abs(ua - ub).max()) < 1e-6

        # one-kernel pair on the lane-padded persistent state
        pair = make_fused_pair2_aa(cfa, dom, tile=(4, 8), tiles_per_program=1)
        fp = to_padded_aa(f0, dom.periodic)
        assert fp.shape[-1] == -(-Z // 16) * 16  # lanes really padded
        fp, rp, up = pair(fp, 0.02, force=force)
        f2s = from_padded_aa(fp, Z)
        assert float(jnp.abs(fa - f2s).max()) < 1e-6
        assert float(jnp.abs(ra - rp).max()) < 2e-6
        assert float(jnp.abs(ua - up).max()) < 1e-6

        # periodic-z wrap through the clamped shift
        dom_p = Domain(lat=D3Q27, units=units,
                       map=np.zeros((X, Y, Z), np.uint8), periodic=(True,) * 3)
        ref_p = make_step(cfg, dom_p)
        fused_p = make_fused_step(cfg, dom_p, tile=(8, 8))
        fp0 = rand_f(dom_p, cfg, seed=5)
        g1, *_ = ref_p(fp0, 0.02, force=force)
        g2, *_ = fused_p(fp0, 0.02, force=force)
        assert float(jnp.abs(g1 - g2).max()) < 1e-6
    finally:
        fused_mod.FORCE_LANE_PAD, fused_mod.LANE = old_force, old_lane


def test_vmem_fit_shrinks_tiles_for_large_z():
    """The VMEM-fit tile selection (round-3: lifts the Z<=256 Mosaic OOM)
    shrinks (tx, ty, K) until the estimate fits the budget."""
    from tnl_lbm_tpu.kernels.fused import _fit_tiles_vmem

    calls = []

    def bytes_fn(tx, ty, K):
        calls.append((tx, ty, K))
        return tx * ty * K * 1_000_000  # 8x32x2 -> 512 MB

    tx, ty, K = _fit_tiles_vmem(bytes_fn, (8, 32), 2, 256, 256,
                                budget_bytes=int(90e6))
    assert tx * ty * K * 1_000_000 <= int(90e6)
    assert ty % 8 == 0 and 256 % tx == 0 and 256 % (ty * K) == 0
    # and a fitting geometry is left untouched
    tx2, ty2, K2 = _fit_tiles_vmem(lambda *a: 1, (8, 32), 2, 256, 256,
                                   budget_bytes=int(90e6))
    assert (tx2, ty2, K2) == (8, 32, 2)


def test_hooked_fused_2d_matches_xla():
    """2D forcing hook (Carreau-Yasuda) rides the fused force-field kernel
    (round-3 VERDICT item 2: the reference's 2D apps accept the same
    plugin set as 3D)."""
    from tnl_lbm_tpu.kernels.hooked import make_hooked_fused_step
    from tnl_lbm_tpu.models import D2Q9
    from tnl_lbm_tpu.ops import collision_2d as col2
    from tnl_lbm_tpu.ops.non_newtonian import CarreauYasuda, make_nn_forcing_hook

    X, Y = 16, 16
    m = np.zeros((X, Y), np.uint8)
    m[:, 0] = m[:, -1] = GEO.WALL
    units = Lattice((X, Y), (0, 0), 1.0, 1.0)
    dom = Domain(lat=D2Q9, units=units, map=m, periodic=(True, False))
    model = CarreauYasuda(nu0=0.1, lam=1.0, a=2.0, n=0.5)
    cfg = LBMConfig(lat=D2Q9, collision=col2.collide_srt_2d,
                    forcing_hook=make_nn_forcing_hook(model))
    rng = np.random.default_rng(31)
    rho0 = jnp.asarray(1 + 0.01 * rng.standard_normal(dom.shape), jnp.float32)
    u0 = jnp.asarray(0.02 * rng.standard_normal((2,) + dom.shape), jnp.float32)
    f1 = f2 = cfg.eq(cfg.lat, rho0, u0).astype(jnp.float32)
    force = jnp.asarray([1e-5, 0], jnp.float32)
    step_ref = make_step(cfg, dom)
    step_fused = make_hooked_fused_step(cfg, dom)
    for _ in range(3):
        f1, rho1, u1 = step_ref(f1, 0.02, force=force)
        f2, rho2, u2 = step_fused(f2, 0.02, force=force)
    assert float(jnp.abs(f1 - f2).max()) < 1e-6
    assert float(jnp.abs(u1 - u2).max()) < 1e-6


def test_macro_only_aa_matches_xla_ustar():
    """The A-A u* pre-pass kernels (fused_aa.py macro_only=True) == the
    XLA ustar for both parities - the hook input of every A-A hooked
    config (kernels/hooked.py)."""
    from tnl_lbm_tpu.kernels.fused_aa import make_fused_step_aa

    dom = duct_domain()
    cfg = LBMConfig(lat=D3Q27, collision=col.collide_cum_well,
                    eq=eqlib.eq_well, well=True, streaming="AA")
    ref_ustar = make_step(cfg, dom).ustar
    macro = make_fused_step_aa(cfg, dom, macro_only=True)
    force = jnp.asarray([1e-5, 0, 0], jnp.float32)
    # advance a couple of real steps so the odd-parity state is genuine
    step = make_step(cfg, dom)
    f = rand_f(dom, cfg, seed=29)
    for parity in (0, 1, 0, 1):
        rho1, u1, _ = ref_ustar(f, force=force, parity=parity)
        rho2, u2 = macro(f, 0.0, force=force, parity=parity)
        assert float(jnp.abs(rho1 - rho2).max()) < 1e-6, parity
        assert float(jnp.abs(u1 - u2).max()) < 1e-6, parity
        f, _, _ = step(f, 0.02, force=force, parity=parity)


def _variant_domain(X=8, Y=32, Z=8, obstacle=False, torus=False):
    """Duct tall enough in y that interior tiles (ty=8) classify as
    z-profile tiles; optional (x, y)-varying obstacle inside one interior
    tile to force that tile back onto the generic path."""
    m = np.zeros((X, Y, Z), np.uint8)
    periodic = (True, True, True) if torus else (True, False, False)
    if not torus:
        m[:, 0] = m[:, -1] = GEO.WALL
        m[:, :, 0] = m[:, :, -1] = GEO.WALL
        m[2, 2, 2] = GEO.NOTHING
    if obstacle:
        # interior blob, varying in x AND y, placed so it pollutes the
        # consumed windows of tile rows jt=0,1 only (rows [-2,10)/[6,18)
        # at ty=8) - jt=2 stays on the z-profile fast path
        m[3:5, 9:12, 3:6] = GEO.WALL
    units = Lattice((X, Y, Z), (0, 0, 0), 1.0, 1.0)
    return Domain(lat=D3Q27, units=units, map=m, periodic=periodic)


def test_pair2_variants_match_base():
    """Round-4 HBM-traffic variants (tight congruent windows, z-profile
    map-DMA skip, int8 map) == the base pair2 bitwise in interpret mode.
    The autotuner sweeps these on-chip (kernels/autotune.py)."""
    from tnl_lbm_tpu.kernels.fused_aa import (
        from_padded_aa, make_fused_pair2_aa, to_padded_aa,
    )

    dom = _variant_domain()
    cfg = LBMConfig(lat=D3Q27, collision=col.collide_cum_well, eq=eqlib.eq_well,
                    well=True, streaming="AA")
    force = jnp.asarray([1e-5, 0, 0], jnp.float32)
    fp0 = to_padded_aa(rand_f(dom, cfg, seed=41), dom.periodic)

    base = make_fused_pair2_aa(cfg, dom, tile=(4, 8))
    fp_ref = fp0
    for _ in range(2):
        fp_ref, rho_ref, u_ref = base(fp_ref, 0.02, force=force)

    v = make_fused_pair2_aa(cfg, dom, tile=(4, 8), window="tight",
                            zprofile=True, map_mode="i8")
    # interior tiles (y-wall-free consumed windows) must take the fast path
    assert v.zprof_tiles > 0 and v.zprof_tiles < v.n_tiles
    fp = fp0
    for _ in range(2):
        fp, rho, u = v(fp, 0.02, force=force)
    Z = dom.shape[-1]
    assert float(jnp.abs(from_padded_aa(fp, Z) - from_padded_aa(fp_ref, Z)).max()) == 0.0
    assert float(jnp.abs(rho - rho_ref).max()) == 0.0
    assert float(jnp.abs(u - u_ref).max()) == 0.0


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["tight", "zprof", "i16", "tight+zprof+i8"])
@pytest.mark.parametrize("geometry", ["duct_obstacle", "torus"])
def test_pair2_variant_matrix_matches_xla(mode, geometry):
    """Each traffic variant x {obstacle duct, all-fluid torus} == two XLA
    A-A steps.  The obstacle forces one interior tile back to the generic
    (map-DMA) path; the torus classifies EVERY tile onto the z-profile
    path (no map DMA at all)."""
    from tnl_lbm_tpu.kernels.autotune import pair2_build_opts
    from tnl_lbm_tpu.kernels.fused_aa import (
        from_padded_aa, make_fused_pair2_aa, to_padded_aa,
    )

    dom = _variant_domain(obstacle=(geometry == "duct_obstacle"),
                          torus=(geometry == "torus"))
    cfg = LBMConfig(lat=D3Q27, collision=col.collide_cum_well, eq=eqlib.eq_well,
                    well=True, streaming="AA")
    step_ref = make_step(cfg, dom)
    pair2 = make_fused_pair2_aa(cfg, dom, tile=(4, 8),
                                **pair2_build_opts(mode))
    if "zprof" in mode:
        if geometry == "torus":
            assert pair2.zprof_tiles == pair2.n_tiles  # all tiles skip
        else:
            assert 0 < pair2.zprof_tiles < pair2.n_tiles
    f1 = rand_f(dom, cfg, seed=17)
    force = jnp.asarray([1e-5, 0, 0], jnp.float32)
    fp = to_padded_aa(f1, dom.periodic)
    for it in range(4):
        f1, rho1, u1 = step_ref(f1, 0.02, force=force, parity=it % 2)
    for _ in range(2):
        fp, rho2, u2 = pair2(fp, 0.02, force=force)
    f2 = from_padded_aa(fp, dom.shape[-1])
    assert float(jnp.abs(f1 - f2).max()) < 1e-6
    assert float(jnp.abs(rho1 - rho2).max()) < 2e-6
    assert float(jnp.abs(u1 - u2).max()) < 1e-6


def test_pair2_half_storage_accuracy():
    """FP16S-style half storage (round-4): DFs at rest in 16 bits, every
    arithmetic op in f32 (kernels/fused_aa.py store_dtype).  Velocity must
    stay within the storage-rounding envelope of the f32 run, and NOTHING
    sites must round-trip bit-exact (widen->narrow of an unchanged value
    is the identity)."""
    from tnl_lbm_tpu.kernels.fused_aa import (
        from_padded_aa, make_fused_pair2_aa, to_padded_aa,
    )

    dom = _variant_domain()  # duct with a NOTHING site at (2, 2, 2)
    cfg = LBMConfig(lat=D3Q27, collision=col.collide_cum_well, eq=eqlib.eq_well,
                    well=True, streaming="AA")
    force = jnp.asarray([1e-5, 0, 0], jnp.float32)
    f0 = rand_f(dom, cfg, seed=23)

    base = make_fused_pair2_aa(cfg, dom, tile=(4, 8))
    fp = to_padded_aa(f0, dom.periodic)
    for _ in range(3):
        fp, rho32, u32 = base(fp, 0.02, force=force)

    for sd, tol_u in ((jnp.float16, 2e-3), (jnp.bfloat16, 2e-2)):
        ph = make_fused_pair2_aa(cfg, dom, tile=(4, 8), store_dtype=sd)
        assert ph.store_dtype == jnp.dtype(sd)
        fph = to_padded_aa(f0, dom.periodic, store_dtype=sd)
        assert fph.dtype == jnp.dtype(sd)
        for _ in range(3):
            fph, rhoh, uh = ph(fph, 0.02, force=force)
        assert fph.dtype == jnp.dtype(sd)  # state stays narrow at rest
        assert rhoh.dtype == cfg.compute_dtype  # macro stays wide
        uh = np.asarray(uh, np.float64)
        assert np.isfinite(uh).all()
        du = np.abs(uh - np.asarray(u32, np.float64)).max()
        assert 0 < du < tol_u, (sd, du)
        # NOTHING sites keep their stored DFs bitwise across pairs
        f_site = from_padded_aa(fph, dom.shape[-1])[:, 2, 2, 2]
        want = f0[:, 2, 2, 2].astype(sd)
        assert jnp.array_equal(f_site, want)

    # half storage composes with the round-4 traffic variants
    phv = make_fused_pair2_aa(cfg, dom, tile=(4, 8), store_dtype=jnp.float16,
                              window="tight", zprofile=True, map_mode="i8")
    fph = to_padded_aa(f0, dom.periodic, store_dtype=jnp.float16)
    fph, _, uhv = phv(fph, 0.02, force=force)
    assert np.isfinite(np.asarray(uhv)).all()

    # the conditioning guard: raw (non-well) DFs refuse half storage
    cfg_raw = LBMConfig(lat=D3Q27, collision=col.collide_srt, streaming="AA")
    with pytest.raises(ValueError, match="well"):
        make_fused_pair2_aa(cfg_raw, dom, tile=(4, 8), store_dtype=jnp.float16)


@pytest.mark.parametrize("periodic", [
    (True, False, False), (True, True, True), (False, False, False),
])
def test_pair2_in_kernel_halos_match_xla_fill(periodic):
    """Round-5 in-kernel halo maintenance: edge tiles DMA their periodic
    halo images straight from the output scratch, replacing the XLA-level
    _fill_halos_pad8 (trace-measured 1.4 ms/pair of pure full-array copy
    at 256^3, ~10% of the step).  Must be BITWISE equal to the XLA fill
    over multiple pairs on every periodicity combination - including
    corners (x+y periodic) and the non-periodic don't-care halos."""
    import dataclasses

    import __graft_entry__ as ge
    from tnl_lbm_tpu.kernels.fused_aa import (
        from_padded_aa,
        make_fused_pair2_aa,
        to_padded_aa,
    )
    from tnl_lbm_tpu.sim import initial_dfs

    cfg, dom = ge._flagship((16, 16, 16), periodic=periodic)
    cfg = dataclasses.replace(cfg, streaming="AA")
    force = jnp.asarray([1e-4, 0.0, 0.0], cfg.compute_dtype)
    rng = np.random.default_rng(0)
    f0 = initial_dfs(cfg, dom)
    f0 = f0 + jnp.asarray(rng.standard_normal(f0.shape) * 1e-3,
                          cfg.compute_dtype)
    outs = {}
    for hik in (False, True):
        pair = make_fused_pair2_aa(cfg, dom, halo_in_kernel=hik)
        f = to_padded_aa(f0, dom.periodic)
        for _ in range(4):
            f, rho, u = pair(f, 0.02, force=force)
        outs[hik] = (from_padded_aa(f, 16), u)
    assert float(jnp.abs(outs[True][0] - outs[False][0]).max()) == 0.0
    assert float(jnp.abs(outs[True][1] - outs[False][1]).max()) == 0.0
