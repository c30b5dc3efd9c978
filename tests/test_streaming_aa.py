import jax.numpy as jnp
import numpy as np

from tnl_lbm_tpu.models import D3Q27
from tnl_lbm_tpu.ops import collision as col
from tnl_lbm_tpu.ops import equilibrium as eqlib
from tnl_lbm_tpu.ops import streaming as stream
from tnl_lbm_tpu.sim import Domain, LBMConfig, initial_dfs, make_step
from tnl_lbm_tpu.utils import Lattice


def periodic_box(n=6):
    units = Lattice(global_size=(n, n, n), phys_origin=(0, 0, 0), phys_dl=1.0, phys_dt=1.0)
    return Domain(lat=D3Q27, units=units, map=np.zeros((n, n, n), np.uint8), periodic=(True,) * 3)


def test_aa_equals_ab_up_to_streaming_conjugation():
    """On a periodic box the A-A pattern trajectory equals the A-B trajectory
    conjugated by one streaming: AA(2k, S f0) = S AB(2k, f0).

    Derivation: an A-B step applies collide-after-stream (C.S); the A-A even
    step applies C alone and the odd step S.C.S, so an A-A pair is
    S.C.S.C = S . (C.S)^2 . S^-1 (reference streaming_AA.h:12-116).
    """
    n = 6
    dom = periodic_box(n)
    nu = 0.05
    cfg_ab = LBMConfig(lat=D3Q27, collision=col.collide_cum, streaming="AB", compute_dtype=jnp.float64)
    cfg_aa = LBMConfig(lat=D3Q27, collision=col.collide_cum, streaming="AA", compute_dtype=jnp.float64)
    step_ab = make_step(cfg_ab, dom)
    step_aa = make_step(cfg_aa, dom)

    rng = np.random.default_rng(42)
    rho0 = jnp.asarray(1 + 0.01 * rng.standard_normal((n, n, n)))
    u0 = jnp.asarray(0.02 * rng.standard_normal((3, n, n, n)))
    f0 = eqlib.eq_quadratic(D3Q27, rho0, u0)

    def S(f):
        return stream.pull(D3Q27, stream.pad_halo(f, dom.periodic), dom.shape)

    f_ab = f0
    for _ in range(4):
        f_ab, _, _ = step_ab(f_ab, nu)

    f_aa = S(f0)
    for it in range(4):
        f_aa, _, _ = step_aa(f_aa, nu, parity=it % 2)

    assert np.allclose(np.asarray(f_aa), np.asarray(S(f_ab)), atol=1e-12)


def test_aa_memory_is_single_buffer_shape():
    # A-A uses a single DF array; just assert the step runs for both parities
    # and stays finite with walls present (ghost ring of NOTHING).
    from tnl_lbm_tpu.ops.boundary import GEO

    n = 8
    units = Lattice(global_size=(n, n, n), phys_origin=(0, 0, 0), phys_dl=1.0, phys_dt=1.0)
    m = np.zeros((n, n, n), np.uint8)
    m[0], m[-1] = GEO.NOTHING, GEO.NOTHING
    m[:, 0], m[:, -1] = GEO.WALL, GEO.WALL
    m[:, :, 0], m[:, :, -1] = GEO.WALL, GEO.WALL
    dom = Domain(lat=D3Q27, units=units, map=m, periodic=(False, False, False))
    cfg = LBMConfig(lat=D3Q27, collision=col.collide_cum, streaming="AA", compute_dtype=jnp.float64)
    step = make_step(cfg, dom)
    f = initial_dfs(cfg, dom, u0=(0.02, 0.0, 0.0))
    for it in range(6):
        f, rho, u = step(f, 0.05, parity=it % 2)
    assert np.isfinite(np.asarray(f)).all()
    assert np.isfinite(np.asarray(rho)).all()
