"""Sharded simulation step: shard_map wrapper over the local fused step.

This is the analog of the reference's multi-block ``LBM`` container + MPI
synchronizers (reference: lbm.h:7-105, lattice_decomposition.h): the lattice
is decomposed over a ``jax.sharding.Mesh`` by sharding the spatial axes of
the ``[Q, X, Y, Z]`` state array; halos are exchanged with ``lax.ppermute``
inside the step (parallel/halo.py).  The decomposition choice reduces to the
mesh shape: e.g. ``make_mesh((4, 2, 1), ('x', 'y', 'z'))`` is the reference's
optimal 3D block split, and ``(N, 1, 1)`` is its 1D x-split
(lattice_decomposition.h:16-55, 253-283).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from tnl_lbm_tpu.parallel.halo import make_halo_pad
from tnl_lbm_tpu.sim.config import Domain, LBMConfig
from tnl_lbm_tpu.sim.step import make_step


@dataclasses.dataclass(frozen=True)
class ShardPlan:
    """How the lattice maps onto the device mesh."""

    mesh: Mesh
    spatial_axes: tuple  # per lattice axis: mesh axis name or None

    def check(self, domain: Domain):
        for size, name in zip(domain.shape, self.spatial_axes):
            if name is not None and size % self.mesh.shape[name] != 0:
                raise ValueError(
                    f"lattice axis of size {size} not divisible by mesh axis "
                    f"'{name}' of size {self.mesh.shape[name]}"
                )

    def divisible(self, domain: Domain) -> bool:
        return all(
            name is None or size % self.mesh.shape[name] == 0
            for size, name in zip(domain.shape, self.spatial_axes)
        )

    def padded_shape(self, domain: Domain) -> tuple:
        """Per-axis round-up to the mesh-axis multiple (the TPU analog of
        the reference's uneven ``splitRange`` decomposition,
        lattice_decomposition.h:16-55: instead of unequal blocks - which
        shard_map cannot express - the lattice pads to the next multiple
        and the ghost layers are refreshed/masked by the step wrapper)."""
        out = []
        for size, name in zip(domain.shape, self.spatial_axes):
            n = self.mesh.shape[name] if name is not None else 1
            out.append(-(-size // n) * n)
        return tuple(out)

    def local_shape(self, domain: Domain):
        return tuple(
            size // (self.mesh.shape[name] if name is not None else 1)
            for size, name in zip(self.padded_shape(domain), self.spatial_axes)
        )

    @property
    def spec_f(self) -> P:
        return P(None, *self.spatial_axes)

    @property
    def spec_site(self) -> P:
        return P(*self.spatial_axes)

    def shard_field(self, arr, like_f: bool):
        spec = self.spec_f if like_f else self.spec_site
        offset = 1 if like_f else 0
        # device_put refuses uneven named shardings; replicate the
        # non-divisible axes instead (the uneven step wrapper pads and
        # reshards inside jit, _make_uneven_sharded_step)
        axes = list(spec)
        for i, name in enumerate(axes[offset:]):
            if name is None:
                continue
            if arr.shape[offset + i] % self.mesh.shape[name] != 0:
                axes[offset + i] = None
        sharding = NamedSharding(self.mesh, P(*axes))
        if jax.process_count() > 1:
            # multi-process: every process holds the full host array (setup
            # data: geometry, initial DFs) and materializes only the shards
            # its local devices own - the analog of the reference ranks
            # each building their own LBM_BLOCK from the global extents
            # (lattice_decomposition.h:16-55)
            host = np.asarray(arr)
            return jax.make_array_from_callback(
                host.shape, sharding, lambda idx: host[idx])
        return jax.device_put(arr, sharding)


def default_plan(domain: Domain, devices=None) -> ShardPlan:
    """1D x-split over all available devices (reference default
    decomposition is the analogous one-block-per-rank split, lbm.hpp:7-22)."""
    devices = devices if devices is not None else jax.devices()
    mesh = Mesh(np.asarray(devices), ("x",))
    axes = ("x",) + (None,) * (domain.lat.D - 1)
    return ShardPlan(mesh=mesh, spatial_axes=axes)


def _divisors(n: int):
    return [d for d in range(1, n + 1) if n % d == 0]


def choose_plan(domain: Domain, devices=None, axis_weights=None,
                allow_z: bool = False) -> ShardPlan:
    """Pick the mesh factorization minimizing weighted halo-interface area.

    Analog of the reference's ``decomposeBlockOptimal`` with storage-
    permutation-aware axis weights {64, 8, 1}
    (lattice_decomposition.h:67-110): cutting a faster-varying storage axis
    costs strided sends, so its interface area is weighted up.  For the
    [Q, X, Y, Z] TPU layout the natural weights are (1, 8, 64): x cuts move
    contiguous (Y, Z) slabs, y cuts interleave at the sublane level, and z
    cuts break the 128-lane tiling entirely - z sharding is additionally
    DISABLED by default because the fused Pallas kernels shift z
    in-register (``allow_z=True`` lifts this for the XLA path).

    Cost = sum over sharded axes of n_interfaces(axis) * global plane area *
    weight(axis); ties prefer x-major splits (the reference's default).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    D = domain.lat.D
    shape = domain.shape
    if axis_weights is None:
        axis_weights = (1.0, 8.0, 64.0)[:D]
    def search(require_divisible: bool):
        best = None
        for nx in _divisors(n):
            for ny in _divisors(n // nx):
                nz = n // nx // ny
                counts = (nx, ny, nz)[:D]
                if D == 2 and nz != 1:
                    continue
                if not allow_z and D == 3 and nz > 1:
                    continue
                if require_divisible and any(
                        shape[a] % counts[a] != 0 for a in range(D)):
                    continue
                if any(counts[a] > shape[a] for a in range(D)):
                    continue
                padded = tuple(-(-shape[a] // counts[a]) * counts[a]
                               for a in range(D))
                cost = 0.0
                for a in range(D):
                    if counts[a] == 1:
                        continue
                    interfaces = counts[a] if domain.periodic[a] else counts[a] - 1
                    area = 1.0
                    for b in range(D):
                        if b != a:
                            area *= padded[b]
                    cost += axis_weights[a] * interfaces * area
                # uneven decomposition wastes the ghost sites' compute
                # every step - weigh that ~10x a unit-weight halo site
                cost += 10.0 * (int(np.prod(padded)) - int(np.prod(shape)))
                key = (cost, -nx, -ny)  # ties: x-major, then y
                if best is None or key < best[0]:
                    best = (key, counts)
        return best

    # prefer exactly-divisible factorizations; fall back to pad-and-mask
    # uneven decomposition (the reference's splitRange handles any extent,
    # lattice_decomposition.h:16-55)
    best = search(True) or search(False)
    if best is None:
        raise ValueError(
            f"no factorization of {n} devices fits lattice {shape}")
    counts = best[1]
    names = ("x", "y", "z")[:D]
    mesh = Mesh(np.asarray(devices).reshape(counts), names)
    return ShardPlan(mesh=mesh, spatial_axes=names)


def _halo_exchange(mesh, f, adim: int, name, per: bool, w: int):
    """w-wide halo pad of array dim ``adim`` via ppermute along mesh axis
    ``name`` (or a local wrap/edge pad when the axis is trivial).  Runs
    INSIDE shard_map.  At non-periodic global boundaries the out-of-domain
    layers are edge-replicated (matching ``jnp.pad(mode='edge')`` on a
    single device); periodic axes wrap through the mesh ring.  The single
    shared implementation for every sharded step builder below."""
    from jax import lax

    n = mesh.shape[name] if name is not None else 1
    if n == 1:
        pad_width = [(0, 0)] * f.ndim
        pad_width[adim] = (w, w)
        return jnp.pad(f, pad_width, mode="wrap" if per else "edge")
    sl_lo = [slice(None)] * f.ndim
    sl_hi = [slice(None)] * f.ndim
    sl_lo[adim] = slice(0, w)
    sl_hi[adim] = slice(f.shape[adim] - w, f.shape[adim])
    first = f[tuple(sl_lo)]
    last = f[tuple(sl_hi)]
    fwd = [(r, (r + 1) % n) for r in range(n)]
    bwd = [(r, (r - 1) % n) for r in range(n)]
    from_left = lax.ppermute(last, name, fwd)
    from_right = lax.ppermute(first, name, bwd)
    if not per:
        if w == 1:
            edge_lo, edge_hi = first, last
        else:
            sl_edge_lo = [slice(None)] * f.ndim
            sl_edge_hi = [slice(None)] * f.ndim
            sl_edge_lo[adim] = slice(0, 1)
            sl_edge_hi[adim] = slice(f.shape[adim] - 1, f.shape[adim])
            rep = [1] * f.ndim
            rep[adim] = w
            edge_lo = jnp.tile(f[tuple(sl_edge_lo)], rep)
            edge_hi = jnp.tile(f[tuple(sl_edge_hi)], rep)
        idx = lax.axis_index(name)
        from_left = jnp.where(idx == 0, edge_lo, from_left)
        from_right = jnp.where(idx == n - 1, edge_hi, from_right)
    return jnp.concatenate([from_left, f, from_right], axis=adim)


def _make_uneven_sharded_step(cfg: LBMConfig, domain: Domain, plan: ShardPlan,
                              inner_builder=None):
    """Sharded step for a lattice NOT divisible by the mesh (the analog of
    the reference's uneven ``splitRange`` decomposition,
    lattice_decomposition.h:16-55).

    shard_map needs equal blocks, so the lattice pads to the next mesh
    multiple and the ghost layers are REBUILT FROM THE TRUE STATE every
    step before the padded inner step runs:

    - non-periodic padded axis: edge-replication - a pull from the first
      ghost layer reads exactly the clamp value the unpadded step uses;
    - periodic padded axis: wrap fill, with the LAST ghost layer holding
      the true last column (the mesh-level wrap delivers it to shard 0).

    Ghost-site outputs are junk and are cropped off; because the ghosts are
    rebuilt from the true state each step, nothing ever reads stale ghost
    data.  This is EXACT for pull (A-B) streaming incl. Bouzidi and the
    OUTFLOW_* pull shifts; the A-A odd push would read post-collision ghost
    values that cannot be refreshed from outside the kernel, so A-A raises.
    """
    if cfg.streaming != "AB":
        raise NotImplementedError(
            "uneven (non-divisible) decomposition requires A-B streaming; "
            "use streaming='AB' or a mesh-divisible lattice")
    if inner_builder is None:
        inner_builder = make_sharded_step
    S = domain.shape
    Sp = list(plan.padded_shape(domain))
    for a, name in enumerate(plan.spatial_axes):
        if name is not None and domain.periodic[a] and Sp[a] - S[a] == 1:
            # Pad-1 periodic axis: the single ghost layer would have to be
            # both the wrap layer (f[0], read by the true last site's +dir
            # pull) and the ring carrier (f[S-1], which the mesh wrap
            # delivers to shard 0's left ghost).  Pad one extra mesh
            # multiple so the two roles land on distinct layers; the extra
            # ghost sites' outputs are cropped like any others.
            Sp[a] += plan.mesh.shape[name]
    Sp = tuple(Sp)
    pads = [(0, p - s) for s, p in zip(S, Sp)]
    D = cfg.lat.D
    hook = cfg.forcing_hook
    if hook is not None and not getattr(hook, "shard_local", False):
        # Exactness fix: evaluated on the padded lattice, the hook's
        # stencils would read ghost-column u*/rho that differ from the
        # unpadded edge-pad semantics (ghost sites pull their replicated
        # neighbors, true boundary sites pull real interiors) - measured
        # ~6e-4 boundary-ring error.  Crop the hook inputs to the TRUE
        # extent (where u*/rho are exact by the ghost-rebuild argument
        # above), let the hook apply its own edge pads there, and pad the
        # force field back out; ghost-site forces only feed ghost
        # collisions, whose outputs are cropped.
        crop_site = tuple(slice(0, s) for s in S)

        def _uneven_hook(lat, rho0, u0, nu, fluid, **kw):
            out = hook(lat, rho0[crop_site], u0[(slice(None),) + crop_site],
                       nu, fluid[crop_site], **kw)
            return jnp.pad(out, [(0, 0)] + pads, mode="edge")

        if getattr(hook, "consts", None) is not None:
            _uneven_hook.consts = hook.consts
        cfg = dataclasses.replace(cfg, forcing_hook=_uneven_hook)
    units_p = dataclasses.replace(domain.units, global_size=Sp)
    map_p = np.pad(domain.map, pads, mode="edge")
    bz_p = (np.pad(domain.bouzidi, [(0, 0)] + pads, mode="edge")
            if domain.bouzidi is not None else None)
    dom_p = dataclasses.replace(domain, units=units_p, map=map_p, bouzidi=bz_p)
    inner = inner_builder(cfg, dom_p, plan)
    crop_f = (slice(None),) + tuple(slice(0, s) for s in S)
    crop_s = tuple(slice(0, s) for s in S)
    map_p_dev = jnp.asarray(map_p)

    def _pad_state(f):
        fp = f
        for a in range(D):
            p = Sp[a] - S[a]
            if p == 0:
                continue
            adim = f.ndim - D + a
            if domain.periodic[a]:
                # ghost layers [S..Sp-1]: wrap fill, except the LAST ghost
                # layer, which carries the true last layer (the mesh-level
                # wrap delivers it to shard 0).  Built by CONCATENATION:
                # jnp.pad(mode="wrap") + .at[].set miscompiles under the
                # SPMD partitioner when the result feeds shard_map in the
                # same jit (measured: wrong values at every x seam, 2D
                # both-axes-padded case; the concat form is exact).
                idx_wrap = [slice(None)] * fp.ndim
                idx_wrap[adim] = slice(0, p - 1)
                idx_last = [slice(None)] * fp.ndim
                idx_last[adim] = slice(S[a] - 1, S[a])
                fp = jnp.concatenate(
                    [fp, fp[tuple(idx_wrap)], fp[tuple(idx_last)]],
                    axis=adim)
            else:
                pw = [(0, 0)] * fp.ndim
                pw[adim] = (0, p)
                fp = jnp.pad(fp, pw, mode="edge")
        return fp

    def _pad_drive(arr, dt):
        """[D] vectors pass through; [D, ...] profile fields broadcast to
        the true lattice, then pad like the state."""
        if arr is None:
            return None
        a = jnp.asarray(arr, dt)
        if a.ndim <= 1:
            return a
        return _pad_state(jnp.broadcast_to(a, (D,) + S))

    def step(f, map_arr, nu, u_in=None, force=None, parity: int = 0,
             bouzidi_arr=None, hook_consts=None):
        del map_arr  # rebuilt padded internally (build-time edge pad)
        dt = cfg.compute_dtype
        extra = {} if hook_consts is None else {"hook_consts": hook_consts}
        if bouzidi_arr is not None:
            # multi-process callers thread the PADDED bouzidi array from
            # step.sharded_consts; the inner builder's closure default
            # only works single-process
            extra["bouzidi_arr"] = bouzidi_arr
        f_new, rho, u = inner(
            _pad_state(f), map_p_dev, nu,
            u_in=_pad_drive(u_in, dt), force=_pad_drive(force, dt),
            parity=parity, **extra,
        )
        return f_new[crop_f], rho[crop_s], u[crop_f]

    # the inner builder's sharded consts live on the PADDED domain; expose
    # them unchanged (callers pass them back verbatim)
    step.sharded_consts = dict(getattr(inner, "sharded_consts", {}))
    return step


def make_sharded_step(cfg: LBMConfig, domain: Domain, plan: ShardPlan):
    """Build ``step(f, map_arr, nu, u_in, force, parity)`` running under
    shard_map with distributed halo exchange.

    ``f`` and ``map_arr`` must be device arrays sharded according to
    ``plan`` (use ``plan.shard_field``).  ``u_in``/``force`` are replicated
    [D] vectors (or None).  Returns (f_new, rho, u) with the same shardings.

    Lattices NOT divisible by the mesh are supported for A-B streaming via
    internal pad-and-crop (``_make_uneven_sharded_step``).
    """
    if not plan.divisible(domain):
        return _make_uneven_sharded_step(cfg, domain, plan)
    plan.check(domain)
    if cfg.forcing_hook is not None and not getattr(cfg.forcing_hook,
                                                    "shard_local", False):
        # Evaluate the hook GLOBALLY, outside shard_map: GSPMD partitions
        # the strain-rate stencils with automatic halo collectives.  Inside
        # shard_map the hook's edge pads (_pad1) would silently corrupt
        # shard seams.  The no-hook sharded step then consumes the per-site
        # force field (reference nonNewtonian.h:216-391 MPI-synced ghost
        # layers).  Hooks marked ``shard_local`` (IBM's ownership-
        # partitioned sharded_hook, which psums inside the mapped body)
        # keep running inside shard_map via the local step below.
        from tnl_lbm_tpu.sim.step import make_step as _mk

        hook = cfg.forcing_hook
        lat = cfg.lat
        dtype = cfg.compute_dtype
        cfg_nohook = dataclasses.replace(cfg, forcing_hook=None)
        inner = make_sharded_step(cfg_nohook, domain, plan)
        ustar = _mk(cfg_nohook, domain).ustar

        has_consts = getattr(hook, "consts", None) is not None

        def hooked_step(f, map_arr, nu, u_in=None, force=None,
                        parity: int = 0, bouzidi_arr=None, hook_consts=None):
            fvec = None if (force is not None and jnp.ndim(force) > 1) else force
            rho0, u0, fluid = ustar(f, force=fvec, parity=parity)
            if fvec is None and force is not None:
                u0 = u0 + jnp.asarray(force, dtype) / (2 * jnp.maximum(rho0, 1e-12))
            if has_consts:
                extra = hook(lat, rho0, u0, nu, fluid,
                             consts=hook_consts).astype(dtype)
            else:
                extra = hook(lat, rho0, u0, nu, fluid).astype(dtype)
            if force is not None:
                fb = jnp.asarray(force, dtype)
                if fb.ndim == 1:
                    fb = fb.reshape((lat.D,) + (1,) * lat.D)
                extra = extra + fb
            return inner(f, map_arr, nu, u_in=u_in, force=extra,
                         parity=parity, bouzidi_arr=bouzidi_arr)

        return hooked_step
    from tnl_lbm_tpu.ops.boundary import GEO

    codes = domain.codes_present()
    local_shape = plan.local_shape(domain)
    # direction-subset halo exchange (reference df_sync_directions,
    # defs.h:307-340) is valid whenever no BC pulls other components' halos:
    # Bouzidi reads +c offsets (step.py forces comps="all" then), and the
    # OUTFLOW_RIGHT* pull-shift reads x-1 for every component - interior
    # unless the local block is a single x-plane
    subset_ok = domain.bouzidi is None and (
        not ({GEO.OUTFLOW_RIGHT, GEO.OUTFLOW_RIGHT_INTERP} & codes)
        or local_shape[0] >= 2
    )
    pad = make_halo_pad(plan.mesh, plan.spatial_axes, domain.periodic,
                        lat=cfg.lat if subset_ok else None)
    local_step = make_step(cfg, domain, pad_halo=pad, local_shape=local_shape)

    use_bouzidi = domain.bouzidi is not None
    # shard-local hooks with a consts pytree (IBM): thread the arrays
    # through shard_map as replicated operands, not inlined HLO constants
    use_hc = (cfg.forcing_hook is not None
              and getattr(cfg.forcing_hook, "consts", None) is not None)

    def run(parity, f, map_arr, nu, u_in, force, bouzidi_arr, uin_spec,
            force_spec, hook_consts):
        def local(f, map_arr, nu, u_in, force, *rest):
            rest = list(rest)
            bz = rest.pop(0) if use_bouzidi else None
            hc = rest.pop(0) if use_hc else None
            return local_step(
                f, nu, u_in=u_in, force=force, parity=parity,
                map_arr=map_arr, bouzidi_arr=bz, hook_consts=hc,
            )

        in_specs = [plan.spec_f, plan.spec_site, P(), uin_spec, force_spec]
        operands = [f, map_arr, nu, u_in, force]
        if use_bouzidi:
            in_specs.append(plan.spec_f)
            operands.append(bouzidi_arr)
        if use_hc:
            in_specs.append(P())  # replicated pytree
            operands.append(hook_consts)
        sharded = shard_map(
            local,
            mesh=plan.mesh,
            in_specs=tuple(in_specs),
            out_specs=(plan.spec_f, plan.spec_site, plan.spec_f),
            check_vma=False,
        )
        return sharded(*operands)

    def _field_or_vec(arr, dt):
        """[D] vectors replicate (P()); [D, ...] profile fields broadcast
        to the full lattice and shard like f (a [2,1,Y] inflow profile
        must split along the sharded y axis, not replicate)."""
        lat = cfg.lat
        if arr is None:
            return jnp.zeros((lat.D,), dt), P()
        a = jnp.asarray(arr, dt)
        if a.ndim <= 1:
            return a, P()
        a = jnp.broadcast_to(a, (lat.D,) + tuple(domain.shape))
        return a, plan.spec_f

    # materialized at BUILD time and exposed via step.sharded_consts:
    # multi-process callers must thread it through jit as an ARGUMENT (a
    # closed-over / trace-time-built sharded array spans non-addressable
    # devices and cannot lower); the in-step default keeps single-process
    # callers working unchanged
    bz_default = (plan.shard_field(
        jnp.asarray(domain.bouzidi, dtype=cfg.compute_dtype), like_f=True)
        if use_bouzidi else None)

    def step(f, map_arr, nu, u_in=None, force=None, parity: int = 0,
             bouzidi_arr=None, hook_consts=None):
        dt = cfg.compute_dtype
        nu = jnp.asarray(nu, dt)
        u_in, uin_spec = _field_or_vec(u_in, dt)
        force, force_spec = _field_or_vec(force, dt)
        if use_bouzidi and bouzidi_arr is None:
            bouzidi_arr = bz_default
        if use_hc and hook_consts is None:
            hook_consts = cfg.forcing_hook.consts
        return run(parity, f, map_arr, nu, u_in, force, bouzidi_arr,
                   uin_spec, force_spec, hook_consts)

    step.sharded_consts = (
        {"bouzidi_arr": bz_default} if use_bouzidi else {})
    return step


def make_sharded_ade_step(cfg: LBMConfig, domain: Domain, plan: ShardPlan):
    """Distributed D3Q7 ADE step (the ADE half of the reference's multi-GPU
    coupled run, state_NSE_ADE.h + lbm.hpp sync): shard_map around
    sim/step_ade.make_ade_step with ppermute halo exchange.

    Returns ``step(g, u, map_arr, nu, phi_in, transfer_dirs, transfer_coeff,
    parity) -> (g_new, phi)`` on plan-sharded arrays (u is the NSE step's
    sharded macro velocity).
    """
    from tnl_lbm_tpu.sim.step_ade import ADEGEO, make_ade_step
    import numpy as _np

    plan.check(domain)
    codes = {ADEGEO(int(c)) for c in _np.unique(domain.map)}
    if ADEGEO.OUTFLOW_PE in codes:
        # _pull_offset pads its own halos locally; at y/z shard seams on the
        # outflow plane that replicates instead of exchanging
        for a in (1, 2):
            name = plan.spatial_axes[a]
            if name is not None and plan.mesh.shape[name] > 1:
                raise NotImplementedError(
                    "OUTFLOW_PE with a sharded y/z axis is not supported")
        if plan.local_shape(domain)[0] < 3:
            raise NotImplementedError("OUTFLOW_PE needs local x width >= 3")
    # D3Q7 direction-subset exchange: 1 of 7 components per face
    pad = make_halo_pad(plan.mesh, plan.spatial_axes, domain.periodic,
                        lat=cfg.lat)
    local_step = make_ade_step(
        cfg, domain, pad_halo=pad,
        local_shape=plan.local_shape(domain))
    has_transfer = bool(codes & {ADEGEO.TRANSFER_FS, ADEGEO.TRANSFER_SF,
                                 ADEGEO.TRANSFER_SW})

    def step(g, u, map_arr, nu, phi_in=None, transfer_dirs=None,
             transfer_coeff=0.0, parity: int = 0):
        dt = cfg.compute_dtype
        nu = jnp.asarray(nu, dt)
        tcoef = jnp.asarray(transfer_coeff, dt)
        phi_b = (jnp.zeros((), dt) if phi_in is None
                 else jnp.asarray(phi_in, dt))
        have_phi_in = phi_in is not None

        def local(g, u, map_arr, nu, phi_b, tcoef, *rest):
            tdirs = rest[0] if has_transfer else None
            return local_step(
                g, u, nu,
                phi_in=phi_b if have_phi_in else None,
                transfer_dirs=tdirs, transfer_coeff=tcoef,
                parity=parity, map_arr=map_arr,
            )

        # nu may be a per-site diffusion field (shard it) or a scalar
        nu_spec = plan.spec_site if jnp.ndim(nu) > 0 else P()
        in_specs = [plan.spec_f, plan.spec_f, plan.spec_site, nu_spec, P(), P()]
        operands = [g, u, map_arr, nu, phi_b, tcoef]
        if has_transfer:
            in_specs.append(plan.spec_f)
            operands.append(transfer_dirs)
        sharded = shard_map(
            local, mesh=plan.mesh, in_specs=tuple(in_specs),
            out_specs=(plan.spec_f, plan.spec_site), check_vma=False,
        )
        return sharded(*operands)

    return step


def make_sharded_fused_step_2d(cfg: LBMConfig, domain: Domain,
                               plan: ShardPlan,
                               force_field: bool = False):
    """Distributed D2Q9 fused (Pallas) step: 1-wide ppermute halo ring +
    the whole-shard-in-VMEM 2D kernel per shard (round 3).

    The D2Q9 pull (incl. Bouzidi's one-link-off-the-wall read and the
    OUTFLOW_RIGHT x-1 shift) is 1-deep and reads RAW neighbor DFs, so a
    single exchanged f ring suffices - map/bouzidi/u_in rings only shape
    the junk ring outputs, which are cropped.  Also lifts the single-chip
    kernel's whole-DOMAIN VMEM bound to whole-SHARD.  Returns
    ``step(f, map_arr, nu, u_in, force, parity, bouzidi_arr)`` matching
    ``make_sharded_step``.  ``force_field=True`` takes a per-site
    [2, X, Y] force sharded like ``f`` (the 2D hook carrier); force only
    enters a site's own collision under pull streaming, so the ring pad
    is inert.
    """
    from jax import lax

    from tnl_lbm_tpu.kernels.fused_2d import make_fused_step_2d

    plan.check(domain)
    ax_x, ax_y = plan.spatial_axes[0], plan.spatial_axes[1]
    Xl, Yl = plan.local_shape(domain)
    local_step = make_fused_step_2d(cfg, domain,
                                    local_shape=(Xl + 2, Yl + 2),
                                    force_field=force_field)
    has_bouzidi = domain.bouzidi is not None
    bz_sharded = (plan.shard_field(
        jnp.asarray(domain.bouzidi, cfg.compute_dtype), like_f=True)
        if has_bouzidi else None)

    def local(f, mp, nu, uin, force, bz):
        fpad = _halo_exchange(plan.mesh, f, 1, ax_x, domain.periodic[0], 1)
        fpad = _halo_exchange(plan.mesh, fpad, 2, ax_y, domain.periodic[1], 1)
        mpad = jnp.pad(mp.astype(jnp.int32), 1, mode="edge")
        if uin.ndim > 1:
            uin_pad = jnp.pad(uin, [(0, 0), (1, 1), (1, 1)], mode="edge")
        else:
            uin_pad = None if uin.shape[0] == 0 else uin
        if force_field:
            # ring force only feeds cropped ring outputs (pull streaming)
            force_pad = jnp.pad(force, [(0, 0), (1, 1), (1, 1)], mode="edge")
        else:
            force_pad = None if force.shape[0] == 0 else force
        bz_pad = (jnp.pad(bz, [(0, 0), (1, 1), (1, 1)], mode="edge")
                  if has_bouzidi else None)
        f_new, rho, u = local_step(fpad, nu, u_in=uin_pad, force=force_pad,
                                   map_arr_in=mpad, bouzidi_arr=bz_pad)
        c = slice(1, -1)
        return f_new[:, c, c], rho[c, c], u[:, c, c]

    def step(f, map_arr, nu, u_in=None, force=None, parity: int = 0,
             bouzidi_arr=None):
        del parity  # AB only
        dt = cfg.compute_dtype
        nu = jnp.asarray(nu, dt)
        empty = jnp.zeros((0,), dt)
        if u_in is None:
            uin_v, uin_spec = empty, P()
        else:
            uin_v = jnp.asarray(u_in, dt)
            if uin_v.ndim > 1:
                uin_v = jnp.broadcast_to(uin_v, (2,) + tuple(domain.shape))
                uin_spec = plan.spec_f
            else:
                uin_spec = P()
        if force_field:
            assert force is not None and force.ndim == 3, \
                "force_field sharded 2D step expects a [2, X, Y] force"
            force_v, force_spec = force.astype(dt), plan.spec_f
        elif force is None:
            force_v, force_spec = empty, P()
        else:
            force_v = jnp.asarray(force, dt)
            assert force_v.ndim <= 1, \
                "per-site force fields need force_field=True (2D hooks)"
            force_spec = P()
        bz_v = bz_sharded if bouzidi_arr is None else bouzidi_arr
        ins = [plan.spec_f, plan.spec_site, P(), uin_spec, force_spec]
        operands = [f, map_arr, nu, uin_v, force_v]
        if has_bouzidi:
            ins.append(plan.spec_f)
            operands.append(bz_v)
        else:
            ins.append(P())
            operands.append(empty)
        sharded = shard_map(
            local,
            mesh=plan.mesh,
            in_specs=tuple(ins),
            out_specs=(plan.spec_f, plan.spec_site, plan.spec_f),
            check_vma=False,
        )
        return sharded(*operands)

    step.sharded_consts = (
        {"bouzidi_arr": bz_sharded} if has_bouzidi else {})
    return step


def make_sharded_fused_nn_step(cfg: LBMConfig, domain: Domain,
                               plan: ShardPlan, model, nn_periodic,
                               tile=None, tiles_per_program: int = 2,
                               with_macro: bool = True):
    """Distributed SINGLE-KERNEL non-Newtonian step (round 3): the whole
    u* + strain-rate + rheology + forcing + collision program runs per
    shard, fed by one master halo exchange (4-wide x / 8-wide y - the
    maximum window depth over the A-B/even/odd modes).  The in-kernel
    boundary edge fixes gate on per-shard owner flags, so seam halos
    carry real neighbor data.  Replaces the three-phase sharded hooked
    pipeline (macro kernel + GSPMD hook + force-field kernel) with ONE
    kernel per step - the reference needs three MPI-synced CUDA kernels
    for the same step (nonNewtonian.h:216-391, kernels.h:178-218).

    Returns ``step(f, map_arr, nu, u_in=None, force=None, parity=0)``
    matching ``make_sharded_step`` (homogeneous [3] force only).
    """
    from jax import lax

    from tnl_lbm_tpu.kernels.fused import _lane_pad
    from tnl_lbm_tpu.kernels.fused_nn_step import make_fused_nn_step
    from tnl_lbm_tpu.ops.boundary import GEO

    assert with_macro, "the sharded NN wrapper returns macro fields"
    plan.check(domain)
    ax_x, ax_y, ax_z = plan.spatial_axes
    if ax_z is not None and plan.mesh.shape[ax_z] > 1:
        raise NotImplementedError(
            "sharded single-kernel NN step requires an unsharded z axis")
    Xl, Yl, Zl = plan.local_shape(domain)
    local_step = make_fused_nn_step(
        cfg, domain, model, nn_periodic, tile=tile,
        tiles_per_program=tiles_per_program, with_macro=with_macro,
        prepadded=True, local_shape=(Xl, Yl, Zl))
    interpret = jax.default_backend() == "cpu"
    Zp = _lane_pad(Zl, interpret)
    dtype = cfg.compute_dtype
    mask_g = plan.shard_field(
        jnp.asarray(np.asarray(domain.map) == int(GEO.FLUID), dtype),
        like_f=False)

    def _master(v, adim):
        """4-wide x / 8-wide y exchange + junk z lanes up to Zp."""
        v = _halo_exchange(plan.mesh, v, adim, ax_x, domain.periodic[0], 4)
        v = _halo_exchange(plan.mesh, v, adim + 1, ax_y, domain.periodic[1], 8)
        if Zp != Zl:
            pw = [(0, 0)] * (v.ndim - 1) + [(0, Zp - Zl)]
            v = jnp.pad(v, pw, mode="edge")
        return v

    def _bflag(name, last):
        if name is None or plan.mesh.shape[name] == 1:
            return jnp.asarray(1.0, dtype)
        idx = lax.axis_index(name)
        n = plan.mesh.shape[name]
        return ((idx == n - 1) if last else (idx == 0)).astype(dtype)

    def local(parity, f, mp, msk, nu, u_in, force):
        del msk  # the kernel derives the fluid mask from the map (round 5)
        fpad = _master(f, 1)
        mpad = _master(mp.astype(jnp.int32), 0)
        one = jnp.asarray(1.0, dtype)
        bflags = jnp.stack([
            _bflag(ax_x, False), _bflag(ax_x, True),
            _bflag(ax_y, False), _bflag(ax_y, True),
            one, one,  # z is unsharded: this shard owns both z boundaries
        ])
        return local_step(fpad, nu, u_in=u_in, force=force, parity=parity,
                          map_master=mpad, bflags=bflags)

    def step(f, map_arr, nu, u_in=None, force=None, parity: int = 0,
             fluid_mask=None):
        dt = cfg.compute_dtype
        nu_v = jnp.asarray(nu, dt)
        u_in_v = jnp.zeros((3,), dt) if u_in is None else jnp.asarray(u_in, dt)
        force_v = (jnp.zeros((3,), dt) if force is None
                   else jnp.asarray(force, dt))
        out_macro = (plan.spec_site, plan.spec_f) if with_macro else (P(), P())
        sharded = shard_map(
            partial(local, parity),
            mesh=plan.mesh,
            in_specs=(plan.spec_f, plan.spec_site, plan.spec_site,
                      P(), P(), P()),
            out_specs=(plan.spec_f,) + out_macro,
            check_vma=False,
        )
        # multi-process callers pass the mask (see step.sharded_consts);
        # the closure default only works single-process
        return sharded(f, map_arr,
                       mask_g if fluid_mask is None else fluid_mask,
                       nu_v, u_in_v, force_v)

    step.sharded_consts = {"fluid_mask": mask_g}
    return step


def make_sharded_fused_ade_step(cfg: LBMConfig, domain: Domain,
                                plan: ShardPlan, tile=(8, 16),
                                tiles_per_program: int = 4,
                                variable_diffusion: bool = False,
                                transfer_coeff: float = 0.0):
    """Distributed fused (Pallas) D3Q7 ADE step: ppermute halo exchange +
    the single-chip ADE kernel per shard - the fused counterpart of
    ``make_sharded_ade_step`` (the ADE half of the reference's multi-GPU
    coupled run, state_NSE_ADE.h; the reference syncs 1 of 7 DFs per face,
    here the 2/1-wide x/y slabs carry the pull ring).

    Returns ``step(g, u, map_arr, nu, phi_in=0.0) -> (g_new, phi)`` on
    plan-sharded arrays; ``u`` is the NSE step's sharded velocity.
    Transfer BCs and variable diffusion are build-time static like the
    single-chip kernel.
    """
    from jax import lax

    from tnl_lbm_tpu.kernels.fused_ade import (
        ADEGEO,
        make_fused_ade_step,
        pack_transfer_flags,
    )

    plan.check(domain)
    ax_x, ax_y, ax_z = plan.spatial_axes
    if ax_z is not None and plan.mesh.shape[ax_z] > 1:
        raise NotImplementedError(
            "sharded fused ADE requires an unsharded z axis")
    Xl, Yl, Zl = plan.local_shape(domain)
    local_step = make_fused_ade_step(
        cfg, domain, tile=tile, tiles_per_program=tiles_per_program,
        variable_diffusion=variable_diffusion, transfer_coeff=transfer_coeff,
        prepadded=True, local_shape=(Xl, Yl, Zl))
    codes = {ADEGEO(int(c)) for c in np.unique(domain.map)}
    needs_transfer = bool(
        codes & {ADEGEO.TRANSFER_FS, ADEGEO.TRANSFER_SF, ADEGEO.TRANSFER_SW})
    if needs_transfer:
        tflags_g = plan.shard_field(
            jnp.asarray(pack_transfer_flags(cfg.lat, domain.map)),
            like_f=False)

    def local(g, mp, u, nu, phi_in, *maybe_tfl):
        # x 2-wide (OUTFLOW_PE pulls x-2), y 1-wide + 6 alignment rows -
        # the _pad_ade layout, with real neighbor slabs at shard seams
        gpad = _halo_exchange(plan.mesh, g, 1, ax_x, domain.periodic[0], 2)
        gpad = _halo_exchange(plan.mesh, gpad, 2, ax_y, domain.periodic[1], 1)
        gpad = jnp.pad(gpad, [(0, 0), (0, 0), (0, 6), (0, 0)], mode="edge")
        return local_step(gpad, u, nu, phi_in=phi_in,
                          map_arr_in=mp.astype(jnp.int32),
                          tflags_in=maybe_tfl[0] if maybe_tfl else None)

    def step(g, u, map_arr, nu, phi_in=0.0, tflags=None):
        dt = cfg.compute_dtype
        nu_v = jnp.asarray(nu, dt)
        phi_v = jnp.asarray(0.0 if phi_in is None else phi_in, dt)
        nu_spec = plan.spec_site if variable_diffusion else P()
        ins = [plan.spec_f, plan.spec_site, plan.spec_f, nu_spec, P()]
        operands = [g, map_arr, u, nu_v, phi_v]
        if needs_transfer:
            # multi-process callers pass tflags (see step.sharded_consts);
            # the closure default only works single-process
            ins.append(plan.spec_site)
            operands.append(tflags_g if tflags is None else tflags)
        sharded = shard_map(
            local,
            mesh=plan.mesh,
            in_specs=tuple(ins),
            out_specs=(plan.spec_f, plan.spec_site),
            check_vma=False,
        )
        return sharded(*operands)

    step.sharded_consts = {"tflags": tflags_g} if needs_transfer else {}
    return step


def make_sharded_fused_step(cfg: LBMConfig, domain: Domain, plan: ShardPlan,
                            tile=None, tiles_per_program: int = 2,
                            with_macro: bool = True,
                            force_field: bool = False,
                            macro_only: bool = False):
    """Distributed Pallas path: ppermute halo exchange + the fused kernel.

    The lattice shards over any subset of the mesh's x/y/z axes.  Each step
    exchanges 1-wide face slabs with lax.ppermute (sequential sweeps,
    corner-correct), assembles the local haloed block and runs the
    single-chip fused kernel on it - the TPU analog of the reference's
    overlapped halo pipeline (reference state.hpp:1047-1111).

    z-sharded meshes (round 3): the z halo planes are concatenated into the
    lane axis and the local kernel is built at extent Zl+2 with clamp (not
    wrap) z semantics - halo planes supply the neighbor data, the halo
    planes' own outputs are junk and are cropped off.  This costs the
    lane-pad of Zl+2 to the next 128 multiple, which is why ``choose_plan``
    still weights z cuts heavily - but a z-sharded mesh now runs the fused
    kernel instead of silently landing on the ~10x slower XLA step.
    """
    from jax import lax

    from tnl_lbm_tpu.kernels.fused import make_fused_step

    plan.check(domain)
    ax_z = plan.spatial_axes[2]
    nz = plan.mesh.shape[ax_z] if ax_z is not None else 1
    zsh = nz > 1
    Xl, Yl, Zl = plan.local_shape(domain)
    if zsh:
        dom_k = dataclasses.replace(
            domain, periodic=(domain.periodic[0], domain.periodic[1], False))
        kshape = (Xl, Yl, Zl + 2)
    else:
        dom_k = domain
        kshape = (Xl, Yl, Zl)
    local_step = make_fused_step(
        cfg, dom_k, tile=tile, tiles_per_program=tiles_per_program,
        with_macro=with_macro, prepadded=True, local_shape=kshape,
        force_field=force_field, macro_only=macro_only,
    )

    def _exchange(f, adim, name, per):
        """1-wide halo pad along array dim ``adim`` via ppermute (or local pad)."""
        return _halo_exchange(plan.mesh, f, adim, name, per, 1)

    def local(f, map_arr, nu, u_in, force):
        map_arr = map_arr.astype(jnp.int32)
        if zsh:
            # z first, so the x/y sweeps carry the z-halo planes too
            # (transitively corner-correct, like the x-then-y order below)
            f = _exchange(f, 3, ax_z, domain.periodic[2])
            map_arr = _exchange(map_arr, 2, ax_z, domain.periodic[2])
            if force_field:
                # z-halo planes only feed halo-site collisions whose
                # outputs are cropped below - edge values suffice, no ICI
                force = jnp.pad(force, [(0, 0)] * 3 + [(1, 1)], mode="edge")
        fpad = _exchange(f, 1, plan.spatial_axes[0], domain.periodic[0])
        fpad = _exchange(fpad, 2, plan.spatial_axes[1], domain.periodic[1])
        # unused alignment rows expected by the kernel's DMA windows
        fpad = jnp.pad(fpad, [(0, 0), (0, 0), (0, 6), (0, 0)], mode="edge")
        out = local_step(fpad, nu, u_in=u_in, force=force,
                         map_arr_in=map_arr)
        if macro_only:
            rho, u = out
            if zsh:
                rho, u = rho[..., 1 : 1 + Zl], u[..., 1 : 1 + Zl]
            return rho, u
        f_new, rho, u = out
        if zsh:
            f_new = f_new[..., 1 : 1 + Zl]
            if with_macro:
                rho = rho[..., 1 : 1 + Zl]
                u = u[..., 1 : 1 + Zl]
        return f_new, rho, u

    def step(f, map_arr, nu, u_in=None, force=None, parity: int = 0):
        del parity  # A-B kernel; accepted so callers can stay pattern-blind
        dt = cfg.compute_dtype
        nu = jnp.asarray(nu, dt)
        u_in_v = jnp.zeros((3,), dt) if u_in is None else jnp.asarray(u_in, dt)
        if force_field:
            assert force is not None and force.ndim == 4, \
                "force_field sharded step expects a [3, X, Y, Z] force"
            force_v = force.astype(dt)
            force_spec = plan.spec_f
        else:
            force_v = jnp.zeros((3,), dt) if force is None else jnp.asarray(force, dt)
            force_spec = P()
        if macro_only:
            out_specs = (plan.spec_site, plan.spec_f)
        else:
            out_macro = (plan.spec_site, plan.spec_f) if with_macro else (P(), P())
            out_specs = (plan.spec_f,) + out_macro
        sharded = shard_map(
            local,
            mesh=plan.mesh,
            in_specs=(plan.spec_f, plan.spec_site, P(), P(), force_spec),
            out_specs=out_specs,
            check_vma=False,
        )
        return sharded(f, map_arr, nu, u_in_v, force_v)

    return step


def make_sharded_fused_step_aa(cfg: LBMConfig, domain: Domain, plan: ShardPlan,
                               tile_even=(8, 16), tile_odd=(8, 16),
                               tiles_per_program: int = 4, with_macro: bool = True,
                               force_field: bool = False,
                               macro_only: bool = False):
    """Distributed Pallas A-A pair: ``step(f, map_arr, nu, u_in, force,
    parity)`` under shard_map.

    The even step is embarrassingly local (same-site read/write) - ZERO
    communication.  The odd step exchanges 2-wide x/y halo slabs with
    ``lax.ppermute`` and runs the prepadded odd push kernel; per-shard
    boundary flags tell the kernel which shards own the global domain
    boundaries.  Notably the reference never completed multi-GPU A-A
    synchronization (reference defs.h:3-9: even-step corner sync marked
    TODO) - the functional halo exchange sidesteps the corner races.

    z-sharded meshes (round 3): the odd step exchanges 2-wide z plane slabs
    into the lane axis and the kernels run at extent Zl+4 with clamp z
    semantics; halo-plane outputs are cropped.  The even step needs no z
    exchange (same-site) - it just edge-pads the junk halo planes.
    """
    from jax import lax

    from tnl_lbm_tpu.kernels.fused_aa import make_fused_step_aa

    plan.check(domain)
    ax_z = plan.spatial_axes[2]
    nz = plan.mesh.shape[ax_z] if ax_z is not None else 1
    zsh = nz > 1
    Xl, Yl, Zl = plan.local_shape(domain)
    if zsh:
        dom_k = dataclasses.replace(
            domain, periodic=(domain.periodic[0], domain.periodic[1], False))
        kshape = (Xl, Yl, Zl + 4)
    else:
        dom_k = domain
        kshape = (Xl, Yl, Zl)
    local_step = make_fused_step_aa(
        cfg, dom_k, tile_even=tile_even, tile_odd=tile_odd,
        tiles_per_program=tiles_per_program, with_macro=with_macro,
        prepadded=True, local_shape=kshape, z_halo=2 if zsh else 0,
        force_field=force_field, macro_only=macro_only,
    )
    ax_x, ax_y = plan.spatial_axes[0], plan.spatial_axes[1]

    def _exchange_w(f, axis, name, per, w):
        """w-wide halo pad along `axis` via ppermute (or local pad)."""
        return _halo_exchange(plan.mesh, f, axis + 1, name, per, w)

    def _bflag(name, last):
        if name is None or plan.mesh.shape[name] == 1:
            return jnp.float32(1.0)
        idx = lax.axis_index(name)
        return ((idx == (plan.mesh.shape[name] - 1)) if last else (idx == 0)).astype(
            cfg.compute_dtype
        )

    def _crop_z(out):
        if not zsh:
            return out
        if macro_only:
            rho, u = out
            return rho[..., 2 : 2 + Zl], u[..., 2 : 2 + Zl]
        f_new, rho, u = out
        f_new = f_new[..., 2 : 2 + Zl]
        if with_macro:
            rho = rho[..., 2 : 2 + Zl]
            u = u[..., 2 : 2 + Zl]
        return f_new, rho, u

    def local(parity, f, map_loc, nu, u_in, force):
        if parity == 0:
            if zsh:
                # even step is same-site: junk halo planes, cropped after
                f = jnp.pad(f, [(0, 0)] * 3 + [(2, 2)], mode="edge")
                m = jnp.pad(map_loc.astype(jnp.int32),
                            [(0, 0), (0, 0), (2, 2)], mode="edge")
                if force_field:
                    # same-site step: halo-plane outputs are cropped below,
                    # so edge force values suffice - no ICI for the force
                    force = jnp.pad(force, [(0, 0)] * 3 + [(2, 2)],
                                    mode="edge")
            else:
                m = map_loc.astype(jnp.int32)
            return _crop_z(local_step(f, nu, u_in=u_in, force=force,
                                      parity=0, map_arr_in=m))
        # 2-wide f halos: z first (so the x/y slabs carry the z planes),
        # then x then y (sequential sweeps -> corner-correct), plus 2 junk
        # y rows each side for the kernel's y-origin-4 layout
        m = map_loc.astype(jnp.int32)[None]
        fring = None
        if zsh:
            f = _exchange_w(f, 2, ax_z, domain.periodic[2], 2)
            m = _exchange_w(m, 2, ax_z, domain.periodic[2], 2)
        fpad = _exchange_w(f, 0, ax_x, domain.periodic[0], 2)
        fpad = _exchange_w(fpad, 1, ax_y, domain.periodic[1], 2)
        fpad = jnp.pad(fpad, [(0, 0), (0, 0), (2, 2), (0, 0)], mode="edge")
        # 1-wide map ring in the [Xl+2, Yl+8, Zk] layout (x-origin 1, y 4)
        mring = _exchange_w(m, 0, ax_x, domain.periodic[0], 1)
        mring = _exchange_w(mring, 1, ax_y, domain.periodic[1], 1)
        mring = jnp.pad(mring, [(0, 0), (0, 0), (3, 3), (0, 0)], mode="edge")[0]
        if force_field:
            # 1-halo force ring in the same layout: halo-ring collisions
            # feed interior pushes, so seam values must be the NEIGHBOR
            # shard's force (edge replication would diverge from the
            # single-device push at the seams, _pad_force_ring docstring)
            fr = force
            if zsh:
                fr = _exchange_w(fr, 2, ax_z, domain.periodic[2], 2)
            fr = _exchange_w(fr, 0, ax_x, domain.periodic[0], 1)
            fr = _exchange_w(fr, 1, ax_y, domain.periodic[1], 1)
            fring = jnp.pad(fr, [(0, 0), (0, 0), (3, 3), (0, 0)],
                            mode="edge")
        zero = jnp.asarray(0.0, cfg.compute_dtype)
        bflags = jnp.stack([
            _bflag(ax_x, False), _bflag(ax_x, True),
            _bflag(ax_y, False), _bflag(ax_y, True),
            # periodic global z: halos wrap, no edge replication anywhere
            zero if domain.periodic[2] else _bflag(ax_z, False),
            zero if domain.periodic[2] else _bflag(ax_z, True),
        ]).astype(cfg.compute_dtype)
        return _crop_z(local_step(fpad, nu, u_in=u_in, force=force, parity=1,
                                  map_ring_in=mring, bflags=bflags,
                                  force_ring_in=fring))

    def step(f, map_arr, nu, u_in=None, force=None, parity: int = 0):
        dt = cfg.compute_dtype
        nu = jnp.asarray(nu, dt)
        u_in_v = jnp.zeros((3,), dt) if u_in is None else jnp.asarray(u_in, dt)
        if force_field:
            assert force is not None and force.ndim == 4, \
                "force_field sharded A-A step expects a [3, X, Y, Z] force"
            force_v = force.astype(dt)
            force_spec = plan.spec_f
        else:
            force_v = (jnp.zeros((3,), dt) if force is None
                       else jnp.asarray(force, dt))
            force_spec = P()
        if macro_only:
            out_specs = (plan.spec_site, plan.spec_f)
        else:
            out_macro = (plan.spec_site, plan.spec_f) if with_macro else (P(), P())
            out_specs = (plan.spec_f,) + out_macro
        sharded = shard_map(
            partial(local, parity),
            mesh=plan.mesh,
            in_specs=(plan.spec_f, plan.spec_site, P(), P(), force_spec),
            out_specs=out_specs,
            check_vma=False,
        )
        return sharded(f, map_arr, nu, u_in_v, force_v)

    return step


def make_sharded_fused_pair2_aa(cfg: LBMConfig, domain: Domain, plan: ShardPlan,
                                tile=(8, 32), tiles_per_program: int = 2,
                                with_macro: bool = True, store_dtype=None):
    """Distributed one-kernel A-A pair: the production 1536-MLUPS path on a
    mesh.  ``pair(fpad, map_arr, nu, u_in, force) -> (fpad_new, rho, u)``
    advances TWO steps per dispatch.

    The pair needs halos exactly ONCE per two steps and with NO parity
    adaptation (the intermediate even-output field never leaves VMEM, so
    the A-A sync direction-flip the reference struggled with - defs.h:3-9 -
    disappears entirely): each call ppermutes 2-wide x/y slabs into the
    persistent-pad layout (sequential sweeps, corner-correct), refreshes
    the map halos the same way, and runs the single-chip pair2 kernel on
    the local block.  Halo traffic is HALF the per-step sync of the
    two-kernel path.

    State layout: the global array is the concatenation of per-shard padded
    blocks [Q, nx*(Xl+4), ny*(Yl+16), Z] sharded so each device holds
    [Q, Xl+4, Yl+16, Z] (helpers ``to_padded_aa_sharded`` /
    ``from_padded_aa_sharded``).

    z-sharded meshes (round 3): the persistent state gains 2 halo planes
    each side on the lane axis ([Q, Xl+4, Yl+16, Zl+4] per shard, before
    lane padding); each pair refreshes them with the same ppermute sweep as
    x/y, and the kernel runs at extent Zl+4 with clamp z semantics.
    """
    from jax import lax

    from tnl_lbm_tpu.kernels.fused_aa import make_fused_pair2_aa

    plan.check(domain)
    ax_z = plan.spatial_axes[2]
    nz = plan.mesh.shape[ax_z] if ax_z is not None else 1
    zsh = nz > 1
    Xl, Yl, Zl = plan.local_shape(domain)
    if zsh:
        dom_k = dataclasses.replace(
            domain, periodic=(domain.periodic[0], domain.periodic[1], False))
        kshape = (Xl, Yl, Zl + 4)
    else:
        dom_k = domain
        kshape = (Xl, Yl, Zl)
    pair_local = make_fused_pair2_aa(
        cfg, dom_k, tile=tile, tiles_per_program=tiles_per_program,
        with_macro=with_macro, local_shape=kshape, prepadded=True,
        z_halo=2 if zsh else 0, store_dtype=store_dtype,
    )
    ax_x, ax_y = plan.spatial_axes[0], plan.spatial_axes[1]
    periodic = domain.periodic

    def _fill_axis(arr, adim, name, per, org, n, w):
        """Fill the w-wide halo layers at [org-w, org) and [org+n, org+n+w)
        along ``adim`` from the neighbor shards' interior edges (or by
        edge-replication at non-periodic global boundaries)."""
        nsh = plan.mesh.shape[name] if name is not None else 1

        def sl(a, lo, hi):
            idx = [slice(None)] * arr.ndim
            idx[adim] = slice(lo, hi)
            return a[tuple(idx)]

        lo_edge = sl(arr, org, org + w)          # my low interior edge
        hi_edge = sl(arr, org + n - w, org + n)  # my high interior edge
        if nsh == 1:
            # single shard on this axis: periodic wraps my own edges;
            # non-periodic replicates the boundary layer
            if per:
                lo_fill, hi_fill = hi_edge, lo_edge
            else:
                rep = [1] * arr.ndim
                rep[adim] = w
                lo_fill = jnp.tile(sl(arr, org, org + 1), rep)
                hi_fill = jnp.tile(sl(arr, org + n - 1, org + n), rep)
        else:
            fwd = [(r, (r + 1) % nsh) for r in range(nsh)]
            bwd = [(r, (r - 1) % nsh) for r in range(nsh)]
            lo_fill = lax.ppermute(hi_edge, name, fwd)   # from left neighbor
            hi_fill = lax.ppermute(lo_edge, name, bwd)   # from right neighbor
            if not per:
                rep = [1] * arr.ndim
                rep[adim] = w
                edge_lo = jnp.tile(sl(arr, org, org + 1), rep)
                edge_hi = jnp.tile(sl(arr, org + n - 1, org + n), rep)
                idx = lax.axis_index(name)
                lo_fill = jnp.where(idx == 0, edge_lo, lo_fill)
                hi_fill = jnp.where(idx == nsh - 1, edge_hi, hi_fill)
        out = arr
        idx_lo = [slice(None)] * arr.ndim
        idx_lo[adim] = slice(org - w, org)
        idx_hi = [slice(None)] * arr.ndim
        idx_hi[adim] = slice(org + n, org + n + w)
        out = out.at[tuple(idx_lo)].set(lo_fill)
        out = out.at[tuple(idx_hi)].set(hi_fill)
        return out

    def _bflag(name, last):
        if name is None or plan.mesh.shape[name] == 1:
            return jnp.asarray(1.0, cfg.compute_dtype)
        idx = lax.axis_index(name)
        n = plan.mesh.shape[name]
        return ((idx == (n - 1)) if last else (idx == 0)).astype(cfg.compute_dtype)

    def local(fpad, m_loc, nu, u_in, force):
        # refresh the persistent-pad halos: z sweep first (so the x/y slabs
        # carry the z planes), then x, then y (the y slabs span the
        # already-filled x halos -> corners route)
        mzpad = [(2, 2), (8, 8), (0, 0)]
        if zsh:
            fpad = _fill_axis(fpad, 3, ax_z, periodic[2], 2, Zl, 2)
            mzpad[2] = (2, 2)
        fpad = _fill_axis(fpad, 1, ax_x, periodic[0], 2, Xl, 2)
        fpad = _fill_axis(fpad, 2, ax_y, periodic[1], 8, Yl, 2)
        # local padded map in the same layout (int32; cheap per pair)
        mp = jnp.pad(m_loc.astype(jnp.int32), mzpad, mode="edge")
        if zsh:
            mp = _fill_axis(mp, 2, ax_z, periodic[2], 2, Zl, 2)
        mp = _fill_axis(mp, 0, ax_x, periodic[0], 2, Xl, 2)
        mp = _fill_axis(mp, 1, ax_y, periodic[1], 8, Yl, 2)
        zero = jnp.asarray(0.0, cfg.compute_dtype)
        bflags = jnp.stack([
            _bflag(ax_x, False), _bflag(ax_x, True),
            _bflag(ax_y, False), _bflag(ax_y, True),
            # periodic global z: halos wrap, no edge replication anywhere
            zero if domain.periodic[2] else _bflag(ax_z, False),
            zero if domain.periodic[2] else _bflag(ax_z, True),
        ]).astype(cfg.compute_dtype)
        fpad_new, rho, u = pair_local(fpad, nu, u_in=u_in, force=force,
                                      map_pad_in=mp, bflags=bflags)
        if zsh and with_macro:
            rho = rho[..., 2 : 2 + Zl]
            u = u[..., 2 : 2 + Zl]
        return fpad_new, rho, u

    spec_pad = plan.spec_f

    def pair(fpad, map_arr, nu, u_in=None, force=None):
        dt = cfg.compute_dtype
        nu = jnp.asarray(nu, dt)
        u_in_v = jnp.zeros((3,), dt) if u_in is None else jnp.asarray(u_in, dt)
        force_v = jnp.zeros((3,), dt) if force is None else jnp.asarray(force, dt)
        out_macro = (plan.spec_site, plan.spec_f) if with_macro else (P(), P())
        sharded = shard_map(
            local,
            mesh=plan.mesh,
            in_specs=(spec_pad, plan.spec_site, P(), P(), P()),
            out_specs=(spec_pad,) + out_macro,
            check_vma=False,
        )
        return sharded(fpad, map_arr, nu, u_in_v, force_v)

    return pair


def _pair2_z_layout(plan: ShardPlan, domain: Domain):
    """(z-halo width, kernel z extent, lane extent) of the per-shard
    persistent-pad pair2 state: z-sharded plans carry 2 halo planes each
    side before the 128-multiple lane pad."""
    import jax as _jax

    from tnl_lbm_tpu.kernels.fused import _lane_pad

    ax_z = plan.spatial_axes[2] if len(plan.spatial_axes) > 2 else None
    nz = plan.mesh.shape[ax_z] if ax_z is not None else 1
    Zl = plan.local_shape(domain)[2]
    zw = 2 if nz > 1 else 0
    Zk = Zl + 2 * zw
    return zw, Zk, _lane_pad(Zk, _jax.default_backend() == "cpu")


def to_padded_aa_sharded(f, plan: ShardPlan, domain: Domain,
                         store_dtype=None):
    """Plain sharded [Q, X, Y, Z] -> per-shard persistent-pad blocks
    [Q, nx*(Xl+4), ny*(Yl+16), Zp] (halo layers uninitialized; the pair
    wrapper fills them before every call; z-sharded plans add 2 halo
    planes per side; lanes padded to the 128 multiple,
    kernels/fused.py _lane_pad)."""
    zw, Zk, Zp = _pair2_z_layout(plan, domain)

    def local(fl):
        if store_dtype is not None:
            fl = fl.astype(store_dtype)  # half storage: narrow at rest AND
            # on the wire - the pair wrapper's ppermute halo sweeps move
            # 16-bit slabs, halving the per-pair ICI traffic
        return jnp.pad(fl, [(0, 0), (2, 2), (8, 8),
                            (zw, zw + Zp - Zk)], mode="edge")

    return shard_map(
        local, mesh=plan.mesh,
        in_specs=(plan.spec_f,), out_specs=plan.spec_f, check_vma=False,
    )(f)


def from_padded_aa_sharded(fpad, plan: ShardPlan, domain: Domain, dtype=None):
    """Inverse of ``to_padded_aa_sharded``: strip the per-shard pads
    (``dtype`` widens half-stored state back to the compute dtype)."""
    zw, _, _ = _pair2_z_layout(plan, domain)
    Zl = plan.local_shape(domain)[2]

    def local(fl):
        out = fl[:, 2 : fl.shape[1] - 2, 8 : fl.shape[2] - 8, zw : zw + Zl]
        return out if dtype is None else out.astype(dtype)

    return shard_map(
        local, mesh=plan.mesh,
        in_specs=(plan.spec_f,), out_specs=plan.spec_f, check_vma=False,
    )(fpad)
