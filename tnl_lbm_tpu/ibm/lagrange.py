"""Wu-Shu velocity-correction IBM on TPU.

Analog of the reference ``Lagrange3D<LBM>`` (reference: lagrange_3D.h:39-153,
lagrange_3D.hpp): Lagrangian points immersed in the Eulerian lattice; each
step solves for boundary forces such that the interpolated fluid velocity at
the points matches the target (zero or prescribed) velocity, then spreads
those forces back to the lattice.

TPU-first re-design:
- The sparse interpolation matrix M never materializes: with a fixed
  ``support^3`` stencil per point, interpolation is a dense gather
  ``u_L[k] = sum_s w[k, s] u[idx[k, s]]`` and spreading is a scatter-add -
  both map to XLA gather/scatter with static shapes (the reference builds
  SlicedEllpack sparse matrices instead, lagrange_3D.h:65-97).
- A-matrix variants (reference IbmMethod, lagrange_3D.hpp:265-331):
  ``modified``  A[k,l] = 3D-dirac(x_k - x_l), a dense [m, m] matrix built
                once (geometry is static) - matvec is a plain matmul (MXU);
  ``original``  A = M M^T realized matrix-free as interpolate(spread(x)).
- CG solve via jax.scipy.sparse.linalg.cg, the three RHS batched.
- compute variants GPU/CPU/hybrid (lagrange_3D.h:24-30) collapse to
  device-only - there is no reason to leave the chip.

The per-step coupling runs as a ``forcing_hook`` inside the fused LBM step:
hook input u is exactly the reference's u* (velocity without the new IBM
force, reference kernels.h:178-218), the hook returns the spread force field
consumed by the collision through the trapezoidal forcing.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tnl_lbm_tpu.ibm.dirac import dirac_delta, dirac_delta_3d, dirac_support
from tnl_lbm_tpu.utils.logging_utils import get_logger


class IBM:
    """Immersed boundary solver for a static Lagrangian point cloud."""

    def __init__(
        self,
        units,
        points_phys: np.ndarray,
        dirac: str = "phi2",
        method: str = "auto",
        max_iters: int = 10000,
        tol: float = 3e-4,
        use_ll_velocity: bool = False,
        dirac_ll: str = "phi3",
    ):
        """Args:
        units: Lattice unit system (phys <-> lattice transforms).
        points_phys: [m, 3] Lagrangian points in physical coordinates.
        dirac: kernel name phi1..phi4 (reference lagrange_3D.h:114-115).
        method: "auto" | "modified" | "original" (reference
          lagrange_3D.hpp:265-331).  "auto" picks the dense-A "modified"
          operator up to ``DENSE_A_MAX_POINTS`` and the matrix-free
          "original" beyond; an explicit "modified" request beyond the
          limit raises (the two operators differ, so changing it silently
          would change results - ADVICE r2).
        max_iters/tol: CG parameters (reference lagrange_3D.hpp:899-906
          uses maxIter 10000, residue 3e-4).
        dirac_ll: kernel for the POINT-POINT matrix of the "modified"
          method.  The reference pins this to its type 1 = the hat kernel
          (``diracDeltaTypeLL = 1``, lagrange_3D.h:115, dirac.h:40-41)
          independently of the interpolation dirac: the hat is a
          positive-definite function with support 1, so A stays CG-solvable
          at sub-grid point spacing - the wide cosine/Peskin kernels
          produce an INDEFINITE A there (measured: phi2 at 0.7 dl spacing
          has ~38% negative eigenvalues and CG diverges).
        """
        self.units = units
        self.dirac = dirac
        self.dirac_ll = dirac_ll
        self.method = method
        self.max_iters = max_iters
        self.tol = tol
        self.use_ll_velocity = use_ll_velocity
        self.log = get_logger("ibm")

        pts = np.asarray(points_phys, np.float64).reshape(-1, 3)
        self.points_phys = pts
        # lattice coordinates (reference lagrange_3D.hpp:102-119)
        self.ll_lat = np.stack([
            np.array([units.phys2lbm_x(p[0], 0), units.phys2lbm_x(p[1], 1), units.phys2lbm_x(p[2], 2)])
            for p in pts
        ])
        self.m = len(pts)
        self.prescribed_velocity = np.zeros((self.m, 3))

        t0 = time.perf_counter()
        self._build_stencils()
        self._build_A()
        self.log.info(
            '{"ibm": "constructMatrices", "points": %d, "dirac": "%s", "method": "%s", "wall_s": %.4f}',
            self.m, dirac, method, time.perf_counter() - t0,
        )

    # ------------------------------------------------------------- geometry
    def _build_stencils(self):
        s = dirac_support(self.dirac)
        base = np.floor(self.ll_lat - (s / 2 - 1)).astype(np.int64)  # lowest stencil node
        offs = np.stack(np.meshgrid(*([np.arange(s)] * 3), indexing="ij"), axis=-1).reshape(-1, 3)
        nodes = base[:, None, :] + offs[None, :, :]  # [m, s^3, 3]
        d = self.ll_lat[:, None, :] - nodes  # distances in lattice units
        w = (
            np.asarray(jax.device_get(dirac_delta(self.dirac, jnp.asarray(d[..., 0]))))
            * np.asarray(jax.device_get(dirac_delta(self.dirac, jnp.asarray(d[..., 1]))))
            * np.asarray(jax.device_get(dirac_delta(self.dirac, jnp.asarray(d[..., 2]))))
        )
        self.stencil_nodes = nodes  # [m, s^3, 3] int lattice indices
        self.weights = jnp.asarray(w, jnp.float32)  # [m, s^3]
        self._nodes_dev = jnp.asarray(nodes, jnp.int32)

    #: largest cloud for which "auto" picks the dense-A "modified" operator
    #: (the [m, m] matrix at 32k points is 4 GB - past that the matrix-free
    #: product is the right operator regardless of compile mechanics)
    DENSE_A_MAX_POINTS = 32768

    def _build_A(self):
        if self.method == "auto":
            self.method = ("modified" if self.m <= self.DENSE_A_MAX_POINTS
                           else "original")
            self.log.info("IBM: method 'auto' -> '%s' for %d points",
                          self.method, self.m)
        elif self.method == "modified" and self.m > self.DENSE_A_MAX_POINTS:
            raise ValueError(
                f"IBM: explicit method='modified' with {self.m} points - the "
                f"dense A would be {self.m * self.m * 4 / 1e9:.1f} GB (limit "
                f"{self.DENSE_A_MAX_POINTS} points).  Use method='auto' or "
                f"'original' (matrix-free A = M M^T).")
        if self.method == "modified":
            # A[k,l] = 3D dirac of point pairs with the LL kernel (hat by
            # default - see dirac_ll in __init__; reference
            # lagrange_3D.hpp:265-295 + diracDeltaTypeLL), built ON DEVICE
            # in row blocks: the full [m, m, 3] host difference tensor
            # would be m^2 * 24 bytes (25 GB at 32k points), and a
            # host-built A re-uploads per trace
            ll = jnp.asarray(self.ll_lat, jnp.float32)

            @jax.jit
            def block(rows, ll):
                d = rows[:, None, :] - ll[None, :, :]
                return dirac_delta_3d(
                    self.dirac_ll, d[..., 0], d[..., 1], d[..., 2])

            bs = max(1, min(self.m, 2**26 // max(self.m, 1)))  # ~256MB temps
            parts = [block(ll[i : i + bs], ll) for i in range(0, self.m, bs)]
            self.A = (parts[0] if len(parts) == 1
                      else jnp.concatenate(parts, axis=0))
        else:
            self.A = None  # matrix-free: A x = interpolate(spread(x))

    # ------------------------------------------------------------- operators
    #
    # ``consts`` protocol: every operator takes an optional dict
    # {"A": [m,m]|None, "w": [m,s^3], "nodes": [m,s^3,3]} overriding the
    # solver's own device arrays.  Step builders thread this pytree through
    # as an ACTUAL jit argument (Simulation passes hook.consts per call):
    # closed-over arrays would be inlined into the lowered HLO as dense
    # constants (measured: a 16 MB array costs a 33 MB HLO upload), which
    # breaks remote compilation for large clouds - the round-2 ~10k-point
    # ceiling.  As arguments they stay device buffers.

    def hook_consts(self):
        """The device arrays a jitted step must receive as arguments."""
        return {"A": self.A, "w": self.weights, "nodes": self._nodes_dev}

    def _cw(self, consts):
        if consts is None:
            return self.A, self.weights, self._nodes_dev
        return consts["A"], consts["w"], consts["nodes"]

    def interpolate(self, field: jnp.ndarray, consts=None) -> jnp.ndarray:
        """M u: sample an Eulerian field [C, X, Y, Z] at the points -> [m, C]."""
        _, w, n = self._cw(consts)
        nx, ny, nz = field.shape[1:]
        ix = jnp.clip(n[..., 0], 0, nx - 1)
        iy = jnp.clip(n[..., 1], 0, ny - 1)
        iz = jnp.clip(n[..., 2], 0, nz - 1)
        vals = field[:, ix, iy, iz]  # [C, m, s^3]
        # explicit multiply-sum: einsum lowers to a dot whose default TPU
        # precision rounds f32 inputs to bf16 (ops/contract.py)
        return jnp.sum(vals * w.astype(field.dtype)[None], axis=-1).T

    def spread(self, vals: jnp.ndarray, shape, consts=None) -> jnp.ndarray:
        """M^T x: spread point values [m, C] to an Eulerian field [C, *shape]."""
        _, w, n = self._cw(consts)
        nx, ny, nz = shape
        ix = jnp.clip(n[..., 0], 0, nx - 1)
        iy = jnp.clip(n[..., 1], 0, ny - 1)
        iz = jnp.clip(n[..., 2], 0, nz - 1)
        flat = (ix * ny + iy) * nz + iz  # [m, s^3]
        contrib = w[..., None] * vals[:, None, :]  # [m, s^3, C]
        C = vals.shape[1]
        out = jnp.zeros((nx * ny * nz, C), vals.dtype)
        out = out.at[flat.reshape(-1)].add(contrib.reshape(-1, C))
        return out.T.reshape((C,) + tuple(shape))

    def _matvec(self, x, shape, consts=None):
        """A x for the CG solve; x: [m, C]."""
        A = self._cw(consts)[0]
        if A is not None:
            # f32 accumulation on the MXU: default matmul precision would
            # round the inputs to bf16 and stall CG convergence
            return jnp.matmul(A.astype(x.dtype), x,
                              precision=jax.lax.Precision.HIGHEST)
        return self.interpolate(self.spread(x, shape, consts), consts=consts)

    def _cg(self, matvec, b):
        """Batched CG over the C right-hand sides with iteration/residual
        reporting (the reference logs both per solve and defaults to
        maxIter 10000, residue 3e-4 - lagrange_3D.hpp:661-668, 899-906;
        jax.scipy's cg discards them, so we run our own while_loop).

        Returns (x, iters, rel_residual) where rel_residual is the max over
        columns of ||r||/||b||."""
        bb = jnp.sum(b * b, axis=0)  # [C]
        bb_safe = jnp.where(bb == 0, 1.0, bb)
        tol2 = jnp.asarray(self.tol, b.dtype) ** 2

        def cond(state):
            x, r, p, rr, k = state
            return (k < self.max_iters) & jnp.any(rr / bb_safe > tol2)

        def body(state):
            x, r, p, rr, k = state
            ap = matvec(p)
            pap = jnp.sum(p * ap, axis=0)
            alpha = jnp.where(pap == 0, 0.0, rr / jnp.where(pap == 0, 1.0, pap))
            x = x + alpha * p
            r = r - alpha * ap
            rr_new = jnp.sum(r * r, axis=0)
            beta = jnp.where(rr == 0, 0.0, rr_new / jnp.where(rr == 0, 1.0, rr))
            p = r + beta * p
            return x, r, p, rr_new, k + 1

        x0 = jnp.zeros_like(b)
        rr0 = jnp.sum(b * b, axis=0)
        x, r, _, rr, k = jax.lax.while_loop(cond, body, (x0, b, b, rr0, jnp.asarray(0)))
        rel = jnp.sqrt(jnp.max(rr / bb_safe))
        return x, k, rel

    # ------------------------------------------------------------- solve
    def compute_forces(self, u_star: jnp.ndarray, rho: jnp.ndarray,
                       consts=None) -> jnp.ndarray:
        """Solve for the velocity-correction forces and spread them.

        u_star: [3, X, Y, Z] fluid velocity without the IBM force;
        returns the Eulerian force field [3, X, Y, Z]
        (reference lagrange_3D.hpp:632-852: b = -M u* (+ target velocity),
        CG solve A x = b per component, then f += 2 rho M^T x).
        """
        shape = u_star.shape[1:]
        b = -self.interpolate(u_star, consts=consts)  # [m, 3]
        if self.use_ll_velocity:
            b = b + jnp.asarray(self.prescribed_velocity, b.dtype)

        matvec = partial(self._matvec, shape=shape, consts=consts)
        x, iters, rel = self._cg(matvec, b)
        self.last_cg_iters = iters      # traced under jit; concrete eagerly
        self.last_cg_residual = rel
        self._log_cg(iters, rel)
        f_pts = 2.0 * x  # [m, 3]
        force = self.spread(f_pts, shape, consts=consts)
        return force * rho[None]

    def _log_cg(self, iters, rel):
        """CG diagnostics (reference lagrange_3D.hpp:661-668).  Eager: log
        directly; under jit: via debug.callback so the solve stays traced."""

        def emit(iters, rel):
            line = (
                '{"ibm": "computeForces", "cg_iterations": %d, '
                '"cg_residual": %.3e}' % (int(iters), float(rel))
            )
            if float(rel) > self.tol and int(iters) >= self.max_iters:
                self.log.warning("CG did not converge: %s", line)
            else:
                self.log.info(line)

        if isinstance(iters, jax.core.Tracer):
            # host callbacks are unsupported on some TPU plugins (axon
            # raises UNIMPLEMENTED at run time); keep in-jit logging to
            # backends known to support it.  The last iteration/residual
            # stay fetchable as device arrays (last_cg_iters/_residual).
            if jax.default_backend() == "cpu":
                jax.debug.callback(emit, iters, rel)
        else:
            emit(iters, rel)

    def forcing_hook(self):
        """Adapter: LBMConfig.forcing_hook closing over this solver.

        The hook carries ``hook.consts`` (A / weights / nodes as a pytree):
        hook-aware step builders accept a ``hook_consts`` argument and pass
        it through, so the arrays enter jit as buffers instead of inlined
        HLO constants (the round-2 large-cloud remote-compile ceiling)."""

        def hook(lat, rho, u, nu, fluid_mask, consts=None):
            del lat, nu, fluid_mask
            return self.compute_forces(u, rho, consts=consts)

        hook.consts = self.hook_consts()
        return hook

    # ------------------------------------------------------- distributed IBM
    # The reference runs IBM inside its multi-GPU step (state.hpp:995-1015,
    # kernels.h:178-218, lagrange_3D.hpp:632-852).  The TPU equivalent keeps
    # the (small) Lagrangian cloud REPLICATED on every shard and partitions
    # the Eulerian work by node ownership: each shard interpolates only the
    # stencil nodes inside its local block (one psum of [m, 3] completes
    # M u*), the CG solve runs replicated (zero communication for the dense
    # "modified" A; one psum per iteration for the matrix-free "original"
    # A = M M^T), and spreading scatters only locally-owned nodes - every
    # node has exactly one owner, so no halo exchange is needed at all.

    def _local_ids(self, plan, shape):
        """(offsets [3] traced, local extents [3] static, mesh axis names)."""
        from jax import lax

        offs, exts, names = [], [], []
        for a in range(3):
            name = plan.spatial_axes[a]
            n = plan.mesh.shape[name] if name is not None else 1
            ext = shape[a] // n
            exts.append(ext)
            if name is None or n == 1:
                offs.append(0)
            else:
                offs.append(lax.axis_index(name) * ext)
                names.append(name)
        return offs, exts, tuple(names)

    def _owned(self, plan, shape):
        """Per-shard local node coords + ownership mask for the stencils."""
        offs, exts, names = self._local_ids(plan, shape)
        n = self._nodes_dev
        loc, inside = [], None
        for a in range(3):
            g = jnp.clip(n[..., a], 0, shape[a] - 1)
            l = g - offs[a]
            ok = (l >= 0) & (l < exts[a])
            inside = ok if inside is None else (inside & ok)
            loc.append(jnp.clip(l, 0, exts[a] - 1))
        return loc, inside, exts, names

    def _owned_c(self, plan, shape, nodes):
        """Per-shard local node coords + ownership mask for given nodes."""
        offs, exts, names = self._local_ids(plan, shape)
        loc, inside = [], None
        for a in range(3):
            g = jnp.clip(nodes[..., a], 0, shape[a] - 1)
            l = g - offs[a]
            ok = (l >= 0) & (l < exts[a])
            inside = ok if inside is None else (inside & ok)
            loc.append(jnp.clip(l, 0, exts[a] - 1))
        return loc, inside, exts, names

    def interpolate_sharded(self, field, plan, shape, consts=None):
        """M u on the local shard of ``field`` [C, Xl, Yl, Zl] -> replicated
        [m, C] (partial sums over owned nodes, completed with one psum)."""
        from jax import lax

        _, w, nodes = self._cw(consts)
        (ix, iy, iz), inside, _, names = self._owned_c(plan, shape, nodes)
        vals = field[:, ix, iy, iz]  # [C, m, s^3]
        wl = (w * inside).astype(field.dtype)
        partial_mc = jnp.sum(vals * wl[None], axis=-1).T  # [m, C] exact sum
        return lax.psum(partial_mc, names) if names else partial_mc

    def spread_sharded(self, vals, plan, shape, consts=None):
        """M^T x onto this shard's local block [C, Xl, Yl, Zl]."""
        _, w, nodes = self._cw(consts)
        (ix, iy, iz), inside, exts, _ = self._owned_c(plan, shape, nodes)
        lx, ly, lz = exts
        flat = (ix * ly + iy) * lz + iz  # [m, s^3] local flat ids
        wl = (w * inside).astype(vals.dtype)
        contrib = wl[..., None] * vals[:, None, :]  # [m, s^3, C]
        C = vals.shape[1]
        out = jnp.zeros((lx * ly * lz, C), vals.dtype)
        out = out.at[flat.reshape(-1)].add(contrib.reshape(-1, C))
        return out.T.reshape((C, lx, ly, lz))

    def compute_forces_sharded(self, u_star, rho, plan, shape, consts=None):
        """Per-shard force solve: same math as ``compute_forces`` with the
        Eulerian operators partitioned by node ownership.  ``u_star``/``rho``
        are this shard's local blocks; returns the local force block."""
        A = self._cw(consts)[0]
        b = -self.interpolate_sharded(u_star, plan, shape, consts)
        if self.use_ll_velocity:
            b = b + jnp.asarray(self.prescribed_velocity, b.dtype)
        if A is not None:
            matvec = lambda x: jnp.matmul(  # noqa: E731
                A.astype(x.dtype), x, precision=jax.lax.Precision.HIGHEST)
        else:
            def matvec(x):
                return self.interpolate_sharded(
                    self.spread_sharded(x, plan, shape, consts), plan, shape,
                    consts)

        x, iters, rel = self._cg(matvec, b)
        self.last_cg_iters = iters
        self.last_cg_residual = rel
        self._log_cg(iters, rel)
        force = self.spread_sharded(2.0 * x, plan, shape, consts)
        return force * rho[None]

    def sharded_hook(self, plan, shape):
        """``LBMConfig.forcing_hook`` for a sharded run: shard-aware IBM
        executed INSIDE shard_map (pass the resulting cfg + plan to
        Simulation / make_sharded_step)."""

        def hook(lat, rho, u, nu, fluid_mask, consts=None):
            del lat, nu, fluid_mask
            return self.compute_forces_sharded(u, rho, plan, tuple(shape),
                                               consts=consts)

        # runs INSIDE shard_map (lax.axis_index / psum over the mesh axes) -
        # make_sharded_step must not lift it to the global GSPMD level
        hook.shard_local = True
        hook.consts = self.hook_consts()
        return hook

    # ---------------------------------------------------------- diagnostics
    def integrate_force(self, force_field: jnp.ndarray) -> np.ndarray:
        """Total body force (reference lagrange_3D.hpp:862-890)."""
        return np.asarray(jax.device_get(jnp.sum(force_field, axis=(1, 2, 3))))

    def min_max_spacing(self):
        """Min/max nearest-neighbor distance of the point cloud (diagnostics
        printed by the reference generators, obstacles_ibm.h:54-66)."""
        d = np.linalg.norm(self.points_phys[:, None] - self.points_phys[None, :], axis=-1)
        np.fill_diagonal(d, np.inf)
        nn = d.min(axis=1)
        return float(nn.min()), float(nn.max())
