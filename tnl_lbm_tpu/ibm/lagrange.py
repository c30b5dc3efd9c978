"""Wu-Shu velocity-correction IBM on TPU.

Analog of the reference ``Lagrange3D<LBM>`` (reference: lagrange_3D.h:39-153,
lagrange_3D.hpp): Lagrangian points immersed in the Eulerian lattice; each
step solves for boundary forces such that the interpolated fluid velocity at
the points matches the target (zero or prescribed) velocity, then spreads
those forces back to the lattice.

TPU-first re-design (round 5; reference sparse machinery:
lagrange_3D.h:65-97 SlicedEllpack M/M^T/A, build kernels
ibm_kernels.h:7-186, method variants lagrange_3D.hpp:265-331):

- All sparse STRUCTURE is precomputed once on the host (the cloud is
  static): bucket-grid neighbor lists, unique stencil nodes, ELLPACK
  packing (``ibm/sparse.py``) - O(m * neighbors), then shipped to the
  device as plain arrays entering jit as arguments (hook-consts protocol).
- The per-step solve runs in the SMALLER of point space and node space.
  With W the [m, u] interpolation matrix over the u unique stencil nodes,
  the physics consumes only y = W^T x of the solution of (W W^T) x = b,
  and y = (W^T W)^+ W^T b exactly (Moore-Penrose).  In the reference's
  production regime (points denser than the lattice: 1e5 points on a
  96^3-grid sphere -> u ~ 2e4 << m) the node-space Gram B = W^T W is a
  small dense SPD matrix: the whole solve becomes [u, u] MXU matmuls with
  ZERO gather/scatter inside CG - where the round-4 implementation paid
  16.5 s/step for XLA scatters inside every CG iteration.
- Sparse clouds (u >= m) solve in point space: the "modified" hat-kernel
  A and the "original" Gram G = W W^T are ELLPACK matrices (padded
  neighbor lists, matvec = one static gather + multiply-sum).
- CG is Jacobi-preconditioned (the reference uses a diagonal
  preconditioner, lagrange_3D.hpp:899-906).
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

from tnl_lbm_tpu.ibm.dirac import (
    dirac_delta,
    dirac_delta_3d,
    dirac_support,
    _SUPPORT,
)
from tnl_lbm_tpu.ibm.sparse import neighbor_pairs, pack_ellpack, unique_nodes
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
        units: Lattice unit system (phys <-> lattice transforms).  Its
          ``global_size`` is the production grid: the compact (unique-node)
          operators are built for it; calls on other shapes take the
          generic gather/scatter path.
        points_phys: [m, 3] Lagrangian points in physical coordinates.
        dirac: kernel name phi1..phi4 (reference lagrange_3D.h:114-115).
        method: "auto" | "modified" | "original" (reference
          lagrange_3D.hpp:265-331).  "auto" keeps the historical operator
          choice: "modified" up to ``DENSE_A_MAX_POINTS`` points and
          "original" beyond (the operators differ, so the threshold is a
          physics choice, not a memory one - both are sparse now).
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
        self.grid_shape = tuple(int(x) for x in units.global_size)

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
        self._build_operators()
        self.log.info(
            '{"ibm": "constructMatrices", "points": %d, "dirac": "%s", "method": "%s", '
            '"space": "%s", "unique_nodes": %d, "wall_s": %.4f}',
            self.m, dirac, self.method, self.space, self.u,
            time.perf_counter() - t0,
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
        self._w_np = np.asarray(w, np.float32)
        self._nodes_dev = jnp.asarray(nodes, jnp.int32)

        # compact (unique-node) structure for the production grid shape
        uflat_np, uid_np = unique_nodes(nodes, self.grid_shape)
        # prune numerically-empty nodes: a unique node whose total squared
        # weight is ~0 (points exactly at the support boundary) carries no
        # physics but puts a ~1e-24 entry on diag(B), exploding the Jacobi
        # preconditioner in f32.  Slots of pruned nodes keep their (tiny)
        # weights and remap to node 0 - error bounded by the threshold.
        colnorm = np.zeros(len(uflat_np), np.float64)
        np.add.at(colnorm, uid_np.reshape(-1), (w.reshape(-1) ** 2))
        keep = colnorm > 1e-16 * max(colnorm.max(), 1e-300)
        if not keep.all():
            remap = np.zeros(len(uflat_np), np.int64)
            remap[keep] = np.arange(int(keep.sum()))
            uflat_np = uflat_np[keep]
            uid_np = remap[uid_np].astype(np.int32)
        self.u = len(uflat_np)
        self._uflat_np = uflat_np
        self._uid_np = uid_np
        self.uflat = jnp.asarray(uflat_np)
        self.uid = jnp.asarray(uid_np)
        self.unodes = jnp.asarray(
            np.stack(np.unravel_index(uflat_np.astype(np.int64),
                                      self.grid_shape), axis=-1), jnp.int32)
        lo, hi = nodes.min(axis=(0, 1)), nodes.max(axis=(0, 1))
        self._clipped = bool((lo < 0).any() or
                             (hi >= np.asarray(self.grid_shape)).any())

    #: "auto" method threshold: "modified" up to here, "original" beyond.
    #: Historical name - the dense [m, m] A is gone (everything is sparse /
    #: compact now); the threshold is kept so "auto" keeps selecting the
    #: same OPERATOR as earlier rounds for the same cloud.
    DENSE_A_MAX_POINTS = 32768

    #: largest node count for which the node-space Gram B = W^T W is
    #: materialized densely ([u, u] f32; 32768 -> 4 GB, comfortably inside
    #: a 16 GB v5e next to the lattice fields.  Round 5: raised from 24576
    #: after the canonical 1e5-points-on-96^3-sphere case measured u ~ 29k
    #: and fell through to the point-space Gram, whose neighbor list is
    #: quadratic-ish on clouds this dense (the 3e8-candidate MemoryError
    #: in docs/measurements/r5/r5_ibm_1e5.log)
    NODE_DENSE_CAP = 32768

    # ------------------------------------------------------------ operators
    def _build_operators(self):
        if self.method == "auto":
            self.method = ("modified" if self.m <= self.DENSE_A_MAX_POINTS
                           else "original")
            self.log.info("IBM: method 'auto' -> '%s' for %d points",
                          self.method, self.m)

        self.A = None          # legacy attribute (dense A is gone)
        self.B = None          # node-space Gram W^T W  [u, u]
        self.E_idx = None      # point-space ELLPACK (A or G)
        self.E_val = None
        self.diag = None       # Jacobi preconditioner of the active system

        if self.method == "modified":
            # A[k,l] = 3D dirac of point pairs with the LL kernel (hat by
            # default - see dirac_ll in __init__; reference
            # lagrange_3D.hpp:265-295 + diracDeltaTypeLL).  The hat has
            # per-dim support < _SUPPORT[dirac_ll]: a bucket-grid neighbor
            # list + ELLPACK replaces the old dense [m, m] build (206 s at
            # 32k points, round-4 measurement) with an O(m * neighbors) one.
            self.space = "point"
            radius = float(_SUPPORT[self.dirac_ll])
            ks, ls = neighbor_pairs(self.ll_lat, radius)
            vals = self._pair_dirac_ll(ks, ls)
            idx, val = pack_ellpack(ks, ls, vals, self.m)
            self.E_idx = jnp.asarray(idx)
            self.E_val = jnp.asarray(val)
            self.diag = jnp.asarray(self._ell_diag(ks, ls, vals), jnp.float32)
        elif self.u <= min(self.m, self.NODE_DENSE_CAP):
            # original, dense cloud: node-space dense Gram (see module
            # docstring) - the per-step solve is pure MXU work.
            # B = W^T W is SEMI-definite whenever shell-edge columns of W
            # are nearly dependent, and in node space the solution y IS the
            # physics (the spread force), so null-space drift cannot be
            # projected out downstream the way point-space x-drift is by
            # y = W^T x.  Hence UNPRECONDITIONED CG (diag None): its Krylov
            # space span{B b, B^2 b, ...} stays inside range(B), and it is
            # the image under W^T of exactly the Krylov space the legacy
            # point-space iteration searches - truncated-CG regularization
            # behaves the same way in both formulations.  (A Jacobi
            # preconditioner rotates out of range(B): measured blow-up to
            # 1e11-scale null-space forces at sub-grid spacing.)
            self.space = "node"
            self.B = self._gram_node()
            self.diag = None
        else:
            # original, sparse cloud: point-space Gram G = W W^T as ELLPACK
            self.space = "point"
            if self._clipped:
                # stencils clipped at the domain edge can make arbitrarily
                # distant points overlap on a boundary node - no finite
                # neighbor radius is safe, keep the matrix-free operator
                self.log.info("IBM: clipped stencils -> matrix-free Gram")
                self.diag = jnp.asarray(self._gram_diag_np(), jnp.float32)
            else:
                radius = 2.0 * float(_SUPPORT[self.dirac])
                try:
                    ks, ls = neighbor_pairs(self.ll_lat, radius)
                except MemoryError:
                    # cloud denser than the lattice: every point overlaps
                    # hundreds of others and an explicit point-space Gram
                    # is near-quadratic - solve matrix-free through the
                    # compact node space instead (exact, same Krylov space)
                    self.log.info(
                        "IBM: point cloud too dense for an explicit Gram "
                        "(m=%d, u=%d) -> matrix-free node-space operator",
                        self.m, self.u)
                    self.diag = jnp.asarray(self._gram_diag_np(),
                                            jnp.float32)
                    return
                vals = self._pair_gram(ks, ls)
                idx, val = pack_ellpack(ks, ls, vals, self.m,
                                        drop_below=0.0)
                self.E_idx = jnp.asarray(idx)
                self.E_val = jnp.asarray(val)
                self.diag = jnp.asarray(self._ell_diag(ks, ls, vals),
                                        jnp.float32)

    def _ell_diag(self, ks, ls, vals):
        dsel = ks == ls
        diag = np.zeros(self.m, np.float32)
        np.add.at(diag, ks[dsel], vals[dsel].astype(np.float32))
        return diag

    def _gram_diag_np(self) -> np.ndarray:
        """diag(W W^T) including duplicate-clipped stencil slots."""
        diag = np.zeros(self.m, np.float64)
        for i in range(0, self.m, 4096):
            uid = self._uid_np[i : i + 4096]
            w = self._w_np[i : i + 4096].astype(np.float64)
            match = uid[:, :, None] == uid[:, None, :]
            diag[i : i + 4096] = (w[:, :, None] * w[:, None, :] * match
                                  ).sum(axis=(1, 2))
        return diag

    def _pair_dirac_ll(self, ks, ls, chunk: int = 4_000_000) -> np.ndarray:
        """phi_ll(x_k - x_l) for pair lists, evaluated on device in chunks."""
        ll = jnp.asarray(self.ll_lat, jnp.float32)

        @jax.jit
        def ev(a, b):
            d = ll[a] - ll[b]
            return dirac_delta_3d(self.dirac_ll, d[:, 0], d[:, 1], d[:, 2])

        return self._chunked_pairs(ev, ks, ls, chunk)

    def _pair_gram(self, ks, ls, chunk: int = 262_144) -> np.ndarray:
        """(W W^T)[k,l] = sum_{s,t} w_k[s] w_l[t] [uid_k[s] == uid_l[t]].

        Exact including duplicate-clipped stencil slots (the uid match is
        over CLIPPED unique nodes, the same convention interpolate/spread
        use)."""
        uid, w = self.uid, self.weights

        @jax.jit
        def ev(a, b):
            ua, ub = uid[a], uid[b]            # [C, s3]
            wa, wb = w[a], w[b]
            match = ua[:, :, None] == ub[:, None, :]
            return jnp.sum(wa[:, :, None] * wb[:, None, :] * match,
                           axis=(1, 2))

        return self._chunked_pairs(ev, ks, ls, chunk)

    @staticmethod
    def _chunked_pairs(ev, ks, ls, chunk) -> np.ndarray:
        out = np.empty(len(ks), np.float32)
        for i in range(0, len(ks), chunk):
            a = np.asarray(ks[i : i + chunk], np.int32)
            b = np.asarray(ls[i : i + chunk], np.int32)
            pad = chunk - len(a)
            if pad and i > 0:  # keep one compiled shape for the tail
                a = np.pad(a, (0, pad))
                b = np.pad(b, (0, pad))
                out[i:] = np.asarray(jax.device_get(ev(a, b)))[: chunk - pad]
            else:
                out[i : i + len(a)] = np.asarray(jax.device_get(ev(a, b)))
        return out

    def _gram_node(self, chunk: int = 2048):
        """B = W^T W [u, u] via chunked dense-W MXU products."""
        u, s3 = self.u, self._w_np.shape[1]
        mp = ((self.m + chunk - 1) // chunk) * chunk
        uid_p = np.zeros((mp, s3), np.int32)
        w_p = np.zeros((mp, s3), np.float32)
        uid_p[: self.m] = self._uid_np
        w_p[: self.m] = self._w_np
        rows = jnp.arange(chunk)[:, None]

        @partial(jax.jit, donate_argnums=0)
        def acc(B, uid_c, w_c):
            Wc = jnp.zeros((chunk, u), jnp.float32).at[rows, uid_c].add(w_c)
            return B + jnp.matmul(Wc.T, Wc,
                                  precision=jax.lax.Precision.HIGHEST)

        B = jnp.zeros((u, u), jnp.float32)
        for i in range(0, mp, chunk):
            B = acc(B, jnp.asarray(uid_p[i : i + chunk]),
                    jnp.asarray(w_p[i : i + chunk]))
        return B

    def _spread_compact_np(self, x_pts: np.ndarray) -> np.ndarray:
        """Host W^T x: [m, C] point values -> [u, C] node values."""
        C = x_pts.shape[1]
        out = np.zeros((self.u, C), np.float64)
        contrib = self._w_np[..., None] * np.asarray(x_pts)[:, None, :]
        np.add.at(out, self._uid_np.reshape(-1), contrib.reshape(-1, C))
        return out

    def dense_A(self) -> np.ndarray:
        """Densify the point-point operator (diagnostics/tests only)."""
        if self.E_idx is None:
            raise ValueError("no ELLPACK operator (node-space solver)")
        A = np.zeros((self.m, self.m), np.float64)
        idx = np.asarray(self.E_idx)
        val = np.asarray(self.E_val, np.float64)
        np.add.at(A, (np.arange(self.m)[:, None], idx), val)
        return A

    # ------------------------------------------------------------- operators
    #
    # ``consts`` protocol: every operator takes an optional dict (see
    # ``hook_consts``) overriding the solver's own device arrays.  Step
    # builders thread this pytree through as an ACTUAL jit argument
    # (Simulation passes hook.consts per call): closed-over arrays would be
    # inlined into the lowered HLO as dense constants (measured: a 16 MB
    # array costs a 33 MB HLO upload), which breaks remote compilation for
    # large clouds - the round-2 ~10k-point ceiling.  As arguments they
    # stay device buffers.

    def hook_consts(self):
        """The device arrays a jitted step must receive as arguments."""
        # W^T v_p for the node-space prescribed-velocity RHS, computed HERE
        # (not at build) so callers that set prescribed_velocity after
        # construction get the value in effect when the step is built -
        # the same bake-at-trace semantics the point-space path has
        wt_vp = None
        if self.use_ll_velocity and self.space == "node":
            wt_vp = jnp.asarray(self._spread_compact_np(
                self.prescribed_velocity), jnp.float32)
        return {
            "w": self.weights, "nodes": self._nodes_dev,
            "uflat": self.uflat, "uid": self.uid, "unodes": self.unodes,
            "B": self.B, "E_idx": self.E_idx, "E_val": self.E_val,
            "diag": self.diag, "Wt_vp": wt_vp,
        }

    def _cw(self, consts):
        if consts is None:
            consts = {}
        return (consts.get("w", self.weights),
                consts.get("nodes", self._nodes_dev))

    def interpolate(self, field: jnp.ndarray, consts=None) -> jnp.ndarray:
        """M u: sample an Eulerian field [C, X, Y, Z] at the points -> [m, C]."""
        w, n = self._cw(consts)
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
        w, n = self._cw(consts)
        nx, ny, nz = shape
        ix = jnp.clip(n[..., 0], 0, nx - 1)
        iy = jnp.clip(n[..., 1], 0, ny - 1)
        iz = jnp.clip(n[..., 2], 0, nz - 1)
        flat = (ix * ny + iy) * nz + iz  # [m, s^3]
        contrib = w.astype(vals.dtype)[..., None] * vals[:, None, :]  # [m, s^3, C]
        C = vals.shape[1]
        out = jnp.zeros((nx * ny * nz, C), vals.dtype)
        out = out.at[flat.reshape(-1)].add(contrib.reshape(-1, C))
        return out.T.reshape((C,) + tuple(shape))

    def _ell_matvec(self, x, consts):
        idx = consts["E_idx"] if consts and consts.get("E_idx") is not None else self.E_idx
        val = consts["E_val"] if consts and consts.get("E_val") is not None else self.E_val
        return jnp.sum(val.astype(x.dtype)[..., None] * x[idx], axis=1)

    def _matvec(self, x, shape, consts=None):
        """A x for the legacy (generic-shape) CG solve; x: [m, C]."""
        if self.method == "modified":
            return self._ell_matvec(x, consts)
        return self.interpolate(self.spread(x, shape, consts), consts=consts)

    def _cg(self, matvec, b, diag=None):
        """Batched Jacobi-preconditioned CG over the C right-hand sides with
        iteration/residual reporting (the reference logs both per solve,
        defaults to maxIter 10000 / residue 3e-4, and preconditions with the
        diagonal - lagrange_3D.hpp:661-668, 899-906; jax.scipy's cg discards
        the diagnostics, so we run our own while_loop).

        Returns (x, iters, rel_residual) where rel_residual is the max over
        columns of ||r||/||b|| (unpreconditioned norms)."""
        bb = jnp.sum(b * b, axis=0)  # [C]
        bb_safe = jnp.where(bb == 0, 1.0, bb)
        tol2 = jnp.asarray(self.tol, b.dtype) ** 2
        if diag is None:
            prec = lambda r: r  # noqa: E731
        else:
            # clamped Jacobi: a near-zero diagonal entry must not produce
            # an astronomically large (f32-overflowing) scaling
            dmax = jnp.max(diag)
            floor = jnp.maximum(1e-9 * dmax, jnp.asarray(1e-30, diag.dtype))
            inv = (1.0 / jnp.maximum(diag, floor)).astype(b.dtype)[:, None]
            prec = lambda r: inv * r  # noqa: E731

        # null-direction breakdown guard: the node-space Gram is often
        # SEMI-definite (shell-edge columns of W are nearly dependent); the
        # right-hand side is in range(B) by construction so CG is sound,
        # but f32 rounding leaks into the null space where p^T A p ~ 0 and
        # alpha = rz / pap would explode.  A column whose search direction
        # goes numerically null is frozen (its solution stops improving,
        # exactly like a breakdown-terminated solver).
        def cond(state):
            x, r, p, rz, rr, dead, k = state
            return (k < self.max_iters) & jnp.any(
                ~dead & (rr / bb_safe > tol2))

        def body(state):
            x, r, p, rz, rr, dead, k = state
            ap = matvec(p)
            pap = jnp.sum(p * ap, axis=0)
            # a non-positive curvature direction is f32 null-space noise:
            # freeze the column (= breakdown-terminated solver); likewise
            # freeze on clear residual divergence before x can blow up
            dead = dead | (pap <= 0) | (rr > 4.0 * bb_safe)
            alpha = jnp.where(dead, 0.0, rz / jnp.where(pap == 0, 1.0, pap))
            x = x + alpha * p
            r = r - alpha * ap
            z = prec(r)
            rz_new = jnp.sum(r * z, axis=0)
            beta = jnp.where(rz == 0, 0.0, rz_new / jnp.where(rz == 0, 1.0, rz))
            p = z + beta * p
            return x, r, p, rz_new, jnp.sum(r * r, axis=0), dead, k + 1

        x0 = jnp.zeros_like(b)
        z0 = prec(b)
        rz0 = jnp.sum(b * z0, axis=0)
        dead0 = jnp.zeros(b.shape[1:], bool)
        x, r, _, _, rr, _, k = jax.lax.while_loop(
            cond, body, (x0, b, z0, rz0, bb, dead0, jnp.asarray(0)))
        rel = jnp.sqrt(jnp.max(rr / bb_safe))
        return x, k, rel

    # ------------------------------------------------------------- solve
    def _solve_compact(self, ug, consts):
        """Core solve from node velocities: ug [u, C] (u* sampled at the
        unique stencil nodes) -> (y [u, C] node forces = M^T x, iters, rel).

        Node space: rhs = W^T b = -B ug; solve B y = rhs (exact reduction,
        see module docstring).  Point space: b = -W ug; CG on A (modified)
        or G = W W^T (original); y = W^T x."""
        c = consts if consts is not None else self.hook_consts()
        dt = ug.dtype
        B = c.get("B")
        if B is not None:
            Bc = B.astype(dt)
            rhs = -jnp.matmul(Bc, ug, precision=jax.lax.Precision.HIGHEST)
            if self.use_ll_velocity and c.get("Wt_vp") is not None:
                rhs = rhs + c["Wt_vp"].astype(dt)
            mv = lambda v: jnp.matmul(Bc, v,  # noqa: E731
                                      precision=jax.lax.Precision.HIGHEST)
            y, iters, rel = self._cg(mv, rhs, diag=c.get("diag"))
            return y, iters, rel

        w = c.get("w", self.weights).astype(dt)
        uid = c.get("uid", self.uid)
        u = ug.shape[0]
        b = -jnp.sum(w[..., None] * ug[uid], axis=1)  # [m, C]
        if self.use_ll_velocity:
            b = b + jnp.asarray(self.prescribed_velocity, dt)
        if c.get("E_idx") is not None:
            mv = lambda x: self._ell_matvec(x, c)  # noqa: E731
        else:
            # matrix-free Gram through the compact node space (exact with
            # clipped stencils; only used for clipped edge-case clouds)
            def mv(x):
                C = x.shape[1]
                t = jnp.zeros((u, C), dt).at[uid.reshape(-1)].add(
                    (w[..., None] * x[:, None, :]).reshape(-1, C))
                return jnp.sum(w[..., None] * t[uid], axis=1)

        x, iters, rel = self._cg(mv, b, diag=c.get("diag"))
        C = x.shape[1]
        y = jnp.zeros((u, C), dt).at[uid.reshape(-1)].add(
            (w[..., None] * x[:, None, :]).reshape(-1, C))
        return y, iters, rel

    def compute_forces(self, u_star: jnp.ndarray, rho: jnp.ndarray,
                       consts=None) -> jnp.ndarray:
        """Solve for the velocity-correction forces and spread them.

        u_star: [3, X, Y, Z] fluid velocity without the IBM force;
        returns the Eulerian force field [3, X, Y, Z]
        (reference lagrange_3D.hpp:632-852: b = -M u* (+ target velocity),
        CG solve A x = b per component, then f += 2 rho M^T x).
        """
        shape = tuple(u_star.shape[1:])
        c = consts if consts is not None else self.hook_consts()
        if shape == self.grid_shape and c.get("uflat") is not None:
            uflat = c["uflat"]
            ug = u_star.reshape(u_star.shape[0], -1)[:, uflat].T  # [u, C]
            y, iters, rel = self._solve_compact(ug, c)
            self.last_cg_iters = iters
            self.last_cg_residual = rel
            self._log_cg(iters, rel)
            out = jnp.zeros((u_star.shape[0],) + (int(np.prod(shape)),),
                            u_star.dtype)
            out = out.at[:, uflat].add((2.0 * y).T, unique_indices=True)
            return out.reshape(u_star.shape) * rho[None]

        # generic-shape fallback (tests, ad-hoc grids): gather/scatter ops
        b = -self.interpolate(u_star, consts=consts)  # [m, 3]
        if self.use_ll_velocity:
            b = b + jnp.asarray(self.prescribed_velocity, b.dtype)
        matvec = partial(self._matvec, shape=shape, consts=consts)
        diag = (c or {}).get("diag", self.diag)
        x, iters, rel = self._cg(matvec, b, diag=diag)
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

        The hook carries ``hook.consts`` (the precomputed operator arrays
        as a pytree): hook-aware step builders accept a ``hook_consts``
        argument and pass it through, so the arrays enter jit as buffers
        instead of inlined HLO constants (the round-2 large-cloud
        remote-compile ceiling)."""

        def hook(lat, rho, u, nu, fluid_mask, consts=None):
            del lat, nu, fluid_mask
            return self.compute_forces(u, rho, consts=consts)

        hook.consts = self.hook_consts()
        return hook

    # ------------------------------------------------------- distributed IBM
    # The reference runs IBM inside its multi-GPU step (state.hpp:995-1015,
    # kernels.h:178-218, lagrange_3D.hpp:632-852).  The TPU equivalent keeps
    # the (small) Lagrangian cloud REPLICATED on every shard and partitions
    # the Eulerian work by node ownership: each shard samples u* at the
    # unique stencil nodes inside its local block (one psum of [u, 3]
    # completes the node velocities), the compact solve runs REPLICATED
    # (zero communication per CG iteration), and spreading scatters only
    # locally-owned nodes - every node has exactly one owner, so no halo
    # exchange is needed at all.

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

        w, nodes = self._cw(consts)
        (ix, iy, iz), inside, _, names = self._owned_c(plan, shape, nodes)
        vals = field[:, ix, iy, iz]  # [C, m, s^3]
        wl = (w * inside).astype(field.dtype)
        partial_mc = jnp.sum(vals * wl[None], axis=-1).T  # [m, C] exact sum
        return lax.psum(partial_mc, names) if names else partial_mc

    def spread_sharded(self, vals, plan, shape, consts=None):
        """M^T x onto this shard's local block [C, Xl, Yl, Zl]."""
        w, nodes = self._cw(consts)
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
        Eulerian sampling/spreading partitioned by unique-node ownership and
        the compact solve replicated.  ``u_star``/``rho`` are this shard's
        local blocks; returns the local force block."""
        from jax import lax

        shape = tuple(shape)
        c = consts if consts is not None else self.hook_consts()
        if shape == self.grid_shape and c.get("unodes") is not None:
            un = c["unodes"]  # [u, 3] global integer coords, unique
            (lx, ly, lz), inside, exts, names = self._owned_c(
                plan, shape, un)
            vals = u_star[:, lx, ly, lz]  # [C, u]
            part = jnp.where(inside[None], vals, 0.0)
            ug = (lax.psum(part, names) if names else part).T  # [u, C]
            y, iters, rel = self._solve_compact(ug, c)
            self.last_cg_iters = iters
            self.last_cg_residual = rel
            self._log_cg(iters, rel)
            contrib = jnp.where(inside, 1.0, 0.0)[:, None] * (2.0 * y)
            flat = (lx * exts[1] + ly) * exts[2] + lz  # [u] local flat ids
            out = jnp.zeros((exts[0] * exts[1] * exts[2], u_star.shape[0]),
                            u_star.dtype)
            out = out.at[flat].add(contrib.astype(u_star.dtype))
            return out.T.reshape((u_star.shape[0],) + tuple(exts)) * rho[None]

        # generic fallback: matrix-free with per-iteration psum
        b = -self.interpolate_sharded(u_star, plan, shape, consts)
        if self.use_ll_velocity:
            b = b + jnp.asarray(self.prescribed_velocity, b.dtype)
        if self.method == "modified":
            matvec = lambda x: self._ell_matvec(x, c)  # noqa: E731
        else:
            def matvec(x):
                return self.interpolate_sharded(
                    self.spread_sharded(x, plan, shape, consts), plan, shape,
                    consts)

        x, iters, rel = self._cg(matvec, b, diag=c.get("diag"))
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
