"""TPU-native Lattice Boltzmann Method framework in JAX.

A from-scratch rebuild of the capabilities of the TNL-LBM reference framework
(C++17/CUDA, see /root/reference) designed TPU-first:

- state is a pytree of SoA arrays ``f: [Q, X, Y, Z]`` (Z = 128-lane axis),
- the fused collide-and-stream step is a pure function under ``jax.jit``
  (XLA reference path) or a Pallas TPU kernel (performance path),
- multi-chip runs shard the lattice over a ``jax.sharding.Mesh`` with
  ``lax.ppermute`` halo exchange inside ``shard_map`` (the TPU-native
  equivalent of the reference's CUDA-aware-MPI synchronizers).
"""

__version__ = "0.1.0"
