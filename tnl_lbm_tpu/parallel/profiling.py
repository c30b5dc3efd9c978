"""Halo-exchange traffic accounting for sharded runs.

Analog of the reference's MPI bandwidth statistics (reference:
lbm.hpp:238-279 - sent/received bytes, message counts, uni/bidirectional
GB/s logged to the "profile" logger every 100 iterations).  On TPU the
collectives are compiler-inserted ppermutes, so instead of counting messages
at runtime we compute the exact per-step halo traffic from the mesh
decomposition (deterministic for a static lattice) and combine it with the
measured step time.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from tnl_lbm_tpu.sim.config import Domain


@dataclasses.dataclass
class HaloTraffic:
    bytes_per_step_per_device: int
    messages_per_step_per_device: int
    n_devices: int

    def log_line(self, steps: int, seconds: float) -> str:
        total = self.bytes_per_step_per_device * steps
        gbps = total / seconds / 1e9 if seconds > 0 else 0.0
        return (
            f"halo traffic: {self.bytes_per_step_per_device / 1e6:.2f} MB/step/device, "
            f"{self.messages_per_step_per_device} ppermute slabs/step, "
            f"{gbps:.2f} GB/s/device over {steps} steps"
        )


def halo_traffic(domain: Domain, plan, itemsize: int = 4) -> HaloTraffic:
    """Exact per-device halo bytes per step for a ShardPlan.

    Each sharded lattice axis exchanges two 1-wide face slabs of the full
    [Q, ...] array per step (send + receive are counted once, as in the
    reference's 'sent bytes' accounting).  Axes with mesh extent 1 (or
    unsharded) cost nothing.
    """
    local = plan.local_shape(domain)
    Q = domain.lat.Q
    total_bytes = 0
    messages = 0
    for a, name in enumerate(plan.spatial_axes):
        if name is None or plan.mesh.shape[name] == 1:
            continue
        slab_sites = int(np.prod([s for i, s in enumerate(local) if i != a]))
        # two directions, halo width 1, padded-so-far axes add negligible rim
        total_bytes += 2 * Q * slab_sites * itemsize
        messages += 2
    n_dev = int(np.prod([plan.mesh.shape[n] for n in plan.mesh.axis_names]))
    return HaloTraffic(
        bytes_per_step_per_device=total_bytes,
        messages_per_step_per_device=messages,
        n_devices=n_dev,
    )
