"""Simulation layer: configs, domains, the fused step, and the driver."""

from tnl_lbm_tpu.sim.config import Domain, LBMConfig, initial_dfs
from tnl_lbm_tpu.sim.step import make_step

__all__ = ["LBMConfig", "Domain", "initial_dfs", "make_step"]
