"""Immersed boundary method (Wu-Shu velocity correction) subsystem."""

from tnl_lbm_tpu.ibm.dirac import dirac_delta, dirac_support
from tnl_lbm_tpu.ibm.lagrange import IBM

__all__ = ["IBM", "dirac_delta", "dirac_support"]
