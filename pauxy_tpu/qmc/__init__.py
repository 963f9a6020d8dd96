"""QMC drivers and options."""

from pauxy_tpu.qmc.options import QMCOpts
from pauxy_tpu.qmc.afqmc import AFQMC

__all__ = ["QMCOpts", "AFQMC"]
