"""Pallas TPU kernels for the hot ops.

Each kernel has a pure-XLA reference path (the default implementation used
elsewhere in the package); kernels are opt-in and validated against it.
"""

from .phi4 import phi4_action_pallas
from .spline_coupling import rqs_transform_fused

__all__ = ["phi4_action_pallas", "rqs_transform_fused"]
