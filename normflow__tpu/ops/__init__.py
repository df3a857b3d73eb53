"""Leaf compute utilities (pure functions; no deps on other subpackages).

TPU-native counterpart of the reference's ``lib`` layer
(/root/reference/src/lib/), policy included: modules here must not import
from other subpackages of ``normflow__tpu``.
"""

from . import spline
from . import lattice
from . import stats
from . import observables

from .spline import rqs, rls, augment_knots
from .stats import Resampler, estimate_logz, fmt_val_err, calc_ess
from .lattice import (
    lattice_k2, rfft_lattice_k2, neighbor_mean, outer, outer_sum,
    outer_arange, outer_linspace, arange_like,
)

__all__ = [
    "spline", "lattice", "stats", "observables",
    "rqs", "rls", "augment_knots",
    "Resampler", "estimate_logz", "fmt_val_err", "calc_ess",
    "lattice_k2", "rfft_lattice_k2", "neighbor_mean", "outer", "outer_sum",
    "outer_arange", "outer_linspace", "arange_like",
]
