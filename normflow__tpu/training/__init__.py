"""Training: Model/Posterior/Fitter, losses, checkpointing."""

from .model import Model, Posterior, backward_sanitychecker
from .fitter import Fitter
from . import losses
from . import checkpoint

__all__ = ["Model", "Posterior", "Fitter", "backward_sanitychecker",
           "losses", "checkpoint"]
