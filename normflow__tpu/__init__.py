"""normflow__tpu: a TPU-native normalizing-flow framework for lattice field theory.

A ground-up JAX/XLA/Pallas re-design with the capabilities of
``jkomijani/normflow_`` (reference mounted at /root/reference): train a
``Model(prior, net_, action)`` by reverse-KL variational inference, draw
flow samples, and correct them to exactness with independence-Metropolis
MCMC -- scaled over TPU meshes with ``jax.sharding`` instead of DDP/NCCL.

Public layout (mirroring the reference's ``normflow`` package):

- ``Model``, ``Fitter`` (via ``model.fit``), ``Posterior``
  (``model.posterior``), ``backward_sanitychecker``
- ``normflow__tpu.nn``     -- flows (couplings, elementwise, spectral, raw nets)
- ``normflow__tpu.prior``  -- priors
- ``normflow__tpu.action`` -- lattice actions
- ``normflow__tpu.mask``   -- masks / partitioners
- ``normflow__tpu.mcmc``   -- Metropolis samplers
- ``normflow__tpu.lib``    -- leaf utilities (splines, stats, lattice grids)
- ``normflow__tpu.parallel`` -- device mesh / distributed handler
"""

import jax
import jax.numpy as jnp
import numpy as np

from .training.model import Model, Posterior, backward_sanitychecker
from .training.fitter import Fitter
from .training import losses
from . import models
from . import ops
from . import mcmc
from . import parallel
from . import nn
from . import training
from . import zoo

# Reference-parity aliases
from .models import priors as prior
from .models import actions as action
from .models import masks as mask
from . import ops as lib

__all__ = [
    "Model", "Posterior", "Fitter", "backward_sanitychecker",
    "nn", "prior", "action", "mask", "mcmc", "lib", "parallel",
    "models", "ops", "losses", "training", "zoo", "jax", "jnp", "np",
]

__version__ = "0.1.0"
