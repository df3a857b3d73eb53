"""The central ``Model`` class: prior + invertible net + action.

TPU-native re-design of the reference core
(/root/reference/src/_normflowcore.py:33-119).  ``Model`` is a thin stateful
convenience wrapper -- it owns the *current* net pytree and an RNG key and
wires up the services (``fit``, ``posterior``, ``mcmc``, ``blocked_mcmc``,
``device_handler``) exactly like the reference; all computation underneath is
pure jitted functions of (net, key).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

__all__ = ["Model", "Posterior", "backward_sanitychecker"]


class Model:
    """The central high-level class (reference _normflowcore.py:33-67).

    Parameters
    ----------
    prior : a Prior instance (e.g. ``NormalPrior``).
    net_ : a ``Flow`` (typically ``FlowList``); trailing underscore kept for
        API parity -- forward/backward handle the log-Jacobian.
    action : an action instance (callable ``cfgs -> per-sample action``).
    name : optional label.
    seed : int, seeds the model's convenience RNG stream.
    """

    def __init__(self, *, prior, net_, action, name: str | None = None, seed: int = 0):
        from ..mcmc import MCMCSampler, BlockedMCMCSampler
        from ..parallel import ModelDeviceHandler
        from .fitter import Fitter

        self.name = name
        self.net_ = net_
        self.prior = prior
        self.action = action

        self.fit = Fitter(self)
        self.posterior = Posterior(self)
        self.raw_dist = self.posterior  # alias (reference l.61)
        self.mcmc = MCMCSampler(self)
        self.blocked_mcmc = BlockedMCMCSampler(self)
        self.device_handler = ModelDeviceHandler(self)

        self._key = jax.random.key(seed)

    def next_key(self):
        """Split and return a fresh RNG key (stateful convenience)."""
        self._key, sub = jax.random.split(self._key)
        return sub

    def seed(self, seed: int):
        self._key = jax.random.key(seed)

    def transform(self, x):
        return self.net_(x)[0]


class Posterior:
    """Draw uncorrected samples from the flow (reference _normflowcore.py:70-119)."""

    def __init__(self, model: Model):
        self._model = model

    def sample(self, batch_size: int = 1, key=None, **kwargs):
        return self.sample_(batch_size, key=key, **kwargs)[0]

    def sample_(self, batch_size: int = 1, key=None, preprocess_func=None):
        """Return samples along with ``log q``."""
        m = self._model
        key = m.next_key() if key is None else key
        if preprocess_func is None:
            return _sample_fn(m.net_, m.prior, key, batch_size,
                              m.device_handler.batch_sharder())
        x, logr = m.prior.sample_(key, batch_size)
        x, logr = preprocess_func(x, logr)
        y, logj = m.net_.forward(x)
        return y, logr - logj

    def sample__(self, batch_size: int = 1, key=None, **kwargs):
        """Return ``(y, logq, logp)``; ``logp`` is ``log(p * z)``."""
        m = self._model
        key = m.next_key() if key is None else key
        if not kwargs:
            return _sample_fn__(m.net_, m.prior, m.action, key, batch_size,
                                m.device_handler.batch_sharder())
        y, logq = self.sample_(batch_size, key=key, **kwargs)
        return y, logq, -m.action(y)

    def log_prob(self, y):
        """Log-probability of given configurations via the inverse flow."""
        m = self._model
        return _log_prob_fn(m.net_, m.prior, y)

    def logqp_stream(self, n_batches: int, batch_size: int, key=None):
        """Draw ``n_batches`` batches inside ONE device program (lax.scan)
        and return the flattened ``logq - logp`` stream.

        The scanned form amortizes dispatch overhead -- use it for ESS /
        acceptance measurement and throughput benchmarking.
        """
        m = self._model
        key = m.next_key() if key is None else key
        logqp = _logqp_scan(m.net_, m.prior, m.action, key, n_batches,
                            batch_size, m.device_handler.batch_sharder())
        return logqp.reshape(-1)


# The production sampling programs take the model's batch sharder as a
# STATIC argument (a mesh-cached callable, parallel/mesh.py): on an attached
# mesh the proposal batch is constrained to P('data') so the flow, action,
# and logq all compile partitioned over chips -- multi-chip sampling
# throughput scales with the mesh instead of every chip redundantly
# computing the full batch (reference counterpart: DDP, device/_core.py).
def _shard(sharder, tree):
    """Apply a per-array sharder to a pytree (PriorList samples are tuples)."""
    return jax.tree_util.tree_map(sharder, tree)


@partial(jax.jit, static_argnums=(3, 4))
def _sample_fn(net, prior, key, batch_size, sharder=None):
    x, logr = prior.sample_(key, batch_size)
    if sharder is not None:
        x, logr = _shard(sharder, x), sharder(logr)
    y, logj = net.forward(x)
    return y, logr - logj


@partial(jax.jit, static_argnums=(4, 5))
def _sample_fn__(net, prior, action, key, batch_size, sharder=None):
    y, logq = _sample_fn(net, prior, key, batch_size, sharder)
    return y, logq, -action(y)


@jax.jit
def _log_prob_fn(net, prior, y):
    x, minus_logj = net.backward(y)
    logr = prior.log_prob(x)
    return logr + minus_logj


@partial(jax.jit, static_argnums=(4, 5, 6))
def _logqp_scan(net, prior, action, key, n_batches, batch_size, sharder=None):
    def body(_, k):
        x, logr = prior.sample_(k, batch_size)
        if sharder is not None:
            x, logr = _shard(sharder, x), sharder(logr)
        y, logj = net.forward(x)
        return None, (logr - logj) + action(y)

    keys = jax.random.split(key, n_batches)
    _, logqp = jax.lax.scan(body, None, keys)
    return logqp


def backward_sanitychecker(model: Model, n_samples: int = 5, net_=None,
                           return_details: bool = False, verbose: bool = True):
    """Round-trip invertibility + log-Jacobian cancellation check.

    Mirrors ``backward_sanitychecker`` (reference _normflowcore.py:432-451):
    ``net.backward(net(x), log0=logJ)`` must reproduce ``x`` and zero log0.
    Returns ``(x_err, logj_err)`` sums for programmatic assertions.
    """
    net_ = model.net_ if net_ is None else net_
    x = model.prior.sample(model.next_key(), n_samples)
    y, logj = net_.forward(x)
    x_hat, log0_hat = net_.backward(y, log0=logj)

    x_err = float(jnp.sum(jnp.abs(x - x_hat)))
    logj_err = float(jnp.sum(jnp.abs(log0_hat)))
    if verbose:
        print("Sanity check is OK if following numbers are zero up to round off:")
        print(f"{x_err:g} {logj_err:g}")
    if return_details:
        return (x, y, x_hat), (logj, log0_hat)
    return x_err, logj_err
