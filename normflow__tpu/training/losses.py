r"""Loss zoo for flow training.

Mirrors the static loss/metric functions of ``Fitter``
(/root/reference/src/_normflowcore.py:325-382) as pure jnp functions.  All
take ``(logq, logp)`` per-sample vectors.  When the batch is sharded over a
device mesh, the reductions (`mean`, `logsumexp`) lower to XLA collectives
automatically -- no manual all-reduce.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import logsumexp

__all__ = [
    "calc_kl_mean", "calc_kl_var", "calc_corrcoef", "calc_direct_kl_mean",
    "calc_kl_mean_includelogz", "calc_least_squares", "calc_minus_logz",
    "calc_ess", "calc_minus_ess",
]


def calc_kl_mean(logq, logp):
    """Reverse KL estimated from samples of q (the default training loss)."""
    return jnp.mean(logq - logp)


def calc_kl_var(logq, logp):
    return jnp.var(logq - logp)


def calc_corrcoef(logq, logp):
    """Pearson correlation of logq and logp."""
    return jnp.corrcoef(jnp.stack([logq, logp]))[0, 1]


def calc_direct_kl_mean(logq, logp):
    r"""Forward ("direct") KL via self-normalized importance weights
    (reference _normflowcore.py:340-354)."""
    logpq = logp - logq
    logz = logsumexp(logpq, axis=0) - jnp.log(logp.shape[0])
    logpq = logpq - logz
    p_by_q = jnp.exp(logpq)
    return jnp.mean(p_by_q * logpq)


def calc_kl_mean_includelogz(logq, logp):
    logqp = logq - logp
    logz = logsumexp(-logqp, axis=0) - jnp.log(logp.shape[0])
    return jnp.mean(logqp) + logz


def calc_least_squares(logq, logp):
    logqp = logq - logp
    logz = logsumexp(-logqp, axis=0) - jnp.log(logp.shape[0])
    return jnp.mean((logqp + logz) ** 2)


def calc_minus_logz(logq, logp):
    logz = logsumexp(logp - logq, axis=0) - jnp.log(logp.shape[0])
    return -logz


def calc_ess(logq, logp):
    """Normalized effective sample size (reference _normflowcore.py:374-379).

    Delegates to the single implementation in ``ops.stats``.
    """
    from ..ops.stats import calc_ess as _calc_ess

    return _calc_ess(logq, logp)


def calc_minus_ess(logq, logp):
    return -calc_ess(logq, logp)
