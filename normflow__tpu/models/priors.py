"""Prior distributions with functional (key-threaded) sampling.

TPU-native re-design of /root/reference/src/prior/prior.py: instead of a
global torch RNG, every ``sample`` takes an explicit ``jax.random`` key --
the foundation for deterministic multi-host sampling (fold the key with the
process index) and reproducible MCMC streams.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..struct import Pytree, static


def _check_homogeneous(arrays, what):
    """Raise if any array has site-dependent values.

    Blocked proposals reuse ONE chopped prior for EVERY block, so the
    proposal density only matches each block's own marginal when the
    prior is homogeneous.  The reference assumes this silently ("we
    assume loc & scale are identical everywhere", prior.py:107); a
    violation breaks detailed balance with no error.  Under jit tracing
    values are unavailable -- the blocked sampler validates eagerly at
    its (concrete) entry point instead."""
    for a in arrays:
        if isinstance(a, jax.core.Tracer):
            return
        a = np.asarray(a).ravel()
        if a.size and not np.all(a == a.flat[0]):
            raise ValueError(
                "blocked proposals need a homogeneous prior (identical "
                f"{what} at every site); per-site parameters would bias "
                "every block after the first")

__all__ = ["NormalPrior", "UniformPrior", "PriorList"]

_LOG_2PI = float(np.log(2.0 * np.pi))


class Prior(Pytree):
    """Template prior (reference prior.py:14-59).

    ``sample_`` returns ``(x, log_prob)``; ``log_prob`` sums the density over
    non-batch axes unless ``density=True``.
    """

    def sample(self, key, batch_size: int = 1):
        raise NotImplementedError

    def sample_(self, key, batch_size: int = 1, *, density: bool = False):
        x = self.sample(key, batch_size)
        return x, self.log_prob(x, density=density)

    def log_prob(self, x, *, density: bool = False):
        d = self.log_prob_density(x)
        if density:
            return d
        return jnp.sum(d, axis=tuple(range(1, d.ndim)))

    def log_prob_density(self, x):
        raise NotImplementedError

    @property
    def nvar(self) -> int:
        return int(np.prod(self.shape))


class NormalPrior(Prior):
    """Independent normal prior with per-site ``loc``/``scale``.

    Mirrors ``NormalPrior`` (reference prior.py:92-125).  Build with either
    explicit ``loc``/``scale`` arrays or a ``shape`` (standard normal).
    """

    loc: jax.Array
    scale: jax.Array
    shape: tuple = static(default=(1,))

    @classmethod
    def build(cls, loc=None, scale=None, shape=None, dtype=None):
        dtype = dtype or jnp.result_type(float)
        if shape is not None:
            shape = (shape,) if isinstance(shape, int) else tuple(shape)
            loc = jnp.zeros(shape, dtype)
            scale = jnp.ones(shape, dtype)
        else:
            loc = jnp.asarray(loc, dtype)
            scale = jnp.asarray(scale, dtype)
            shape = tuple(loc.shape)
        return cls(loc=loc, scale=scale, shape=shape)

    def sample(self, key, batch_size: int = 1):
        z = jax.random.normal(key, (batch_size, *self.shape), self.loc.dtype)
        return self.loc + self.scale * z

    def log_prob_density(self, x):
        z = (x - self.loc) / self.scale
        return -0.5 * (z * z + _LOG_2PI) - jnp.log(self.scale)

    def chopped(self, block_len: int) -> "NormalPrior":
        """A flattened prior over the first ``block_len`` sites, for
        block-Gibbs proposals (reference prior.py:106-112).

        Block proposals reuse this ONE chopped prior for EVERY block, so
        the proposal density only matches each block's own marginal when
        the prior is homogeneous.  The reference assumes this silently
        ("we assume loc & scale are identical everywhere", prior.py:107);
        a violation breaks detailed balance with no error, so check it.
        """
        loc, scale = self.loc.ravel(), self.scale.ravel()
        _check_homogeneous((loc, scale), "loc/scale")
        return NormalPrior(loc=loc[:block_len], scale=scale[:block_len],
                           shape=(block_len,))


class UniformPrior(Prior):
    """Uniform prior on ``[low, high]`` (reference prior.py:62-89)."""

    low: jax.Array
    high: jax.Array
    shape: tuple = static(default=(1,))

    @classmethod
    def build(cls, low=None, high=None, shape=None, dtype=None):
        dtype = dtype or jnp.result_type(float)
        if shape is not None:
            shape = (shape,) if isinstance(shape, int) else tuple(shape)
            low = jnp.zeros(shape, dtype)
            high = jnp.ones(shape, dtype)
        else:
            low = jnp.asarray(low, dtype)
            high = jnp.asarray(high, dtype)
            shape = tuple(low.shape)
        return cls(low=low, high=high, shape=shape)

    def sample(self, key, batch_size: int = 1):
        u = jax.random.uniform(key, (batch_size, *self.shape), self.low.dtype)
        return self.low + (self.high - self.low) * u

    def log_prob_density(self, x):
        inside = (x >= self.low) & (x <= self.high)
        d = -jnp.log(self.high - self.low)
        return jnp.where(inside, d, -jnp.inf)

    def chopped(self, block_len: int) -> "UniformPrior":
        """Flattened prior over the first ``block_len`` sites for blocked
        proposals (homogeneity required -- see NormalPrior.chopped)."""
        low, high = self.low.ravel(), self.high.ravel()
        _check_homogeneous((low, high), "low/high")
        return UniformPrior(low=low[:block_len], high=high[:block_len],
                            shape=(block_len,))


class PriorList(Pytree):
    """Product of priors over a list of fields (reference prior.py:128-158).

    Samples and log-probs are lists, matching the reference's semantics.
    """

    priors: tuple

    def __post_init__(self):
        object.__setattr__(self, "priors", tuple(self.priors))

    def sample(self, key, batch_size: int = 1):
        keys = jax.random.split(key, len(self.priors))
        return [p.sample(k, batch_size) for p, k in zip(self.priors, keys)]

    def sample_(self, key, batch_size: int = 1, *, density: bool = False):
        x = self.sample(key, batch_size)
        return x, self.log_prob(x, density=density)

    def log_prob(self, x, *, density: bool = False):
        return [p.log_prob(x_, density=density) for p, x_ in zip(self.priors, x)]

    @property
    def nvar(self) -> int:
        return sum(p.nvar for p in self.priors)
