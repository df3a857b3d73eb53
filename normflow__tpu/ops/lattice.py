"""Lattice utilities: momentum grids and neighbor stencils.

TPU-native counterparts of the reference's indexing/linalg helpers
(/root/reference/src/lib/indexing/arange.py, /root/reference/src/lib/linalg/mean.py,
/root/reference/src/nn/scalar/fftflow_.py:318-349).  These are pure functions
of *static* shapes; under ``jit`` the grids are constant-folded by XLA.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "outer", "outer_sum", "outer_arange", "outer_linspace", "arange_like",
    "lattice_k2", "rfft_lattice_k2", "neighbor_mean",
]


def outer(x, y, rule: Callable = lambda a, b: a * b):
    """Outer combination of ``x`` and ``y`` under ``rule`` (default product).

    Mirrors ``outer`` (reference arange.py:89-107) via broadcasting.
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    return rule(x.reshape(x.shape + (1,) * y.ndim), y)


def outer_sum(x, y):
    """Outer sum: ``z[i..., j...] = x[i...] + y[j...]``."""
    return outer(x, y, rule=lambda a, b: a + b)


def outer_arange(tuple_of_tuples, rule=lambda a, b: a * b, arange_gen=jnp.arange):
    """Multi-dimensional grid from 1-D ranges combined pairwise by ``rule``.

    Mirrors ``outer_arange`` (reference arange.py:28-77).
    """
    out = None
    for args in tuple_of_tuples:
        axis = arange_gen(*args)
        out = axis if out is None else outer(out, axis, rule)
    return out


def outer_linspace(tuple_of_tuples, rule=lambda a, b: a * b):
    """Like :func:`outer_arange` with ``linspace`` generators.

    (The reference's version is broken -- calls undefined ``nd_arange``,
    arange.py:77 -- this is the working equivalent.)
    """
    return outer_arange(tuple_of_tuples, rule=rule, arange_gen=jnp.linspace)


def arange_like(x, axis: int = -1):
    """Index grid along ``axis`` broadcast to the shape of ``x``.

    Mirrors ``arange_like`` (reference arange.py:9-24).
    """
    x = jnp.asarray(x)
    n = x.shape[axis]
    shape = [1] * x.ndim
    shape[axis] = n
    return jnp.broadcast_to(jnp.arange(n).reshape(shape), x.shape)


def lattice_k2(lat_shape: Sequence[int], dtype=None):
    """Lattice momentum-squared grid: ``k_hat^2 = sum_mu 4 sin^2(k_mu/2)``.

    Mirrors ``outer_lattice_k2`` + ``FreeScalar.calc_lattice_k2`` without the
    rfft trim (reference fftflow_.py:325-349).
    """
    dtype = dtype or jnp.result_type(float)
    out = None
    for n in lat_shape:
        k = jnp.linspace(0.0, 2 * np.pi * (1 - 1 / n), n, dtype=dtype)
        k2 = 4 * jnp.sin(k / 2) ** 2
        out = k2 if out is None else outer_sum(out, k2)
    return out


def rfft_lattice_k2(lat_shape: Sequence[int], dtype=None):
    """:func:`lattice_k2` trimmed on the last axis for ``rfftn`` layouts."""
    k2 = lattice_k2(lat_shape, dtype)
    return k2[..., : (1 + lat_shape[-1] // 2)]


def neighbor_mean(x, axes: Sequence[int] | None = None):
    """Average of the 2*ndim nearest lattice neighbors via rolls.

    Mirrors ``neighbor_mean`` (reference mean.py:7-21), including skipping
    size-1 directions.  ``axes`` defaults to all non-batch axes.
    """
    if axes is None:
        axes = range(1, x.ndim)
    y, n = 0.0, 0
    for mu in axes:
        if x.shape[mu] == 1:
            continue
        n += 1
        y = y + jnp.roll(x, 1, mu) + jnp.roll(x, -1, mu)
    return y / (2 * max(n, 1))
