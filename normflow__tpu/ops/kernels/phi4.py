r"""Fused phi^4 action kernel: stencil + elementwise + reduction in one pass.

The XLA path (models/actions.py) materializes the rolled neighbor products;
this kernel keeps a batch-tile of configurations VMEM-resident and emits only
the per-sample action -- one HBM read of the field, no intermediates.

The gradient (``pltpu.roll`` has no JAX differentiation rule) is a second
fused kernel via ``jax.custom_vjp``: the phi^4 force is analytic,

.. math::
    \partial S/\partial\phi_x = 2 w_2 \phi_x + 4 w_4 \phi_x^3
        - w_0 \sum_\mu (\phi_{x+\hat\mu} + \phi_{x-\hat\mu}),

so the backward pass is again one HBM read of the field (plus the
per-sample cotangent), no stored residuals beyond the input.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["phi4_action_pallas"]


def _phi4_kernel(x_ref, o_ref, *, w0, w2, w4, nd):
    x = x_ref[:]  # (TB, *lat)
    phi2 = x * x
    acc = w2 * phi2 + w4 * phi2 * phi2
    if w0 != 0.0:
        neigh = 0.0
        for mu in range(1, nd + 1):
            neigh = neigh + pltpu.roll(x, 1, mu)
        acc = acc - w0 * x * neigh
    # Reduce trailing lattice axes one at a time and keep the batch axis
    # 2-D throughout: a full reduce to (TB,) followed by a [:, None]
    # reshape crashes Mosaic's vector-layout inference (1-D -> 2-D
    # reshape, observed on libtpu 2026-08: ``inferReshape`` check failure).
    red = acc
    for ax in range(nd, 1, -1):
        red = jnp.sum(red, axis=ax)
    o_ref[:] = jnp.sum(red, axis=1, keepdims=True)


def _phi4_grad_kernel(x_ref, g_ref, o_ref, *, w0, w2, w4, nd):
    x = x_ref[:]           # (TB, *lat)
    g = g_ref[:]           # (TB, 1, ..., 1) -- lattice axes kept as 1s
    dv = (2.0 * w2) * x + (4.0 * w4) * (x * x) * x
    if w0 != 0.0:
        neigh = 0.0
        for mu in range(1, nd + 1):
            size = x.shape[mu]
            neigh = (neigh + pltpu.roll(x, 1, mu)
                     + pltpu.roll(x, size - 1, mu))  # shift -1 (mod size)
        dv = dv - w0 * neigh
    o_ref[:] = dv * g


def _tile(b, batch_tile):
    tb = min(batch_tile, b)
    while b % tb:
        tb -= 1
    return tb


def _action_impl(cfgs, w0, w2, w4, batch_tile, interpret):
    b = cfgs.shape[0]
    lat = cfgs.shape[1:]
    nd = len(lat)
    tb = _tile(b, batch_tile)
    kernel = functools.partial(_phi4_kernel, w0=w0, w2=w2, w4=w4, nd=nd)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, 1), cfgs.dtype),
        grid=(b // tb,),
        in_specs=[pl.BlockSpec((tb, *lat), lambda i: (i,) + (0,) * nd,
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tb, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(cfgs)
    return out[:, 0]


def _grad_impl(cfgs, g, w0, w2, w4, batch_tile, interpret):
    b = cfgs.shape[0]
    lat = cfgs.shape[1:]
    nd = len(lat)
    tb = _tile(b, batch_tile)
    g = g.reshape((b,) + (1,) * nd).astype(cfgs.dtype)
    kernel = functools.partial(_phi4_grad_kernel, w0=w0, w2=w2, w4=w4, nd=nd)
    ones = (0,) * nd
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(cfgs.shape, cfgs.dtype),
        grid=(b // tb,),
        in_specs=[
            pl.BlockSpec((tb, *lat), lambda i: (i,) + ones,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb,) + (1,) * nd, lambda i: (i,) + ones,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, *lat), lambda i: (i,) + ones,
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(cfgs, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def _phi4_action(cfgs, w0, w2, w4, batch_tile, interpret):
    return _action_impl(cfgs, w0, w2, w4, batch_tile, interpret)


def _phi4_fwd(cfgs, w0, w2, w4, batch_tile, interpret):
    return _action_impl(cfgs, w0, w2, w4, batch_tile, interpret), cfgs


def _phi4_bwd(w0, w2, w4, batch_tile, interpret, cfgs, g):
    return (_grad_impl(cfgs, g, w0, w2, w4, batch_tile, interpret),)


_phi4_action.defvjp(_phi4_fwd, _phi4_bwd)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def phi4_action_pallas(cfgs, w0, w2, w4, batch_tile: int = 8,
                       interpret: bool = False):
    """Per-sample phi^4 action ``S = sum(w2 x^2 + w4 x^4) - w0 sum_mu x roll(x)``.

    ``cfgs``: (B, *lat) with 1-3 lattice dims.  Matches
    ``ScalarPhi4Action.action`` bit-for-bit up to reduction order (reference
    scalar_action.py:38-46).  Differentiable (fused analytic backward).
    """
    nd = cfgs.ndim - 1
    assert 1 <= nd <= 3, "pallas phi4 kernel supports 1-3 lattice dims"
    return _phi4_action(cfgs, w0, w2, w4, batch_tile, interpret)
