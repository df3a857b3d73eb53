r"""Fused RQ-spline coupling transform: knots + transform + log-grad, one pass.

The hot op of spline-coupling flows (SURVEY §3.1): given the conv-net output
(``3m-2`` per-site channels) and the active partition, build the monotone
spline knots (softmax+cumsum coordinates, softplus derivatives), apply the
rational-quadratic transform (or its closed-form inverse), and emit the
transformed field plus the per-site log-gradient -- all VMEM-resident.

Layout strategy: the knot axis is fully **unrolled in registers** -- every
intermediate is a lane-aligned ``(batch_tile, site_tile)`` vector tile, so
there is zero lane waste from the awkward ``3m-2`` channel count and no
dynamic gathers (segment selection is a short chain of vector selects).

The XLA path (``ops.spline.rqs``) remains the reference implementation; this
kernel is validated against it bit-for-bit (tests/test_kernels.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["rqs_transform_fused"]

_LOG2 = float(np.log(2.0))


def _softplus_log2(w):
    return jax.nn.softplus(w * _LOG2) / _LOG2


def _rqs_core(x, out, *, m, xlo, xw, ylo, yw, left, right, inverse):
    """Pure function of loaded tiles: ``x (TB,TS), out (TB,K3,TS)`` ->
    ``(y, logg)``.  Shared by the forward kernel and -- via ``jax.vjp`` at
    trace time -- the analytic backward kernel."""
    wx = [out[:, k, :] for k in range(m - 1)]
    wy = [out[:, (m - 1) + k, :] for k in range(m - 1)]
    wd = [out[:, 2 * (m - 1) + k, :] for k in range(m)]

    def coords(ws, lo, width):
        mx = ws[0]
        for w in ws[1:]:
            mx = jnp.maximum(mx, w)
        es = [jnp.exp(w - mx) for w in ws]
        tot = sum(es)
        inv_tot = 1.0 / tot
        knots, cum = [jnp.zeros_like(x)], 0.0
        for e in es:
            cum = cum + e
            knots.append(cum * inv_tot)
        return [lo + width * c for c in knots]

    kx = coords(wx, xlo, xw)
    ky = coords(wy, ylo, yw)
    kd = [_softplus_log2(w) for w in wd]

    # linear boundary augmentation (ops.spline.augment_knots semantics)
    if left == "linear":
        kx = [kx[0] - 1.0] + kx
        ky = [ky[0] - kd[0]] + ky
        kd = [kd[0]] + kd
    if right == "linear":
        kx = kx + [kx[-1] + 1.0]
        ky = ky + [ky[-1] + kd[-1]]
        kd = kd + [kd[-1]]

    k = len(kx)
    lookup = ky if inverse else kx
    idx = sum((x > lk).astype(jnp.int32) for lk in lookup)
    idx = jnp.clip(idx, 1, k - 1) - 1

    # segment-parameter gather as a select chain (vector ops, no gathers)
    zeros = jnp.zeros_like(x)
    x0 = x1 = y0 = y1 = d0 = d1 = zeros
    for s in range(k - 1):
        sel = idx == s
        x0 = jnp.where(sel, kx[s], x0)
        x1 = jnp.where(sel, kx[s + 1], x1)
        y0 = jnp.where(sel, ky[s], y0)
        y1 = jnp.where(sel, ky[s + 1], y1)
        d0 = jnp.where(sel, kd[s], d0)
        d1 = jnp.where(sel, kd[s + 1], d1)

    dx = x1 - x0
    dy = y1 - y0
    mm = dy / dx
    spread = d1 + d0 - 2 * mm

    def grad_of(theta):
        denom = mm + spread * theta * (1 - theta)
        num = d0 + 2 * (mm - d0) * theta + spread * theta * theta
        return mm * mm * num / (denom * denom)

    if not inverse:
        theta = (x - x0) / dx
        denom = mm + spread * theta * (1 - theta)
        y = y0 + dy * theta * (mm * theta + d0 * (1 - theta)) / denom
        return y, jnp.log(grad_of(theta))

    eta = (x - y0) / dy
    a2 = -spread * eta + d0 - mm
    a1 = -a2 - mm
    a0 = mm * eta
    delta = jnp.sqrt(jnp.maximum(a1 * a1 - 4 * a0 * a2, 0.0))
    neg = a1 <= 0
    q_minus = 0.5 * (-a1 + delta)
    q_plus = -0.5 * (a1 + delta)
    tiny = jnp.finfo(x.dtype).tiny
    safe = lambda d: jnp.where(jnp.abs(d) < tiny, 1.0, d)
    theta = jnp.where(neg,
                      a0 / safe(jnp.where(neg, q_minus, 1.0)),
                      q_plus / safe(jnp.where(neg, 1.0, a2)))
    return x0 + dx * theta, -jnp.log(grad_of(theta))


def _rqs_kernel(x_ref, out_ref, y_ref, logg_ref, *, channels_last, **cfg):
    # channels_last: out arrives (TB, TS, K3) straight from the conv and the
    # channel transpose happens here in registers, never in HBM.  Otherwise
    # out was pre-transposed to (TB, K3, TS) by XLA.
    out = out_ref[:]
    if channels_last:
        out = jnp.transpose(out, (0, 2, 1))
    y, logg = _rqs_core(x_ref[:], out, **cfg)
    y_ref[:] = y
    logg_ref[:] = logg


def _rqs_bwd_kernel(x_ref, out_ref, ybar_ref, loggbar_ref,
                    xbar_ref, outbar_ref, *, channels_last, **cfg):
    """Analytic VJP, VMEM-resident: recompute the forward on the tile and
    transpose it via ``jax.vjp`` (trace-time -- lowers to elementwise ops)."""
    out = out_ref[:]
    if channels_last:
        out = jnp.transpose(out, (0, 2, 1))
    f = functools.partial(_rqs_core, **cfg)
    _, vjp = jax.vjp(f, x_ref[:], out)
    xbar, outbar = vjp((ybar_ref[:], loggbar_ref[:]))
    xbar_ref[:] = xbar
    outbar_ref[:] = jnp.transpose(outbar, (0, 2, 1)) if channels_last \
        else outbar


@functools.lru_cache(maxsize=None)
def _make_op(b, sp, k3, tb, ts, xlim, ylim, left, right, inverse, interpret,
             dtype_name, channels_last):
    """Build (and cache) the custom-VJP fused op for one static config.

    Forward AND backward are Pallas kernels; the backward recomputes the
    tile forward and transposes it in-register (residuals are just the
    inputs), so training never materializes knot intermediates in HBM.

    ``channels_last``: the kernels consume the conv's (B, S, K3) layout
    directly and transpose in registers; otherwise XLA pre-transposes the
    net output to (B, K3, S) in HBM and the kernels read lane-aligned
    channel slices.
    """
    dtype = jnp.dtype(dtype_name)
    m = (k3 + 2) // 3
    cfg = dict(m=m, xlo=xlim[0], xw=xlim[1] - xlim[0],
               ylo=ylim[0], yw=ylim[1] - ylim[0], left=left, right=right,
               inverse=inverse, channels_last=channels_last)
    vec_spec = pl.BlockSpec((tb, ts), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    if channels_last:
        out_spec = pl.BlockSpec((tb, ts, k3), lambda i, j: (i, j, 0),
                                memory_space=pltpu.VMEM)
        full_shape = jax.ShapeDtypeStruct((b, sp, k3), dtype)
    else:
        out_spec = pl.BlockSpec((tb, k3, ts), lambda i, j: (i, 0, j),
                                memory_space=pltpu.VMEM)
        full_shape = jax.ShapeDtypeStruct((b, k3, sp), dtype)
    vec_shape = jax.ShapeDtypeStruct((b, sp), dtype)

    def pallas_fwd(xf, of):
        return pl.pallas_call(
            functools.partial(_rqs_kernel, **cfg),
            out_shape=(vec_shape, vec_shape),
            grid=(b // tb, sp // ts),
            in_specs=[vec_spec, out_spec],
            out_specs=(vec_spec, vec_spec),
            interpret=interpret,
        )(xf, of)

    # Backward tiles are half-size: the VJP holds the out tile, its
    # in-register transpose, AND the linearization intermediates at once --
    # full-size tiles overflow the 16 MB scoped-VMEM budget on v5e.
    ts_b = ts // 2 if (ts % 2 == 0 and sp % (ts // 2) == 0 and ts > 128) \
        else ts
    vec_spec_b = pl.BlockSpec((tb, ts_b), lambda i, j: (i, j),
                              memory_space=pltpu.VMEM)
    if channels_last:
        out_spec_b = pl.BlockSpec((tb, ts_b, k3), lambda i, j: (i, j, 0),
                                  memory_space=pltpu.VMEM)
    else:
        out_spec_b = pl.BlockSpec((tb, k3, ts_b), lambda i, j: (i, 0, j),
                                  memory_space=pltpu.VMEM)

    def pallas_bwd(xf, of, ybar, loggbar):
        return pl.pallas_call(
            functools.partial(_rqs_bwd_kernel, **cfg),
            out_shape=(vec_shape, full_shape),
            grid=(b // tb, sp // ts_b),
            in_specs=[vec_spec_b, out_spec_b, vec_spec_b, vec_spec_b],
            out_specs=(vec_spec_b, out_spec_b),
            interpret=interpret,
        )(xf, of, ybar, loggbar)

    @jax.custom_vjp
    def op(xf, of):
        return pallas_fwd(xf, of)

    def fwd(xf, of):
        return pallas_fwd(xf, of), (xf, of)

    def bwd(res, ct):
        xf, of = res
        ybar, loggbar = ct
        return pallas_bwd(xf, of, ybar, loggbar)

    op.defvjp(fwd, bwd)
    return op


@functools.partial(jax.jit,
                   static_argnames=("xlim", "ylim", "left", "right",
                                    "inverse", "batch_tile", "site_tile",
                                    "interpret", "channels_last"))
def rqs_transform_fused(x, out, *, xlim=(0.0, 1.0), ylim=(0.0, 1.0),
                        left=None, right=None, inverse=False,
                        batch_tile=8, site_tile=512, interpret=False,
                        channels_last=False):
    """Apply a per-site RQ spline parameterized by net output ``out``.

    ``x``: (B, *lat) active field; ``out``: (B, *lat, 3m-2) net output
    (channels-last).  Returns ``(y, log_grad)`` with the shapes of ``x``.
    Equivalent to building knots via softmax/cumsum/softplus + linear
    augmentation and calling ``ops.spline.rqs`` (couplings.py XLA path).
    Differentiable: the VJP is an analytic Pallas backward kernel.
    """
    orig_shape = x.shape
    b = x.shape[0]
    s = int(np.prod(x.shape[1:]))
    k3 = out.shape[-1]

    xf = x.reshape(b, s)
    if channels_last:
        of = out.reshape(b, s, k3)  # transposed in-kernel registers
    else:
        of = jnp.moveaxis(out.reshape(b, s, k3), -1, 1)  # (B, K3, S) in HBM

    tb = min(batch_tile, b)
    while b % tb:
        tb -= 1
    ts = min(site_tile, s)
    pad = (-s) % ts
    if pad:
        mid = 0.5 * (xlim[0] + xlim[1])
        xf = jnp.pad(xf, ((0, 0), (0, pad)), constant_values=mid)
        if channels_last:
            of = jnp.pad(of, ((0, 0), (0, pad), (0, 0)))
        else:
            of = jnp.pad(of, ((0, 0), (0, 0), (0, pad)))
    sp = s + pad

    op = _make_op(b, sp, k3, tb, ts, tuple(xlim), tuple(ylim), left, right,
                  inverse, interpret, jnp.dtype(x.dtype).name, channels_last)
    y, logg = op(xf, of)

    if pad:
        y, logg = y[:, :s], logg[:, :s]
    return y.reshape(orig_shape), logg.reshape(orig_shape)
