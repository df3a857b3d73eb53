r"""Vectorized monotone rational splines (TPU-first).

Re-designs the reference's spline machinery
(/root/reference/src/lib/spline/spline.py:9-540) as *pure static-shape
functions*:

- :func:`rqs` -- rational-quadratic (Pade 2/2, Gregory--Delbourgo) segments
  with a numerically-stable closed-form inverse.
- :func:`rls` -- rational-linear (Pade 1/1) segments.
- :func:`augment_knots` -- boundary augmentation for out-of-domain points
  (``linear`` patch knots, ``periodic``, ``anti``/``anti-periodic``
  reflection), mirroring ``AugmentKnots`` (spline.py:392-540).
- smooth-derivative constructors mirroring ``SplineTemplate.smooth_derivatives``
  (spline.py:126-152) and ``Pade11Spline.smooth_derivatives`` (spline.py:297-318).

TPU-specific choices:

- knots always live on the LAST axis (lane dimension);
- segment lookup is a vectorized comparison-count (O(K) VPU ops, no
  data-dependent control flow);
- per-segment parameters are gathered with a one-hot contraction rather than
  ``gather`` -- elementwise multiply+reduce maps cleanly onto the VPU and
  fuses with the surrounding arithmetic;
- the quadratic inverse uses the cancellation-free "citardauq" root form
  instead of the naive quadratic formula, so it is stable in float32/bfloat16
  (the reference relies on float64 end-to-end).

All functions broadcast: ``x`` has any shape ``S``; ``kx``/``ky``/``kd`` must
broadcast against ``S + (K,)`` (shared knots: shape ``(K,)``; per-site knots:
``S + (K,)``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "rqs", "rls", "augment_knots", "smooth_derivatives_rq",
    "smooth_derivatives_rl", "searchsorted_last", "segment_gather",
    "knot_coords",
]


def knot_coords(w: jax.Array, lo, width) -> jax.Array:
    """Monotone knot coordinates from unconstrained width weights:
    softmax -> cumsum -> prepend 0 -> affine map to ``[lo, lo + width]``
    along the trailing axis (reference SplineNet.make_spline,
    modules.py:369-391).  Single definition shared by the coupling
    conditioner, ``SplineFlow``, and the circular gauge splines."""
    c = jnp.cumsum(jax.nn.softmax(w, axis=-1), axis=-1)
    zero = jnp.zeros((*w.shape[:-1], 1), w.dtype)
    return lo + width * jnp.concatenate([zero, c], axis=-1)


def searchsorted_last(knots: jax.Array, x: jax.Array) -> jax.Array:
    """Index of the segment of ``x`` in sorted ``knots`` (last axis).

    Equivalent to ``searchsorted(knots, x, side='left')`` then
    ``clamp(1, K-1) - 1`` (reference spline.py:154-172), expressed as a
    comparison count so it vectorizes with static shapes on TPU.
    Returns integer indices in ``[0, K-2]``.
    """
    k = knots.shape[-1]
    idx = jnp.sum((x[..., None] > knots).astype(jnp.int32), axis=-1)
    return jnp.clip(idx, 1, k - 1) - 1


def segment_gather(params: jax.Array, idx: jax.Array, offset: int, k: int):
    """Select ``params[..., idx + offset]`` via a one-hot contraction.

    ``params`` broadcasts against ``idx.shape + (k,)``; ``idx`` indexes the
    ``k - 1`` segments.  One-hot multiply+reduce avoids dynamic gathers (slow
    on TPU for tiny inner dims) and lets XLA fuse the select into neighboring
    elementwise ops.
    """
    seg = jnp.arange(k - 1, dtype=jnp.int32)
    onehot = (idx[..., None] == seg).astype(params.dtype)
    window = params[..., offset:offset + k - 1]
    return jnp.sum(window * onehot, axis=-1)


def _gather_segment_params(x, kx, ky, kd, lookup_knots):
    k = lookup_knots.shape[-1]
    idx = searchsorted_last(lookup_knots, x)
    g = lambda p, off: segment_gather(p, idx, off, k)
    x0, x1 = g(kx, 0), g(kx, 1)
    y0, y1 = g(ky, 0), g(ky, 1)
    d0, d1 = g(kd, 0), g(kd, 1)
    return x0, x1, y0, y1, d0, d1


def _rq_grad(theta, m, d0, d1):
    # dy/dx of the rational-quadratic segment (reference spline.py:209-211)
    denom = m + (d1 + d0 - 2 * m) * theta * (1 - theta)
    num = d0 + 2 * (m - d0) * theta + (d1 + d0 - 2 * m) * theta**2
    return m**2 * num / denom**2


def rqs(x, kx, ky, kd, *, inverse: bool = False):
    """Monotone rational-quadratic spline transform.

    Forward: ``y(x)`` per reference spline.py:185-220.  Inverse solves the
    per-segment quadratic in closed form (spline.py:222-287) using stable
    root selection.  Returns ``(out, grad)`` where ``grad`` is the derivative
    of the applied map (``dy/dx`` forward, ``dx/dy`` inverse), always
    positive for monotone knots -- take ``log(grad)`` for the log-Jacobian.
    """
    dt = jnp.result_type(x, kx, ky, kd)
    x = jnp.asarray(x, dt)
    kx, ky, kd = (jnp.asarray(a, dt) for a in (kx, ky, kd))

    lookup = ky if inverse else kx
    # Broadcast the lookup table against x so per-site knots work.
    lookup_b = jnp.broadcast_to(lookup, jnp.broadcast_shapes(lookup.shape, x.shape + lookup.shape[-1:]))
    x0, x1, y0, y1, d0, d1 = _gather_segment_params(x, kx, ky, kd, lookup_b)
    m = (y1 - y0) / (x1 - x0)

    if not inverse:
        theta = (x - x0) / (x1 - x0)
        denom = m + (d1 + d0 - 2 * m) * theta * (1 - theta)
        y = y0 + (y1 - y0) * theta * (m * theta + d0 * (1 - theta)) / denom
        return y, _rq_grad(theta, m, d0, d1)

    # Inverse: solve a2*theta^2 + a1*theta + a0 = 0 for theta, where
    #   a2 = (2m - d1 - d0)*eta + d0 - m,  a1 = -a2 - m,  a0 = m*eta
    # (reference spline.py:245-272).  Stable "citardauq" selection:
    #   a1 <= 0:  theta = a0 / q,   q = (-a1 + delta)/2   (no cancellation)
    #   a1 >  0:  theta = q / a2,   q = -(a1 + delta)/2   (a2 < 0 here)
    eta = (x - y0) / (y1 - y0)
    a2 = (2 * m - d1 - d0) * eta + d0 - m
    a1 = -a2 - m
    a0 = m * eta
    delta = jnp.sqrt(jnp.maximum(a1 * a1 - 4 * a0 * a2, 0.0))
    neg_branch = a1 <= 0
    q_minus = 0.5 * (-a1 + delta)
    q_plus = -0.5 * (a1 + delta)
    safe = lambda d: jnp.where(jnp.abs(d) < jnp.finfo(dt).tiny, 1.0, d)
    theta = jnp.where(
        neg_branch,
        a0 / safe(jnp.where(neg_branch, q_minus, 1.0)),
        q_plus / safe(jnp.where(neg_branch, 1.0, a2)),
    )
    xout = x0 + (x1 - x0) * theta
    return xout, 1.0 / _rq_grad(theta, m, d0, d1)


def rls(x, kx, ky, kd, *, inverse: bool = False):
    """Monotone rational-linear (Pade 1/1) spline transform.

    Mirrors ``Pade11Spline`` (reference spline.py:290-385).  Only ``d0`` of
    each segment is used.  Returns ``(out, grad)`` as in :func:`rqs`.
    """
    dt = jnp.result_type(x, kx, ky, kd)
    x = jnp.asarray(x, dt)
    kx, ky, kd = (jnp.asarray(a, dt) for a in (kx, ky, kd))

    lookup = ky if inverse else kx
    lookup_b = jnp.broadcast_to(lookup, jnp.broadcast_shapes(lookup.shape, x.shape + lookup.shape[-1:]))
    x0, x1, y0, y1, d0, _ = _gather_segment_params(x, kx, ky, kd, lookup_b)
    m = (y1 - y0) / (x1 - x0)

    def grad_of(theta):
        return m**2 * d0 / (m + (d0 - m) * theta) ** 2

    if not inverse:
        theta = (x - x0) / (x1 - x0)
        y = y0 + (y1 - y0) * d0 * theta / (m + (d0 - m) * theta)
        return y, grad_of(theta)

    eta = (x - y0) / (y1 - y0)
    theta = -eta * m / (eta * (d0 - m) - d0)
    return x0 + (x1 - x0) * theta, 1.0 / grad_of(theta)


def smooth_derivatives_rq(kx, ky):
    """Derivative-free knot derivatives for RQ splines.

    Internal knots get the average of adjacent segment slopes; boundary knots
    get the adjacent segment slope (reference spline.py:126-152,
    ``bc_type='not-ones'``).
    """
    m = (ky[..., 1:] - ky[..., :-1]) / (kx[..., 1:] - kx[..., :-1])
    inner = 0.5 * (m[..., 1:] + m[..., :-1])
    return jnp.concatenate([m[..., :1], inner, m[..., -1:]], axis=-1)


def smooth_derivatives_rl(kx, ky):
    """Derivative-free knot derivatives for RL splines.

    ``d_0 = 1`` and ``d_{k+1} = m_k^2 / d_k`` (reference spline.py:297-318,
    'natural' boundary), which makes every interior derivative continuous.
    """
    m = (ky[..., 1:] - ky[..., :-1]) / (kx[..., 1:] - kx[..., :-1])
    k = kx.shape[-1]
    d = jnp.ones_like(m[..., :1])
    ds = [d]
    for i in range(k - 1):
        d = m[..., i:i + 1] ** 2 / d
        ds.append(d)
    return jnp.concatenate(ds, axis=-1)


def _flip(a):
    return jnp.flip(a, axis=-1)


def augment_knots(kx, ky, kd, *, left=None, right=None):
    """Augment knots for controlled extrapolation.

    Matches ``AugmentKnots.__call__`` (reference spline.py:406-532) exactly,
    including the two-pass order (``linear`` sides patched first; ``periodic``
    / ``anti`` reflections then act on the linearly-augmented arrays):

    - ``'linear'``: one fiducial knot per side continuing with the boundary
      derivative, which makes the edge segment exactly linear;
    - ``'anti'`` / ``'anti-periodic'``: odd reflection of all knots about the
      boundary knot;
    - ``'periodic'``: even reflection (requires zero boundary derivative --
      the caller is responsible, reference asserts at spline.py:504-505).

    ``kx``/``ky``/``kd`` must share a broadcastable shape with knots on the
    last axis.  Output shapes grow statically by the augmentation size.
    """
    kx, ky, kd = jnp.broadcast_arrays(kx, ky, kd)
    cat = lambda parts: jnp.concatenate([p for p in parts if p is not None], axis=-1)

    # Pass 1: linear patches.
    lparts = rparts = None
    if left == "linear":
        lparts = (kx[..., :1] - 1, ky[..., :1] - kd[..., :1], kd[..., :1])
    if right == "linear":
        rparts = (kx[..., -1:] + 1, ky[..., -1:] + kd[..., -1:], kd[..., -1:])
    if lparts is not None or rparts is not None:
        kx = cat([lparts and lparts[0], kx, rparts and rparts[0]])
        ky = cat([lparts and lparts[1], ky, rparts and rparts[1]])
        kd = cat([lparts and lparts[2], kd, rparts and rparts[2]])

    # Pass 2: reflections (acting on the possibly linear-augmented arrays).
    def reflect(mode, is_left):
        anti = mode in ("anti", "anti-periodic")
        periodic = mode == "periodic"
        if not (anti or periodic):
            return None
        if periodic:
            # even mirror requires a zero boundary derivative (reference
            # spline.py:504-505 raises); validate when concrete.
            edge = kd[..., :1] if is_left else kd[..., -1:]
            if not isinstance(edge, jax.core.Tracer):
                if not np.allclose(np.asarray(edge), 0.0):
                    raise ValueError(
                        "periodic knot augmentation requires a zero "
                        "derivative at the boundary knot")
        if is_left:
            xs, ys, ds = _flip(kx[..., 1:]), _flip(ky[..., 1:]), _flip(kd[..., 1:])
            x_edge, y_edge = kx[..., :1], ky[..., :1]
        else:
            xs, ys, ds = _flip(kx[..., :-1]), _flip(ky[..., :-1]), _flip(kd[..., :-1])
            x_edge, y_edge = kx[..., -1:], ky[..., -1:]
        new_x = 2 * x_edge - xs
        new_y = (2 * y_edge - ys) if anti else ys
        new_d = ds if anti else -ds
        return new_x, new_y, new_d

    lref = reflect(left, True)
    rref = reflect(right, False)
    if lref is not None or rref is not None:
        kx = cat([lref and lref[0], kx, rref and rref[0]])
        ky = cat([lref and lref[1], ky, rref and rref[1]])
        kd = cat([lref and lref[2], kd, rref and rref[2]])

    return kx, ky, kd
