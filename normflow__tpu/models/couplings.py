r"""Mask-based coupling flows: shift, affine, rational-quadratic spline.

TPU-native re-design of /root/reference/src/nn/scalar/couplings_.py and
cntr_couplings_.py.  A coupling alternates parity over a list of plain nets:
net ``k`` reads the frozen partition and produces per-site transform
parameters for the active partition (``atomic_forward``/``atomic_backward``).

Layout: channels-last.  The frozen partition gets a trailing channel axis
before the net; net outputs carry transform parameters on the trailing axis
(2 channels for affine ``(t, s)``; ``3m-2`` for an ``m``-knot RQ spline).
Spline knots therefore land directly on the last axis, which is exactly the
layout ``ops.spline`` wants -- no transposes anywhere on the hot path.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import spline as sp
from ..struct import Pytree, static, HashableArray
from .core import Flow, sum_density
from .elementwise import softplus_log2

__all__ = [
    "Coupling", "ShiftCoupling", "AffineCoupling", "RQSplineCoupling",
    "MultiRQSplineCoupling", "DirectCntrCoupling", "CntrCoupling",
    "CntrShiftCoupling", "CntrAffineCoupling", "CntrRQSplineCoupling",
    "CntrMultiRQSplineCoupling", "refresh_controls", "has_controls",
]


class Coupling(Flow):
    """Base coupling (reference couplings_.py:22-103).

    ``mask.split(x) -> (x0, x1, *extra)``; net ``k`` transforms partition
    ``k % 2`` using the other partition as frozen input; ``mask.cat``
    reassembles.  Any ``extra`` split outputs (e.g. ``DoubleMask``'s
    invisible partition) are threaded through to ``cat`` unchanged, keeping
    the pipeline functional.
    """

    nets: tuple
    mask: Any = static()
    label: str | None = static(default="coupling_")

    def __post_init__(self):
        object.__setattr__(self, "nets", tuple(self.nets))

    def forward(self, x, log0=0.0, *, density: bool = False):
        parts = list(self.mask.split(x))
        x, extra = parts[:2], parts[2:]
        for k, net in enumerate(self.nets):
            parity = k % 2
            x[parity], log0 = self.atomic_forward(
                x_active=x[parity], x_frozen=x[1 - parity], parity=parity,
                net=net, log0=log0, density=density)
        return self.mask.cat(*x, *extra), log0

    def backward(self, x, log0=0.0, *, density: bool = False):
        parts = list(self.mask.split(x))
        x, extra = parts[:2], parts[2:]
        for k in reversed(range(len(self.nets))):
            parity = k % 2
            x[parity], log0 = self.atomic_backward(
                x_active=x[parity], x_frozen=x[1 - parity], parity=parity,
                net=self.nets[k], log0=log0, density=density)
        return self.mask.cat(*x, *extra), log0

    def atomic_forward(self, *, x_active, x_frozen, parity, net, log0,
                       density):
        raise NotImplementedError

    def atomic_backward(self, *, x_active, x_frozen, parity, net, log0,
                        density):
        raise NotImplementedError

    # channels-last pre/post-processing (reference couplings_.py:88-95
    # unsqueezes a channel axis; here the channel axis is trailing)
    @staticmethod
    def preprocess_fz(x):
        return x[..., None]

    @staticmethod
    def preprocess(x):
        return x[..., None]

    @staticmethod
    def postprocess(x):
        return x[..., 0]

    def transfer(self, mask=None, **kwargs):
        return self.replace(
            nets=tuple(net.transfer(**kwargs) for net in self.nets),
            **({} if mask is None else {"mask": mask}),
        )

    def grow(self, new_nets):
        """Append conditioner nets as NEAR-IDENTITY coupling layers.

        Each appended net's final layer is zeroed (``zeroed_final()``):
        zero conditioner output is the identity transform for every
        coupling here (shift ``t=0``; affine ``t=0, s=|0|=0``; RQ splines
        get uniform knots + unit derivatives via the log-2 softplus), so
        the grown flow computes exactly the same map as ``self`` while
        the new layers' hidden activations keep nonzero gradients flowing
        into the zeroed layer.  Progressive capacity growth for
        coarse-to-fine transfer (docs/TRAINING.md); no reference
        counterpart (closest: identity init via ``set_param2zero``,
        reference modules.py:156-159).  Existing nets keep their indices,
        so the parity alternation of the trained stack is unchanged.
        """
        return self.replace(nets=self.nets + tuple(
            net.zeroed_final() for net in new_nets))


class ShiftCoupling(Coupling):
    """Additive coupling: ``y = x + t(frozen)``, logJ = 0
    (reference couplings_.py:107-116)."""

    label: str | None = static(default="shift_coupling_")

    def _shift(self, x_frozen, parity, net):
        t = self.postprocess(net(self.preprocess_fz(x_frozen)))
        return t

    def atomic_forward(self, *, x_active, x_frozen, parity, net, log0,
                       density):
        t = self._shift(x_frozen, parity, net)
        y = self.mask.purify(x_active + t, channel=parity)
        return y, log0 + _zero_like_logj(x_active, density)

    def atomic_backward(self, *, x_active, x_frozen, parity, net, log0,
                        density):
        t = self._shift(x_frozen, parity, net)
        y = self.mask.purify(x_active - t, channel=parity)
        return y, log0 + _zero_like_logj(x_active, density)


def _zero_like_logj(x, density):
    return jnp.zeros_like(x) if density else jnp.zeros(x.shape[:1], x.dtype)


class AffineCoupling(Coupling):
    r"""Affine coupling: net output chunks into ``(t, s)``; ``s <- |s|`` so
    ``exp(-s) <= 1``; forward ``y = t + x e^{-s}``, logJ ``-sum s``
    (reference couplings_.py:120-139)."""

    label: str | None = static(default="affine_coupling_")

    def _params(self, x_frozen, parity, net):
        out = net(self.preprocess_fz(x_frozen))
        t, s = jnp.split(out, 2, axis=-1)
        t = self.mask.purify(self.postprocess(t), channel=parity)
        s = self.mask.purify(self.postprocess(s), channel=parity)
        return t, jnp.abs(s)

    def atomic_forward(self, *, x_active, x_frozen, parity, net, log0,
                       density):
        t, s = self._params(x_frozen, parity, net)
        return t + x_active * jnp.exp(-s), log0 - sum_density(s, density)

    def atomic_backward(self, *, x_active, x_frozen, parity, net, log0,
                        density):
        t, s = self._params(x_frozen, parity, net)
        return (x_active - t) * jnp.exp(s), log0 + sum_density(s, density)


def _knots_from_net_out(out, *, xlim, ylim, xwidth, ywidth,
                        fixed_x, fixed_y, extrap):
    """Per-site spline knots from net output channels (trailing axis).

    Mirrors ``RQSplineCoupling_.make_spline`` (reference couplings_.py:211-262):
    ``out`` splits into ``(m-1, m-1, m)`` slices for knots_x/knots_y/derivs
    (or ``(m-1, m)`` when one coordinate set is fixed); coordinates via
    softmax+cumsum pinned to the ``(xlim, ylim)`` box; derivatives via
    softplus (log-2 parameterization so zero nets give unit derivatives);
    then static boundary augmentation per ``extrap``.
    """
    to_coord = sp.knot_coords

    n = out.shape[-1]
    if fixed_x is None and fixed_y is None:
        m = (n + 2) // 3
        x_, y_, d_ = jnp.split(out, [m - 1, 2 * (m - 1)], axis=-1)
        kx = to_coord(x_, xlim[0], xwidth)
        ky = to_coord(y_, ylim[0], ywidth)
        kd = softplus_log2(d_)
    elif fixed_x is not None and fixed_y is None:
        m = (n + 2) // 2
        y_, d_ = jnp.split(out, [m - 1], axis=-1)
        kx = jnp.asarray(fixed_x.value)
        ky = to_coord(y_, ylim[0], ywidth)
        kd = softplus_log2(d_)
    elif fixed_x is None and fixed_y is not None:
        m = (n + 2) // 2
        x_, d_ = jnp.split(out, [m - 1], axis=-1)
        kx = to_coord(x_, xlim[0], xwidth)
        ky = jnp.asarray(fixed_y.value)
        kd = softplus_log2(d_)
    else:
        kx = jnp.asarray(fixed_x.value)
        ky = jnp.asarray(fixed_y.value)
        kd = softplus_log2(out)

    if extrap:
        kx, ky, kd = sp.augment_knots(kx, ky, kd, **dict(extrap))
    return kx, ky, kd


class RQSplineCoupling(Coupling):
    """Coupling with per-site rational-quadratic spline transforms
    (reference couplings_.py:143-275).

    Net output needs ``3m - 2`` trailing channels for ``m`` knots (fewer if
    ``knots_x``/``knots_y`` are fixed).  Extrapolation tip (reference
    docstring): ``extrap={'left': 'anti', 'right': 'linear'}``.
    """

    xlim: tuple = static(default=(0.0, 1.0))
    ylim: tuple = static(default=(0.0, 1.0))
    extrap: tuple = static(default=())
    knots_x: HashableArray | None = static(default=None)
    knots_y: HashableArray | None = static(default=None)
    # 'xla' | 'pallas' (fused kernel, channel transpose in HBM) |
    # 'pallas_reg' (fused kernel, channel transpose in registers)
    backend: str = static(default="xla")
    label: str | None = static(default="rqs_coupling_")

    @classmethod
    def build(cls, nets, *, mask, xlim=(0.0, 1.0), ylim=(0.0, 1.0),
              knots_x=None, knots_y=None, extrap=None, backend="xla",
              label="rqs_coupling_"):
        wrap = lambda a: None if a is None else HashableArray(np.asarray(a))
        extrap_t = tuple(sorted(extrap.items())) if isinstance(extrap, dict) \
            else tuple(extrap or ())
        return cls(nets=tuple(nets), mask=mask, xlim=tuple(xlim),
                   ylim=tuple(ylim), extrap=extrap_t, knots_x=wrap(knots_x),
                   knots_y=wrap(knots_y), backend=backend, label=label)

    def make_knots(self, out):
        return _knots_from_net_out(
            out, xlim=self.xlim, ylim=self.ylim,
            xwidth=self.xlim[1] - self.xlim[0],
            ywidth=self.ylim[1] - self.ylim[0],
            fixed_x=self.knots_x, fixed_y=self.knots_y, extrap=self.extrap)

    def _can_fuse(self):
        e = dict(self.extrap)
        return (self.backend in ("pallas", "pallas_reg")
                and self.knots_x is None and self.knots_y is None
                and e.get("left") in (None, "linear")
                and e.get("right") in (None, "linear"))

    def _apply(self, x_active, x_frozen, parity, net, inverse):
        out = net(self.preprocess_fz(x_frozen))
        if self._can_fuse():
            from ..ops.kernels import rqs_transform_fused

            e = dict(self.extrap)
            fx, logg = rqs_transform_fused(
                x_active, out, xlim=self.xlim, ylim=self.ylim,
                left=e.get("left"), right=e.get("right"), inverse=inverse,
                channels_last=(self.backend == "pallas_reg"))
        else:
            kx, ky, kd = self.make_knots(out)
            fx, g = sp.rqs(x_active, kx, ky, kd, inverse=inverse)
            logg = jnp.log(g)
        fx = self.mask.purify(fx, channel=parity)
        logg = self.mask.purify(logg, channel=parity)
        return fx, logg

    def atomic_forward(self, *, x_active, x_frozen, parity, net, log0,
                       density):
        fx, logg = self._apply(x_active, x_frozen, parity, net, False)
        return fx, log0 + sum_density(logg, density)

    def atomic_backward(self, *, x_active, x_frozen, parity, net, log0,
                        density):
        fx, logg = self._apply(x_active, x_frozen, parity, net, True)
        return fx, log0 + sum_density(logg, density)


class MultiRQSplineCoupling(Coupling):
    """One RQ spline per input channel (reference couplings_.py:279-436).

    The input carries ``num_splines`` trailing channels; the net output is
    split evenly into per-channel knot parameter groups.
    """

    xlims: tuple = static(default=((0.0, 1.0), (0.0, 1.0)))
    ylims: tuple = static(default=((0.0, 1.0), (0.0, 1.0)))
    extraps: tuple = static(default=((), ()))
    knots_x: tuple = static(default=(None, None))
    knots_y: tuple = static(default=(None, None))
    label: str | None = static(default="multi_rqs_coupling_")

    @classmethod
    def build(cls, nets, *, mask, xlims=((0.0, 1.0), (0.0, 1.0)),
              ylims=((0.0, 1.0), (0.0, 1.0)), knots_x=None, knots_y=None,
              extraps=None, label="multi_rqs_coupling_"):
        n = len(xlims)
        wrap = lambda a: None if a is None else HashableArray(np.asarray(a))
        knots_x = tuple(wrap(k) for k in (knots_x or [None] * n))
        knots_y = tuple(wrap(k) for k in (knots_y or [None] * n))
        to_t = lambda e: tuple(sorted(e.items())) if isinstance(e, dict) \
            else tuple(e or ())
        extraps = tuple(to_t(e) for e in (extraps or [{}] * n))
        return cls(nets=tuple(nets), mask=mask, xlims=tuple(map(tuple, xlims)),
                   ylims=tuple(map(tuple, ylims)), extraps=extraps,
                   knots_x=knots_x, knots_y=knots_y, label=label)

    @property
    def num_splines(self):
        return len(self.xlims)

    def _apply(self, x_active, x_frozen, parity, net, inverse):
        out = net(x_frozen)  # input already carries channels
        out_splits = jnp.split(out, self.num_splines, axis=-1)
        x_splits = jnp.split(x_active, self.num_splines, axis=-1)
        fxs, loggs = [], []
        for i, (xi, oi) in enumerate(zip(x_splits, out_splits)):
            kx, ky, kd = _knots_from_net_out(
                oi, xlim=self.xlims[i], ylim=self.ylims[i],
                xwidth=self.xlims[i][1] - self.xlims[i][0],
                ywidth=self.ylims[i][1] - self.ylims[i][0],
                fixed_x=self.knots_x[i], fixed_y=self.knots_y[i],
                extrap=self.extraps[i])
            # xi: (..., c_i); knots broadcast over the channel slice
            fx, g = sp.rqs(xi, kx[..., None, :], ky[..., None, :],
                           kd[..., None, :], inverse=inverse)
            fxs.append(fx)
            loggs.append(jnp.log(g))
        fx = self.mask.purify(jnp.concatenate(fxs, axis=-1), channel=parity)
        logg = self.mask.purify(jnp.concatenate(loggs, axis=-1),
                                channel=parity)
        return fx, logg

    def atomic_forward(self, *, x_active, x_frozen, parity, net, log0,
                       density):
        fx, logg = self._apply(x_active, x_frozen, parity, net, False)
        return fx, log0 + sum_density(logg, density)

    def atomic_backward(self, *, x_active, x_frozen, parity, net, log0,
                        density):
        fx, logg = self._apply(x_active, x_frozen, parity, net, True)
        return fx, log0 + sum_density(logg, density)


# ===================================================================== #
# Controlled couplings (reference cntr_couplings_.py)
# ===================================================================== #
class DirectCntrCoupling(Flow):
    """Coupling whose FIRST layer's frozen input is an external control
    tensor; input/output is ``(x, control)`` (reference cntr_couplings_.py:17-50).

    Composes with any ``Coupling`` subclass via ``coupling``.
    """

    coupling: Any
    label: str | None = static(default="cntr_coupling_")

    def forward(self, x_and_control, log0=0.0, *, density: bool = False):
        x, control = x_and_control
        c = self.coupling
        parts = list(c.mask.split(x))
        x, extra = parts[:2], parts[2:]
        for k, net in enumerate(c.nets):
            parity = k % 2
            x_frozen = control if k == 0 else x[1 - parity]
            x[parity], log0 = c.atomic_forward(
                x_active=x[parity], x_frozen=x_frozen, parity=parity,
                net=net, log0=log0, density=density)
        return (c.mask.cat(*x, *extra), control), log0

    def backward(self, x_and_control, log0=0.0, *, density: bool = False):
        x, control = x_and_control
        c = self.coupling
        parts = list(c.mask.split(x))
        x, extra = parts[:2], parts[2:]
        for k in reversed(range(len(c.nets))):
            parity = k % 2
            x_frozen = control if k == 0 else x[1 - parity]
            x[parity], log0 = c.atomic_backward(
                x_active=x[parity], x_frozen=x_frozen, parity=parity,
                net=c.nets[k], log0=log0, density=density)
        return (c.mask.cat(*x, *extra), control), log0


class CntrCoupling(Flow):
    """Controlled coupling with a stored control tensor.

    The reference version (cntr_couplings_.py:54-79) draws a fresh control
    per forward call and stashes it mutably for the backward pass.  Here the
    control is an explicit (non-trainable, ``Const``-wrapped) array leaf:
    call :meth:`refresh_control` to draw a new one (functional -- returns a
    new flow), keeping forward/backward pure and serializable.  The
    ``Fitter`` refreshes controls automatically every training step (see
    :func:`refresh_controls`), matching the reference's fresh-control-per-
    forward semantics during training.
    """

    coupling: Any
    control: Any = None
    control_generator: Any = static(default=None)
    label: str | None = static(default="cntr_coupling_")

    def refresh_control(self, key, batch_size: int) -> "CntrCoupling":
        if self.control_generator is None:
            raise ValueError(
                "CntrCoupling.refresh_control needs a control_generator "
                "(a callable (key, batch_size) -> control array)")
        from ..struct import Const

        return self.replace(
            control=Const(self.control_generator(key, batch_size)))

    def _control_value(self):
        from ..struct import stop_const

        if self.control is None:
            raise ValueError(
                "CntrCoupling has no control tensor: call "
                "refresh_control(key, batch_size) first (the Fitter does "
                "this automatically when a control_generator is set)")
        return stop_const(self.control)

    def forward(self, x, log0=0.0, *, density: bool = False):
        (y, _), log0 = DirectCntrCoupling(coupling=self.coupling).forward(
            (x, self._control_value()), log0, density=density)
        return y, log0

    def backward(self, x, log0=0.0, *, density: bool = False):
        (y, _), log0 = DirectCntrCoupling(coupling=self.coupling).backward(
            (x, self._control_value()), log0, density=density)
        return y, log0


def has_controls(flow) -> bool:
    """True if any sub-flow is a ``CntrCoupling`` with a control generator."""
    found = []

    def visit(node):
        if isinstance(node, CntrCoupling) and node.control_generator is not None:
            found.append(node)
        return node

    _map_subflows(visit, flow)
    return bool(found)


def refresh_controls(flow, key, batch_size: int):
    """Draw a fresh control for every ``CntrCoupling`` in ``flow``.

    Functional counterpart of the reference's fresh-control-per-forward
    (cntr_couplings_.py:64-69): returns a new flow pytree with each
    controlled coupling's ``control`` leaf resampled from its generator.
    Each coupling gets an independent subkey.
    """
    counter = [0]

    def visit(node):
        if isinstance(node, CntrCoupling) and node.control_generator is not None:
            sub = jax.random.fold_in(key, counter[0])
            counter[0] += 1
            return node.refresh_control(sub, batch_size)
        return node

    return _map_subflows(visit, flow)


def _map_subflows(fn, node):
    """Recursively rebuild a flow pytree, applying ``fn`` to every dataclass
    node (children first, then the node itself).  Traverses dataclass
    fields and tuple/list/dict containers -- a ``CntrCoupling`` stored in a
    dict-valued field must not be silently skipped (its control would stay
    stale)."""
    import dataclasses as _dc

    if _dc.is_dataclass(node) and not isinstance(node, type):
        changes = {}
        for f in _dc.fields(node):
            v = getattr(node, f.name)
            new_v = _map_container(fn, v)
            if new_v is not v:
                changes[f.name] = new_v
        if changes:
            node = _dc.replace(node, **changes)
        return fn(node)
    return node


def _map_container(fn, v):
    """Apply :func:`_map_subflows` through (arbitrarily nested) tuple/list/
    dict containers, preserving identity when nothing changed."""
    if isinstance(v, (tuple, list)):
        new_v = type(v)(_map_container(fn, item) for item in v)
        return new_v if any(a is not b for a, b in zip(new_v, v)) else v
    if isinstance(v, dict):
        new_v = {k: _map_container(fn, item) for k, item in v.items()}
        changed = any(new_v[k] is not v[k] for k in v)
        return new_v if changed else v
    return _map_subflows(fn, v)


def CntrShiftCoupling(nets, *, mask, control_generator=None, **kwargs):
    return CntrCoupling(
        coupling=ShiftCoupling(nets=tuple(nets), mask=mask, **kwargs),
        control_generator=control_generator)


def CntrAffineCoupling(nets, *, mask, control_generator=None, **kwargs):
    return CntrCoupling(
        coupling=AffineCoupling(nets=tuple(nets), mask=mask, **kwargs),
        control_generator=control_generator)


def CntrRQSplineCoupling(nets, *, mask, control_generator=None, **kwargs):
    return CntrCoupling(
        coupling=RQSplineCoupling.build(nets, mask=mask, **kwargs),
        control_generator=control_generator)


def CntrMultiRQSplineCoupling(nets, *, mask, control_generator=None, **kwargs):
    return CntrCoupling(
        coupling=MultiRQSplineCoupling.build(nets, mask=mask, **kwargs),
        control_generator=control_generator)
