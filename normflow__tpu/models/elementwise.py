r"""Elementwise (pointwise) bijections and distribution convertors.

TPU-native re-design of the reference's elementwise flow zoo
(/root/reference/src/nn/scalar/modules_.py) plus the trainable-knot
``SplineNet`` (/root/reference/src/nn/scalar/modules.py:276-391).  All maps
are pure elementwise VPU work that XLA fuses into neighboring ops.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import spline as sp
from ..struct import Pytree, static, HashableArray
from .core import Flow, FlowList, sum_density

__all__ = [
    "Identity", "Clone", "Scale", "Tanh", "ArcTanh", "Expit", "Logit",
    "Pade11", "Pade22", "Pade32", "SgnBias", "SplineFlow",
    "UnityDistConvertor", "PhaseDistConvertor", "DistConvertor",
    "softplus_log2", "inv_softplus_log2",
]

_LOG2 = float(np.log(2.0))


def softplus_log2(x):
    r"""Softplus with ``beta = log 2`` so that ``softplus_log2(0) = 1``.

    The reference uses this parameterization for all positive quantities
    (derivatives, scales) so zero-initialized weights give the identity map
    (reference modules.py:314-317).  ``log(1 + 2^x) / log 2``, computed
    stably.
    """
    return jax.nn.softplus(x * _LOG2) / _LOG2


def inv_softplus_log2(y):
    """Inverse of :func:`softplus_log2` (for initializing to a target value)."""
    y = jnp.asarray(y)
    return jnp.log(jnp.expm1(y * _LOG2)) / _LOG2


class Identity(Flow):
    """Identity bijection (reference modules_.py:20-29)."""

    label: str | None = static(default="identity_")

    def forward(self, x, log0=0.0, *, density: bool = False):
        return x, log0 + _zero_logj(x, density)

    backward = forward


class Clone(Identity):
    """Copy bijection (reference modules_.py:32-41); a no-op in JAX's
    functional model (arrays are immutable)."""

    label: str | None = static(default="clone_")


def _zero_logj(x, density):
    if density:
        return jnp.zeros_like(x)
    return jnp.zeros(x.shape[:1], dtype=x.dtype)


class Scale(Flow):
    """Global positive scaling ``y = w * x`` with exact log-Jacobian.

    Mirrors ``ScaleNet_`` (reference modules_.py:44-69): the weight is
    softplus-parameterized so ``w > 0`` and zero-init gives ``w = 1``.
    """

    w: jax.Array
    label: str | None = static(default="scale_")

    @classmethod
    def build(cls, dtype=None, label="scale_"):
        dtype = dtype or jnp.result_type(float)
        return cls(w=jnp.zeros((1,), dtype), label=label)

    @property
    def weight(self):
        return softplus_log2(self.w)

    def forward(self, x, log0=0.0, *, density: bool = False):
        return x * self.weight, log0 + self._logj(x, density, +1)

    def backward(self, x, log0=0.0, *, density: bool = False):
        return x / self.weight, log0 + self._logj(x, density, -1)

    def _logj(self, x, density, sign):
        logw = sign * jnp.log(self.weight)  # shape (1,)
        if density:
            return jnp.broadcast_to(logw, x.shape).astype(x.dtype)
        n = np.prod(x.shape[1:], dtype=float)
        return jnp.broadcast_to(logw * n, x.shape[:1]).astype(x.dtype)


class Tanh(Flow):
    """``y = tanh(x)`` with ``logJ = -2 sum log cosh x`` (modules_.py:72-79)."""

    label: str | None = static(default="tanh_")

    def forward(self, x, log0=0.0, *, density: bool = False):
        # log(1 - tanh^2 x) = 2(log 2 - x - softplus(-2x)), stable for |x| large
        logj = 2 * (_LOG2 - x - jax.nn.softplus(-2 * x))
        return jnp.tanh(x), log0 + sum_density(logj, density)

    def backward(self, x, log0=0.0, *, density: bool = False):
        return ArcTanh().forward(x, log0, density=density)


class ArcTanh(Flow):
    """``y = atanh(x)`` (modules_.py:82-90)."""

    label: str | None = static(default="arctanh_")

    def forward(self, x, log0=0.0, *, density: bool = False):
        y = jnp.arctanh(x)
        logj = -jnp.log1p(-x * x)
        return y, log0 + sum_density(logj, density)

    def backward(self, x, log0=0.0, *, density: bool = False):
        return Tanh().forward(x, log0, density=density)


class Expit(Flow):
    """Sigmoid ``y = 1/(1+e^{-x})`` (modules_.py:93-102), stable log-Jacobian."""

    label: str | None = static(default="expit_")

    def forward(self, x, log0=0.0, *, density: bool = False):
        y = jax.nn.sigmoid(x)
        logj = jax.nn.log_sigmoid(x) + jax.nn.log_sigmoid(-x)
        return y, log0 + sum_density(logj, density)

    def backward(self, x, log0=0.0, *, density: bool = False):
        return Logit().forward(x, log0, density=density)


class Logit(Flow):
    """``y = log(x/(1-x))`` (modules_.py:105-114)."""

    label: str | None = static(default="logit_")

    def forward(self, x, log0=0.0, *, density: bool = False):
        y = jnp.log(x) - jnp.log1p(-x)
        logj = -(jnp.log(x) + jnp.log1p(-x))
        return y, log0 + sum_density(logj, density)

    def backward(self, x, log0=0.0, *, density: bool = False):
        return Expit().forward(x, log0, density=density)


def _reshape_channels(w, ndim, channels_axis):
    shape = [1] * ndim
    shape[channels_axis] = w.shape[0]
    return w.reshape(shape)


class Pade11(Flow):
    r"""Pade 1/1 bijection of [0,1]: ``f(x;t) = x / (x + e^t (1-x))``.

    Mirrors ``Pade11_`` (reference modules_.py:117-158); channelwise
    parameter with softplus-parameterized derivative at 1.
    """

    w1: jax.Array
    channels_axis: int = static(default=-1)
    label: str | None = static(default="pade11")

    @classmethod
    def build(cls, n_channels=1, channels_axis=-1, dtype=None, label="pade11"):
        dtype = dtype or jnp.result_type(float)
        return cls(w1=jnp.zeros((n_channels,), dtype), channels_axis=channels_axis,
                   label=label)

    def forward(self, x, log0=0.0, *, density: bool = False):
        d1 = softplus_log2(_reshape_channels(self.w1, x.ndim, self.channels_axis))
        denom = x + (1 - x) * d1
        logj = jnp.log(d1) - 2 * jnp.log(denom)
        return x / denom, log0 + sum_density(logj, density)

    def backward(self, x, log0=0.0, *, density: bool = False):
        d1 = softplus_log2(_reshape_channels(self.w1, x.ndim, self.channels_axis))
        denom = x + (1 - x) / d1
        logj = -jnp.log(d1) - 2 * jnp.log(denom)
        return x / denom, log0 + sum_density(logj, density)


class Pade22(Flow):
    r"""Pade 2/2 bijection of [0,1] (reference modules_.py:161-222).

    ``f(x) = x (x + d0 (1-x)) / (1 + (d1+d0-2) x (1-x))`` with channelwise
    ``d0, d1 > 0``; ``symmetric=True`` ties ``d1 = d0``.
    """

    w0: jax.Array
    w1: jax.Array
    channels_axis: int = static(default=-1)
    symmetric: bool = static(default=False)
    label: str | None = static(default="pade22")

    @classmethod
    def build(cls, n_channels=1, channels_axis=-1, symmetric=False, dtype=None,
              label="pade22"):
        dtype = dtype or jnp.result_type(float)
        z = jnp.zeros((n_channels,), dtype)
        return cls(w0=z, w1=z, channels_axis=channels_axis, symmetric=symmetric,
                   label=label)

    def _derivs(self, ndim):
        d0 = softplus_log2(_reshape_channels(self.w0, ndim, self.channels_axis))
        w1 = self.w0 if self.symmetric else self.w1
        d1 = softplus_log2(_reshape_channels(w1, ndim, self.channels_axis))
        return d0, d1

    @staticmethod
    def _g1(x, d0, d1):
        denom = 1 + (d1 + d0 - 2) * x * (1 - x)
        return (d0 + 2 * (1 - d0) * x + (d1 + d0 - 2) * x**2) / denom**2

    def forward(self, x, log0=0.0, *, density: bool = False):
        d0, d1 = self._derivs(x.ndim)
        denom = 1 + (d1 + d0 - 2) * x * (1 - x)
        y = x * (x + d0 * (1 - x)) / denom
        logj = jnp.log(self._g1(x, d0, d1))
        return y, log0 + sum_density(logj, density)

    def backward(self, y, log0=0.0, *, density: bool = False):
        d0, d1 = self._derivs(y.ndim)
        # positive root of a x^2 + b x + c = 0 (reference modules_.py:197-205),
        # via the stable citardauq form (c >= 0, a <= -b - c here).
        c = y
        b = (d1 + d0 - 2) * y - d0
        a = -1 - b
        delta = jnp.sqrt(jnp.maximum(b * b - 4 * c * a, 0.0))
        # reference picks (-b - delta) / (2a); rationalized: 2c / (-b + delta)
        denom_q = -b + delta
        safe = jnp.where(jnp.abs(denom_q) < jnp.finfo(y.dtype).tiny, 1.0, denom_q)
        x = 2 * c / safe
        logj = -jnp.log(self._g1(x, d0, d1))
        return x, log0 + sum_density(logj, density)


class Pade32(Flow):
    r"""Odd Pade 3/2 bijection of the real line (reference modules_.py:225-274).

    ``f(x) = x (a + x^2) / (1 + a x^2)`` with ``0 < a < 3``.  The reference's
    ``backward`` is broken (undefined name, modules_.py:257); here the inverse
    solves the monotone cubic with a fixed Newton iteration (jit-friendly).
    """

    w0: jax.Array
    channels_axis: int = static(default=-1)
    newton_iters: int = static(default=24)
    label: str | None = static(default="pade32")

    @classmethod
    def build(cls, n_channels=1, channels_axis=-1, dtype=None, label="pade32"):
        dtype = dtype or jnp.result_type(float)
        w0 = jnp.full((n_channels,), -float(np.log(2.0)), dtype)
        return cls(w0=w0, channels_axis=channels_axis, label=label)

    def _a(self, ndim):
        return 3 * jax.nn.sigmoid(_reshape_channels(self.w0, ndim, self.channels_axis))

    @staticmethod
    def _f(x, a):
        s = x * x
        return x * (a + s) / (1 + a * s)

    @staticmethod
    def _df(x, a):
        s = x * x
        return (a * s**2 + (3 - a * a) * s + a) / (1 + a * s) ** 2

    def forward(self, x, log0=0.0, *, density: bool = False):
        a = self._a(x.ndim)
        logj = jnp.log(self._df(x, a))
        return self._f(x, a), log0 + sum_density(logj, density)

    def backward(self, y, log0=0.0, *, density: bool = False):
        a = self._a(y.ndim)

        def newton(x, _):
            x = x - (self._f(x, a) - y) / self._df(x, a)
            return x, None

        x, _ = jax.lax.scan(newton, y, None, length=self.newton_iters)
        logj = -jnp.log(self._df(x, a))
        return x, log0 + sum_density(logj, density)


class SgnBias(Flow):
    """Discontinuous bias ``y = x + sgn(x) w^2`` (reference modules_.py:386-400).

    Volume-preserving; only valid as the first layer of a flow.
    """

    w: jax.Array
    label: str | None = static(default="sgnbias_")

    @classmethod
    def build(cls, key=None, size=(1,), dtype=None, label="sgnbias_"):
        dtype = dtype or jnp.result_type(float)
        if key is None:
            w = jnp.full(size, 0.05, dtype)
        else:
            w = jax.random.uniform(key, size, dtype) / 10
        return cls(w=w, label=label)

    def forward(self, x, log0=0.0, *, density: bool = False):
        return x + jnp.sign(x) * self.w**2, log0 + _zero_logj(x, density)

    def backward(self, x, log0=0.0, *, density: bool = False):
        return x - jnp.sign(x) * self.w**2, log0 + _zero_logj(x, density)


class SplineFlow(Flow):
    """Trainable-knot rational-spline bijection (elementwise).

    Mirrors ``SplineNet``/``SplineNet_`` (reference modules.py:276-391,
    modules_.py:277-302): ``knots_len - 1`` weights parameterize the x (and
    y) knot positions through softmax+cumsum, ``knots_len`` weights the
    derivatives through softplus; ``smooth=True`` drops the derivative
    parameters and uses slope-averaged derivatives.  Boundary knots are
    pinned to ``(xlim[0], ylim[0])`` and ``(xlim[1], ylim[1])``.

    ``spline_shape`` gives per-channel splines: weights carry leading axes
    that broadcast against the trailing axes of the input.
    """

    weights_x: jax.Array | None
    weights_y: jax.Array | None
    weights_d: jax.Array | None
    knots_len: int = static(default=2)
    xlim: tuple = static(default=(0.0, 1.0))
    ylim: tuple = static(default=(0.0, 1.0))
    extrap: tuple = static(default=())
    spline_shape: tuple = static(default=())
    smooth: bool = static(default=False)
    kind: str = static(default="rqs")  # 'rqs' | 'rls'
    fixed_knots_x: HashableArray | None = static(default=None)
    fixed_knots_y: HashableArray | None = static(default=None)
    fixed_knots_d: HashableArray | None = static(default=None)
    label: str | None = static(default="spline_")

    @classmethod
    def build(cls, knots_len, xlim=(0.0, 1.0), ylim=(0.0, 1.0),
              knots_x=None, knots_y=None, knots_d=None,
              spline_shape=(), smooth=False, extrap=None, kind="rqs",
              dtype=None, label="spline_"):
        dtype = dtype or jnp.result_type(float)
        assert knots_len >= 2, "oops: knots_len < 2 for splines"
        spline_shape = tuple(spline_shape)
        init = lambda n: jnp.zeros((*spline_shape, n), dtype)
        wx = None if knots_x is not None else init(knots_len - 1)
        wy = None if knots_y is not None else init(knots_len - 1)
        wd = None if (knots_d is not None or smooth) else init(knots_len)
        wrap = lambda a: None if a is None else HashableArray(np.asarray(a))
        extrap_t = tuple(sorted(extrap.items())) if isinstance(extrap, dict) \
            else tuple(extrap or ())
        if "periodic" in dict(extrap_t).values() and knots_d is None:
            # softplus-parameterized derivatives are strictly positive, so
            # the zero-boundary-derivative requirement of 'periodic'
            # augmentation (reference spline.py:504-505) can never hold.
            raise ValueError(
                "extrap='periodic' requires fixed knots_d with zero "
                "boundary derivatives (trainable derivatives are strictly "
                "positive)")
        return cls(
            weights_x=wx, weights_y=wy, weights_d=wd, knots_len=knots_len,
            xlim=tuple(xlim), ylim=tuple(ylim), extrap=extrap_t,
            spline_shape=spline_shape, smooth=smooth, kind=kind,
            fixed_knots_x=wrap(knots_x), fixed_knots_y=wrap(knots_y),
            fixed_knots_d=wrap(knots_d), label=label,
        )

    def make_knots(self):
        """Materialize ``(kx, ky, kd)`` from the trainable weights.

        softmax+cumsum coordinates (reference modules.py:369-391) and
        softplus derivatives; then boundary augmentation per ``extrap``.
        """
        def to_coord(w, lim):
            return sp.knot_coords(w, lim[0], lim[1] - lim[0])

        kx = (jnp.asarray(self.fixed_knots_x.value) if self.fixed_knots_x is not None
              else to_coord(self.weights_x, self.xlim))
        ky = (jnp.asarray(self.fixed_knots_y.value) if self.fixed_knots_y is not None
              else to_coord(self.weights_y, self.ylim))
        if self.fixed_knots_d is not None:
            kd = jnp.asarray(self.fixed_knots_d.value)
        elif self.weights_d is not None:
            kd = softplus_log2(self.weights_d)
        else:
            smooth_fn = sp.smooth_derivatives_rq if self.kind == "rqs" \
                else sp.smooth_derivatives_rl
            kd = smooth_fn(*jnp.broadcast_arrays(kx, ky))
        extrap = dict(self.extrap)
        if extrap:
            kx, ky, kd = sp.augment_knots(kx, ky, kd, **extrap)
        return kx, ky, kd

    def _spline_fn(self):
        return sp.rqs if self.kind == "rqs" else sp.rls

    def forward(self, x, log0=0.0, *, density: bool = False):
        kx, ky, kd = self.make_knots()
        y, g = self._spline_fn()(x, kx, ky, kd)
        return y, log0 + sum_density(jnp.log(g), density)

    def backward(self, x, log0=0.0, *, density: bool = False):
        kx, ky, kd = self.make_knots()
        y, g = self._spline_fn()(x, kx, ky, kd, inverse=True)
        return y, log0 + sum_density(jnp.log(g), density)


class SplineNet(SplineFlow):
    """Raw trainable-knot spline net (no log-Jacobian handling).

    Mirrors the reference's plain ``SplineNet`` (modules.py:276-391):
    ``__call__`` applies the spline as a function; ``backward`` applies the
    inverse.  Used e.g. by the IPSD net.
    """

    def __call__(self, x):
        kx, ky, kd = self.make_knots()
        y, _ = self._spline_fn()(x, kx, ky, kd)
        return y

    def invert(self, y):
        kx, ky, kd = self.make_knots()
        x, _ = self._spline_fn()(y, kx, ky, kd, inverse=True)
        return x


class UnityDistConvertor(SplineFlow):
    """PDF convertor for variables in [0, 1] (reference modules_.py:305-315)."""

    @classmethod
    def build(cls, knots_len, symmetric=False, **kwargs):
        if symmetric:
            kwargs.setdefault("xlim", (0.5, 1.0))
            kwargs.setdefault("ylim", (0.5, 1.0))
            kwargs.setdefault("extrap", {"left": "anti"})
        return super().build(knots_len, **kwargs)


class PhaseDistConvertor(SplineFlow):
    """PDF convertor for phases in [-pi, pi] (reference modules_.py:318-330)."""

    @classmethod
    def build(cls, knots_len, symmetric=False, label="phase-dc_", **kwargs):
        pi = float(np.pi)
        if symmetric:
            kwargs.setdefault("xlim", (0.0, pi))
            kwargs.setdefault("ylim", (0.0, pi))
            kwargs.setdefault("extrap", {"left": "anti"})
        else:
            kwargs.setdefault("xlim", (-pi, pi))
            kwargs.setdefault("ylim", (-pi, pi))
        return super().build(knots_len, label=label, **kwargs)


class DistConvertor(FlowList):
    """PDF convertor for real variables: ``Expit -> Spline -> Logit``.

    The workhorse elementwise flow on the real line (reference
    modules_.py:333-383).  Optional ``Scale`` (initial or final) and
    ``SgnBias`` (first only) layers.
    """

    @classmethod
    def build(cls, knots_len, symmetric=False, label="dc_", sgnbias=False,
              initial_scale=False, final_scale=False, key=None, dtype=None,
              **kwargs):
        if symmetric:
            extra = dict(xlim=(0.5, 1.0), ylim=(0.5, 1.0),
                         extrap={"left": "anti"})
        else:
            extra = dict(xlim=(0.0, 1.0), ylim=(0.0, 1.0))

        flows: list[Any] = []
        if knots_len > 1:
            spl = SplineFlow.build(knots_len, dtype=dtype, label="spline_",
                                   **extra, **kwargs)
            flows = [Expit(label="expit_"), spl, Logit(label="logit_")]
        if initial_scale:
            flows = [Scale.build(dtype=dtype, label="scale_")] + flows
        elif final_scale:
            flows = flows + [Scale.build(dtype=dtype, label="scale_")]
        if sgnbias:  # SgnBias **must** come first if it exists
            flows = [SgnBias.build(key=key, dtype=dtype)] + flows
        return cls(flows=tuple(flows), label=label)

    def _find(self, label):
        for f in self.flows:
            if getattr(f, "label", None) == label:
                return f
        return None

    @property
    def spline_layer(self):
        return self._find("spline_")

    @property
    def scale_layer(self):
        return self._find("scale_")

    @property
    def sgnbias_layer(self):
        return self._find("sgnbias_")
