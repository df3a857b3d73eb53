"""Raw (non-invertible) nets: circular conv stacks and linear stacks.

TPU-native re-design of ``ConvAct``/``LinearAct``/``ConvNd``
(/root/reference/src/nn/scalar/modules.py:68-273, convNd.py:7-175).

Layout choice: **channels-last** ``(batch, *lattice, channels)`` -- the
native TPU conv layout (NHWC); the MXU contracts over the channel axis.
Periodic boundary conditions are manual wrap-padding + VALID convolution
(XLA fuses the pad).  1-3 spatial dims use ``lax.conv_general_dilated``
natively; 4-D lattices use the roll-and-sum decomposition over the leading
kernel axis (the same trick as the reference's ``Conv4d``, convNd.py:86-126,
because TPUs, like cuDNN, have no native 4-D conv).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.lattice import neighbor_mean
from ..struct import Pytree, static

__all__ = ["ConvNet", "LinearNet", "CircularConv", "Dense", "ACTIVATIONS"]


def _act_avg_neighbor_pool(x):
    # spatial axes for channels-last data: everything but batch & channels
    return neighbor_mean(x, axes=range(1, x.ndim - 1))


ACTIVATIONS: dict[str, Callable] = {
    "tanh": jnp.tanh,
    "relu": jax.nn.relu,
    "leaky_relu": jax.nn.leaky_relu,
    "softplus": jax.nn.softplus,
    "avg_neighbor_pool": _act_avg_neighbor_pool,
    "abs": jnp.abs,
    # NOTE: applied (the reference's Expit/Logit activations return the
    # function object instead of applying it -- defect SURVEY §2.14.5)
    "expit": jax.nn.sigmoid,
    "logit": lambda x: jnp.log(x) - jnp.log1p(-x),
    "none": lambda x: x,
}


def _torch_conv_init(key, kernel_shape, in_ch, out_ch, dtype, bias: bool):
    """Kaiming-uniform(a=sqrt(5)) + uniform bias, matching torch Conv
    defaults so training dynamics track the reference: torch's bound is
    gain*sqrt(3/fan_in) with gain=sqrt(1/3), i.e. U(-1/sqrt(fan_in),
    +1/sqrt(fan_in)) for both weight and bias."""
    fan_in = in_ch * int(np.prod(kernel_shape))
    bound = 1.0 / np.sqrt(fan_in)
    k_w, k_b = jax.random.split(key)
    w = jax.random.uniform(k_w, (*kernel_shape, in_ch, out_ch), dtype,
                           -bound, bound)
    b = (jax.random.uniform(k_b, (out_ch,), dtype, -bound, bound)
         if bias else None)
    return w, b


class CircularConv(Pytree):
    """One N-dim conv layer with periodic ('circular') padding, channels-last.

    Weight layout ``(*kernel, in_ch, out_ch)`` (HWIO).  Supports 1-4 spatial
    dims; 4-D decomposes into rolled 3-D convs (reference convNd.py:86-126).
    """

    weight: jax.Array
    bias: jax.Array | None
    conv_dim: int = static(default=2)
    dilation: int = static(default=1)

    @classmethod
    def build(cls, key, in_channels, out_channels, kernel_size, conv_dim=2,
              bias=True, dtype=None, dilation=1):
        """``dilation > 1`` spaces the kernel taps ``dilation`` sites apart
        (circular wrap preserved): a one-line receptive-field multiplier
        for deep conditioners without extra parameters or FLOPs --
        ``lax.conv_general_dilated``'s ``rhs_dilation`` (the axis the
        reference's ConvAct never exposes, modules.py:114-118)."""
        dtype = dtype or jnp.result_type(float)
        ks = ((kernel_size,) * conv_dim if isinstance(kernel_size, int)
              else tuple(kernel_size))
        assert len(ks) == conv_dim and 1 <= conv_dim <= 4
        w, b = _torch_conv_init(key, ks, in_channels, out_channels, dtype, bias)
        return cls(weight=w, bias=b, conv_dim=conv_dim, dilation=int(dilation))

    @property
    def kernel_size(self):
        return self.weight.shape[: self.conv_dim]

    def __call__(self, x, out_dtype=None):
        """``out_dtype`` (round 5): emit the conv result directly in that
        dtype via XLA's ``preferred_element_type`` — the MXU accumulates in
        f32 regardless, so a bf16 compute stack can write its FINAL f32
        output in the conv epilogue instead of a separate ``copy_convert``
        op (measured 108 us/iter, 11% of the flagship sampling program —
        docs/EXPERIMENTS.md round-5 roofline)."""
        nd = self.conv_dim
        if nd <= 3:
            y = self._convnd(x, self.weight, out_dtype)
        else:
            y = self._conv4d(x, out_dtype)
        if self.bias is not None:
            b = self.bias
            if out_dtype is not None:
                b = b.astype(out_dtype)
            y = y + b
        return y

    def _convnd(self, x, w, out_dtype=None):
        nd = w.ndim - 2
        ks = w.shape[:nd]
        d = self.dilation
        # periodic 'same' padding for the EFFECTIVE (dilated) kernel extent
        # e = (k-1)*d + 1: total pad e-1, split ((e-1)//2, e//2) to match
        # torch's padding='same' site alignment (torch puts the extra pad
        # of an even kernel on the right; only even kernels are sensitive
        # to the split).
        pad = [(0, 0)] + [(((k - 1) * d) // 2, ((k - 1) * d + 1) // 2)
                          for k in ks] + [(0, 0)]
        x = jnp.pad(x, pad, mode="wrap")
        spec = "".join("DHW"[3 - nd:][i] for i in range(nd))
        dn = jax.lax.conv_dimension_numbers(
            x.shape, w.shape, (f"N{spec}C", f"{spec}IO", f"N{spec}C"))
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1,) * nd, padding="VALID",
            rhs_dilation=(d,) * nd, dimension_numbers=dn,
            preferred_element_type=out_dtype)

    def _conv4d(self, x, out_dtype=None):
        # Roll-and-sum over the leading kernel axis: a 4-D circular conv is a
        # sum of 3-D circular convs of the input rolled along axis 1
        # (reference convNd.py:86-126, re-derived for channels-last).
        k0 = self.weight.shape[0]
        y = 0.0
        for i in range(k0):
            shift = (i - (k0 - 1) // 2) * self.dilation
            xi = jnp.roll(x, -shift, axis=1)
            y = y + self._convnd(
                xi.reshape((-1, *x.shape[2:])), self.weight[i], out_dtype
            ).reshape((*x.shape[:-1], self.weight.shape[-1]))
        return y


class ConvNet(Pytree):
    """Stack of circular conv layers with activations.

    Mirrors ``ConvAct`` (reference modules.py:68-159): sizes
    ``[in_channels, *hidden_sizes, out_channels]``, one activation name per
    layer (``acts``), optional ``pre_act``.  Channels-last data.
    """

    layers: tuple
    acts: tuple = static(default=(None,))
    pre_act: str | None = static(default=None)
    compute_dtype: str | None = static(default=None)
    # When running under a reduced compute_dtype and the final layer has no
    # activation, emit the final conv directly in the caller's dtype via
    # preferred_element_type (MXU epilogue cast) instead of a separate
    # copy_convert op.  MEASURED NEGATIVE on v5e (round-5 micro A/B,
    # interleaved: -2.7% raw -- the f32-output conv loses more than the
    # 108 us copy_convert saved, likely an output-tiling cost), so the
    # default stays off; the switch is kept because the trade is
    # hardware-generation dependent.
    fuse_out_cast: bool = static(default=False)

    @classmethod
    def build(cls, key, in_channels, out_channels, kernel_size, conv_dim=2,
              hidden_sizes=(), acts=(None,), pre_act=None, bias=True,
              dtype=None, compute_dtype=None, dilations=None):
        """``compute_dtype='bfloat16'`` runs the conv stack on the MXU in
        bf16 (params stay in ``dtype``); the output is cast back.  The conv
        net only *parameterizes* the transform -- the flow's log-Jacobian is
        computed exactly from its (cast-back) outputs, so invertibility and
        logq consistency are unaffected.

        ``dilations``: per-layer kernel dilation (int or one per layer);
        e.g. ``(1, 2, 4)`` grows the stack's receptive field exponentially
        at zero extra parameters/FLOPs."""
        sizes = [in_channels, *hidden_sizes, out_channels]
        acts = tuple(acts)
        assert len(acts) == len(hidden_sizes) + 1
        if dilations is None:
            dilations = (1,) * len(acts)
        elif isinstance(dilations, int):
            dilations = (dilations,) * len(acts)
        else:
            dilations = tuple(dilations)
        assert len(dilations) == len(acts)
        keys = jax.random.split(key, len(acts))
        layers = tuple(
            CircularConv.build(k, sizes[i], sizes[i + 1], kernel_size,
                               conv_dim=conv_dim, bias=bias, dtype=dtype,
                               dilation=dilations[i])
            for i, k in enumerate(keys)
        )
        return cls(layers=layers, acts=acts, pre_act=pre_act,
                   compute_dtype=compute_dtype)

    def __call__(self, x):
        out_dtype = x.dtype
        net = self
        if self.compute_dtype is not None:
            cd = jnp.dtype(self.compute_dtype)
            x = x.astype(cd)
            net = jax.tree_util.tree_map(lambda p: p.astype(cd), self)
        if net.pre_act is not None:
            x = ACTIVATIONS[net.pre_act](x)
        n_last = len(net.layers) - 1
        for i, (layer, act) in enumerate(zip(net.layers, net.acts)):
            fuse = (i == n_last and act is None and net.fuse_out_cast
                    and self.compute_dtype is not None
                    and jnp.dtype(out_dtype) != jnp.dtype(
                        self.compute_dtype))
            x = layer(x, out_dtype=out_dtype if fuse else None)
            if act is not None:
                x = ACTIVATIONS[act](x)
        return x.astype(out_dtype)

    def zeroed(self) -> "ConvNet":
        """All-zero parameters (reference ``set_param2zero``, modules.py:156-159),
        making any coupling built on this net the identity map."""
        return jax.tree_util.tree_map(jnp.zeros_like, self)

    def zeroed_final(self) -> "ConvNet":
        """Zero only the FINAL layer: the net outputs zeros (any coupling
        built on it is the identity map) while the hidden layers keep
        their init, so the zeroed layer still receives nonzero gradients.
        The near-identity init behind ``Coupling.grow`` — a fully
        ``zeroed()`` net is a dead gradient trap (zero hidden activations
        give the final layer zero gradient too)."""
        layers = list(self.layers)
        layers[-1] = jax.tree_util.tree_map(jnp.zeros_like, layers[-1])
        return self.replace(layers=tuple(layers))

    def transfer(self, **kwargs):
        return self


class RowParityFeature(Pytree):
    """Wraps a net, appending a ±1 row-parity plane as an extra channel.

    For conditioners on checkerboard-PACKED grids (``PackedEvenOddMask``):
    the packed geometry is row-parity-skewed (physical column offsets
    alternate by row), so a shared-weight conv needs the row parity as an
    input feature to express row-consistent physical stencils.  The wrapped
    net must expect one extra input channel.
    """

    net: Any

    def __call__(self, x):
        rows = jnp.arange(x.shape[1])
        par = (2.0 * (rows % 2) - 1.0).astype(x.dtype)
        shape = [1, x.shape[1]] + [1] * (x.ndim - 2)
        plane = jnp.broadcast_to(par.reshape(shape), (*x.shape[:-1], 1))
        return self.net(jnp.concatenate([x, plane], axis=-1))

    def transfer(self, **kwargs):
        return self.replace(net=self.net.transfer(**kwargs))

    def zeroed(self):
        return self.replace(net=self.net.zeroed())

    def zeroed_final(self):
        return self.replace(net=self.net.zeroed_final())


class Dense(Pytree):
    """One linear layer, features-last (torch Linear init)."""

    weight: jax.Array  # (in, out)
    bias: jax.Array | None

    @classmethod
    def build(cls, key, in_features, out_features, bias=True, dtype=None):
        dtype = dtype or jnp.result_type(float)
        bound = 1.0 / np.sqrt(in_features)  # torch Linear default
        k_w, k_b = jax.random.split(key)
        w = jax.random.uniform(k_w, (in_features, out_features), dtype,
                               -bound, bound)
        b = (jax.random.uniform(k_b, (out_features,), dtype, -bound, bound)
             if bias else None)
        return cls(weight=w, bias=b)

    def __call__(self, x):
        y = x @ self.weight
        if self.bias is not None:
            y = y + self.bias
        return y


class PlusBias(Pytree):
    """Standalone bias add (reference modules.py:57-65)."""

    bias: jax.Array

    @classmethod
    def build(cls, key, out_features, dtype=None):
        dtype = dtype or jnp.result_type(float)
        return cls(bias=jax.random.normal(key, (out_features,), dtype))

    def __call__(self, x):
        return x + self.bias


class LinearNet(Pytree):
    """Stack of linear layers with activations, movable features axis.

    Mirrors ``LinearAct`` (reference modules.py:197-273).
    """

    layers: tuple
    acts: tuple = static(default=(None,))
    pre_act: str | None = static(default=None)
    final_bias: Any = None
    features_axis: int = static(default=-1)

    @classmethod
    def build(cls, key, in_features, out_features, hidden_sizes=(),
              acts=(None,), pre_act=None, final_bias=False, features_axis=-1,
              bias=True, dtype=None):
        sizes = [in_features, *hidden_sizes, out_features]
        acts = tuple(acts)
        assert len(acts) == len(hidden_sizes) + 1
        keys = jax.random.split(key, len(acts) + 1)
        layers = tuple(
            Dense.build(keys[i], sizes[i], sizes[i + 1], bias=bias, dtype=dtype)
            for i in range(len(acts))
        )
        fb = PlusBias.build(keys[-1], out_features, dtype) if final_bias else None
        return cls(layers=layers, acts=acts, pre_act=pre_act, final_bias=fb,
                   features_axis=features_axis)

    def __call__(self, x):
        axis = self.features_axis
        if axis not in (-1, x.ndim - 1):
            x = jnp.moveaxis(x, axis, -1)
        y = x
        if self.pre_act is not None:
            y = ACTIVATIONS[self.pre_act](y)
        for layer, act in zip(self.layers, self.acts):
            y = layer(y)
            if act is not None:
                y = ACTIVATIONS[act](y)
        if self.final_bias is not None:
            y = self.final_bias(y)
        if axis not in (-1, x.ndim - 1):
            y = jnp.moveaxis(y, -1, axis)
        return y

    def zeroed(self) -> "LinearNet":
        return jax.tree_util.tree_map(jnp.zeros_like, self)

    def zeroed_final(self) -> "LinearNet":
        """Zero the final layer (and ``final_bias`` if any) only; see
        ``ConvNet.zeroed_final``."""
        layers = list(self.layers)
        layers[-1] = jax.tree_util.tree_map(jnp.zeros_like, layers[-1])
        fb = (jax.tree_util.tree_map(jnp.zeros_like, self.final_bias)
              if self.final_bias is not None else None)
        return self.replace(layers=tuple(layers), final_bias=fb)

    def transfer(self, **kwargs):
        return self
