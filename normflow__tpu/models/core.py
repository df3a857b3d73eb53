"""Bijection core: the ``(y, log_det)`` flow protocol and containers.

TPU-native re-design of the reference's ``Module_`` / ``ModuleList_``
(/root/reference/src/nn/_core.py:12-231).  Key differences:

- flows are immutable pytree dataclasses (see ``normflow__tpu.struct``), so
  the module tree IS the parameter pytree -- ``jax.grad`` differentiates
  through a whole model directly;
- the log-Jacobian *density* option is an explicit ``density`` keyword
  threaded through ``forward``/``backward``, replacing the reference's
  global mutable class flag ``Module_.propagate_density`` (SURVEY.md §7
  hard-part 4);
- ``backward`` is the exact inverse (with log-Jacobian accumulation), same
  contract as the reference's trailing-underscore convention.
"""

from __future__ import annotations

import base64
from typing import Any, Sequence

import jax
import jax.numpy as jnp

from ..struct import Pytree, static, tree_size

__all__ = [
    "Flow", "FlowList", "MultiChannelFlow", "MultiOutChannelFlow",
    "InvisibilityMaskWrapper", "sum_density",
]


def sum_density(x, density: bool = False):
    """Reduce a per-site log-Jacobian density over non-batch axes.

    Mirrors ``Module_.sum_density`` (reference nn/_core.py:38-42): axis 0 is
    the batch axis; pass ``density=True`` to keep the full density.
    """
    if density:
        return x
    return jnp.sum(x, axis=tuple(range(1, jnp.ndim(x))))


class Flow(Pytree):
    """Base invertible module.

    Contract: ``forward(x, log0=0.) -> (y, log0 + logJ)`` and
    ``backward(y, log0=0.) -> (x, log0 - logJ)`` where ``logJ`` is the
    per-sample log|det d(out)/d(in)| (or its per-site density when
    ``density=True``).
    """

    def forward(self, x, log0=0.0, *, density: bool = False):
        raise NotImplementedError

    def backward(self, x, log0=0.0, *, density: bool = False):
        raise NotImplementedError

    def __call__(self, x, log0=0.0, **kwargs):
        return self.forward(x, log0, **kwargs)

    def transfer(self, **kwargs):
        """Hook for transfer learning (reference nn/_core.py:30-32)."""
        return self

    def to(self, device_or_sharding):
        """Functional device placement (reference ``ModuleList_.to``,
        nn/_core.py:132-134): returns a copy with all leaves placed."""
        return jax.device_put(self, device_or_sharding)


class FlowList(Flow):
    """Sequential composition of flows, accumulating the log-Jacobian.

    Mirrors ``ModuleList_`` (reference nn/_core.py:46-134): ``forward``
    composes in order, ``backward`` in reverse order.
    """

    flows: tuple
    label: str | None = static(default=None)

    def __post_init__(self):
        object.__setattr__(self, "flows", tuple(self.flows))

    def forward(self, x, log0=0.0, *, density: bool = False):
        for f in self.flows:
            x, log0 = f.forward(x, log0, density=density)
        return x, log0

    def backward(self, x, log0=0.0, *, density: bool = False):
        for f in reversed(self.flows):
            x, log0 = f.backward(x, log0, density=density)
        return x, log0

    def __iter__(self):
        return iter(self.flows)

    def __len__(self):
        return len(self.flows)

    def __getitem__(self, i):
        return self.flows[i]

    def hack(self, x, log0=0.0, **kwargs):
        """Forward pass returning all intermediates (reference nn/_core.py:95-103)."""
        stack = [(x, log0)]
        for f in self.flows:
            x, log0 = f.forward(x, log0, **kwargs)
            stack.append((x, log0))
        return stack

    def get_weights_blob(self) -> str:
        """Portable base64 weight blob (reference nn/_core.py:108-112)."""
        from flax.serialization import msgpack_serialize

        from ..utils.serialization import leaves_of

        return base64.b64encode(
            msgpack_serialize(leaves_of(self))).decode("utf-8")

    def set_weights_blob(self, blob: str) -> "FlowList":
        """Return a copy with weights restored from a blob (functional;
        leaf-count/shape-checked against this architecture)."""
        from flax.serialization import msgpack_restore

        from ..utils.serialization import restore_into

        leaf_dict = msgpack_restore(base64.b64decode(blob.strip()))
        return restore_into(self, leaf_dict)

    @property
    def npar(self) -> int:
        return tree_size(self)

    def transfer(self, **kwargs):
        """Transfer-learning hook: map each child (reference nn/_core.py:105-106)."""
        return self.replace(flows=tuple(f.transfer(**kwargs) for f in self.flows))

    def freeze_parameters(self) -> "FlowList":
        """Return a copy whose sub-flows are all frozen (non-trainable).

        Functional replacement for ``requires_grad=False``
        (reference nn/_core.py:120-126): children are wrapped in
        :class:`Frozen`, which stops gradients and is masked out of
        optimizer updates and weight decay by the Fitter.
        """
        return self.replace(flows=tuple(freeze(f) for f in self.flows))

    def unfreeze_parameters(self) -> "FlowList":
        return self.replace(flows=tuple(unfreeze(f) for f in self.flows))


class Frozen(Flow):
    """Marks an inner flow as non-trainable.

    Gradients through the inner parameters are stopped, and the Fitter
    excludes the subtree from optimizer updates (incl. weight decay) via
    :func:`trainable_mask`.
    """

    flow: Any

    def _stopped(self):
        return jax.tree_util.tree_map(jax.lax.stop_gradient, self.flow)

    def forward(self, x, log0=0.0, **kwargs):
        return self._stopped().forward(x, log0, **kwargs)

    def backward(self, x, log0=0.0, **kwargs):
        return self._stopped().backward(x, log0, **kwargs)


def freeze(flow):
    return flow if isinstance(flow, Frozen) else Frozen(flow=flow)


def unfreeze(flow):
    return flow.flow if isinstance(flow, Frozen) else flow


def trainable_mask(net):
    """Bool pytree matching ``net``: False under every :class:`Frozen` node.

    Feed to ``optax.masked`` so frozen parameters receive no updates and no
    weight decay.
    """

    def is_frozen(x):
        return isinstance(x, Frozen)

    def expand(x):
        if is_frozen(x):
            return jax.tree_util.tree_map(lambda _: False, x)
        return jax.tree_util.tree_map(lambda _: True, x)

    return jax.tree_util.tree_map(expand, net, is_leaf=is_frozen)


class MultiChannelFlow(Flow):
    """Applies the k-th subflow to the k-th channel slice.

    Mirrors ``MultiChannelModule_`` (reference nn/_core.py:138-183).  With
    ``keep_channels_axis`` each subflow sees a size-1 channel slice; otherwise
    the channel axis is removed before dispatch and restacked after.
    """

    flows: tuple
    channels_axis: int = static(default=-1)
    keep_channels_axis: bool = static(default=True)
    label: str | None = static(default=None)

    def __post_init__(self):
        object.__setattr__(self, "flows", tuple(self.flows))

    def forward(self, x, log0=0.0, *, density: bool = False):
        return self._map(x, [f.forward for f in self.flows], log0, density)

    def backward(self, x, log0=0.0, *, density: bool = False):
        return self._map(x, [f.backward for f in self.flows], log0, density)

    def _map(self, x, fns, log0, density):
        axis = self.channels_axis % x.ndim
        n = x.shape[axis]
        assert n == len(fns), "mismatch in channels of input & network."
        parts = [jax.lax.index_in_dim(x, k, axis, keepdims=self.keep_channels_axis)
                 for k in range(n)]
        outs = [fn(p, density=density) for fn, p in zip(fns, parts)]
        stack = jnp.concatenate if self.keep_channels_axis else jnp.stack
        y = stack([o[0] for o in outs], axis=axis)
        logj = sum(o[1] for o in outs)
        return y, log0 + logj


class MultiOutChannelFlow(MultiChannelFlow):
    """Every subflow sees the full input; outputs concatenate over channels.

    Mirrors ``MultiOutChannelModule_`` (reference nn/_core.py:187-195).
    """

    def _map(self, x, fns, log0, density):
        outs = [fn(x, density=density) for fn in fns]
        y = jnp.concatenate([o[0] for o in outs], axis=self.channels_axis)
        logj = sum(o[1] for o in outs)
        return y, log0 + logj


class InvisibilityMaskWrapper(Flow):
    """Hides part of the input from an inner flow via a mask.

    Mirrors ``InvisibilityMaskWrapperModule_`` (reference nn/_core.py:199-231):
    the inner flow transforms only the visible partition; its log-Jacobian is
    requested as a *density* so the invisible sites' contribution can be
    masked out before reduction.
    """

    flow: Any
    mask: Any = static()
    label: str | None = static(default=None)

    def forward(self, x, log0=0.0, *, density: bool = False):
        return self._apply(x, log0, density, self.flow.forward)

    def backward(self, x, log0=0.0, *, density: bool = False):
        return self._apply(x, log0, density, self.flow.backward)

    def _apply(self, x, log0, density, fn):
        x_v, x_inv = self.mask.split(x)
        x_v, logj_density = fn(x_v, density=True)
        x_v = self.mask.purify(x_v, channel=0)
        logj = sum_density(self.mask.purify(logj_density, channel=0), density)
        return self.mask.cat(x_v, x_inv), log0 + logj
