"""Pytree-dataclass module system: the foundation of the framework.

Design (TPU-first, functional): every model component is an *immutable
dataclass registered as a JAX pytree*.  Array fields are pytree leaves
(trainable parameters unless wrapped in :class:`Const`); fields declared with
:func:`static` are auxiliary metadata (hashable, part of the jit cache key).
Because modules ARE pytrees, ``jax.jit`` / ``jax.grad`` / ``jax.vmap`` and
optax apply to them directly -- no parameter registries, no ``state_dict``
plumbing, no global mutable state (unlike the reference package, which keeps
parameters inside ``torch.nn.Module`` objects, /root/reference/src/nn/_core.py:12).

Static fields computed from shapes (masks, lattice-k^2 grids, ...) are
recomputed inside traced functions and constant-folded by XLA, so they cost
nothing at runtime and never pollute the parameter pytree.
"""

from __future__ import annotations

import dataclasses
from typing import Any, TypeVar

import jax
import numpy as np

T = TypeVar("T")

__all__ = [
    "Pytree", "static", "field", "replace", "Const", "HashableArray",
    "tree_size",
]


def static(*, default=dataclasses.MISSING, default_factory=dataclasses.MISSING):
    """Declare a dataclass field as static metadata (pytree aux data).

    Static fields must be hashable; they become part of jit cache keys.
    """
    kwargs: dict[str, Any] = {"metadata": {"static": True}}
    if default is not dataclasses.MISSING:
        kwargs["default"] = default
    if default_factory is not dataclasses.MISSING:
        kwargs["default_factory"] = default_factory
    return dataclasses.field(**kwargs)


field = dataclasses.field


class HashableArray:
    """An immutable, hashable wrapper for a numpy array.

    Used for array-valued *static* configuration (e.g. user-fixed spline
    knots): the array participates in jit cache keys by content and is
    constant-folded into the compiled program rather than traced.
    """

    __slots__ = ("value", "_hash")

    def __init__(self, value):
        # copy before freezing: np.asarray returns the SAME object for an
        # ndarray input, and setflags would make the caller's array
        # read-only behind their back
        value = np.array(value, copy=True)
        value.setflags(write=False)
        object.__setattr__(self, "value", value)
        object.__setattr__(self, "_hash", hash((value.shape, str(value.dtype), value.tobytes())))

    def __hash__(self):
        return self._hash

    def __eq__(self, other):
        return (
            isinstance(other, HashableArray)
            and self.value.shape == other.value.shape
            and self.value.dtype == other.value.dtype
            and bool(np.all(self.value == other.value))
        )

    def __repr__(self):
        return f"HashableArray({self.value!r})"

    def __array__(self, dtype=None):
        return np.asarray(self.value, dtype=dtype)


class Pytree:
    """Base class: subclasses become frozen dataclasses registered as pytrees.

    Usage::

        class Affine(Pytree):
            weight: jax.Array
            axis: int = static(default=-1)
    """

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        dataclasses.dataclass(frozen=True, eq=False, repr=False)(cls)
        data_fields = []
        meta_fields = []
        for f in dataclasses.fields(cls):
            (meta_fields if f.metadata.get("static") else data_fields).append(f.name)
        jax.tree_util.register_dataclass(
            cls, data_fields=data_fields, meta_fields=meta_fields
        )

    def replace(self: T, **changes) -> T:
        return dataclasses.replace(self, **changes)

    def __repr__(self):
        parts = []
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            if hasattr(v, "shape") and hasattr(v, "dtype"):
                parts.append(f"{f.name}={type(v).__name__}{tuple(v.shape)}")
            else:
                parts.append(f"{f.name}={v!r}")
        return f"{type(self).__name__}({', '.join(parts)})"

    @property
    def npar(self) -> int:
        """Total number of array elements in the (trainable) pytree leaves.

        Mirrors ``Module_.npar`` (/root/reference/src/nn/_core.py:34-36).
        """
        return tree_size(self)


@jax.tree_util.register_pytree_node_class
class Const:
    """Marks an array leaf as non-trainable.

    ``Const`` is itself a pytree node whose child is the wrapped value, so the
    array still travels with the module (device placement, serialization),
    but optimizers can mask it out via :func:`trainable_mask` and gradients
    through it are stopped.
    """

    __slots__ = ("value",)

    def __init__(self, value):
        self.value = value

    def tree_flatten(self):
        return (self.value,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

    def __repr__(self):
        return f"Const({self.value!r})"


def stop_const(x):
    """Unwrap a ``Const`` (with stopped gradient) or pass through."""
    if isinstance(x, Const):
        return jax.lax.stop_gradient(x.value)
    return x


def trainable_mask(tree) -> Any:
    """A pytree of bools matching ``tree``: True for trainable leaves.

    Leaves under a ``Const`` wrapper map to False.  Use with
    ``optax.masked`` to exclude frozen parameters from updates/weight decay.
    """

    def is_const(x):
        return isinstance(x, Const)

    return jax.tree_util.tree_map(
        lambda x: jax.tree_util.tree_map(lambda _: False, x)
        if is_const(x)
        else True,
        tree,
        is_leaf=is_const,
    )


def tree_size(tree) -> int:
    """Element count of the TRAINABLE leaves (skips ``Const`` subtrees --
    e.g. a refreshed control batch would otherwise inflate ``npar`` by
    batch x volume)."""
    return sum(
        np.size(leaf)
        for leaf in jax.tree_util.tree_leaves(
            tree, is_leaf=lambda x: isinstance(x, Const))
        if not isinstance(leaf, Const) and hasattr(leaf, "shape")
    )


def replace(obj: T, **changes) -> T:
    return dataclasses.replace(obj, **changes)
