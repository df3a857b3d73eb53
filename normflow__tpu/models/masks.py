"""Masks and partitioners for coupling layers.

TPU-native re-design of /root/reference/src/mask/: masks are *hashable
static specs* (frozen dataclasses); the 0/1 arrays are materialized from the
spec inside traced functions and constant-folded by XLA, so they never live
in the parameter pytree and cost nothing at runtime.

Contract (reference mask/mask.py:3-9): ``split(x) -> (x0, x1)``,
``cat(x0, x1) -> x``, ``purify(x_chnl, channel)`` zeroing contamination.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "Mask", "EvenOddMask", "AlongAxesEvenOddMask", "DummyMask", "DoubleMask",
    "PackedEvenOddMask",
    "GaugeLinksDoubleMask", "ZebraPlanarMask", "MatrixMask",
    "ListPartitioner", "ChunkCatPartitioner", "AlongAxisEvenOddPartitioner",
]


def _index_sum_grid(shape, exclude_mu=None):
    """sum(ind) over the lattice (minus ind[exclude_mu] if given), vectorized
    (replaces the reference's Python loop over all sites, mask/mask.py:53-61)."""
    total = np.zeros(shape, dtype=np.int64)
    for mu, n in enumerate(shape):
        if mu == exclude_mu:
            continue
        idx = np.arange(n).reshape([-1 if k == mu else 1 for k in range(len(shape))])
        total = total + idx
    return total


@dataclasses.dataclass(frozen=True)
class _MultiplicativeMask:
    """Base for 0/1 masks applied multiplicatively (reference mask/mask.py:17-42).

    Exported as ``Mask`` for parity with the reference's ABC name."""

    shape: tuple

    def __post_init__(self):
        object.__setattr__(self, "shape", tuple(self.shape))

    def make_mask(self) -> np.ndarray:
        raise NotImplementedError

    def _mask(self, x):
        """Mask aligned to ``x``: data is (batch, *lattice, *extra) -- any
        trailing channel axes get singleton dims so the mask broadcasts."""
        m = jnp.asarray(self.make_mask(), dtype=x.dtype)
        extra = x.ndim - 1 - len(self.shape)
        if extra > 0:
            m = m.reshape(m.shape + (1,) * extra)
        return m

    def split(self, x):
        m = self._mask(x)
        return m * x, (1 - m) * x

    def cat(self, x0, x1):
        return x0 + x1

    def purify(self, x_chnl, channel: int):
        m = self._mask(x_chnl)
        return x_chnl * (m if channel == 0 else (1 - m))


Mask = _MultiplicativeMask  # reference ABC name (mask/mask.py:17)


@dataclasses.dataclass(frozen=True)
class EvenOddMask(_MultiplicativeMask):
    """Checkerboard mask by site-index parity (reference mask/mask.py:45-61).

    ``exclude_mu`` makes the mask constant along direction ``mu``.
    """

    parity: int = 0
    exclude_mu: int | None = None

    def make_mask(self):
        s = _index_sum_grid(self.shape, self.exclude_mu)
        return ((1 - self.parity + s) % 2).astype(np.uint8)


@dataclasses.dataclass(frozen=True)
class AlongAxesEvenOddMask(_MultiplicativeMask):
    """Stripes alternating along direction ``mu`` (reference mask/mask.py:64-72)."""

    parity: int = 0
    mu: int = 0

    def make_mask(self):
        shape = self.shape
        idx = np.arange(shape[self.mu]).reshape(
            [-1 if k == self.mu else 1 for k in range(len(shape))])
        return np.broadcast_to((1 - self.parity + idx) % 2, shape).astype(np.uint8)


@dataclasses.dataclass(frozen=True)
class DummyMask:
    """Pass-through mask: one partition is empty (reference mask/mask.py:75-94)."""

    parity: int = 0

    def split(self, x):
        return (x, None) if self.parity == 0 else (None, x)

    def cat(self, x0, x1):
        return x0 if self.parity == 0 else x1

    @staticmethod
    def purify(x_chnl, *args, **kwargs):
        return x_chnl


@dataclasses.dataclass(frozen=True, eq=False)
class DoubleMask:
    """Invisibility mask composed with an outer mask (reference
    mask/double_mask.py:16-41).

    Functional redesign: the reference stashes the invisible partition
    mutably between ``split`` and ``cat`` (double_mask.py:24-33), which is a
    footgun under ``vmap``/concurrent traces.  Here ``split`` RETURNS the
    invisible partition as a third element and ``cat`` takes it back --
    couplings thread any extra ``split`` outputs through to ``cat``
    unchanged, so the whole pipeline stays pure.
    """

    invisibility_mask: Any
    outer_mask: Any

    def split(self, x):
        x, x_invisible = self.invisibility_mask.split(x)
        x0, x1 = self.outer_mask.split(x)
        return x0, x1, x_invisible

    def cat(self, x0, x1, x_invisible):
        x = self.outer_mask.cat(x0, x1)
        return self.invisibility_mask.cat(x, x_invisible)

    def purify(self, x_chnl, channel, **kwargs):
        return self.invisibility_mask.purify(
            self.outer_mask.purify(x_chnl, channel, **kwargs), 0)

    def __hash__(self):
        return hash((type(self), self.invisibility_mask, self.outer_mask))

    def __eq__(self, other):
        return (type(self) is type(other)
                and self.invisibility_mask == other.invisibility_mask
                and self.outer_mask == other.outer_mask)


def GaugeLinksDoubleMask(*, shape, parity, mu):
    """Gauge-link double mask: hide even/odd sites, couple along stripes.

    The reference version is broken (undefined ``mask_shape``,
    double_mask.py:49-50); this is the working construction it sketches.
    """
    return DoubleMask(
        invisibility_mask=EvenOddMask(shape=shape, parity=parity),
        outer_mask=AlongAxesEvenOddMask(shape=shape, mu=mu),
    )


@dataclasses.dataclass(frozen=True)
class ZebraPlanarMask:
    """Zebra stripes: shape-changing split along axis ``nu`` by parity slices
    (reference mask/planar_mask.py:9-58).  Axis 0 of the data is the batch.
    """

    mu: int
    nu: int
    parity: int = 0
    shape: tuple | None = None

    def _inds(self):
        p, q = self.parity, (self.parity + 1) % 2
        white = (slice(None),) * (1 + self.nu) + (slice(p, None, 2),)
        black = (slice(None),) * (1 + self.nu) + (slice(q, None, 2),)
        return white, black

    def split(self, x):
        white, black = self._inds()
        return x[white], x[black]

    def cat(self, x_white, x_black):
        white, black = self._inds()
        # reconstruct from the ACTUAL partition sizes: for an odd extent
        # the parity slices differ by one plane, so doubling one of them
        # would build the wrong shape (cf. AlongAxisEvenOddPartitioner.cat)
        shape = list(x_white.shape)
        shape[1 + self.nu] = (x_white.shape[1 + self.nu]
                              + x_black.shape[1 + self.nu])
        x = jnp.zeros(shape, dtype=x_white.dtype)
        x = x.at[white].set(x_white)
        x = x.at[black].set(x_black)
        return x

    @staticmethod
    def purify(x_chnl, *args, **kwargs):
        return x_chnl

    @property
    def subshape(self):
        """Shape of the ``parity`` partition (the larger one when the
        striped extent is odd)."""
        if self.shape is None:
            raise ValueError("shape of the underlying lattice is not defined.")
        sub = list(self.shape)
        n = sub[self.nu]
        sub[self.nu] = (n - self.parity + 1) // 2
        return sub


@dataclasses.dataclass(frozen=True)
class MatrixMask:
    """Even-odd mask over matrix-valued fields with identity filler.

    Mirrors ``MatrixMask`` (reference mask/matrix_mask.py:11-61; unexported
    there -- defect §2.14.7).  The frozen partition is filled with the
    identity matrix so matrix products through it are harmless.
    """

    lat_shape: tuple
    nc: int = 2
    parity: int = 0
    anisotropic_dir: int | None = None

    def _mask_eye(self, dtype):
        s = _index_sum_grid(self.lat_shape, self.anisotropic_dir)
        m = ((s + self.parity) % 2).astype(np.float64)
        m = m.reshape(*self.lat_shape, 1, 1)
        eye = np.eye(self.nc)
        return jnp.asarray(m, dtype=dtype), jnp.asarray(eye, dtype=dtype)

    def split(self, x):
        m, eye = self._mask_eye(x.dtype)
        return (1 - m) * x + m * eye, m * x + (1 - m) * eye

    def cat(self, x0, x1):
        _, eye = self._mask_eye(x0.dtype)
        return x0 + x1 - eye

    def purify(self, x_chnl, channel: int):
        m, eye = self._mask_eye(x_chnl.dtype)
        if channel == 0:
            return (1 - m) * x_chnl + m * eye
        return m * x_chnl + (1 - m) * eye


@dataclasses.dataclass(frozen=True)
class PackedEvenOddMask:
    """Checkerboard partitioner with PACKED partitions (TPU-first, new).

    ``split`` returns the even/odd sublattices as dense ``(B, L1, L2/2)``
    arrays instead of zero-masked full-lattice fields.  Couplings built on
    this mask run their conditioner convs and transforms on HALF the sites
    -- 2x fewer FLOPs and bytes than the multiplicative ``EvenOddMask``
    (which matches the reference's layout, mask/mask.py:45-61, where half of
    every conv input is zeros and half of every output is discarded).

    ``purify`` is the identity: the packed representation cannot be
    contaminated by the other partition.  The conditioner sees the frozen
    sublattice on a row-parity-skewed packed grid; this is a (equally
    expressive) different conditioner family than the full-lattice conv, so
    packed and unpacked couplings are not weight-compatible.

    Requires even lattice dims.  2-D only (batch, L1, L2).
    """

    shape: tuple
    parity: int = 0

    def __post_init__(self):
        object.__setattr__(self, "shape", tuple(self.shape))
        l1, l2 = self.shape
        assert l1 % 2 == 0 and l2 % 2 == 0, "packed mask needs even dims"

    def _pack(self, x, parity):
        b = x.shape[0]
        l1, l2 = self.shape
        e = x[:, 0::2, parity::2]
        o = x[:, 1::2, (1 - parity)::2]
        return jnp.stack([e, o], axis=2).reshape(b, l1, l2 // 2)

    def _unpack_into(self, out, packed, parity):
        b = packed.shape[0]
        l1, l2 = self.shape
        rows = packed.reshape(b, l1 // 2, 2, l2 // 2)
        out = out.at[:, 0::2, parity::2].set(rows[:, :, 0])
        out = out.at[:, 1::2, (1 - parity)::2].set(rows[:, :, 1])
        return out

    def split(self, x):
        p = self.parity
        return self._pack(x, p), self._pack(x, 1 - p)

    def cat(self, x0, x1):
        b = x0.shape[0]
        out = jnp.zeros((b, *self.shape), x0.dtype)
        out = self._unpack_into(out, x0, self.parity)
        out = self._unpack_into(out, x1, 1 - self.parity)
        return out

    @staticmethod
    def purify(x_chnl, *args, **kwargs):
        return x_chnl


@dataclasses.dataclass(frozen=True)
class ListPartitioner:
    """Input is a 2-list (reference mask/partitioner.py:8-20)."""

    @staticmethod
    def split(x):
        return x[0], x[1]

    @staticmethod
    def cat(x0, x1):
        return [x0, x1]

    @staticmethod
    def purify(x_chnl, *args, **kwargs):
        return x_chnl


@dataclasses.dataclass(frozen=True)
class ChunkCatPartitioner:
    """Chunk the input in halves along ``chunk_axis`` (positive)
    (reference mask/partitioner.py:23-39)."""

    axis: int

    def split(self, x):
        n = x.shape[self.axis]
        return (jax.lax.slice_in_dim(x, 0, n // 2, axis=self.axis),
                jax.lax.slice_in_dim(x, n // 2, n, axis=self.axis))

    def cat(self, x0, x1):
        return jnp.concatenate([x0, x1], axis=self.axis)

    @staticmethod
    def purify(x_chnl, *args, **kwargs):
        return x_chnl


@dataclasses.dataclass(frozen=True)
class AlongAxisEvenOddPartitioner:
    """Even/odd slicing along ``axis`` (positive), zero-fill cat
    (reference mask/partitioner.py:42-63)."""

    axis: int

    def _inds(self):
        even = (slice(None),) * self.axis + (slice(0, None, 2),)
        odd = (slice(None),) * self.axis + (slice(1, None, 2),)
        return even, odd

    def split(self, x):
        even, odd = self._inds()
        return x[even], x[odd]

    def cat(self, x_even, x_odd):
        even, odd = self._inds()
        shape = list(x_even.shape)
        shape[self.axis] = x_even.shape[self.axis] + x_odd.shape[self.axis]
        x = jnp.zeros(shape, dtype=x_even.dtype)
        x = x.at[even].set(x_even)
        x = x.at[odd].set(x_odd)
        return x

    @staticmethod
    def purify(x_chnl, *args, **kwargs):
        return x_chnl
