"""Unit tests for the pytree-dataclass module system and utils."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from normflow__tpu.struct import (
    Const, HashableArray, Pytree, static, tree_size,
)


class Affine(Pytree):
    w: jax.Array
    b: jax.Array
    axis: int = static(default=-1)


def test_pytree_registration():
    m = Affine(w=jnp.ones((2, 3)), b=jnp.zeros(3))
    leaves = jax.tree_util.tree_leaves(m)
    assert len(leaves) == 2
    assert m.npar == 9
    m2 = jax.tree_util.tree_map(lambda x: x * 2, m)
    assert isinstance(m2, Affine) and m2.axis == -1
    np.testing.assert_allclose(np.asarray(m2.w), 2.0)


def test_static_fields_in_jit_cache_key():
    m1 = Affine(w=jnp.ones(2), b=jnp.zeros(2), axis=-1)
    m2 = m1.replace(axis=0)
    calls = []

    @jax.jit
    def f(m):
        calls.append(1)
        return m.w.sum()

    f(m1), f(m1), f(m2)
    assert len(calls) == 2  # retrace only on static change


def test_grad_through_module():
    m = Affine(w=jnp.ones((2, 2)), b=jnp.zeros(2))
    g = jax.grad(lambda m: jnp.sum(m.w**2) + jnp.sum(m.b))(m)
    assert isinstance(g, Affine)
    np.testing.assert_allclose(np.asarray(g.w), 2.0)
    np.testing.assert_allclose(np.asarray(g.b), 1.0)


def test_immutability():
    m = Affine(w=jnp.ones(2), b=jnp.zeros(2))
    with pytest.raises(Exception):
        m.w = jnp.zeros(2)


def test_hashable_array():
    a = HashableArray(np.arange(4))
    b = HashableArray(np.arange(4))
    c = HashableArray(np.arange(5))
    assert a == b and hash(a) == hash(b)
    assert a != c
    np.testing.assert_array_equal(np.asarray(a), np.arange(4))
    with pytest.raises(ValueError):
        a.value[0] = 9  # read-only


def test_const_pytree():
    c = Const(jnp.ones(3))
    leaves = jax.tree_util.tree_leaves(c)
    assert len(leaves) == 1
    # tree_size counts TRAINABLE elements: Const leaves are excluded
    # (npar parity with the reference, which never sees control batches)
    assert tree_size(c) == 0
    assert tree_size({"w": jnp.ones((2, 2)), "c": c}) == 4


def test_repr():
    m = Affine(w=jnp.ones((2, 3)), b=jnp.zeros(3))
    r = repr(m)
    assert "Affine" in r and "(2, 3)" in r


def test_profiling_utils():
    from normflow__tpu.utils import Timer, profile_fn

    f = jax.jit(lambda x: x * 2)
    stats = profile_fn(f, jnp.ones(16), iters=3, warmup=1)
    assert stats["min"] > 0 and stats["iters"] == 3
    with Timer("t", verbose=False) as t:
        pass
    assert t.elapsed >= 0


def test_hashable_array_copies_input():
    """HashableArray must not freeze the CALLER's array (np.asarray
    returns the same object; setflags would make it read-only)."""
    from normflow__tpu.struct import HashableArray

    a = np.arange(4.0)
    HashableArray(a)
    a[0] = 99.0  # must still be writable
    assert a[0] == 99.0


def test_npar_skips_const_leaves():
    """npar counts TRAINABLE elements only -- Const-wrapped leaves (e.g.
    refreshed control batches) are excluded."""
    from normflow__tpu.struct import Const, tree_size

    tree = {"w": np.zeros((3, 3)), "ctrl": Const(np.zeros((100, 100)))}
    assert tree_size(tree) == 9
