"""Property/oracle tests for the rational-spline engine.

The reference has no test suite; these generalize its manual checks
(``backward_sanitychecker``, ``test_pade22``) into pytest properties:
invertibility, derivative correctness vs finite differences, monotonicity,
extrapolation behavior, identity initialization.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from normflow__tpu.ops import spline as sp


def random_knots(rng, shape, k, xlim=(0.0, 1.0), ylim=(0.0, 1.0)):
    def coords(lim):
        w = rng.random((*shape, k - 1)) + 0.1
        w = w / w.sum(-1, keepdims=True)
        c = np.concatenate([np.zeros((*shape, 1)), np.cumsum(w, -1)], -1)
        return lim[0] + c * (lim[1] - lim[0])

    kx = coords(xlim)
    ky = coords(ylim)
    kd = rng.random((*shape, k)) + 0.3
    return jnp.asarray(kx), jnp.asarray(ky), jnp.asarray(kd)


@pytest.mark.parametrize("fn", [sp.rqs, sp.rls])
@pytest.mark.parametrize("per_site", [False, True])
def test_roundtrip_and_grad_product(rng, fn, per_site):
    shape = (64,) if per_site else ()
    kx, ky, kd = random_knots(rng, shape, 8)
    if fn is sp.rls:
        kd = sp.smooth_derivatives_rl(kx, ky)
    x = jnp.asarray(rng.random(64))
    y, g = fn(x, kx, ky, kd)
    x2, ginv = fn(y, kx, ky, kd, inverse=True)
    np.testing.assert_allclose(x2, x, atol=1e-10)
    np.testing.assert_allclose(g * ginv, 1.0, atol=1e-9)


@pytest.mark.parametrize("fn", [sp.rqs, sp.rls])
def test_grad_matches_finite_difference(rng, fn):
    kx, ky, kd = random_knots(rng, (), 6)
    x = jnp.asarray(rng.random(100) * 0.96 + 0.02)
    eps = 1e-6
    y_p, _ = fn(x + eps, kx, ky, kd)
    y_m, _ = fn(x - eps, kx, ky, kd)
    _, g = fn(x, kx, ky, kd)
    np.testing.assert_allclose((y_p - y_m) / (2 * eps), g, rtol=1e-4)


def test_identity_initialization():
    # Uniform knots on [0,1]x[0,1] with unit derivatives = identity map,
    # matching the reference SplineNet zero-init (modules.py:342-353).
    k = 10
    kx = ky = jnp.linspace(0, 1, k)
    kd = jnp.ones(k)
    x = jnp.linspace(0.01, 0.99, 57)
    y, g = sp.rqs(x, kx, ky, kd)
    np.testing.assert_allclose(y, x, atol=1e-12)
    np.testing.assert_allclose(g, 1.0, atol=1e-12)


def test_monotonicity(rng):
    kx, ky, kd = random_knots(rng, (), 9)
    x = jnp.sort(jnp.asarray(rng.random(512)))
    y, g = sp.rqs(x, kx, ky, kd)
    assert bool(jnp.all(jnp.diff(y) >= 0))
    assert bool(jnp.all(g > 0))


def test_linear_extrapolation(rng):
    kx, ky, kd = random_knots(rng, (), 5)
    kx2, ky2, kd2 = sp.augment_knots(kx, ky, kd, left="linear", right="linear")
    assert kx2.shape[-1] == 7
    # Beyond the right domain edge the map continues with slope kd[-1].
    x = jnp.asarray([1.5, 2.0, 5.0])
    y, g = sp.rqs(x, kx2, ky2, kd2)
    np.testing.assert_allclose(g, kd[-1], atol=1e-12)
    np.testing.assert_allclose(y, ky[-1] + (x - kx[-1]) * kd[-1], atol=1e-10)
    # And on the left with slope kd[0].
    x = jnp.asarray([-1.0, -0.3])
    y, g = sp.rqs(x, kx2, ky2, kd2)
    np.testing.assert_allclose(g, kd[0], atol=1e-12)
    np.testing.assert_allclose(y, ky[0] + (x - kx[0]) * kd[0], atol=1e-10)


def test_anti_periodic_augmentation_is_odd(rng):
    # Spline on [0.5, 1] with anti-periodic left boundary: the map is odd
    # about (0.5, 0.5) -- the symmetric DistConvertor construction
    # (reference modules_.py:345-351).
    kx, ky, kd = random_knots(rng, (), 6, xlim=(0.5, 1.0), ylim=(0.5, 1.0))
    kx2, ky2, kd2 = sp.augment_knots(kx, ky, kd, left="anti")
    t = jnp.asarray(np.linspace(0.01, 0.49, 23))
    y_plus, g_plus = sp.rqs(0.5 + t, kx2, ky2, kd2)
    y_minus, g_minus = sp.rqs(0.5 - t, kx2, ky2, kd2)
    np.testing.assert_allclose(y_minus, 1.0 - y_plus, atol=1e-10)
    np.testing.assert_allclose(g_minus, g_plus, atol=1e-10)


def test_periodic_augmentation_is_even(rng):
    # 'periodic' = even mirror about the boundary knot (requires zero
    # boundary derivative): f(x0 - t) == f(x0 + t).  Used for interpolating
    # even periodic functions, e.g. the IPSD spline over lattice k^2
    # (reference spline.py:502-508 with fftflow_.py usage).
    k = 6
    kx, ky, kd = random_knots(rng, (), k)
    kd = kd.at[0].set(0.0).at[-1].set(0.0)
    kx2, ky2, kd2 = sp.augment_knots(kx, ky, kd, left="periodic")
    assert kx2.shape[-1] == 2 * k - 1
    t = jnp.asarray(np.linspace(0.02, 0.6, 17)) * (kx[-1] - kx[0])
    y_left, _ = sp.rqs(kx[0] - t, kx2, ky2, kd2)
    y_right, _ = sp.rqs(kx[0] + t, kx2, ky2, kd2)
    np.testing.assert_allclose(y_left, y_right, atol=1e-10)


def test_smooth_derivatives_rq(rng):
    kx, ky, _ = random_knots(rng, (), 7)
    kd = sp.smooth_derivatives_rq(kx, ky)
    m = (ky[1:] - ky[:-1]) / (kx[1:] - kx[:-1])
    np.testing.assert_allclose(kd[0], m[0])
    np.testing.assert_allclose(kd[-1], m[-1])
    np.testing.assert_allclose(kd[1:-1], 0.5 * (m[1:] + m[:-1]))


def test_smooth_derivatives_rl_gives_c1_spline(rng):
    # RL spline with 'natural' derivatives is C^1: left/right derivative
    # limits agree at interior knots.
    kx, ky, _ = random_knots(rng, (), 5)
    kd = sp.smooth_derivatives_rl(kx, ky)
    eps = 1e-9
    for i in range(1, 4):
        _, g_left = sp.rls(kx[i] - eps, kx, ky, kd)
        _, g_right = sp.rls(kx[i] + eps, kx, ky, kd)
        np.testing.assert_allclose(g_left, g_right, rtol=1e-5)


def test_float32_inverse_stability(rng):
    # The stable root form must stay accurate in float32 (TPU runs f32).
    kx, ky, kd = random_knots(rng, (), 12)
    kx, ky, kd = (a.astype(jnp.float32) for a in (kx, ky, kd))
    x = jnp.asarray(rng.random(4096), jnp.float32)
    y, _ = sp.rqs(x, kx, ky, kd)
    x2, _ = sp.rqs(y, kx, ky, kd, inverse=True)
    np.testing.assert_allclose(x2, x, atol=5e-6)


def test_jit_and_grad_composable(rng):
    kx, ky, kd = random_knots(rng, (), 6)

    @jax.jit
    def loss(kx, ky, kd, x):
        y, g = sp.rqs(x, kx, ky, kd)
        return jnp.sum(y**2) + jnp.sum(jnp.log(g))

    x = jnp.asarray(rng.random(32))
    grads = jax.grad(loss, argnums=(0, 1, 2))(kx, ky, kd, x)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in grads)
