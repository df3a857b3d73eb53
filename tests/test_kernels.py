"""Pallas kernels vs their XLA reference paths (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from normflow__tpu.models.actions import ScalarPhi4Action
from normflow__tpu.ops.kernels.phi4 import phi4_action_pallas
from normflow__tpu.ops.kernels.spline_coupling import rqs_transform_fused
from normflow__tpu.models.couplings import _knots_from_net_out
from normflow__tpu.ops import spline as sp


@pytest.mark.parametrize("lat", [(16,), (8, 8), (4, 4, 4)])
def test_phi4_kernel_matches_xla(rng, lat):
    act = ScalarPhi4Action(kappa=0.7, m_sq=-2.0, lambd=0.5)
    x = jnp.asarray(rng.standard_normal((16, *lat)), jnp.float32)
    w0, w2, w4 = act.get_coef(len(lat))
    got = phi4_action_pallas(x, w0, w2, w4, interpret=True)
    want = act.action(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5)


@pytest.mark.parametrize("lat", [(16,), (8, 8), (4, 4, 4)])
def test_phi4_kernel_gradient_matches_xla(rng, lat):
    """The analytic custom-VJP backward kernel vs jax.grad of the XLA path."""
    act = ScalarPhi4Action(kappa=0.7, m_sq=-2.0, lambd=0.5)
    x = jnp.asarray(rng.standard_normal((8, *lat)), jnp.float32)
    w0, w2, w4 = act.get_coef(len(lat))
    # weight each sample differently so the per-sample cotangent is exercised
    wts = jnp.asarray(rng.standard_normal(8), jnp.float32)
    got = jax.grad(lambda x: jnp.sum(
        wts * phi4_action_pallas(x, w0, w2, w4, interpret=True)))(x)
    want = jax.grad(lambda x: jnp.sum(wts * act.action(x)))(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("channels_last", [False, True])
def test_rqs_fused_layouts_agree(rng, channels_last):
    """Both kernel layouts (HBM-transposed and register-transposed) match
    the XLA reference, including gradients."""
    m, b, lat = 12, 4, (8, 8)
    x = jnp.asarray(rng.standard_normal((b, *lat)), jnp.float32)
    out = jnp.asarray(rng.standard_normal((b, *lat, 3 * m - 2)), jnp.float32)
    kw = dict(xlim=(-3.0, 3.0), ylim=(-3.0, 3.0), left="linear",
              right="linear", interpret=True, site_tile=32,
              channels_last=channels_last)
    got_y, got_logg = rqs_transform_fused(x, out, **kw)
    kx, ky, kd = _knots_from_net_out(
        out, xlim=(-3.0, 3.0), ylim=(-3.0, 3.0), xwidth=6.0, ywidth=6.0,
        fixed_x=None, fixed_y=None,
        extrap=(("left", "linear"), ("right", "linear")))
    want_y, want_g = sp.rqs(x, kx, ky, kd, inverse=False)
    np.testing.assert_allclose(np.asarray(got_y), np.asarray(want_y),
                               atol=1e-4)
    g1 = jax.grad(lambda x, o: jnp.sum(rqs_transform_fused(x, o, **kw)[0]),
                  argnums=(0, 1))(x, out)
    g2 = jax.grad(lambda x, o: jnp.sum(
        sp.rqs(x, *_knots_from_net_out(
            o, xlim=(-3.0, 3.0), ylim=(-3.0, 3.0), xwidth=6.0, ywidth=6.0,
            fixed_x=None, fixed_y=None,
            extrap=(("left", "linear"), ("right", "linear"))),
            inverse=False)[0]), argnums=(0, 1))(x, out)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                               atol=2e-3)


@pytest.mark.parametrize("inverse", [False, True])
@pytest.mark.parametrize("extrap", [(None, None), ("linear", "linear")])
def test_rqs_fused_matches_xla(rng, inverse, extrap):
    left, right = extrap
    m = 6
    b, lat = 4, (8, 8)
    x = jnp.asarray(rng.standard_normal((b, *lat)) * 0.8, jnp.float32)
    if (left, right) == (None, None):
        # keep strictly inside the domain when there is no extrapolation
        x = jnp.asarray(rng.random((b, *lat)) * 3.6 - 1.8, jnp.float32)
    out = jnp.asarray(rng.standard_normal((b, *lat, 3 * m - 2)), jnp.float32)

    got_y, got_logg = rqs_transform_fused(
        x, out, xlim=(-2.0, 2.0), ylim=(-2.0, 2.0), left=left, right=right,
        inverse=inverse, interpret=True, site_tile=32)

    extrap_d = {k: v for k, v in dict(left=left, right=right).items() if v}
    kx, ky, kd = _knots_from_net_out(
        out, xlim=(-2.0, 2.0), ylim=(-2.0, 2.0), xwidth=4.0, ywidth=4.0,
        fixed_x=None, fixed_y=None,
        extrap=tuple(sorted(extrap_d.items())))
    want_y, want_g = sp.rqs(x, kx, ky, kd, inverse=inverse)

    np.testing.assert_allclose(np.asarray(got_y), np.asarray(want_y),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_logg),
                               np.log(np.asarray(want_g)), atol=1e-4)


def test_rqs_fused_roundtrip(rng):
    m, b, lat = 8, 4, (6, 6)
    x = jnp.asarray(rng.standard_normal((b, *lat)), jnp.float32)
    out = jnp.asarray(rng.standard_normal((b, *lat, 3 * m - 2)), jnp.float32)
    kw = dict(xlim=(-3.0, 3.0), ylim=(-3.0, 3.0), left="linear",
              right="linear", interpret=True, site_tile=32)
    y, logg = rqs_transform_fused(x, out, **kw)
    x2, logg_inv = rqs_transform_fused(y, out, inverse=True, **kw)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(logg + logg_inv), 0.0, atol=1e-4)


def test_pallas_action_backend(rng):
    act_x = ScalarPhi4Action(kappa=0.7, m_sq=-2.0, lambd=0.5)
    act_p = act_x.replace(backend="pallas")
    assert act_p.backend == "pallas"
    # on CPU the pallas path requires interpret mode; just check dispatch
    # machinery via the standalone kernel (covered above) and XLA equality
    x = jnp.asarray(rng.standard_normal((4, 8, 8)), jnp.float32)
    np.testing.assert_allclose(np.asarray(act_x.action(x)),
                               np.asarray(act_x.action(x)))


def test_rqs_fused_gradients_match_xla(rng):
    """The Pallas custom-VJP backward must match jax.grad of the XLA path."""
    m, b, lat = 5, 4, (4, 8)
    x = jnp.asarray(rng.standard_normal((b, *lat)), jnp.float32)
    out = jnp.asarray(rng.standard_normal((b, *lat, 3 * m - 2)) * 0.5,
                      jnp.float32)
    kw = dict(xlim=(-3.0, 3.0), ylim=(-3.0, 3.0), left="linear",
              right="linear")

    def loss_pallas(x, out):
        y, logg = rqs_transform_fused(x, out, **kw, interpret=True,
                                      site_tile=32)
        return jnp.sum(jnp.sin(y)) + jnp.sum(logg)

    def loss_xla(x, out):
        kx, ky, kd = _knots_from_net_out(
            out, xlim=(-3.0, 3.0), ylim=(-3.0, 3.0), xwidth=6.0, ywidth=6.0,
            fixed_x=None, fixed_y=None,
            extrap=(("left", "linear"), ("right", "linear")))
        y, g = sp.rqs(x, kx, ky, kd)
        return jnp.sum(jnp.sin(y)) + jnp.sum(jnp.log(g))

    gx_p, go_p = jax.grad(loss_pallas, argnums=(0, 1))(x, out)
    gx_x, go_x = jax.grad(loss_xla, argnums=(0, 1))(x, out)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_x), atol=2e-4)
    np.testing.assert_allclose(np.asarray(go_p), np.asarray(go_x), atol=2e-4)


def test_rqs_fused_inverse_gradients(rng):
    m, b, lat = 4, 2, (4, 4)
    x = jnp.asarray(rng.standard_normal((b, *lat)), jnp.float32)
    out = jnp.asarray(rng.standard_normal((b, *lat, 3 * m - 2)) * 0.5,
                      jnp.float32)
    kw = dict(xlim=(-3.0, 3.0), ylim=(-3.0, 3.0), left="linear",
              right="linear", inverse=True)

    def loss(x, out):
        y, logg = rqs_transform_fused(x, out, **kw, interpret=True,
                                      site_tile=16)
        return jnp.sum(y * y) + jnp.sum(logg)

    gx, go = jax.grad(loss, argnums=(0, 1))(x, out)
    assert np.isfinite(np.asarray(gx)).all()
    assert np.isfinite(np.asarray(go)).all()
