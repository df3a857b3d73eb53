"""Transfer learning and controlled-coupling tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import normflow__tpu as nf
from normflow__tpu.models import (
    AffineCoupling, CntrAffineCoupling, ConvNet, DirectCntrCoupling,
    EvenOddMask, FFTFlow, FlowList,
)


def _nets(key, out_channels=2, n=2, lat=(6, 6)):
    return tuple(
        ConvNet.build(k, 1, out_channels, kernel_size=3, conv_dim=len(lat),
                      hidden_sizes=(4,), acts=("tanh", None))
        for k in jax.random.split(key, n))


def test_fftflow_transfer_rescales(rng):
    # transfer to half the lattice spacing (scale_factor=2): the infrared
    # mass in lattice units halves (m * a), reference fftflow_.py:187-209.
    flow = FFTFlow.build((8, 8), knots_len=4, eff_mass2=1.0)
    m_before = float(flow.infrared_mass)
    flow2 = flow.transfer(scale_factor=2, shape=(16, 16))
    assert flow2.lat_shape == (16, 16)
    m_after = float(flow2.infrared_mass)
    np.testing.assert_allclose(m_after, m_before / 2, rtol=1e-6)
    # still a valid bijection on the new lattice
    x = jnp.asarray(rng.standard_normal((3, 16, 16)))
    y, logj = flow2.forward(x)
    x2, logj0 = flow2.backward(y, log0=logj)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-8)


def test_coupling_transfer_new_mask(rng, key):
    mask6 = EvenOddMask(shape=(6, 6))
    mask8 = EvenOddMask(shape=(8, 8))
    c = AffineCoupling(nets=_nets(key), mask=mask6)
    c2 = c.transfer(mask=mask8)
    # conv nets are resolution independent: same weights on a larger lattice
    x = jnp.asarray(rng.standard_normal((2, 8, 8)))
    y, logj = c2.forward(x)
    x2, logj0 = c2.backward(y, log0=logj)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-9)


def test_flowlist_transfer(rng, key):
    net = FlowList(flows=(
        nf.models.DistConvertor.build(6, symmetric=True),
        AffineCoupling(nets=_nets(key), mask=EvenOddMask(shape=(6, 6))),
    ))
    net2 = net.transfer(mask=EvenOddMask(shape=(12, 12)))
    x = jnp.asarray(rng.standard_normal((2, 12, 12)))
    y, logj = net2.forward(x)
    assert y.shape == x.shape


def test_direct_cntr_coupling_roundtrip(rng, key):
    mask = EvenOddMask(shape=(6, 6))
    c = DirectCntrCoupling(
        coupling=AffineCoupling(nets=_nets(key), mask=mask))
    x = jnp.asarray(rng.standard_normal((4, 6, 6)))
    control = jnp.asarray(rng.standard_normal((4, 6, 6)))
    (y, ctrl_out), logj = c.forward((x, control))
    np.testing.assert_array_equal(np.asarray(ctrl_out), np.asarray(control))
    (x2, _), logj0 = c.backward((y, control), log0=logj)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-9)
    np.testing.assert_allclose(np.asarray(logj0), 0.0, atol=1e-9)
    # the control actually conditions the first layer
    (y_other, _), _ = c.forward((x, control * 2))
    assert not np.allclose(np.asarray(y_other), np.asarray(y))


def test_cntr_coupling_with_generator(rng, key):
    mask = EvenOddMask(shape=(6, 6))

    def gen(k, batch_size):
        return jax.random.normal(k, (batch_size, 6, 6))

    c = CntrAffineCoupling(_nets(key), mask=mask, control_generator=gen)
    c = c.refresh_control(jax.random.key(1), 4)
    x = jnp.asarray(rng.standard_normal((4, 6, 6)))
    y, logj = c.forward(x)
    x2, logj0 = c.backward(y, log0=logj)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-9)
    # refreshing the control changes the transform
    c2 = c.refresh_control(jax.random.key(2), 4)
    y2, _ = c2.forward(x)
    assert not np.allclose(np.asarray(y2), np.asarray(y))


def test_flagship_coarse_to_fine_transfer():
    """The FULL flagship transfers across lattice sizes (coarse-to-fine,
    reference fftflow_.py:187-209): spectral block via FFTFlow.transfer,
    couplings by swapping the (static) mask, convs/DistConvertors are
    resolution-free.  Invertibility and trainability must survive."""
    from normflow__tpu.models import PackedEvenOddMask
    from normflow__tpu.training.model import backward_sanitychecker
    from normflow__tpu.zoo import build_phi4_model

    m8 = build_phi4_model((8, 8), knots=4, hidden=(4,), n_layers=2, seed=0)
    m8.fit(n_epochs=10, batch_size=32, hyperparam=dict(lr=1e-3),
           checkpoint_dict=dict(print_stride=None), steps_per_call=10)
    m16 = build_phi4_model((16, 16), knots=4, hidden=(4,), n_layers=2,
                           seed=0)
    m16.net_ = m8.net_.transfer(
        shape=(16, 16), mask=PackedEvenOddMask(shape=(16, 16)))
    y, logq, logp = m16.posterior.sample__(batch_size=8)
    assert y.shape == (8, 16, 16)
    assert np.isfinite(np.asarray(logq)).all()
    xe, je = backward_sanitychecker(m16, n_samples=4, verbose=False)
    assert xe < 1e-6 and je < 1e-6, (xe, je)
    hist = m16.fit(n_epochs=3, batch_size=8, hyperparam=dict(lr=1e-3),
                   checkpoint_dict=dict(print_stride=None))
    assert np.isfinite(hist["loss"][-1])


def test_coupling_grow_is_identity_and_trainable(rng, key):
    """``Coupling.grow`` (progressive capacity growth for coarse-to-fine
    transfer): appended zeroed-final conditioners must leave forward AND
    logdet bit-identical, while the zeroed layers still receive nonzero
    gradients (a fully-zeroed net would be a dead gradient trap)."""
    from normflow__tpu.models import RQSplineCoupling

    mask = EvenOddMask(shape=(6, 6))
    k1, k2, k3 = jax.random.split(key, 3)
    x = jnp.asarray(rng.normal(size=(4, 6, 6)))

    # AffineCoupling wants 2 output channels; the 4-knot spline 3m-2 = 10
    cases = [
        (AffineCoupling(nets=_nets(k1, out_channels=2, n=2), mask=mask),
         _nets(k2, out_channels=2, n=2)),
        (RQSplineCoupling.build(
            _nets(k1, out_channels=10, n=2), mask=mask,
            xlim=(-3.0, 3.0), ylim=(-3.0, 3.0),
            extrap={"left": "linear", "right": "linear"}),
         _nets(k2, out_channels=10, n=2)),
    ]
    for cpl, new in cases:
        grown = cpl.grow(new)
        assert len(grown.nets) == 4

        y0, j0 = cpl.forward(x, 0.0)
        y1, j1 = grown.forward(x, 0.0)
        # affine identity is exact; the RQ spline at uniform knots/unit
        # derivatives recomputes x through the rational-quadratic formula,
        # so identity holds to f32 rounding only
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                                   rtol=0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(j0), np.asarray(j1),
                                   rtol=0, atol=1e-4)
        xb, jb = grown.backward(y1, j1)
        np.testing.assert_allclose(np.asarray(xb), np.asarray(x),
                                   rtol=0, atol=1e-5)

        # the zeroed final layers are NOT gradient-dead
        def loss(c):
            y, j = c.forward(x, 0.0)
            return jnp.sum(y**2) + jnp.sum(j)

        g = jax.grad(loss)(grown)
        for net in g.nets[2:]:
            gw = np.asarray(net.layers[-1].weight)
            assert np.abs(gw).max() > 0.0
