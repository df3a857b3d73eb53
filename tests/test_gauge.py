"""U(1) gauge flow tests: invertibility, equivariance, exact sampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import normflow__tpu as nf
from normflow__tpu.models.gauge import (
    U1AngleAction, U1PlaquetteCoupling, build_u1_gauge_flow, u1_plaq_angle,
    wrap_angle,
)

LAT = (8, 8)


def _theta(rng, batch=4):
    return jnp.asarray(rng.uniform(-np.pi, np.pi, (batch, 2, *LAT)))


def _flow(key, **kw):
    return build_u1_gauge_flow(key, LAT, knots_len=6, hidden=(8,), **kw)


def test_u1_angle_action_matches_complex_action(rng):
    theta = _theta(rng)
    a1 = U1AngleAction(beta=1.3)(theta)
    links = jnp.exp(1j * theta)
    a2 = nf.action.U1GaugeAction(beta=1.3, ndim=2)(links)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-10)


def test_gauge_flow_roundtrip(rng, key):
    flow = _flow(key)
    theta = _theta(rng)
    y, logj = flow.forward(theta)
    x, logj0 = flow.backward(y, log0=logj)
    np.testing.assert_allclose(np.asarray(wrap_angle(x - theta)), 0.0,
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(logj0), 0.0, atol=1e-8)


def test_single_coupling_frozen_plaquettes_unchanged(rng, key):
    from normflow__tpu.models.nets import ConvNet

    net = ConvNet.build(key, 2, 3 * 5, kernel_size=3, conv_dim=2)
    c = U1PlaquetteCoupling(net=net, mu=1, offset=0)
    theta = _theta(rng)
    y, _ = c.forward(theta)
    p_old = np.asarray(u1_plaq_angle(theta))
    p_new = np.asarray(u1_plaq_angle(y))
    # frozen stripes (x0 % 4 in {1, 2}) must be bit-unchanged
    for col in range(8):
        if col % 4 in (1, 2):
            np.testing.assert_allclose(p_new[:, col], p_old[:, col],
                                       atol=1e-12)
    # active stripes must actually change
    assert not np.allclose(p_new[:, 0], p_old[:, 0])


def test_gauge_equivariance(rng, key):
    """flow(g . theta) == g . flow(theta) and identical logJ."""
    flow = _flow(key)
    theta = _theta(rng)
    alpha = jnp.asarray(rng.uniform(-np.pi, np.pi, (1, *LAT)))

    def gauge_transform(th):
        # mu=0 links shift lattice axis 0, mu=1 links shift axis 1
        t0 = th[:, 0] + alpha - jnp.roll(alpha, -1, -2)
        t1 = th[:, 1] + alpha - jnp.roll(alpha, -1, -1)
        return wrap_angle(jnp.stack([t0, t1], axis=1))

    y1, logj1 = flow.forward(gauge_transform(theta))
    y2, logj2 = flow.forward(theta)
    np.testing.assert_allclose(np.asarray(wrap_angle(y1 - gauge_transform(y2))),
                               0.0, atol=1e-8)
    np.testing.assert_allclose(np.asarray(logj1), np.asarray(logj2),
                               atol=1e-8)


def test_plaquettes_are_gauge_invariant(rng):
    theta = _theta(rng)
    alpha = jnp.asarray(rng.uniform(-np.pi, np.pi, (1, *LAT)))
    t0 = theta[:, 0] + alpha - jnp.roll(alpha, -1, -2)
    t1 = theta[:, 1] + alpha - jnp.roll(alpha, -1, -1)
    theta_g = jnp.stack([t0, t1], axis=1)
    np.testing.assert_allclose(
        np.asarray(wrap_angle(u1_plaq_angle(theta_g) - u1_plaq_angle(theta))),
        0.0, atol=1e-8)


def test_gauge_logj_vs_jacobian(rng, key):
    # per-sample logJ vs slogdet of the full link-space Jacobian
    flow = _flow(key)
    theta = _theta(rng, batch=1)

    def f(flat):
        y, _ = flow.forward(flat.reshape(1, 2, *LAT))
        return y.ravel()

    jac = jax.jacfwd(f)(theta.ravel())
    _, logdet = jnp.linalg.slogdet(jac)
    _, logj = flow.forward(theta)
    np.testing.assert_allclose(float(logj[0]), float(logdet), rtol=1e-6)


@pytest.mark.slow
def test_u1_training_and_exactness():
    """Train the gauge flow and check <cos P> against the ANALYTIC 2-D U(1)
    result: on the torus, <cos P> = I1(beta)/I0(beta) up to exp(-V)
    topological corrections (exact solvability of 2-D U(1))."""
    key = jax.random.key(3)
    flow = _flow(key, n_cycles=1)
    prior = nf.prior.UniformPrior.build(
        low=-np.pi * jnp.ones((2, *LAT)), high=np.pi * jnp.ones((2, *LAT)))
    action = U1AngleAction(beta=1.0)
    model = nf.Model(net_=flow, prior=prior, action=action, seed=0)
    model.fit(n_epochs=400, batch_size=128,
              hyperparam=dict(lr=2e-3, weight_decay=0.0),
              checkpoint_dict=dict(print_stride=None), steps_per_call=200)
    out = model.mcmc.sample_chain(12, 512, collect_samples=True)
    p = np.asarray(u1_plaq_angle(jnp.asarray(
        np.asarray(out["samples"]).reshape(-1, 2, *LAT))))
    cosp = np.cos(p).mean(axis=(1, 2))

    from scipy.special import i0, i1

    oracle = float(i1(1.0) / i0(1.0))  # 0.44639...
    err = cosp.std() / np.sqrt(len(cosp) / 20)
    assert abs(cosp.mean() - oracle) < 5 * err + 0.01, (cosp.mean(), oracle)


def test_single_coupling_density_path(rng, key):
    """density=True returns a per-site logJ field: it must sum to the
    scalar logJ and be supported only on the updated link's active stripe
    (the stripe-restricted spline scatters it back)."""
    from normflow__tpu.models.nets import ConvNet

    net = ConvNet.build(key, 2, 3 * 5, kernel_size=3, conv_dim=2)
    for mu, offset in ((1, 0), (0, 3)):
        c = U1PlaquetteCoupling(net=net, mu=mu, offset=offset)
        theta = _theta(rng)
        y, logj = c.forward(theta)
        yd, dens = c.forward(theta, density=True)
        np.testing.assert_allclose(np.asarray(y), np.asarray(yd))
        assert dens.shape == theta.shape
        np.testing.assert_allclose(
            np.asarray(dens.sum(axis=(1, 2, 3))), np.asarray(logj),
            rtol=1e-6)
        # support: only link component mu, only active stripe rows/cols
        d = np.asarray(dens)
        assert np.all(d[:, 1 - mu] == 0.0)
        ax = 0 if mu == 1 else 1
        for coord in range(8):
            if coord % 4 != offset:
                sl = d[:, mu, coord] if ax == 0 else d[:, mu, :, coord]
                np.testing.assert_allclose(sl, 0.0, atol=0.0)
