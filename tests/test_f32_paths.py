"""TPU-precision (float32) end-to-end tests.

conftest enables x64 for sharp numerical oracles; production TPU runs are
float32.  These tests exercise the f32 paths explicitly (dtype-pinned
models under the x64 session) so reduced-precision correctness is covered
in CI, not just on hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import normflow__tpu as nf


def test_f32_zerodim_training_and_mcmc():
    net = nf.nn.DistConvertor_.build(10, symmetric=True, dtype=jnp.float32)
    prior = nf.prior.NormalPrior.build(shape=(1,), dtype=jnp.float32)
    action = nf.action.ScalarPhi4Action(kappa=0, m_sq=-1.2, lambd=0.5)
    model = nf.Model(net_=net, prior=prior, action=action, seed=42)
    hist = model.fit(n_epochs=400, batch_size=128,
                     hyperparam=dict(lr=0.01, weight_decay=0.0),
                     checkpoint_dict=dict(print_stride=None),
                     steps_per_call=400)
    assert hist["loss"][-1] <= -1.0
    y, logq, logp = model.mcmc.sample__(batch_size=512)
    assert y.dtype == jnp.float32
    assert model.mcmc.history.accept_rate[-1] > 0.85


def test_f32_flagship_roundtrip():
    from normflow__tpu.zoo import build_phi4_model

    model = build_phi4_model((8, 8), knots=4, hidden=(4,), n_layers=2,
                             dtype=jnp.float32)
    x = model.prior.sample(jax.random.key(0), 4)
    assert x.dtype == jnp.float32
    y, logj = model.net_.forward(x)
    x2, logj0 = model.net_.backward(y, log0=logj)
    # f32 tolerances: per-site error accumulates through expit/spline/logit
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=5e-4)
    assert float(jnp.abs(logj0).max()) < 0.2  # logJ over 64 sites, f32


def test_f32_logqp_accumulation_accuracy():
    # logq over a 32x32 lattice is O(1000); f32 absolute error must stay
    # well below MC-relevant scales (~0.01)
    from normflow__tpu.zoo import build_phi4_model

    m32 = build_phi4_model((16, 16), knots=4, hidden=(4,), n_layers=2,
                           dtype=jnp.float32, seed=3)
    m64 = build_phi4_model((16, 16), knots=4, hidden=(4,), n_layers=2,
                           dtype=jnp.float64, seed=3)
    # same weights, cast
    net64 = jax.tree_util.tree_map(
        lambda a, b: jnp.asarray(np.asarray(a), jnp.float64),
        m32.net_, m64.net_)
    x32 = m32.prior.sample(jax.random.key(1), 16)
    _, logj32 = m32.net_.forward(x32)
    _, logj64 = net64.forward(x32.astype(jnp.float64))
    err = np.abs(np.asarray(logj32, np.float64) - np.asarray(logj64)).max()
    assert err < 5e-2, err
