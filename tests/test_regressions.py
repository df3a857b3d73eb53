"""Regression tests: functional DoubleMask, controlled-coupling
training, path-gradient estimator, sample_chain shape-probe, parity shims."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import normflow__tpu as nf
from normflow__tpu.models import (
    AffineCoupling, ShiftCoupling, DoubleMask, GaugeLinksDoubleMask,
    EvenOddMask, AlongAxesEvenOddMask,
)
from normflow__tpu.models.couplings import (
    CntrAffineCoupling, CntrCoupling, refresh_controls, has_controls,
)
from normflow__tpu.models.nets import ConvNet
from normflow__tpu.struct import Const


# ------------------------------------------------------------------ #
# functional DoubleMask
# ------------------------------------------------------------------ #
def test_doublemask_split_returns_stash(rng):
    m = GaugeLinksDoubleMask(shape=(4, 4), parity=0, mu=1)
    x = jnp.asarray(rng.standard_normal((2, 4, 4)))
    x0, x1, stash = m.split(x)
    np.testing.assert_allclose(np.asarray(m.cat(x0, x1, stash)),
                               np.asarray(x), atol=0)
    # repeated split/cat on the same mask instance is safe (no hidden state)
    a = m.split(x)
    b = m.split(2.0 * x)
    np.testing.assert_allclose(np.asarray(m.cat(*b)), np.asarray(2.0 * x))
    np.testing.assert_allclose(np.asarray(m.cat(*a)), np.asarray(x))


def test_doublemask_coupling_roundtrip_and_vmap(rng, key):
    lat = (4, 4)
    mask = GaugeLinksDoubleMask(shape=lat, parity=0, mu=1)
    nets = tuple(
        ConvNet.build(k, 1, 2, kernel_size=3, conv_dim=2, bias=False)
        for k in jax.random.split(key, 2))
    c = AffineCoupling(nets=nets, mask=mask)
    x = jnp.asarray(rng.standard_normal((3, *lat)))
    y, logj = c.forward(x)
    x2, logj0 = c.backward(y, log0=logj)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-9)
    np.testing.assert_allclose(np.asarray(logj0), 0.0, atol=1e-9)
    # invisible partition passes through untouched
    inv_mask = np.asarray(EvenOddMask(shape=lat, parity=0).make_mask())
    np.testing.assert_allclose(np.asarray(y)[:, inv_mask == 0],
                               np.asarray(x)[:, inv_mask == 0], atol=0)
    # the stateless split/cat is vmap-safe (the mutable-stash version
    # was a footgun here)
    yv, logjv = jax.vmap(lambda xi: c.forward(xi[None]))(x)
    np.testing.assert_allclose(np.asarray(yv[:, 0]), np.asarray(y),
                               atol=1e-12)


# ------------------------------------------------------------------ #
# controlled couplings: training integration
# ------------------------------------------------------------------ #
def _cntr_model(seed=3, lat=(4, 4)):
    key = jax.random.key(seed)
    nets = tuple(
        ConvNet.build(k, 1, 2, kernel_size=3, conv_dim=2, bias=False)
        for k in jax.random.split(key, 2))
    prior = nf.prior.NormalPrior.build(shape=lat)

    def control_generator(k, batch_size):
        return jax.random.normal(k, (batch_size, *lat))

    c = CntrAffineCoupling(nets, mask=EvenOddMask(shape=lat),
                           control_generator=control_generator)
    action = nf.action.ScalarPhi4Action(kappa=0.3, m_sq=-1.0, lambd=0.3)
    return nf.Model(net_=c, prior=prior, action=action, seed=seed)


def test_cntr_coupling_without_control_raises():
    model = _cntr_model()
    x = model.prior.sample(jax.random.key(0), 4)
    with pytest.raises(ValueError, match="refresh_control"):
        model.net_.forward(x)


def test_refresh_controls_traversal():
    model = _cntr_model()
    assert has_controls(model.net_)
    net = refresh_controls(model.net_, jax.random.key(1), 8)
    assert isinstance(net.control, Const)
    assert net.control.value.shape == (8, 4, 4)
    # fresh key -> fresh control
    net2 = refresh_controls(net, jax.random.key(2), 8)
    assert not np.allclose(np.asarray(net.control.value),
                           np.asarray(net2.control.value))


def test_cntr_coupling_trains_end_to_end():
    model = _cntr_model()
    hist = model.fit(n_epochs=30, batch_size=32,
                     hyperparam=dict(lr=5e-3, weight_decay=0.0),
                     checkpoint_dict=dict(print_stride=15,
                                          print_batch_size=64))
    losses = hist["loss"]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # control leaf refreshed per step, marked non-trainable (Const)
    assert isinstance(model.net_.control, Const)
    # eval path ran at a different batch size than training
    assert len(hist["ess"]) >= 1


def test_cntr_coupling_snapshot_roundtrip(tmp_path):
    """Const-wrapped control leaves serialize and restore with snapshots."""
    from normflow__tpu.training.checkpoint import load_snapshot, save_snapshot

    model = _cntr_model(seed=17)
    model.fit(n_epochs=5, batch_size=16,
              checkpoint_dict=dict(print_stride=None))
    path = str(tmp_path / "cntr.snap")
    save_snapshot(path, net=model.net_, epoch=5)
    model2 = _cntr_model(seed=99)
    net2 = refresh_controls(model2.net_, jax.random.key(0), 16)
    restored, _, epoch, _ = load_snapshot(path, net=net2)
    assert epoch == 5
    np.testing.assert_allclose(
        np.asarray(restored.control.value),
        np.asarray(model.net_.control.value), atol=0)
    a = np.asarray(jax.tree_util.tree_leaves(model.net_)[0])
    b = np.asarray(jax.tree_util.tree_leaves(restored)[0])
    np.testing.assert_allclose(a, b, atol=0)


def test_cntr_coupling_trains_with_scan_segments():
    model = _cntr_model(seed=11)
    hist = model.fit(n_epochs=20, batch_size=16, steps_per_call=10,
                     hyperparam=dict(lr=5e-3),
                     checkpoint_dict=dict(print_stride=None))
    assert np.isfinite(hist["loss"]).all()


# ------------------------------------------------------------------ #
# path-gradient (sticking-the-landing) estimator
# ------------------------------------------------------------------ #
def test_path_gradient_vanishes_at_optimum(key):
    """For q = N(0, w^2) vs p = N(0, 1) at w = 1 the path-gradient is
    EXACTLY zero for any finite batch (the integrand d/dy[log q - log p]
    vanishes pointwise), while the plain reparametrization estimator keeps
    its O(1/sqrt(N)) score noise."""
    from normflow__tpu.models.elementwise import Scale

    prior = nf.prior.NormalPrior.build(shape=(1,))
    scale = Scale.build()  # w param 0 -> weight 1 (the optimum for p=N(0,1))
    batch = 256

    def loss_rep(net):
        x, logr = prior.sample_(key, batch)
        y, logj = net.forward(x)
        logq = logr - logj
        logp = -0.5 * jnp.sum(y**2, axis=1) - 0.5 * np.log(2 * np.pi)
        return jnp.mean(logq - logp)

    def loss_path(net):
        x, logr = prior.sample_(key, batch)
        y, _ = net.forward(x)
        net_sg = jax.tree_util.tree_map(jax.lax.stop_gradient, net)
        x_inv, mlogj = net_sg.backward(y)
        logq = prior.log_prob(x_inv) + mlogj
        logp = -0.5 * jnp.sum(y**2, axis=1) - 0.5 * np.log(2 * np.pi)
        return jnp.mean(logq - logp)

    g_rep = jax.grad(loss_rep)(scale).w
    g_path = jax.grad(loss_path)(scale).w
    assert abs(float(g_path[0])) < 1e-10, g_path
    assert abs(float(g_rep[0])) > 1e-3, g_rep  # score noise survives


def test_path_gradient_matches_rep_in_expectation(key):
    """Away from the optimum both estimators are unbiased for the same
    gradient; with a large batch they must agree."""
    from normflow__tpu.models.elementwise import Scale

    prior = nf.prior.NormalPrior.build(shape=(1,))
    scale = Scale.build().replace(w=jnp.asarray([1.3]))
    batch = 200_000

    def make_loss(path):
        def loss(net):
            x, logr = prior.sample_(key, batch)
            y, logj = net.forward(x)
            if path:
                net_sg = jax.tree_util.tree_map(jax.lax.stop_gradient, net)
                x_inv, mlogj = net_sg.backward(y)
                logq = prior.log_prob(x_inv) + mlogj
            else:
                logq = logr - logj
            logp = -0.5 * jnp.sum(y**2, axis=1) - 0.5 * np.log(2 * np.pi)
            return jnp.mean(logq - logp)
        return loss

    g_rep = float(jax.grad(make_loss(False))(scale).w[0])
    g_path = float(jax.grad(make_loss(True))(scale).w[0])
    # analytic: KL(w) = (w^2 - 1)/2 - log w, dKL/dw = w - 1/w, then chain
    # rule through the softplus-log2 parameterization is shared by both
    np.testing.assert_allclose(g_path, g_rep, rtol=0.05)


def test_fit_with_path_estimator_trains():
    net = nf.nn.DistConvertor_.build(8, symmetric=True)
    prior = nf.prior.NormalPrior.build(shape=(1,))
    action = nf.action.ScalarPhi4Action(kappa=0, m_sq=-1.2, lambd=0.5)
    model = nf.Model(net_=net, prior=prior, action=action, seed=7)
    hist = model.fit(n_epochs=300, batch_size=128,
                     hyperparam=dict(lr=0.01, weight_decay=0.0),
                     grad_estimator="path",
                     checkpoint_dict=dict(print_stride=150))
    assert hist["loss"][-1] <= -0.9, hist["loss"][-1]
    assert hist["ess"][-1] >= 0.9


# ------------------------------------------------------------------ #
# sample_chain shape probe (shape-changing flows)
# ------------------------------------------------------------------ #
def test_sample_chain_shape_changing_flow():
    from normflow__tpu.models.core import Flow
    from normflow__tpu.struct import static

    class FlattenFlow(Flow):
        label: str | None = static(default="flatten_")

        def forward(self, x, log0=0.0, *, density=False):
            return x.reshape(x.shape[0], -1), log0

        def backward(self, x, log0=0.0, *, density=False):
            return x.reshape(x.shape[0], 4, 4), log0

    prior = nf.prior.NormalPrior.build(shape=(4, 4))
    action = nf.action.ScalarPhi4Action(kappa=0.0, m_sq=1.0, lambd=0.0)
    model = nf.Model(net_=FlattenFlow(), prior=prior, action=action, seed=0)
    out = model.mcmc.sample_chain(3, 8, collect_samples=True)
    assert out["samples"].shape == (3, 8, 16)
    assert np.isfinite(np.asarray(out["logq"])).all()
    assert (np.asarray(out["accept_rate"]) > 0).all()


# ------------------------------------------------------------------ #
# parity shims
# ------------------------------------------------------------------ #
def test_nn_scalar_namespace():
    from normflow__tpu.nn.scalar.couplings_ import RQSplineCoupling_
    from normflow__tpu.nn.scalar.modules_ import DistConvertor_, Pade32_
    from normflow__tpu.nn.scalar.modules import ConvAct, LinearAct
    from normflow__tpu.nn.scalar.fftflow_ import FFTNet_
    from normflow__tpu.nn.scalar.psd_ import PSDBlock_
    from normflow__tpu.nn.scalar.meanfield_ import MeanFieldNet_
    from normflow__tpu.nn.scalar.cntr_couplings_ import CntrRQSplineCoupling_
    from normflow__tpu.nn.scalar.convNd import ConvNd, Conv4d

    assert RQSplineCoupling_ is nf.nn.RQSplineCoupling_
    assert DistConvertor_ is nf.nn.DistConvertor_
    assert Pade32_ is nf.nn.Pade32_
    assert nf.nn.scalar.ConvAct is ConvAct


def test_mask_abc_exported():
    assert issubclass(nf.mask.EvenOddMask, nf.mask.Mask)
    assert issubclass(nf.mask.AlongAxesEvenOddMask, nf.mask.Mask)


def test_with_conv_compute_dtype_bf16_sampling():
    """zoo.with_conv_compute_dtype must convert every conditioner ConvNet
    (including through RowParityFeature wrappers) and produce a valid,
    close logqp stream -- the bf16-sampling production path."""
    import jax.numpy as jnp

    from normflow__tpu.zoo import build_phi4_model, with_conv_compute_dtype
    from normflow__tpu.models.nets import ConvNet

    model = build_phi4_model((8, 8), knots=4, hidden=(4,), seed=0)
    net16 = with_conv_compute_dtype(model.net_, "bfloat16")
    convs = [n for n in jax.tree_util.tree_leaves(
        net16, is_leaf=lambda x: isinstance(x, ConvNet))
        if isinstance(n, ConvNet)]
    assert convs and all(c.compute_dtype == "bfloat16" for c in convs)
    # params stay f32/f64 (master weights untouched)
    assert all(jnp.issubdtype(l.dtype, jnp.floating) and
               l.dtype != jnp.bfloat16
               for l in jax.tree_util.tree_leaves(net16)
               if hasattr(l, "dtype"))

    key = jax.random.key(1)
    logqp_f32 = model.posterior.logqp_stream(4, 32, key=key)
    model.net_ = net16
    logqp_bf16 = model.posterior.logqp_stream(4, 32, key=key)
    assert np.isfinite(np.asarray(logqp_bf16)).all()
    # same flow up to bf16 conditioner rounding
    np.testing.assert_allclose(np.asarray(logqp_bf16),
                               np.asarray(logqp_f32), rtol=0.2, atol=2.0)


def test_no_private_jax_imports():
    """The package must not touch ``jax._src`` (round-4 VERDICT item 7):
    private modules break across JAX upgrades.  Source-level scan of every
    package file."""
    import pathlib

    import normflow__tpu

    pkg_root = pathlib.Path(normflow__tpu.__file__).parent
    offenders = [
        str(p) for p in pkg_root.rglob("*.py")
        if "jax._src" in p.read_text()
    ]
    assert offenders == [], f"private jax._src usage in: {offenders}"


def test_host_scan_device_selection(monkeypatch):
    """``NORMFLOW_HOST_SCAN`` gates the host accept-scan backend:
    ``numpy`` must force the plain-numpy recurrence, and both paths must
    agree decision-for-decision with a shared uniform stream."""
    from normflow__tpu.mcmc.metropolis import (Metropolis,
                                               _initialized_cpu_device)

    monkeypatch.setenv("NORMFLOW_HOST_SCAN", "numpy")
    assert _initialized_cpu_device() is None
    logqp = np.asarray(np.random.default_rng(7).normal(size=300),
                       dtype=np.float32)
    s_np = Metropolis.calc_accept_status(logqp,
                                         rng=np.random.default_rng(11))
    monkeypatch.delenv("NORMFLOW_HOST_SCAN")
    assert _initialized_cpu_device() is not None  # tests pin JAX_PLATFORMS=cpu
    s_dev = Metropolis.calc_accept_status(logqp,
                                          rng=np.random.default_rng(11))
    np.testing.assert_array_equal(np.asarray(s_np), np.asarray(s_dev))


def test_fused_out_cast_matches_unfused_bf16():
    """Round 5: the final bf16 conv emits f32 via preferred_element_type
    (MXU-epilogue cast) instead of a separate copy_convert.  The fused
    path must agree with the unfused one to bf16 rounding, engage ONLY
    under a reduced compute_dtype (f32 flows bit-unchanged), and keep the
    flow exactly invertible."""
    import jax.numpy as jnp

    from normflow__tpu.models.nets import ConvNet
    from normflow__tpu.zoo import build_phi4_model, with_conv_compute_dtype

    def set_fuse(net_, on):
        is_conv = lambda n: isinstance(n, ConvNet)
        return jax.tree_util.tree_map(
            lambda n: n.replace(fuse_out_cast=on) if is_conv(n) else n,
            net_, is_leaf=is_conv)

    model = build_phi4_model((8, 8), knots=4, hidden=(4,), seed=0,
                             dtype=jnp.float32)
    x = model.prior.sample(jax.random.key(2), 16).astype(jnp.float32)

    # f32 path: flag is a no-op bit-for-bit
    y_on, lj_on = set_fuse(model.net_, True).forward(x)
    y_off, lj_off = set_fuse(model.net_, False).forward(x)
    np.testing.assert_array_equal(np.asarray(y_on), np.asarray(y_off))
    np.testing.assert_array_equal(np.asarray(lj_on), np.asarray(lj_off))

    # bf16 path: fused agrees with unfused to bf16 rounding, f32 dtype out
    net16 = with_conv_compute_dtype(model.net_, "bfloat16")
    yf, ljf = set_fuse(net16, True).forward(x)
    yu, lju = set_fuse(net16, False).forward(x)
    assert yf.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yu),
                               rtol=0.05, atol=0.05)
    # invertibility of the fused flow (conditioner outputs are shared by
    # forward and backward, so the roundtrip is tight, not bf16-loose)
    xr, ljr = set_fuse(net16, True).backward(yf)
    np.testing.assert_allclose(np.asarray(xr), np.asarray(x),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ljf + ljr), 0.0, atol=1e-3)
