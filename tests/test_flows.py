"""Bijection property tests: every flow must round-trip with logJ cancellation.

Generalizes the reference's ``backward_sanitychecker`` into pytest
(SURVEY.md §4 test strategy (a)): forward∘backward = id, logJ antisymmetry,
finite-difference Jacobian checks, density-propagation consistency.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import normflow__tpu as nf
from normflow__tpu.models import (
    AffineCoupling, ArcTanh, CircularConv, ConvNet, DistConvertor,
    EvenOddMask, Expit, FFTFlow, FlowList, Identity, LinearNet, Logit,
    MeanFieldFlow, MultiRQSplineCoupling, Pade11, Pade22, Pade32, PSDBlock,
    RQSplineCoupling, Scale, SgnBias, ShiftCoupling, SplineFlow, Tanh,
)


def check_roundtrip(flow, x, atol=1e-8, **kwargs):
    y, logj = flow.forward(x, **kwargs)
    x2, logj0 = flow.backward(y, log0=logj, **kwargs)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=atol)
    np.testing.assert_allclose(np.asarray(logj0), 0.0, atol=atol)
    return y, logj


def check_logj_fd(flow, x, rtol=1e-4):
    """Per-sample logJ vs finite-difference log|det| via jacfwd (small x)."""
    def fwd_flat(xf):
        y, _ = flow.forward(xf.reshape(1, -1))
        return y.ravel()

    for i in range(min(3, x.shape[0])):
        xf = x[i].ravel()
        jac = jax.jacfwd(fwd_flat)(xf)
        _, logdet = jnp.linalg.slogdet(jac)
        _, logj = flow.forward(x[i][None])
        np.testing.assert_allclose(float(logj[0]), float(logdet), rtol=rtol)


UNIT_FLOWS = [
    lambda: Pade11.build(),
    lambda: Pade22.build(),
    lambda: Pade22.build(symmetric=True),
    lambda: SplineFlow.build(8),
    lambda: nf.models.UnityDistConvertor.build(6, symmetric=True),
]

REAL_FLOWS = [
    lambda: Identity(),
    lambda: Scale.build().replace(w=jnp.asarray([0.7])),
    lambda: Tanh(),
    lambda: Expit(),
    lambda: SgnBias.build(),
    lambda: Pade32.build().replace(w0=jnp.asarray([0.4])),
    lambda: DistConvertor.build(10, symmetric=True),
    lambda: DistConvertor.build(8, sgnbias=True, initial_scale=True),
    lambda: MeanFieldFlow.build(6),
]


@pytest.mark.parametrize("mk", UNIT_FLOWS)
def test_unit_interval_flows_roundtrip(rng, mk):
    flow = mk()
    # perturb params away from identity
    flow = jax.tree_util.tree_map(
        lambda p: p + 0.3 * jnp.asarray(rng.standard_normal(p.shape)), flow)
    x = jnp.asarray(rng.random((16, 5)) * 0.98 + 0.01)
    check_roundtrip(flow, x, atol=1e-9)


@pytest.mark.parametrize("mk", REAL_FLOWS)
def test_real_line_flows_roundtrip(rng, mk):
    flow = mk()
    x = jnp.asarray(rng.standard_normal((8, 4, 4)))
    check_roundtrip(flow, x, atol=1e-8)


def test_logj_vs_jacobian_det(rng):
    flow = DistConvertor.build(8, symmetric=True)
    flow = jax.tree_util.tree_map(
        lambda p: p + 0.2 * jnp.asarray(rng.standard_normal(p.shape)), flow)
    x = jnp.asarray(rng.standard_normal((3, 4)))
    check_logj_fd(flow, x)


def test_density_propagation_consistency(rng):
    flow = DistConvertor.build(8, symmetric=True)
    x = jnp.asarray(rng.standard_normal((6, 3, 3)))
    _, logj = flow.forward(x)
    _, logj_density = flow.forward(x, density=True)
    np.testing.assert_allclose(
        np.asarray(logj), np.asarray(logj_density.sum(axis=(1, 2))),
        atol=1e-10)


# ------------------------------------------------------------------ #
# convolution oracle
# ------------------------------------------------------------------ #
def _circular_conv_oracle(x, w):
    """Brute-force circular cross-correlation, channels-last, any dim."""
    nd = w.ndim - 2
    ks = w.shape[:nd]
    out = np.zeros((*x.shape[:-1], w.shape[-1]))
    for idx in np.ndindex(*ks):
        shifted = x
        for d, (i, k) in enumerate(zip(idx, ks)):
            shifted = np.roll(shifted, -(i - k // 2), axis=1 + d)
        out += np.einsum("...i,io->...o", shifted, w[idx])
    return out


@pytest.mark.parametrize("conv_dim,shape", [(1, (6,)), (2, (6, 4)),
                                            (3, (4, 4, 4)), (4, (4, 4, 4, 4))])
def test_circular_conv_matches_oracle(rng, key, conv_dim, shape):
    conv = CircularConv.build(key, 2, 3, kernel_size=3, conv_dim=conv_dim)
    x = rng.standard_normal((2, *shape, 2))
    got = conv(jnp.asarray(x))
    want = _circular_conv_oracle(x, np.asarray(conv.weight))
    if conv.bias is not None:
        want = want + np.asarray(conv.bias)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-10)


def test_convnet_stack(rng, key):
    net = ConvNet.build(key, 1, 2, kernel_size=3, conv_dim=2,
                        hidden_sizes=(4,), acts=("tanh", None), bias=False)
    x = jnp.asarray(rng.standard_normal((3, 8, 8, 1)))
    y = net(x)
    assert y.shape == (3, 8, 8, 2)
    # z2 symmetry: odd activations + no bias => net(-x) = -net(x)
    np.testing.assert_allclose(np.asarray(net(-x)), -np.asarray(y), atol=1e-12)


def test_linear_net(rng, key):
    net = LinearNet.build(key, 5, 3, hidden_sizes=(7,), acts=("relu", None),
                          final_bias=True)
    x = jnp.asarray(rng.standard_normal((4, 5)))
    assert net(x).shape == (4, 3)
    net2 = LinearNet.build(key, 5, 3, features_axis=1)
    x2 = jnp.asarray(rng.standard_normal((4, 5, 6)))
    assert net2(x2).shape == (4, 3, 6)


# ------------------------------------------------------------------ #
# couplings
# ------------------------------------------------------------------ #
def _coupling_nets(key, out_channels, n=2, lat=(6, 6)):
    return tuple(
        ConvNet.build(k, 1, out_channels, kernel_size=3, conv_dim=len(lat),
                      hidden_sizes=(4,), acts=("tanh", None))
        for k in jax.random.split(key, n)
    )


def test_shift_coupling_roundtrip(rng, key):
    mask = EvenOddMask(shape=(6, 6))
    c = ShiftCoupling(nets=_coupling_nets(key, 1), mask=mask)
    x = jnp.asarray(rng.standard_normal((4, 6, 6)))
    y, logj = check_roundtrip(c, x, atol=1e-9)
    np.testing.assert_allclose(np.asarray(logj), 0.0)  # volume preserving
    assert not np.allclose(np.asarray(y), np.asarray(x))


def test_affine_coupling_roundtrip_and_logj(rng, key):
    mask = EvenOddMask(shape=(6, 6))
    c = AffineCoupling(nets=_coupling_nets(key, 2), mask=mask)
    x = jnp.asarray(rng.standard_normal((4, 6, 6)))
    check_roundtrip(c, x, atol=1e-8)
    # logJ <= 0 because s = |s| makes exp(-s) <= 1 (couplings_.py:129)
    _, logj = c.forward(x)
    assert bool(jnp.all(logj <= 1e-12))


def test_rqspline_coupling_roundtrip(rng, key):
    mask = EvenOddMask(shape=(6, 6))
    m = 8
    c = RQSplineCoupling.build(
        _coupling_nets(key, 3 * m - 2), mask=mask,
        xlim=(-3, 3), ylim=(-3, 3),
        extrap={"left": "linear", "right": "linear"})
    x = jnp.asarray(rng.standard_normal((4, 6, 6)))
    check_roundtrip(c, x, atol=1e-8)


def test_multi_rqspline_coupling_roundtrip(rng, key):
    mask = EvenOddMask(shape=(6, 6))
    m = 6
    nets = tuple(
        ConvNet.build(k, 2, 2 * (3 * m - 2), kernel_size=3, conv_dim=2)
        for k in jax.random.split(key, 2)
    )
    c = MultiRQSplineCoupling.build(
        nets, mask=mask,
        xlims=[(-3, 3), (0, 1)], ylims=[(-3, 3), (0, 1)],
        extraps=[{"left": "linear", "right": "linear"}, {}])
    x1 = rng.standard_normal((4, 6, 6, 1))
    x2 = rng.random((4, 6, 6, 1)) * 0.96 + 0.02
    x = jnp.asarray(np.concatenate([x1, x2], axis=-1))
    check_roundtrip(c, x, atol=1e-8)


def test_coupling_jit_grad(rng, key):
    mask = EvenOddMask(shape=(6, 6))
    c = AffineCoupling(nets=_coupling_nets(key, 2), mask=mask)
    x = jnp.asarray(rng.standard_normal((4, 6, 6)))

    @jax.jit
    def loss(c, x):
        y, logj = c.forward(x)
        return jnp.sum(y**2) + jnp.sum(logj)

    g = jax.grad(loss)(c, x)
    leaves = jax.tree_util.tree_leaves(g)
    assert leaves and all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)


# ------------------------------------------------------------------ #
# spectral flows
# ------------------------------------------------------------------ #
def test_fftflow_roundtrip_and_gaussian_oracle(rng):
    # SURVEY §4 oracle (b): an FFTFlow with fixed IPSD must turn white noise
    # into a free field with the matching 2-pt function.
    lat = (8, 8)
    flow = FFTFlow.build(lat, knots_len=2, eff_mass2=1.0, eff_kappa=1.0)
    x = jnp.asarray(rng.standard_normal((16, *lat)))
    check_roundtrip(flow, x, atol=1e-8)

    # logJ oracle: sum over full fft grid of log(1/sqrt(ipsd)) with
    # rfft doubling handled == direct det of the linear map.
    w = 1.0 / jnp.sqrt(flow.ipsd)
    logj_direct = float(flow.log_jacobian(w))
    e = jnp.zeros(np.prod(lat))
    jac = jax.jacfwd(lambda v: flow.forward(v.reshape(1, *lat))[0].ravel())(e)
    _, logdet = jnp.linalg.slogdet(jac)
    np.testing.assert_allclose(logj_direct, float(logdet), rtol=1e-9)


def test_fftflow_free_theory_variance(rng):
    # With ipsd = kappa*k^2 + m^2, samples y = irfft(rfft(z) * ipsd^-1/2)
    # have <|y_k|^2> = 1/(ipsd_k) / V per mode; check the real-space variance
    # against the exact lattice propagator sum.
    lat = (16, 16)
    m2, kap = 0.5, 1.0
    flow = FFTFlow.build(lat, knots_len=2, eff_mass2=m2, eff_kappa=kap,
                         smooth=True)
    z = jnp.asarray(rng.standard_normal((4096, *lat)))
    y, _ = flow.forward(z)
    var = float(jnp.var(y))
    from normflow__tpu.ops.lattice import lattice_k2
    k2 = np.asarray(lattice_k2(lat))
    # ipsd spline init is identity on normalized k2: ipsd = m2 + kap*max_k2*(k2/max_k2)
    var_exact = float(np.mean(1.0 / (m2 + kap * k2)))
    np.testing.assert_allclose(var, var_exact, rtol=0.05)


def test_psd_block_roundtrip(rng, key):
    lat = (8, 8)
    block = PSDBlock(
        mfnet=MeanFieldFlow.build(6, symmetric=True, final_scale=True,
                                  smooth=True),
        fftnet=FFTFlow.build(lat, knots_len=6, ignore_zeromode=True),
    )
    x = jnp.asarray(rng.standard_normal((8, *lat)))
    check_roundtrip(block, x, atol=1e-8)


def test_flowlist_composition(rng, key):
    lat = (6, 6)
    net = FlowList(flows=(
        PSDBlock(
            mfnet=MeanFieldFlow.build(4, symmetric=True, smooth=True),
            fftnet=FFTFlow.build(lat, knots_len=4, ignore_zeromode=True)),
        DistConvertor.build(8, symmetric=True, smooth=True),
        AffineCoupling(nets=_coupling_nets(key, 2, lat=lat),
                       mask=EvenOddMask(shape=lat)),
        DistConvertor.build(8, symmetric=True, smooth=True),
    ))
    x = jnp.asarray(rng.standard_normal((4, *lat)))
    check_roundtrip(net, x, atol=1e-7)
    # intermediates
    stack = net.hack(x)
    assert len(stack) == 5


def test_4d_conv_coupling_roundtrip(rng, key):
    # 4-D lattice coupling: exercises the roll-and-sum Conv4d decomposition
    # inside a full flow (higher-dim parity, reference convNd.py).
    lat = (4, 4, 4, 4)
    mask = EvenOddMask(shape=lat)
    nets = tuple(
        ConvNet.build(k, 1, 2, kernel_size=3, conv_dim=4, bias=False)
        for k in jax.random.split(key, 2))
    c = AffineCoupling(nets=nets, mask=mask)
    x = jnp.asarray(rng.standard_normal((2, *lat)))
    y, logj = c.forward(x)
    x2, logj0 = c.backward(y, log0=logj)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-9)
    np.testing.assert_allclose(np.asarray(logj0), 0.0, atol=1e-9)


def test_1d_and_3d_flows(rng, key):
    for lat in [(12,), (6, 6, 6)]:
        mask = EvenOddMask(shape=lat)
        nets = tuple(
            ConvNet.build(k, 1, 2, kernel_size=3, conv_dim=len(lat))
            for k in jax.random.split(key, 2))
        c = AffineCoupling(nets=nets, mask=mask)
        x = jnp.asarray(rng.standard_normal((2, *lat)))
        y, logj = c.forward(x)
        x2, _ = c.backward(y)
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-9)


def test_packed_evenodd_mask_pack_unpack(rng):
    from normflow__tpu.models import PackedEvenOddMask

    m = PackedEvenOddMask(shape=(6, 8))
    x = jnp.asarray(rng.standard_normal((3, 6, 8)))
    x0, x1 = m.split(x)
    assert x0.shape == (3, 6, 4) and x1.shape == (3, 6, 4)
    np.testing.assert_allclose(np.asarray(m.cat(x0, x1)), np.asarray(x),
                               atol=0)
    # partition content matches the multiplicative checkerboard: parity 0
    # sites of x all appear in x0
    grid = np.indices((6, 8)).sum(0) % 2
    vals0 = np.sort(np.asarray(x)[0][grid == 0])
    np.testing.assert_allclose(np.sort(np.asarray(x0)[0].ravel()), vals0)


def test_packed_coupling_roundtrip_and_logj(rng, key):
    from normflow__tpu.models import PackedEvenOddMask

    lat = (6, 8)
    mask = PackedEvenOddMask(shape=lat)
    m = 6
    nets = tuple(
        ConvNet.build(k, 1, 3 * m - 2, kernel_size=3, conv_dim=2,
                      hidden_sizes=(4,), acts=("tanh", None))
        for k in jax.random.split(key, 2))
    c = RQSplineCoupling.build(nets, mask=mask, xlim=(-3, 3), ylim=(-3, 3),
                               extrap={"left": "linear", "right": "linear"})
    x = jnp.asarray(rng.standard_normal((4, *lat)))
    check_roundtrip(c, x, atol=1e-8)
    # exact logJ vs the full Jacobian determinant

    def f(flat):
        y, _ = c.forward(flat.reshape(1, *lat))
        return y.ravel()

    jac = jax.jacfwd(f)(x[0].ravel())
    _, logdet = jnp.linalg.slogdet(jac)
    _, logj = c.forward(x[:1])
    np.testing.assert_allclose(float(logj[0]), float(logdet), rtol=1e-8)


def test_packed_coupling_with_parity_feature(rng, key):
    from normflow__tpu.models import PackedEvenOddMask
    from normflow__tpu.models.nets import RowParityFeature

    lat = (6, 8)
    mask = PackedEvenOddMask(shape=lat)
    m = 5
    nets = tuple(
        RowParityFeature(net=ConvNet.build(
            k, 2, 3 * m - 2, kernel_size=3, conv_dim=2))
        for k in jax.random.split(key, 2))
    c = RQSplineCoupling.build(nets, mask=mask, xlim=(-3, 3), ylim=(-3, 3),
                               extrap={"left": "linear", "right": "linear"})
    x = jnp.asarray(rng.standard_normal((4, *lat)))
    check_roundtrip(c, x, atol=1e-8)


# ------------------------------------------------------------------ #
# round-2 review regressions (spectral logJ edge cases, even kernels)
# ------------------------------------------------------------------ #
def _perturb(tree, rng, eps=0.1):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    out = [l + jnp.asarray(rng.standard_normal(l.shape) * eps, l.dtype)
           if isinstance(l, jax.Array) and jnp.issubdtype(l.dtype, jnp.inexact)
           else l for l in leaves]
    return jax.tree_util.tree_unflatten(treedef, out)


@pytest.mark.parametrize("lat", [(4, 5), (5, 4), (3, 3), (5,), (6,)])
def test_fftflow_logj_any_extent_parity(rng, lat):
    """rfft-redundancy logJ == dense slogdet for odd AND even extents
    (the k_last Nyquist plane is self-conjugate only for even last dims)."""
    flow = FFTFlow.build(lat, knots_len=3, eff_mass2=2.0, eff_kappa=0.7)
    flow = _perturb(flow, rng, 0.2)
    w = 1.0 / jnp.sqrt(flow.ipsd)
    logj_direct = float(flow.log_jacobian(w))
    e = jnp.zeros(int(np.prod(lat)))
    jac = jax.jacfwd(lambda v: flow.forward(v.reshape(1, *lat))[0].ravel())(e)
    _, logdet = jnp.linalg.slogdet(jac)
    np.testing.assert_allclose(logj_direct, float(logdet), rtol=1e-8)


def test_psdblock_rejects_unpinned_zeromode(rng):
    """The mean-field flow owns the zero mode; an fftnet that can move the
    k=0 weight away from 1 double-counts that DOF in logq -- must raise."""
    block = PSDBlock(
        mfnet=MeanFieldFlow.build(4, symmetric=True, smooth=True),
        fftnet=FFTFlow.build((4, 4), knots_len=4, ignore_zeromode=False))
    with pytest.raises(ValueError, match="ignore_zeromode"):
        block.forward(jnp.zeros((2, 4, 4)))


def test_meanfield_and_psdblock_density_spread(rng):
    """density=True must SPREAD the mean-mode logJ over the lattice:
    summing the density over lattice axes == the scalar logJ (previously
    the whole logJ sat in a (B,1,1) cell and broadcast V-fold)."""
    lat = (4, 4)
    x = jnp.asarray(rng.standard_normal((3, *lat)))
    mf = _perturb(MeanFieldFlow.build(6, symmetric=True, smooth=True,
                                      final_scale=True), rng)
    block = PSDBlock(
        mfnet=mf,
        fftnet=_perturb(FFTFlow.build(lat, knots_len=4,
                                      ignore_zeromode=True), rng))
    for flow in (mf, block):
        y1, logj = flow.forward(x)
        y2, dens = flow.forward(x, density=True)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2))
        assert dens.shape == (3, *lat)
        assert float(jnp.abs(logj).min()) > 1e-4  # perturbation worked
        np.testing.assert_allclose(np.asarray(jnp.sum(dens, axis=(1, 2))),
                                   np.asarray(logj), rtol=1e-5)


def test_infrared_mass_both_ipsd_variants():
    from normflow__tpu.models.spectral import IPSDNoZeroMode

    f1 = FFTFlow.build((4, 4), knots_len=4, eff_mass2=2.0)
    assert np.isfinite(float(f1.infrared_mass))
    f2 = FFTFlow(ipsd_net=IPSDNoZeroMode.build(5, logy=[0.0], smooth=True),
                 lat_shape=(4, 4))
    assert np.isfinite(float(f2.infrared_mass))


def test_circular_conv_even_kernel_matches_torch(rng, key):
    """Even kernels are alignment-sensitive: torch's padding='same' puts
    the extra pad on the right ((k-1)//2 left, k//2 right)."""
    import torch

    conv = CircularConv.build(key, 2, 3, kernel_size=4, conv_dim=2,
                              bias=False)
    w = np.asarray(conv.weight)  # (kh, kw, in, out)
    x = rng.standard_normal((2, 6, 6, 2)).astype(w.dtype)
    got = np.asarray(conv(jnp.asarray(x)))
    tconv = torch.nn.Conv2d(2, 3, 4, padding="same",
                            padding_mode="circular", bias=False,
                            dtype=torch.float64)
    with torch.no_grad():
        tconv.weight.copy_(torch.tensor(w.transpose(3, 2, 0, 1),
                                        dtype=torch.float64))
        want = tconv(torch.tensor(x.transpose(0, 3, 1, 2),
                                  dtype=torch.float64)
                     ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_zebra_mask_odd_extent_roundtrip(rng):
    """split -> cat must reconstruct for odd striped extents (the parity
    slices differ by one plane)."""
    from normflow__tpu.models.masks import ZebraPlanarMask

    for shape, parity in [((4, 5), 0), ((4, 5), 1), ((3, 4), 0)]:
        z = ZebraPlanarMask(mu=0, nu=1, parity=parity, shape=shape)
        x = jnp.asarray(rng.standard_normal((2, *shape)))
        w, b = z.split(x)
        assert w.shape[1 + z.nu] == z.subshape[z.nu]
        np.testing.assert_allclose(np.asarray(z.cat(w, b)), np.asarray(x))


def test_circular_conv_dilation_matches_roll_oracle(rng):
    """A dilation-d circular conv equals a sum of input rolls weighted by
    the kernel taps at spacing d (periodic wrap), for odd kernels."""
    from normflow__tpu.models.nets import CircularConv

    for d in (1, 2, 3):
        conv = CircularConv.build(jax.random.key(d), 1, 1, kernel_size=3,
                                  conv_dim=2, bias=False, dilation=d)
        x = jnp.asarray(rng.normal(size=(2, 8, 8, 1)))
        y = conv(x)
        w = np.asarray(conv.weight)[..., 0, 0]  # (3, 3)
        expect = np.zeros_like(np.asarray(x)[..., 0])
        for i in range(3):
            for j in range(3):
                expect += w[i, j] * np.roll(
                    np.asarray(x)[..., 0],
                    shift=(-(i - 1) * d, -(j - 1) * d), axis=(1, 2))
        np.testing.assert_allclose(np.asarray(y)[..., 0], expect,
                                   atol=1e-12)


def test_phi4_model_with_dilations_round_trips(key):
    """zoo conv_dilations: flow stays exactly invertible and the dilated
    conditioner changes the distribution (receptive-field growth is real).
    """
    from normflow__tpu.training.model import backward_sanitychecker
    from normflow__tpu.zoo import build_phi4_model

    m = build_phi4_model((8, 8), knots=4, hidden=(4, 4), n_layers=2,
                         conv_dilations=(1, 2, 2))
    x_err, logj_err = backward_sanitychecker(m, n_samples=4, verbose=False)
    assert x_err < 1e-8 and logj_err < 1e-8
    convs = [c for c in jax.tree_util.tree_leaves(
        m.net_, is_leaf=lambda o: hasattr(o, "dilation"))
        if hasattr(o := c, "dilation")]
    assert {c.dilation for c in convs} == {1, 2}
