"""MCMC semantics and statistical exactness tests (SURVEY §4 (c))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import normflow__tpu as nf
from normflow__tpu.mcmc import (
    Metropolis, ModifiedMetropolis, accept_scan, estimate_accept_rate,
)


def test_accept_scan_semantics(key):
    # indices must point at the last accepted proposal; accept <=> index==i+1
    logqp = jnp.asarray(np.random.default_rng(0).standard_normal(256))
    accept, idx = accept_scan(key, logqp, logqp[0])
    accept, idx = np.asarray(accept), np.asarray(idx)
    cur = 0
    for i in range(256):
        if accept[i]:
            cur = i + 1
        assert idx[i] == cur


def test_accept_scan_always_accepts_downhill(key):
    # strictly decreasing logqp (increasing weight) => all accepted
    logqp = -jnp.arange(64.0)
    accept, idx = accept_scan(key, logqp, logqp[0] + 1.0)
    assert bool(jnp.all(accept))
    np.testing.assert_array_equal(np.asarray(idx), np.arange(1, 65))


def test_host_metropolis_matches_semantics(rng):
    logqp = rng.standard_normal(128)
    status = Metropolis.calc_accept_status(logqp, rng=rng)
    indices = Metropolis.calc_accept_indices(status)
    cur = 0
    for i in range(128):
        if status[i]:
            cur = i
        assert indices[i] == cur
    # rejection statistics helpers
    counts = Metropolis.calc_accept_count(status)
    assert counts.sum() == np.where(status)[0][-1] - np.where(status)[0][0]
    p_tau = Metropolis.calc_tau_rejections_prob(status, max_tau=5)
    assert p_tau[0] == 1 - status.mean()
    assert np.all(np.diff(p_tau) <= 1e-12)


def test_modified_metropolis(rng):
    logqp = rng.standard_normal(64)
    status = ModifiedMetropolis.calc_accept_status(logqp, tau=0.1, rng=rng)
    assert status.dtype == bool and len(status) == 64


def _zerodim_model(seed=11):
    net = nf.nn.DistConvertor_.build(10, symmetric=True)
    prior = nf.prior.NormalPrior.build(shape=(1,))
    action = nf.action.ScalarPhi4Action(kappa=0, m_sq=-1.2, lambd=0.5)
    return nf.Model(net_=net, prior=prior, action=action, seed=seed)


def _exact_phi2(m_sq=-1.2, lambd=0.5):
    # S = 0.5*m_sq*phi^2 + lambd*phi^4 for lat_ndim=1, kappa=0
    phi = np.linspace(-6, 6, 20001)
    s = 0.5 * m_sq * phi**2 + lambd * phi**4
    w = np.exp(-s + s.min())
    return float((phi**2 * w).sum() / w.sum())


@pytest.mark.slow
def test_mcmc_exactness_zerodim():
    """Train briefly, then Metropolis-corrected <phi^2> must match quadrature
    within MC error -- the de-facto integration test of the whole pipeline."""
    model = _zerodim_model()
    model.fit(n_epochs=300, batch_size=256,
              hyperparam=dict(lr=0.01, weight_decay=0.0),
              checkpoint_dict=dict(print_stride=10**9))
    ys = []
    for _ in range(16):
        y, logq, logp = model.mcmc.sample__(batch_size=1024)
        ys.append(np.asarray(y))
    phi2 = np.concatenate(ys).ravel() ** 2
    exact = _exact_phi2()
    err = phi2.std() / np.sqrt(len(phi2) / 10)  # conservative tau estimate
    assert abs(phi2.mean() - exact) < 5 * err + 0.01, (phi2.mean(), exact)
    # acceptance should be high for a trained flow
    assert model.mcmc.history.accept_rate[-1] > 0.8


def test_mcmc_chain_carries_ref_state():
    model = _zerodim_model()
    y1, _, _ = model.mcmc.sample__(batch_size=32)
    ref1 = model.mcmc._ref["sample"]
    np.testing.assert_allclose(np.asarray(y1[-1]), np.asarray(ref1))
    y2, _, _ = model.mcmc.sample__(batch_size=32)
    assert model.mcmc._ref["sample"] is not ref1


def test_mcmc_bookkeeping():
    model = _zerodim_model()
    model.mcmc.sample__(batch_size=16, bookkeeping=True)
    h = model.mcmc.history
    assert len(h.logq) == 1 and len(h.raw_logq) == 1
    assert len(h.accept_seq) == 1 and len(h.accept_ind) == 1
    rep = h.report_summary(asstr=True)
    assert set(rep) == {"logqp", "logz", "accept_rate"}


def test_serial_sample_generator():
    model = _zerodim_model()
    out = list(model.mcmc.serial_sample_generator(5, batch_size=2))
    assert len(out) == 5
    assert out[0][0].shape == (1, 1)


def test_blocked_mcmc_runs_and_matches_distribution():
    model = _zerodim_model()
    model.fit(n_epochs=200, batch_size=256,
              hyperparam=dict(lr=0.01, weight_decay=0.0),
              checkpoint_dict=dict(print_stride=10**9))
    y, logq, logp = model.blocked_mcmc.sample__(batch_size=256, n_blocks=1)
    assert y.shape == (256, 1)
    accept = model.blocked_mcmc.history.accept_rate[-1]
    assert 0.5 < accept <= 1.0


def test_blocked_mcmc_multiblock(key):
    # 4-var prior split into 2 blocks
    net = nf.nn.DistConvertor_.build(6, symmetric=True)
    prior = nf.prior.NormalPrior.build(shape=(4,))
    action = nf.action.ScalarPhi4Action(kappa=0, m_sq=-1.2, lambd=0.5)
    model = nf.Model(net_=net, prior=prior, action=action, seed=3)
    y, logq, logp = model.blocked_mcmc.sample__(batch_size=8, n_blocks=2)
    assert y.shape == (8, 4)
    assert np.isfinite(np.asarray(logq)).all()


def test_estimate_accept_rate_range(rng):
    mean, std = estimate_accept_rate(rng.standard_normal(512))
    assert 0 < mean < 1 and std >= 0


def test_sample_chain_scanned():
    model = _zerodim_model()
    out = model.mcmc.sample_chain(5, 64, collect_samples=True)
    assert out["samples"].shape == (5, 64, 1)
    assert out["accept_rate"].shape == (5,)
    assert model.mcmc._ref is not None
    # continuing the chain consumes the carried reference
    out2 = model.mcmc.sample_chain(2, 64)
    assert out2["logq"].shape == (2, 64)
    assert len(model.mcmc.history.accept_rate) == 7


@pytest.mark.slow
def test_mcmc_exactness_2d_free_theory():
    """2-D exactness oracle: free theory (lambda=0).  An FFTFlow can
    represent the exact Gaussian, so after a short fit the Metropolis
    chain must reproduce <phi^2> = (1/V) sum_k 1/(m^2 + kappa k_hat^2)."""
    from normflow__tpu.models import FFTFlow, FlowList
    from normflow__tpu.ops.lattice import lattice_k2

    lat, m2, kap = (8, 8), 1.0, 1.0
    net = FlowList(flows=(FFTFlow.build(lat, knots_len=6, eff_mass2=2.0,
                                        eff_kappa=0.5),))
    prior = nf.prior.NormalPrior.build(shape=lat)
    action = nf.action.ScalarPhi4Action(kappa=kap, m_sq=m2, lambd=0.0)
    model = nf.Model(net_=net, prior=prior, action=action, seed=1)
    model.fit(n_epochs=400, batch_size=256,
              hyperparam=dict(lr=5e-3, weight_decay=0.0),
              checkpoint_dict=dict(print_stride=None), steps_per_call=400)
    out = model.mcmc.sample_chain(16, 1024, collect_samples=True)
    phi2 = (np.asarray(out["samples"]) ** 2).mean(axis=(2, 3)).ravel()
    exact = float(np.mean(1.0 / (m2 + kap * np.asarray(lattice_k2(lat)))))
    err = phi2.std() / np.sqrt(len(phi2) / 10)
    assert abs(phi2.mean() - exact) < 5 * err + 0.005, (phi2.mean(), exact)
    assert float(np.mean(np.asarray(out["accept_rate"]))) > 0.8


def test_parallel_chains_exactness():
    """1024 independent 1-proposal-per-round chains must reproduce the
    quadrature <phi^2> (elementwise-accept production sampler)."""
    model = _zerodim_model()
    model.fit(n_epochs=300, batch_size=256,
              hyperparam=dict(lr=0.01, weight_decay=0.0),
              checkpoint_dict=dict(print_stride=None), steps_per_call=300)
    out = model.mcmc.sample_parallel_chains(32, 1024, collect_samples=True)
    # discard a short burn-in, then average
    phi2 = (np.asarray(out["samples"])[4:] ** 2).ravel()
    exact = _exact_phi2()
    err = phi2.std() / np.sqrt(len(phi2) / 5)
    assert abs(phi2.mean() - exact) < 5 * err + 0.01, (phi2.mean(), exact)
    assert float(np.asarray(out["accept_rate"])[1:].mean()) > 0.85
    assert out["final_samples"].shape == (1024, 1)


def test_parallel_chains_sharded():
    import os
    model = _zerodim_model()
    model.device_handler.use_mesh(n_devices=4)
    out = model.mcmc.sample_parallel_chains(4, 64)
    assert out["logq"].shape == (4, 64)


def test_scanned_samplers_bookkeeping():
    """bookkeeping=True on the scanned samplers must record the raw and
    corrected per-round streams plus accept sequences/indices (the scanned
    equivalent of sample__(bookkeeping=True); round-2 VERDICT gap)."""
    model = _zerodim_model()
    out = model.mcmc.sample_chain(3, 16, bookkeeping=True)
    h = model.mcmc.history
    assert len(h.raw_logq) == 3 and len(h.logq) == 3
    assert len(h.accept_seq) == 3 and len(h.accept_ind) == 3
    assert h.raw_logq[0].shape == (16,)
    # accept_ind consistent with accept_seq per round
    for seq, ind in zip(h.accept_seq, h.accept_ind):
        np.testing.assert_array_equal(ind, Metropolis.calc_accept_indices(seq))
    # corrected stream: rejected slots repeat the last accepted logqp
    assert set(h.report_summary()) == {"logqp", "logz", "accept_rate"}

    model2 = _zerodim_model()
    model2.mcmc.sample_parallel_chains(4, 8, bookkeeping=True)
    h2 = model2.mcmc.history
    assert len(h2.raw_logq) == 4 and len(h2.logq) == 4
    assert h2.accept_seq[0].shape == (8,)


def test_report_summary_after_scanned_samplers():
    """sample_chain records only accept_rate; report_summary must not
    crash on the empty logq/logp lists (round-2 review regression)."""
    model = _zerodim_model()
    model.fit(n_epochs=50, batch_size=64,
              hyperparam=dict(lr=0.01, weight_decay=0.0),
              checkpoint_dict=dict(print_stride=None), steps_per_call=50)
    model.mcmc.sample_chain(3, 32)
    out = model.mcmc.history.report_summary()
    assert "accept_rate" in out and "logqp" not in out
    # the classic sampler fills the full summary
    model.mcmc.sample__(batch_size=64, bookkeeping=True)
    out2 = model.mcmc.history.report_summary(asstr=True)
    assert set(out2) >= {"logqp", "logz", "accept_rate"}


def test_fit_print_stride_zero_and_save_every_zero(tmp_path):
    """print_stride=0 must disable evals (not ZeroDivisionError); a
    snapshot path with save_every=0 must not divide by zero."""
    model = _zerodim_model()
    model.fit(n_epochs=12, batch_size=32, save_every=0,
              hyperparam=dict(lr=0.01, weight_decay=0.0),
              checkpoint_dict=dict(
                  print_stride=0,
                  snapshot_path=str(tmp_path / "snap.msgpack")))
