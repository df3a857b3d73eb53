"""Bench-harness helpers (repo-root bench.py) regression tests.

bench.py produces the driver's scored metric, so its measurement helpers
get the same regression coverage as library code.  Covered here:

- ``autotune_batch``: returns a candidate batch and a full rate table.
  Round-5 regression: the sweep must run at the caller's scan length
  (``iters``) -- a short sweep amortizes the per-dispatch constant over
  more samples for larger batches and flips the VMEM-residency ordering
  that holds at the official 400-iter scan.
- ``bootstrap_ess_err``: positive, finite, deterministic given the seed.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_model():
    from normflow__tpu.zoo import build_phi4_model

    return build_phi4_model((8, 8), knots=4, hidden=(4,), n_layers=2,
                            seed=0)


def test_autotune_batch_picks_a_candidate(tiny_model):
    import bench

    candidates = (4, 8)
    best, table = bench.autotune_batch(tiny_model, candidates=candidates,
                                       iters=3, reps=1)
    assert best in candidates
    assert set(table) == set(candidates)
    assert all(r > 0 and np.isfinite(r) for r in table.values())


def test_autotune_batch_honors_scan_length(tiny_model, monkeypatch):
    """The sweep must time ``logqp_stream`` at the REQUESTED iters."""
    import bench

    seen = []
    posterior = tiny_model.posterior
    orig = posterior.logqp_stream

    def spy(iters, batch, key=None):
        seen.append(iters)
        return orig(iters, batch, key=key)

    monkeypatch.setattr(posterior, "logqp_stream", spy)
    bench.autotune_batch(tiny_model, candidates=(4,), iters=7, reps=1)
    assert seen and set(seen) == {7}


def test_bootstrap_ess_err_deterministic():
    import bench

    rng = np.random.default_rng(0)
    logqp = rng.normal(size=256)
    e1 = bench.bootstrap_ess_err(logqp, n_boot=20, seed=5)
    e2 = bench.bootstrap_ess_err(logqp, n_boot=20, seed=5)
    assert e1 == e2
    assert 0 < e1 < 1
