"""Smoke-drive the example scripts (tiny sizes) through their main()."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


def test_scalar_zerodim_example():
    from scalar_zerodim import main

    model = main(n_epochs=50, batch_size=64, knots_len=6)
    assert model.fit.train_history["loss"][-1] < 0


def test_scalar_affine_example():
    from scalar_affine import main

    model = main(n_epochs=10, batch_size=32, lat_shape=(4, 4),
                 knots0_len=4, knots1_len=4, knots2_len=6, knots4_len=6,
                 hidden_sizes=(4,), n_layers=2)
    assert len(model.fit.train_history["loss"]) == 10


def test_u1_gauge_example():
    from u1_gauge import main

    model = main(beta=1.0, lat_shape=(4, 4), n_epochs=10, batch_size=16,
                 n_cycles=1, knots_len=4, steps_per_call=10)
    assert len(model.fit.train_history["loss"]) == 10


def test_schwinger_example():
    from schwinger import main

    model = main(beta=1.5, mass=0.3, lat_shape=(4, 4), n_epochs=10,
                 batch_size=16, n_cycles=1, knots_len=4, steps_per_call=10)
    assert len(model.fit.train_history["loss"]) == 10


@pytest.mark.slow
def test_scalar_affine_8x8_integration():
    """The reference's headline 2-D config (examples/scalar_affine.py:14-15):
    after 1000 epochs the Metropolis acceptance must clear 0.5 (measured
    ~0.61 on this architecture)."""
    import numpy as np
    from scalar_affine import main

    model = main(n_epochs=1000, batch_size=256, lat_shape=(8, 8))
    out = model.mcmc.sample_chain(8, 512)
    accept = float(np.asarray(out["accept_rate"]).mean())
    assert accept > 0.5, accept


def test_scalar_64x64_distributed_example_smoke():
    """BASELINE config 4 example at toy scale: sharded fit + parallel-chains
    Metropolis with observables (runs multi-device on the virtual mesh)."""
    import importlib.util

    path = os.path.join(os.path.dirname(__file__), "..", "examples",
                        "scalar_64x64_distributed.py")
    spec = importlib.util.spec_from_file_location("ex64", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    model = mod.main(lat_shape=(8, 8), n_epochs=10, batch_size=32, chains=32,
                     chain_rounds=3, knots=4, hidden=(4,), n_layers=2,
                     steps_per_call=10, coarse_epochs=10)  # coarse-to-fine on
    assert model.device_handler.mesh is not None  # ran sharded
