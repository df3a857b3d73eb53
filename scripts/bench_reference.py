"""Measure the reference implementation's effective samples/s (torch CPU).

Loads jkomijani/normflow_ from /root/reference (read-only) under the module
name ``normflow``, builds the same 32x32 RQ-spline-coupling architecture as
our ``bench.py`` flagship, trains with the same protocol, and measures
effective samples/s.  The result seeds ``REFERENCE_EFF_SAMPLES_PER_SEC`` in
bench.py (the reference publishes no benchmark numbers of its own --
BASELINE.md -- and torch-CPU is its only runnable configuration here).

Run:  python scripts/bench_reference.py --train_epochs 400
"""

import argparse
import importlib.util
import json
import sys
import time


def load_reference():
    spec = importlib.util.spec_from_file_location(
        "normflow", "/root/reference/src/__init__.py",
        submodule_search_locations=["/root/reference/src"])
    mod = importlib.util.module_from_spec(spec)
    sys.modules["normflow"] = mod
    spec.loader.exec_module(mod)
    return mod


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--train_epochs", type=int, default=400)
    p.add_argument("--train_batch", type=int, default=512)
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--sample_iters", type=int, default=20)
    p.add_argument("--lat", type=int, default=32)
    args = p.parse_args()

    import numpy as np
    if not hasattr(np, "product"):
        # the reference uses the numpy-2.x-removed alias ``np.product``
        # throughout (SURVEY §2.14.8); shim it so it can run at all.
        np.product = np.prod

    nf = load_reference()
    import torch

    from normflow.action import ScalarPhi4Action
    from normflow.prior import NormalPrior
    from normflow.mask import EvenOddMask
    from normflow.nn import (
        ModuleList_, DistConvertor_, RQSplineCoupling_, ConvAct, FFTNet_,
        MeanFieldNet_, PSDBlock_,
    )

    lat_shape = (args.lat, args.lat)
    knots = 8
    hidden = (16, 16)
    conv = dict(in_channels=1, out_channels=3 * knots - 2,
                hidden_sizes=list(hidden), kernel_size=3,
                conv_dim=2, acts=["tanh"] * len(hidden) + [None], bias=False)
    mask = EvenOddMask(shape=lat_shape)
    net_ = ModuleList_([
        PSDBlock_(
            mfnet_=MeanFieldNet_.build(knots_len=8, symmetric=True,
                                       smooth=True, final_scale=True),
            fftnet_=FFTNet_.build(lat_shape, knots_len=8,
                                  ignore_zeromode=True),
        ),
        DistConvertor_(16, symmetric=True, smooth=True),
        RQSplineCoupling_(
            [ConvAct(**conv) for _ in range(4)], mask=mask,
            xlim=(-4.0, 4.0), ylim=(-4.0, 4.0),
            extrap={"left": "linear", "right": "linear"}),
        DistConvertor_(16, symmetric=True, smooth=True),
    ])
    prior = NormalPrior(shape=lat_shape)
    action = ScalarPhi4Action(kappa=0.6, m_sq=-2.4, lambd=0.5)
    model = nf.Model(net_=net_, prior=prior, action=action)
    print("reference npar:",
          sum(int(np.prod(p.shape)) for p in net_.parameters()), flush=True)

    t0 = time.time()
    model.fit(n_epochs=args.train_epochs, batch_size=args.train_batch,
              hyperparam=dict(lr=2e-3, weight_decay=1e-4),
              checkpoint_dict=dict(print_stride=100))
    train_time = time.time() - t0

    # throughput
    with torch.no_grad():
        model.posterior.sample__(batch_size=args.batch)  # warmup
        logqps = []
        t0 = time.time()
        for _ in range(args.sample_iters):
            _, logq, logp = model.posterior.sample__(batch_size=args.batch)
            logqps.append((logq - logp).cpu())
        dt = time.time() - t0
    samples_per_sec = args.sample_iters * args.batch / dt

    logqp = torch.cat(logqps)
    log_ess = (2 * torch.logsumexp(-logqp, 0)
               - torch.logsumexp(-2 * logqp, 0))
    ess = float(torch.exp(log_ess)) / len(logqp)
    eff = samples_per_sec * ess

    print(json.dumps({
        "metric": f"REFERENCE effective samples/s (torch cpu), "
                  f"{args.lat}x{args.lat} phi^4",
        "value": round(eff, 3),
        "unit": "eff_samples/s",
        "raw_samples_per_sec": round(samples_per_sec, 2),
        "ess": round(ess, 4),
        "train_time_s": round(train_time, 1),
    }))


if __name__ == "__main__":
    main()
