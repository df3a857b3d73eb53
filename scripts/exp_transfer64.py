"""Coarse-to-fine transfer: train the 32x32 flagship, transfer the flow to
64x64 (spectral block via FFTFlow.transfer -- built for exactly this,
reference fftflow_.py:187-209; convs/DistConvertors are resolution-free;
the coupling just swaps its mask), fine-tune briefly, and measure.

Round-2 found 64x64 ESS collapses (0.65 -> 0.15) when trained from scratch
at the same architecture/protocol; this probes whether initializing from
the converged 32x32 flow recovers it cheaper/better (VERDICT item 4, arm ii).

    python scripts/exp_transfer64.py --ft_epochs 6000
"""

import argparse
import json
import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")


def measure(model, batch, iters, key):
    from normflow__tpu.training.losses import calc_ess
    from normflow__tpu.mcmc import estimate_accept_rate

    logqp = model.posterior.logqp_stream(iters, batch, key=key)
    jax.block_until_ready(logqp)
    t0 = time.time()
    logqp = model.posterior.logqp_stream(iters, batch, key=key)
    jax.block_until_ready(logqp)
    dt = time.time() - t0
    sps = iters * batch / dt
    ess = float(calc_ess(logqp, 0.0))
    accept, _ = estimate_accept_rate(jax.device_get(logqp))
    return dict(raw_per_s=round(sps, 1), ess=round(ess, 4),
                accept=round(accept, 4), eff_per_s=round(sps * ess, 1))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--coarse_epochs", type=int, default=24000)
    p.add_argument("--ft_epochs", type=int, default=6000)
    p.add_argument("--ft_lr", type=float, default=1e-3)
    p.add_argument("--n_layers", type=int, default=4,
                   help="coupling layers (capacity arm: deeper coarse flow "
                        "-> better per-site quality -> higher 64x64 ESS)")
    p.add_argument("--knots", type=int, default=12)
    p.add_argument("--bf16", action="store_true",
                   help="also measure with bf16 conditioner convs "
                        "(the official sampling arm)")
    p.add_argument("--train_batch", type=int, default=512)
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--sample_iters", type=int, default=100)
    p.add_argument("--steps_per_call", type=int, default=200)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tag", default="transfer64")
    p.add_argument("--platform", default=None,
                   help="force a jax platform (e.g. 'cpu' for smoke tests)")
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import optax

    from normflow__tpu.models import PackedEvenOddMask
    from normflow__tpu.zoo import build_phi4_model, with_conv_compute_dtype

    # -- phase 1: converge the 32x32 flagship (the cheap lattice) -------- #
    m32 = build_phi4_model((32, 32), seed=args.seed,
                           n_layers=args.n_layers, knots=args.knots)
    t0 = time.time()
    m32.fit(n_epochs=args.coarse_epochs, batch_size=args.train_batch,
            hyperparam=dict(lr=3e-3, weight_decay=1e-4),
            scheduler=optax.cosine_decay_schedule(
                1.0, decay_steps=args.coarse_epochs, alpha=0.05),
            steps_per_call=min(args.steps_per_call * 5, 1000),
            grad_estimator="path", clip_grad_norm=25.0,
            checkpoint_dict=dict(print_stride=None))
    t_coarse = time.time() - t0
    key = jax.random.key(args.seed + 1)
    k32, k64a, k64b = jax.random.split(key, 3)
    r32 = measure(m32, args.batch, args.sample_iters, k32)

    # -- phase 2: transfer 32x32 weights onto the 64x64 lattice ---------- #
    # same lattice spacing, 4x the volume: scale_factor=1 (the IPSD spline
    # input is k^2/k^2_max -- resolution free); only the static shapes move
    m64 = build_phi4_model((64, 64), seed=args.seed,
                           n_layers=args.n_layers, knots=args.knots)
    m64.net_ = m32.net_.transfer(
        shape=(64, 64), mask=PackedEvenOddMask(shape=(64, 64)))
    r64_zero = measure(m64, args.batch, args.sample_iters, k64a)

    # -- phase 3: brief fine-tune at 64x64 ------------------------------- #
    t0 = time.time()
    if args.ft_epochs > 0:
        m64.fit(n_epochs=args.ft_epochs, batch_size=args.train_batch,
                hyperparam=dict(lr=args.ft_lr, weight_decay=1e-4),
                scheduler=optax.cosine_decay_schedule(
                    1.0, decay_steps=args.ft_epochs, alpha=0.05),
                steps_per_call=args.steps_per_call,
                grad_estimator="path", clip_grad_norm=25.0,
                checkpoint_dict=dict(print_stride=None))
    t_ft = time.time() - t0
    r64 = measure(m64, args.batch, args.sample_iters, k64b)

    out = {
        "tag": args.tag, "coarse_epochs": args.coarse_epochs,
        "ft_epochs": args.ft_epochs, "ft_lr": args.ft_lr,
        "n_layers": args.n_layers, "knots": args.knots,
        "coarse_train_s": round(t_coarse, 1), "ft_train_s": round(t_ft, 1),
        "lat32": r32, "lat64_zeroshot": r64_zero, "lat64_finetuned": r64,
    }
    if args.bf16:
        m64.net_ = with_conv_compute_dtype(m64.net_, "bfloat16")
        out["lat64_bf16"] = measure(m64, args.batch, args.sample_iters,
                                    k64b)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
