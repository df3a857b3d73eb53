"""Round-2 experiment: path-gradient (STL) vs plain reparametrization on the
flagship 32x32 phi^4 flow.

Run ONE config per invocation (only one process may own the tunneled chip):

    python scripts/exp_pathgrad.py --grad_estimator path --train_epochs 6000

Prints a JSON line with ESS, accept rate, per-step train time, and raw
sampling throughput, for side-by-side comparison.
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--train_epochs", type=int, default=6000)
    p.add_argument("--train_batch", type=int, default=512)
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--sample_iters", type=int, default=50)
    p.add_argument("--steps_per_call", type=int, default=500)
    p.add_argument("--lat", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--grad_estimator", default="path")
    p.add_argument("--n_layers", type=int, default=4)
    p.add_argument("--lr", type=float, default=3e-3)
    p.add_argument("--alpha", type=float, default=0.05,
                   help="cosine-decay floor as a fraction of lr")
    p.add_argument("--knots", type=int, default=8)
    p.add_argument("--dc_knots", type=int, default=16)
    p.add_argument("--clip", type=float, default=0.0,
                   help="if >0, clip the global gradient norm")
    p.add_argument("--hidden", type=int, nargs="*", default=[16, 16])
    p.add_argument("--loss", default="kl",
                   help="'kl' or 'mixed:LAMBDA' (reverse KL + lambda * "
                        "self-normalized forward KL)")
    p.add_argument("--tag", default="")
    args = p.parse_args()

    import optax

    sys.path.insert(0, ".")
    from normflow__tpu.zoo import build_phi4_model

    model = build_phi4_model((args.lat, args.lat), seed=args.seed,
                             n_layers=args.n_layers, knots=args.knots,
                             dc_knots=args.dc_knots,
                             hidden=tuple(args.hidden))

    loss_fn = None
    if args.loss.startswith("mixed:"):
        lam = float(args.loss.split(":")[1])
        from normflow__tpu.training import losses as L

        def loss_fn(logq, logp, lam=lam):
            return (L.calc_kl_mean(logq, logp)
                    + lam * L.calc_direct_kl_mean(logq, logp))

    t0 = time.time()
    model.fit(n_epochs=args.train_epochs, batch_size=args.train_batch,
              loss_fn=loss_fn,
              hyperparam=dict(lr=args.lr, weight_decay=1e-4),
              scheduler=optax.cosine_decay_schedule(
                  1.0, decay_steps=args.train_epochs, alpha=args.alpha),
              steps_per_call=args.steps_per_call,
              grad_estimator=args.grad_estimator,
              clip_grad_norm=args.clip if args.clip > 0 else None,
              checkpoint_dict=dict(print_stride=None))
    train_time = time.time() - t0

    # sampling keeps the XLA backend (the round-2 A/B winner at knots=12)
    key = jax.random.key(args.seed + 1)
    k1, k2 = jax.random.split(key)
    logqp = model.posterior.logqp_stream(args.sample_iters, args.batch,
                                        key=k1)
    jax.block_until_ready(logqp)
    times = []
    for _ in range(3):
        t0 = time.time()
        logqp = model.posterior.logqp_stream(args.sample_iters, args.batch,
                                             key=k2)
        jax.block_until_ready(logqp)
        times.append(time.time() - t0)
    dt = float(np.median(times))
    samples_per_sec = args.sample_iters * args.batch / dt

    from normflow__tpu.training.losses import calc_ess
    from normflow__tpu.mcmc import estimate_accept_rate

    ess = float(calc_ess(logqp, 0.0))
    accept, accept_err = estimate_accept_rate(jax.device_get(logqp))
    print(json.dumps({
        "tag": args.tag or args.grad_estimator,
        "grad_estimator": args.grad_estimator,
        "train_epochs": args.train_epochs,
        "n_layers": args.n_layers,
        "knots": args.knots,
        "dc_knots": args.dc_knots,
        "clip": args.clip,
        "hidden": args.hidden,
        "batch": args.batch,
        "lr": args.lr,
        "train_time_s": round(train_time, 1),
        "ms_per_step": round(1000 * train_time / max(args.train_epochs, 1), 2),
        "raw_samples_per_sec": round(samples_per_sec, 1),
        "ess": round(ess, 4),
        "accept": round(accept, 4),
        "eff_per_s": round(samples_per_sec * ess, 1),
    }))


if __name__ == "__main__":
    main()
