"""Round-2 experiment: does parameter averaging (tail average / per-segment
EMA) improve final ESS over the last iterate, at zero sampling cost?

Trains the flagship with the path estimator via the Fitter's scanned
multi-step segments, accumulating (a) a uniform average over the last
--swa_frac of segments ("tail"/SWA) and (b) an exponential moving average
(per-step decay --ema_decay, folded per segment), then measures ESS of each
parameter set on the same logqp stream.

    python scripts/exp_swa.py --train_epochs 24000
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
    p.add_argument("--train_epochs", type=int, default=24000)
    p.add_argument("--train_batch", type=int, default=512)
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--sample_iters", type=int, default=50)
    p.add_argument("--seg", type=int, default=1000)
    p.add_argument("--swa_frac", type=float, default=0.25)
    p.add_argument("--ema_decay", type=float, default=0.9995)
    p.add_argument("--lat", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--lr", type=float, default=3e-3)
    p.add_argument("--tag", default="swa")
    p.add_argument("--probe_every", type=int, default=0,
                   help="if >0, measure ESS of the current params every N "
                        "segments (small stream) to localize instabilities")
    p.add_argument("--clip", type=float, default=0.0,
                   help="if >0, clip the global gradient norm")
    args = p.parse_args()

    import optax

    sys.path.insert(0, ".")
    from __graft_entry__ import _flagship_model

    model = _flagship_model(lat_shape=(args.lat, args.lat), seed=args.seed)
    fit = model.fit
    fit.hyperparam.update(lr=args.lr, weight_decay=1e-4)
    fit.grad_estimator = "path"
    sched = optax.cosine_decay_schedule(
        1.0, decay_steps=args.train_epochs, alpha=0.05)
    fit.optimizer = fit._build_optimizer("adamw", sched, None)
    if args.clip > 0:
        fit.optimizer = optax.chain(
            optax.clip_by_global_norm(args.clip), fit.optimizer)
    fit.opt_state = fit.optimizer.init(model.net_)
    fit._make_step_fn()
    multi = fit._multi_step_fn

    from normflow__tpu.training.losses import calc_ess

    if args.train_epochs % args.seg:
        raise SystemExit("--train_epochs must be a multiple of --seg "
                         "(otherwise the cosine schedule endpoint and the "
                         "reported epoch count would not match what ran)")
    n_segs = args.train_epochs // args.seg
    tail_from = int(np.floor((1.0 - args.swa_frac) * n_segs))
    w_seg = args.ema_decay ** args.seg

    axpy = jax.jit(lambda a, x, b, y: jax.tree_util.tree_map(
        lambda u, v: a * u + b * v, x, y))

    net = model.net_
    ema = net
    tail = None
    n_tail = 0
    all_losses = []
    t0 = time.time()
    for s in range(n_segs):
        net, fit.opt_state, losses = multi(
            net, fit.opt_state, model.next_key(), args.train_batch, args.seg)
        losses = np.asarray(jax.device_get(losses))
        all_losses.append(losses)
        ema = axpy(w_seg, ema, 1.0 - w_seg, net)
        if s >= tail_from:
            if tail is None:
                tail = net
            else:
                tail = axpy(n_tail / (n_tail + 1), tail,
                            1.0 / (n_tail + 1), net)
            n_tail += 1
        if args.probe_every and (s + 1) % args.probe_every == 0:
            model.net_ = net
            lqp = model.posterior.logqp_stream(
                5, args.batch, key=jax.random.key(1000 + s))
            print(json.dumps({
                "seg": s + 1, "epoch": (s + 1) * args.seg,
                "loss_mean": round(float(losses.mean()), 4),
                "loss_last": round(float(losses[-1]), 4),
                "loss_max": round(float(losses.max()), 4),
                "nan_steps": int(np.sum(~np.isfinite(losses))),
                "probe_ess": round(float(calc_ess(lqp, 0.0)), 4),
            }), flush=True)
    jax.block_until_ready(jax.tree_util.tree_leaves(net)[0])
    train_time = time.time() - t0
    np.save(f"/tmp/losses_{args.tag}.npy", np.concatenate(all_losses))

    from normflow__tpu.mcmc import estimate_accept_rate

    key = jax.random.key(args.seed + 1)
    out = {"tag": args.tag, "train_epochs": args.train_epochs,
           "train_time_s": round(train_time, 1),
           "ms_per_step": round(1000 * train_time / args.train_epochs, 2)}
    for name, params in (("final", net), ("ema", ema), ("tail", tail)):
        model.net_ = params
        logqp = model.posterior.logqp_stream(
            args.sample_iters, args.batch, key=key)
        acc, acc_err = estimate_accept_rate(jax.device_get(logqp))
        out[f"ess_{name}"] = round(float(calc_ess(logqp, 0.0)), 4)
        out[f"accept_{name}"] = round(acc, 4)
        print(json.dumps({k: out[k] for k in
                          (f"ess_{name}", f"accept_{name}")}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
