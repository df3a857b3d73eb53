"""Flagship-candidate combo A/B: train several (hidden, dc_knots) configs
in one process, interleave the bf16 sampling arms (trustworthy ranking).

    python scripts/exp_combo.py --configs 16:16 24:16 24:32
"""

import argparse
import json
import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--configs", nargs="*", default=["16:16", "24:16",
                                                    "24:32"],
                   help="hidden_width:dc_knots per arm")
    p.add_argument("--train_epochs", type=int, default=24000)
    p.add_argument("--train_batch", type=int, default=512)
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--sample_iters", type=int, default=400)
    p.add_argument("--steps_per_call", type=int, default=1000)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--lat", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import optax

    from normflow__tpu.zoo import build_phi4_model, with_conv_compute_dtype
    from normflow__tpu.training.losses import calc_ess
    from normflow__tpu.mcmc import estimate_accept_rate

    models = {}
    for cfg in args.configs:
        w, dck = (int(v) for v in cfg.split(":"))
        model = build_phi4_model((args.lat, args.lat), seed=args.seed,
                                 hidden=(w, w), dc_knots=dck)
        model.fit(n_epochs=args.train_epochs, batch_size=args.train_batch,
                  hyperparam=dict(lr=3e-3, weight_decay=1e-4),
                  scheduler=optax.cosine_decay_schedule(
                      1.0, decay_steps=args.train_epochs, alpha=0.05),
                  steps_per_call=args.steps_per_call,
                  grad_estimator="path", clip_grad_norm=25.0,
                  checkpoint_dict=dict(print_stride=None))
        model.net_ = with_conv_compute_dtype(model.net_, "bfloat16")
        models[f"h{w}dc{dck}"] = model
        print(json.dumps({"trained": f"h{w}dc{dck}"}), flush=True)

    key = jax.random.key(args.seed + 1)
    _, k2 = jax.random.split(key)
    logqp_by, times = {}, {k: [] for k in models}
    for k, m in models.items():  # compile
        logqp_by[k] = m.posterior.logqp_stream(args.sample_iters,
                                               args.batch, key=k2)
        jax.block_until_ready(logqp_by[k])
    for _ in range(args.reps):
        for k, m in models.items():
            t0 = time.time()
            logqp_by[k] = m.posterior.logqp_stream(args.sample_iters,
                                                   args.batch, key=k2)
            jax.block_until_ready(logqp_by[k])
            times[k].append(time.time() - t0)

    out = {}
    n_per = args.sample_iters * args.batch
    for k in models:
        sps = n_per / float(np.median(times[k]))
        ess = float(calc_ess(logqp_by[k], 0.0))
        accept, _ = estimate_accept_rate(jax.device_get(logqp_by[k]))
        out[k] = {"samples_per_s": round(sps, 1), "ess": round(ess, 4),
                  "accept": round(accept, 4),
                  "eff_per_s": round(sps * ess, 1)}
        print(json.dumps({k: out[k]}), flush=True)
    print(json.dumps({"summary": out}))


if __name__ == "__main__":
    main()
