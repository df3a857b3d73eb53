"""Annealed-action training: approach criticality in stages.

Reverse-KL training at criticality fights mode structure from step one;
annealing trains first on an easier (more massive) target and walks
``m_sq`` to the critical value, spending the cosine-annealed polish phase
on the true target.  Equal TOTAL epoch budget vs the flagship protocol.

    python scripts/exp_anneal.py --stages='-2.2:4000,-2.3:4000,-2.4:16000'
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
    p.add_argument("--stages", default="-2.2:4000,-2.3:4000,-2.4:16000",
                   help="comma-separated m_sq:epochs (pass with '='; the "
                        "last stage is the target)")
    p.add_argument("--train_batch", type=int, default=512)
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--sample_iters", type=int, default=400)
    p.add_argument("--steps_per_call", type=int, default=1000)
    p.add_argument("--lat", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--lr", type=float, default=3e-3)
    p.add_argument("--tag", default="anneal")
    args = p.parse_args()

    import optax

    from normflow__tpu.zoo import build_phi4_model
    from normflow__tpu.models.actions import ScalarPhi4Action
    from normflow__tpu.training.losses import calc_ess
    from normflow__tpu.mcmc import estimate_accept_rate

    stages = [(float(s.split(":")[0]), int(s.split(":")[1]))
              for s in args.stages.split(",")]
    model = build_phi4_model((args.lat, args.lat), seed=args.seed)

    t0 = time.time()
    for i, (m_sq, epochs) in enumerate(stages):
        last = i == len(stages) - 1
        model.action = ScalarPhi4Action(kappa=0.6, m_sq=m_sq, lambd=0.5)
        sched = (optax.cosine_decay_schedule(1.0, decay_steps=epochs,
                                             alpha=0.05)
                 if last else None)  # constant lr during the walk-in
        model.fit(n_epochs=epochs, batch_size=args.train_batch,
                  hyperparam=dict(lr=args.lr, weight_decay=1e-4),
                  scheduler=sched, steps_per_call=args.steps_per_call,
                  grad_estimator="path", clip_grad_norm=25.0,
                  checkpoint_dict=dict(print_stride=None))
    train_time = time.time() - t0

    key = jax.random.key(args.seed + 1)
    _, k2 = jax.random.split(key)
    logqp = model.posterior.logqp_stream(args.sample_iters, args.batch,
                                         key=k2)
    jax.block_until_ready(logqp)
    t1 = time.time()
    logqp = model.posterior.logqp_stream(args.sample_iters, args.batch,
                                         key=k2)
    jax.block_until_ready(logqp)
    sps = args.sample_iters * args.batch / (time.time() - t1)

    ess = float(calc_ess(logqp, 0.0))
    accept, _ = estimate_accept_rate(jax.device_get(logqp))
    print(json.dumps({
        "tag": args.tag, "stages": args.stages.split(","),
        "train_time_s": round(train_time, 1),
        "raw_samples_per_sec": round(sps, 1),
        "ess": round(ess, 4), "accept": round(accept, 4),
        "eff_per_s": round(sps * ess, 1),
    }))


if __name__ == "__main__":
    main()
