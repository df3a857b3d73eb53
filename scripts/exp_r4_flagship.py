"""Round-4 flagship convergence campaign (VERDICT r3 item 1).

Questions this answers, under a drift-immune protocol:
 (a) is the 24k-epoch official protocol leaving ESS on the table?
     (arms: 24k vs 48k vs 96k epochs at the fixed flagship architecture)
 (b) capacity-at-convergence: do 6 layers / 16 knots win once the
     optimization limit is lifted?  (arms: 6L@48k, 16-knot@48k -- every
     prior capacity negative was at <=24k epochs where deep flows are
     optimization-limited, docs/EXPERIMENTS.md 6-cycle U(1) finding)

Protocol: train every arm first (deterministic seed; ESS is trajectory-
deterministic), then time ALL arms with INTERLEAVED repetitions in one
session (raw throughput drifts +-20% minute-to-minute with tunnel/host
contention -- only interleaved A/B raw readings are comparable, see the
drift policy at the top of docs/EXPERIMENTS.md).  Each arm's trained net
is snapshotted so later experiments (64x64 transfer, VERDICT item 3)
reuse the coarse flows without retraining.

    python scripts/exp_r4_flagship.py --out runs/r4_flagship.jsonl
"""

import argparse
import json
import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")

ARMS = [
    # name, n_layers, knots, epochs
    ("e24_L4_k12", 4, 12, 24000),   # round-3 official protocol
    ("e48_L4_k12", 4, 12, 48000),   # the promised 48k official arm
    ("e96_L4_k12", 4, 12, 96000),   # convergence probe
    ("e192_L4_k12", 4, 12, 192000),  # one more doubling past the 96k official
    ("e48_L6_k12", 6, 12, 48000),   # capacity-at-convergence: depth
    ("e48_L4_k16", 4, 16, 48000),   # capacity-at-convergence: knots
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arms", nargs="*", default=None,
                   help="subset of arm names to run (default: all)")
    p.add_argument("--train_batch", type=int, default=512)
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--sample_iters", type=int, default=400)
    p.add_argument("--steps_per_call", type=int, default=1000)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--max_epochs", type=int, default=None,
                   help="cap every arm's epochs (CPU smoke tests)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--snapshot_dir", default="runs/r4_flagship")
    p.add_argument("--out", default="runs/r4_flagship.jsonl")
    args = p.parse_args()

    import optax

    from normflow__tpu.mcmc import estimate_accept_rate
    from normflow__tpu.training.checkpoint import save_snapshot
    from normflow__tpu.training.losses import calc_ess
    from normflow__tpu.zoo import build_phi4_model, with_conv_compute_dtype

    arms = [a for a in ARMS if args.arms is None or a[0] in args.arms]
    os.makedirs(args.snapshot_dir, exist_ok=True)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)

    # ---- phase 1: train every arm (ESS is seed-deterministic) ---------- #
    models, train_s = {}, {}
    for name, n_layers, knots, epochs in arms:
        if args.max_epochs is not None:
            epochs = min(epochs, args.max_epochs)
        print(f"[r4] training {name} ...", flush=True)
        m = build_phi4_model((32, 32), seed=args.seed, n_layers=n_layers,
                             knots=knots)
        t0 = time.time()
        m.fit(n_epochs=epochs, batch_size=args.train_batch,
              hyperparam=dict(lr=3e-3, weight_decay=1e-4),
              scheduler=optax.cosine_decay_schedule(
                  1.0, decay_steps=epochs, alpha=0.05),
              steps_per_call=args.steps_per_call,
              grad_estimator="path", clip_grad_norm=25.0,
              checkpoint_dict=dict(print_stride=None))
        train_s[name] = round(time.time() - t0, 1)
        models[name] = m
        save_snapshot(os.path.join(args.snapshot_dir, f"{name}.msgpack"),
                      net=m.net_)
        print(f"[r4] {name} trained in {train_s[name]} s", flush=True)

    # ---- phase 2: interleaved sampling A/B across ALL arms ------------- #
    # bf16-conditioner sampling arm (the official winner); logqp stream is
    # key-deterministic so ESS/accept come from the same programs we time.
    nets = {n: with_conv_compute_dtype(m.net_, "bfloat16")
            for n, m in models.items()}
    key = jax.random.key(args.seed + 1)
    _, k2 = jax.random.split(key)
    times = {n: [] for n in nets}
    logqp = {}
    for n, m in models.items():  # compile/warmup every program first
        m.net_ = nets[n]
        logqp[n] = m.posterior.logqp_stream(args.sample_iters, args.batch,
                                            key=k2)
        jax.block_until_ready(logqp[n])
    for rep in range(args.reps):
        for n, m in models.items():
            t0 = time.time()
            logqp[n] = m.posterior.logqp_stream(args.sample_iters,
                                                args.batch, key=k2)
            jax.block_until_ready(logqp[n])
            times[n].append(time.time() - t0)

    # ---- report --------------------------------------------------------- #
    n_per = args.sample_iters * args.batch
    results = []
    with open(args.out, "a") as f:
        for name, n_layers, knots, epochs in arms:
            med = float(np.median(times[name]))
            ess = float(calc_ess(logqp[name], 0.0))
            accept, _ = estimate_accept_rate(jax.device_get(logqp[name]))
            row = dict(arm=name, n_layers=n_layers, knots=knots,
                       epochs=epochs, train_s=train_s[name],
                       raw_per_s=round(n_per / med, 1), ess=round(ess, 4),
                       accept=round(accept, 4),
                       eff_per_s=round(n_per / med * ess, 1),
                       times_s=[round(t, 4) for t in times[name]])
            results.append(row)
            f.write(json.dumps(row) + "\n")
    print(json.dumps(dict(tag="r4_flagship", seed=args.seed,
                          batch=args.batch, reps=args.reps, arms=results)))


if __name__ == "__main__":
    main()
