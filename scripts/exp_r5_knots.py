"""Round-5 knots-at-convergence campaign — spending the MEASURED roofline.

The round-5 profiler trace (jax.profiler + xprof op_profile on the
production sampling program) killed the round-4 "HBM-bandwidth-bound"
reading: measured HBM utilization is ~2% (cost-analysis hbm_util 2.62 was
an overcount), MXU 15%, with everything VMEM-resident.  The program is
VPU-latency-bound, and the per-op attribution puts ~28% of device time in
the coupling's per-site KNOT construction (f32 [512,32,16,K] knot fusions
+ a 108 us/iter bf16->f32 layout copy of the 3K-2-channel conditioner
output) — all linear in knot count.  The conditioner convs (26%) already
run at 40-60% MXU during execution.

The one semantics-light lever that shrinks the measured hot path is the
coupling knot count.  Round-2 measured 8 knots losing ESS at 12k epochs —
an OPTIMIZATION-limited reading (same loophole the r4 convergence campaign
closed for depth/16-knots).  This campaign re-measures knots at the
CONVERGED 96k-epoch protocol:

    arms: 8 / 10 / 12 coupling knots, 4L, 96k epochs, path estimator,
    then interleaved bf16-arm sampling across all arms in one session.

Decision rule: effective rate (raw x ESS).  If k8/k10 hold ESS near the
0.72 asymptote, the ~15-25% raw gain flips the flagship default.

    python scripts/exp_r5_knots.py --out runs/r5_knots.jsonl
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
    ("e96_L4_k8", 4, 8, 96000),
    ("e96_L4_k10", 4, 10, 96000),
    ("e96_L4_k12", 4, 12, 96000),  # official protocol control (ESS 0.7219)
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arms", nargs="*", default=None)
    p.add_argument("--train_batch", type=int, default=512)
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--sample_iters", type=int, default=400)
    p.add_argument("--steps_per_call", type=int, default=1000)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--max_epochs", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--snapshot_dir", default="runs/r5_knots")
    p.add_argument("--out", default="runs/r5_knots.jsonl")
    p.add_argument("--platform", default=None,
                   help="force a jax platform (e.g. 'cpu' for smoke tests)")
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

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
        print(f"[r5] training {name} ...", flush=True)
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
        print(f"[r5] {name} trained in {train_s[name]} s", flush=True)

    # ---- phase 2: interleaved sampling A/B across ALL arms ------------- #
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
    print(json.dumps(dict(tag="r5_knots", seed=args.seed,
                          batch=args.batch, reps=args.reps, arms=results)))


if __name__ == "__main__":
    main()
