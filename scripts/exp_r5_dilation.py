"""Round-5 ESS-ceiling attempt: dilated conditioner convolutions
(VERDICT r4 item 5).

Every per-site capacity axis (depth, width, knots, capacity-at-64x64) is
measured dead at convergence, asymptoting the 4L/12-knot flagship at ESS
~0.75.  This probes an orthogonal axis the reference never exposes:
conditioner RECEPTIVE FIELD via kernel dilation (models/nets.py round 5).
The flagship conditioner stack (3x 3x3 convs on the packed grid) sees a
radius-3 packed neighborhood; dilations (1,2,2) widen it to radius 5 and
(1,2,4) to radius 7 at ZERO extra parameters or MACs -- if the ceiling is
set by the conditioner not seeing far enough (the phi^4 correlation
length at these couplings spans several sites), this lifts it; if ESS
stays at the asymptote, locality is not the binding constraint and the
negative closes the axis.

Protocol: identical to the official 96k-epoch flagship campaign; the
undilated control arm bit-matches exp_r5_knots' e96_L4_k12 (same seed,
same math), so its presence here is a cross-campaign determinism check
AND the interleaved raw-rate reference for the dilated arms.

    python scripts/exp_r5_dilation.py --out runs/r5_dilation.jsonl
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
    # name, conv_dilations, epochs
    ("e96_dil111", None, 96000),        # control == e96_L4_k12
    ("e96_dil122", (1, 2, 2), 96000),
    ("e96_dil124", (1, 2, 4), 96000),
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
    p.add_argument("--knots", type=int, default=12)
    p.add_argument("--control_snapshot", default=None,
                   help="trained snapshot for the UNDILATED control arm "
                        "(exp_r5_knots e96_L4_k12 -- the identical "
                        "seed/math trajectory); loading it skips the "
                        "880 s retrain while keeping the control in the "
                        "interleaved sampling A/B")
    p.add_argument("--snapshot_dir", default="runs/r5_dilation")
    p.add_argument("--out", default="runs/r5_dilation.jsonl")
    p.add_argument("--platform", default=None)
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

    models, train_s = {}, {}
    for name, dil, epochs in arms:
        if args.max_epochs is not None:
            epochs = min(epochs, args.max_epochs)
        m = build_phi4_model((32, 32), seed=args.seed, n_layers=4,
                             knots=args.knots, conv_dilations=dil)
        if dil is None and args.control_snapshot:
            from normflow__tpu.training.checkpoint import load_snapshot

            print(f"[r5-dil] loading control {name} from "
                  f"{args.control_snapshot}", flush=True)
            m.net_, _, _, _ = load_snapshot(args.control_snapshot,
                                            net=m.net_)
            train_s[name] = 0.0
            models[name] = m
            continue
        print(f"[r5-dil] training {name} ...", flush=True)
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
        print(f"[r5-dil] {name} trained in {train_s[name]} s", flush=True)

    nets = {n: with_conv_compute_dtype(m.net_, "bfloat16")
            for n, m in models.items()}
    key = jax.random.key(args.seed + 1)
    _, k2 = jax.random.split(key)
    times = {n: [] for n in nets}
    logqp = {}
    for n, m in models.items():
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

    n_per = args.sample_iters * args.batch
    results = []
    with open(args.out, "a") as f:
        for name, dil, epochs in arms:
            med = float(np.median(times[name]))
            ess = float(calc_ess(logqp[name], 0.0))
            accept, _ = estimate_accept_rate(jax.device_get(logqp[name]))
            row = dict(arm=name, dilations=list(dil) if dil else None,
                       epochs=epochs, train_s=train_s[name],
                       raw_per_s=round(n_per / med, 1), ess=round(ess, 4),
                       accept=round(accept, 4),
                       eff_per_s=round(n_per / med * ess, 1),
                       times_s=[round(t, 4) for t in times[name]])
            results.append(row)
            f.write(json.dumps(row) + "\n")
    print(json.dumps(dict(tag="r5_dilation", seed=args.seed,
                          batch=args.batch, reps=args.reps, arms=results)))


if __name__ == "__main__":
    main()
