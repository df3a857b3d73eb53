"""Round-5 U(1) divergence-guard campaign (VERDICT r4 item 6).

Round 4 established that every training collapse in the gauge campaign is
a 2-CYCLE flow at >=48k epochs (4 of 14 such trajectories: c2_e48 seeds
1/2, c2_e96 seeds 3/4), with a signature the per-step NaN guard cannot
catch: a FINITE loss spiral followed by accept ~1e-4 and unphysical
<cos P> < 0.  Tight grad clipping (3) rescued only one of two probed
collapses and hurts healthy runs.

This campaign re-runs the collapsing arms with the round-5 Fitter
safeguard armed (``rewind_on_spike``): a segment whose median loss jumps
past best-so-far + threshold rewinds net AND optimizer state to the last
healthy snapshot and re-seeds the RNG stream.  Loss-spike triggering
fires earlier than an accept-rate trigger (no eval batch needed, the
spiral is visible in the per-segment loss medians the trainer already
collects) and is theory-agnostic.

Arms:
  c2_e96 seeds 0-4  (previously 2/5 collapsed: seeds 3, 4)
  c2_e48 seeds 1, 2 (the two known collapses; direct rescue check)

Done-criterion: 5/5 healthy seeds on c2_e96 (ESS > 0, accept >> 1e-3,
<cos P> at the exact value), plus rescue (or a recorded mechanism) on the
two c2_e48 collapses.

    python scripts/exp_r5_u1_guard.py --out runs/r5_u1_guard.jsonl
"""

import argparse
import json
import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")

# (name, n_cycles, epochs, seeds)
GRID = [
    ("c2_e96_guard", 2, 96000, (0, 1, 2, 3, 4)),
    ("c2_e48_guard", 2, 48000, (1, 2)),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arms", nargs="*", default=None)
    p.add_argument("--lat", type=int, default=16)
    p.add_argument("--beta", type=float, default=2.0)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--clip", type=float, default=25.0)
    p.add_argument("--spike", type=float, default=50.0,
                   help="rewind_on_spike threshold in loss units")
    p.add_argument("--lr_backoff", type=float, default=None,
                   help="rewind_lr_backoff factor (e.g. 0.5): shrink the "
                        "effective lr on every rewind -- the intervention "
                        "for landscape-walk collapses that re-enter the "
                        "spiral after a plain rewind+reseed")
    p.add_argument("--seeds", type=int, nargs="*", default=None,
                   help="restrict every arm to these seeds")
    p.add_argument("--train_batch", type=int, default=256)
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--sample_iters", type=int, default=200)
    p.add_argument("--steps_per_call", type=int, default=500)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--max_epochs", type=int, default=None)
    p.add_argument("--out", default="runs/r5_u1_guard.jsonl")
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import optax
    from scipy import special

    from normflow__tpu.mcmc import estimate_accept_rate
    from normflow__tpu.models.gauge import u1_plaq_angle
    from normflow__tpu.training.losses import calc_ess
    from normflow__tpu.zoo import build_u1_model

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    lat = (args.lat, args.lat)
    exact = float(special.iv(1, args.beta) / special.iv(0, args.beta))
    grid = [g for g in GRID if args.arms is None or g[0] in args.arms]

    kq = jax.random.key(1234)
    last_model = None
    rows = []
    for name, n_cycles, epochs, seeds in grid:
        if args.max_epochs is not None:
            epochs = min(epochs, args.max_epochs)
        if args.seeds is not None:
            seeds = tuple(s for s in seeds if s in args.seeds)
        for seed in seeds:
            print(f"[r5-u1] {name} seed {seed} ...", flush=True)
            model = build_u1_model(lat, beta=args.beta, seed=seed,
                                   n_cycles=n_cycles)
            t0 = time.time()
            hist = model.fit(
                n_epochs=epochs, batch_size=args.train_batch,
                hyperparam=dict(lr=args.lr, weight_decay=0.0),
                scheduler=optax.cosine_decay_schedule(
                    1.0, decay_steps=epochs, alpha=0.1),
                grad_estimator="path", clip_grad_norm=args.clip,
                steps_per_call=args.steps_per_call,
                rewind_on_spike=args.spike,
                rewind_lr_backoff=args.lr_backoff,
                checkpoint_dict=dict(print_stride=None))
            train_s = round(time.time() - t0, 1)

            logqp = model.posterior.logqp_stream(args.sample_iters,
                                                 args.batch, key=kq)
            ess = float(calc_ess(logqp, 0.0))
            accept, _ = estimate_accept_rate(jax.device_get(logqp))

            out = model.mcmc.sample_chain(8, args.batch,
                                          collect_samples=True)
            theta = np.asarray(out["samples"]).reshape(-1, 2, *lat)
            pang = np.asarray(u1_plaq_angle(jax.numpy.asarray(theta)))
            cosp = float(np.cos(pang).mean())
            q_std = float((pang.sum(axis=(1, 2)) / (2 * np.pi)).std())

            row = dict(arm=name, n_cycles=n_cycles, epochs=epochs,
                       clip=args.clip, spike=args.spike,
                       lr_backoff=args.lr_backoff, seed=seed,
                       train_s=train_s,
                       rewinds=hist.get("rewinds", []),
                       ess=round(ess, 4), accept=round(accept, 4),
                       cos_plaq=round(cosp, 4),
                       cos_plaq_exact=round(exact, 4),
                       topo_q_std=round(q_std, 3))
            rows.append(row)
            with open(args.out, "a") as f:
                f.write(json.dumps(row) + "\n")
            print(f"[r5-u1] {json.dumps(row)}", flush=True)
            last_model = model

    # interleaved raw rate (architecture-only; one arch in this grid)
    times = []
    jax.block_until_ready(last_model.posterior.logqp_stream(
        args.sample_iters, args.batch, key=kq))
    for _ in range(args.reps):
        t0 = time.time()
        jax.block_until_ready(last_model.posterior.logqp_stream(
            args.sample_iters, args.batch, key=kq))
        times.append(time.time() - t0)
    n_per = args.sample_iters * args.batch
    raw = round(n_per / float(np.median(times)), 1)
    for row in rows:
        row["raw_per_s"] = raw
        row["eff_per_s"] = round(raw * row["ess"], 1)

    with open(args.out, "a") as f:
        f.write(json.dumps(dict(tag="r5_u1_guard_summary", raw_per_s=raw,
                                rows=rows)) + "\n")
    print(json.dumps(dict(tag="r5_u1_guard", raw_per_s=raw, rows=rows)))


if __name__ == "__main__":
    main()
