"""Round-4 U(1) campaign: epochs-vs-variance grid + annealing arm
(VERDICT r3 item 2).

The round-3 seed studies found huge training-trajectory variance at the
24k-epoch protocol (4-cycle ESS 0.009-0.43, 2-cycle 0.076-0.115 across
seeds) and hypothesized "the gauge protocol needs epochs, not capacity" --
but never ran the longer-epoch study.  This runs it: a seeds x cycles x
epochs grid (ESS is trajectory-deterministic so every cell is exact), plus
a beta-annealing variance-reduction arm (walk beta 1.0 -> 2.0 during
training: the gauge loss landscape is where the multimodality lives, so
the phi^4 anneal negative does not transfer).

Raw sampling rate is ARCHITECTURE-only (stripe-restricted spline: 2 cycles
~347k/s, 4 cycles ~183k/s), so it is measured once per architecture with
interleaved reps at the end; per-run eff/s = raw(arch) x ESS(run).
Results stream to --out as JSONL (crash-safe).

    python scripts/exp_r4_u1.py --out runs/r4_u1.jsonl
"""

import argparse
import json
import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")

# (name, n_cycles, epochs, seeds, anneal)
GRID = [
    ("c2_e24", 2, 24000, (0, 1, 2), False),
    ("c2_e48", 2, 48000, (0, 1, 2), False),
    ("c2_e96", 2, 96000, (0, 1, 2), False),
    ("c4_e24", 4, 24000, (0, 1, 2), False),
    ("c4_e48", 4, 48000, (0, 1, 2), False),
    ("c4_e96", 4, 96000, (0,), False),
    ("c2_e48_anneal", 2, 48000, (0, 1, 2), True),
    # confirmation seeds for the two finalist arms of the main grid
    ("c2_e96_s34", 2, 96000, (3, 4), False),
    ("c4_e24_s34", 4, 24000, (3, 4), False),
]


def train(model, epochs, batch, lr, steps_per_call, anneal, beta,
          clip=25.0):
    """Standard U(1) protocol (exp_u1_bench.py), optionally beta-annealed:
    constant-lr walk-in at beta {1.0, 1.5} for the first half, cosine
    polish at the target beta for the second half (equal total epochs)."""
    import optax

    from normflow__tpu.models.gauge import U1AngleAction

    common = dict(batch_size=batch, grad_estimator="path",
                  clip_grad_norm=clip, steps_per_call=steps_per_call,
                  checkpoint_dict=dict(print_stride=None))
    if not anneal:
        model.fit(n_epochs=epochs, hyperparam=dict(lr=lr, weight_decay=0.0),
                  scheduler=optax.cosine_decay_schedule(
                      1.0, decay_steps=epochs, alpha=0.1), **common)
        return
    stage = epochs // 4
    for b in (1.0, 1.5):
        model.action = U1AngleAction(beta=b)
        model.fit(n_epochs=stage, hyperparam=dict(lr=lr, weight_decay=0.0),
                  **common)
    model.action = U1AngleAction(beta=beta)
    model.fit(n_epochs=epochs - 2 * stage,
              hyperparam=dict(lr=lr, weight_decay=0.0),
              scheduler=optax.cosine_decay_schedule(
                  1.0, decay_steps=epochs - 2 * stage, alpha=0.1), **common)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arms", nargs="*", default=None,
                   help="subset of GRID names (default: all)")
    p.add_argument("--lat", type=int, default=16)
    p.add_argument("--beta", type=float, default=2.0)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--clip", type=float, default=25.0,
                   help="grad-norm clip for every arm run (mechanism probes)")
    p.add_argument("--train_batch", type=int, default=256)
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--sample_iters", type=int, default=200)
    p.add_argument("--steps_per_call", type=int, default=500)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--max_epochs", type=int, default=None)
    p.add_argument("--out", default="runs/r4_u1.jsonl")
    p.add_argument("--platform", default=None,
                   help="force a jax platform (e.g. 'cpu' for smoke tests)")
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

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
    last_model = {}   # n_cycles -> a trained model (for interleaved raw)
    logqp_of = {}     # (name, seed) -> logqp stream (key-deterministic)
    rows = []
    for name, n_cycles, epochs, seeds, anneal in grid:
        if args.max_epochs is not None:
            epochs = min(epochs, args.max_epochs)
        for seed in seeds:
            print(f"[r4-u1] {name} seed {seed} ...", flush=True)
            model = build_u1_model(lat, beta=args.beta, seed=seed,
                                   n_cycles=n_cycles)
            t0 = time.time()
            train(model, epochs, args.train_batch, args.lr,
                  args.steps_per_call, anneal, args.beta,
                  clip=args.clip)
            train_s = round(time.time() - t0, 1)

            logqp = model.posterior.logqp_stream(args.sample_iters,
                                                 args.batch, key=kq)
            ess = float(calc_ess(logqp, 0.0))
            accept, _ = estimate_accept_rate(jax.device_get(logqp))

            # exactness check from the Metropolis chain (cheap, per run)
            out = model.mcmc.sample_chain(8, args.batch,
                                          collect_samples=True)
            theta = np.asarray(out["samples"]).reshape(-1, 2, *lat)
            pang = np.asarray(u1_plaq_angle(jax.numpy.asarray(theta)))
            cosp = float(np.cos(pang).mean())
            q_std = float((pang.sum(axis=(1, 2)) / (2 * np.pi)).std())

            row = dict(arm=name, n_cycles=n_cycles, epochs=epochs,
                       clip=args.clip,
                       seed=seed, anneal=anneal, train_s=train_s,
                       ess=round(ess, 4), accept=round(accept, 4),
                       cos_plaq=round(cosp, 4),
                       cos_plaq_exact=round(exact, 4),
                       topo_q_std=round(q_std, 3))
            rows.append(row)
            with open(args.out, "a") as f:
                f.write(json.dumps(row) + "\n")
            print(f"[r4-u1] {json.dumps(row)}", flush=True)
            last_model[n_cycles] = model
            logqp_of[(name, seed)] = logqp

    # ---- interleaved raw-rate measurement, one per architecture -------- #
    times = {c: [] for c in last_model}
    for c, m in last_model.items():  # warmup (programs already compiled)
        jax.block_until_ready(
            m.posterior.logqp_stream(args.sample_iters, args.batch, key=kq))
    for _ in range(args.reps):
        for c, m in last_model.items():
            t0 = time.time()
            jax.block_until_ready(m.posterior.logqp_stream(
                args.sample_iters, args.batch, key=kq))
            times[c].append(time.time() - t0)
    n_per = args.sample_iters * args.batch
    raw = {c: round(n_per / float(np.median(t)), 1)
           for c, t in times.items()}
    for row in rows:
        row["raw_per_s"] = raw[row["n_cycles"]]
        row["eff_per_s"] = round(raw[row["n_cycles"]] * row["ess"], 1)

    with open(args.out, "a") as f:
        f.write(json.dumps(dict(tag="r4_u1_summary", raw_per_s=raw,
                                rows=rows)) + "\n")
    print(json.dumps(dict(tag="r4_u1", raw_per_s=raw, rows=rows)))


if __name__ == "__main__":
    main()
