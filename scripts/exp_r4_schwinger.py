"""On-chip benchmark for the Schwinger model (U(1) + staggered fermions).

The reference sketches this action but it is non-functional there
(reference schwinger_action.py, SURVEY §2.14.2); here the exact staggered
log-det (models/fermions.py) trains end-to-end, so this records the first
measured Schwinger numbers for either framework: raw/effective sampling
rate, ESS, accept, ⟨cos P⟩, σ(Q) — plus a pure-gauge control at the same
β/architecture so the fermion determinant's train/sample cost is isolated.

Protocol mirrors the U(1) bench (exp_u1_bench.py): path-gradient reverse
KL, cosine decay, clip 25; sampling raw rates are timed with INTERLEAVED
reps across the fermion/pure-gauge arms (drift policy,
docs/EXPERIMENTS.md).

    python scripts/exp_r4_schwinger.py --out runs/r4_schwinger.jsonl
"""

import argparse
import json
import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--lat", type=int, default=8)
    p.add_argument("--beta", type=float, default=2.0)
    p.add_argument("--mass", type=float, default=0.2)
    p.add_argument("--train_epochs", type=int, default=8000)
    p.add_argument("--train_batch", type=int, default=256)
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--sample_iters", type=int, default=200)
    p.add_argument("--steps_per_call", type=int, default=250)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--n_cycles", type=int, default=2)
    p.add_argument("--knots_len", type=int, default=8)
    p.add_argument("--hidden", type=int, nargs="*", default=[16])
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--out", default="runs/r4_schwinger.jsonl")
    p.add_argument("--platform", default=None,
                   help="force a jax platform (e.g. 'cpu' for smoke tests)")
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import optax
    from scipy import special

    import normflow__tpu as nf
    from normflow__tpu.mcmc import estimate_accept_rate
    from normflow__tpu.models.fermions import SchwingerAngleAction
    from normflow__tpu.models.gauge import (U1AngleAction,
                                            build_u1_gauge_flow,
                                            u1_plaq_angle)
    from normflow__tpu.training.losses import calc_ess

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    lat = (args.lat, args.lat)

    def build(action, seed):
        flow = build_u1_gauge_flow(jax.random.key(seed), lat,
                                   knots_len=args.knots_len,
                                   hidden=tuple(args.hidden),
                                   n_cycles=args.n_cycles)
        prior = nf.prior.UniformPrior.build(
            low=-np.pi * np.ones((2, *lat)), high=np.pi * np.ones((2, *lat)))
        return nf.Model(net_=flow, prior=prior, action=action, seed=seed)

    arms = {
        "schwinger": build(SchwingerAngleAction(
            beta=args.beta, lat_shape=lat, mass=args.mass, n_copies=1),
            args.seed),
        "pure_gauge": build(U1AngleAction(beta=args.beta), args.seed),
    }

    train_s = {}
    for name, model in arms.items():
        print(f"[r4-schwinger] training {name} ...", flush=True)
        t0 = time.time()
        model.fit(n_epochs=args.train_epochs, batch_size=args.train_batch,
                  hyperparam=dict(lr=args.lr, weight_decay=0.0),
                  scheduler=optax.cosine_decay_schedule(
                      1.0, decay_steps=args.train_epochs, alpha=0.1),
                  steps_per_call=args.steps_per_call,
                  grad_estimator="path", clip_grad_norm=25.0,
                  checkpoint_dict=dict(print_stride=None))
        train_s[name] = round(time.time() - t0, 1)

    # interleaved raw-rate measurement across both arms
    kq = jax.random.key(args.seed + 1)
    times = {n: [] for n in arms}
    logqp = {}
    for n, m in arms.items():  # compile/warmup
        logqp[n] = m.posterior.logqp_stream(args.sample_iters, args.batch,
                                            key=kq)
        jax.block_until_ready(logqp[n])
    for _ in range(args.reps):
        for n, m in arms.items():
            t0 = time.time()
            logqp[n] = m.posterior.logqp_stream(args.sample_iters,
                                                args.batch, key=kq)
            jax.block_until_ready(logqp[n])
            times[n].append(time.time() - t0)

    n_per = args.sample_iters * args.batch
    exact_pure = float(special.iv(1, args.beta) / special.iv(0, args.beta))
    out = dict(tag="r4_schwinger", lat=args.lat, beta=args.beta,
               mass=args.mass, n_cycles=args.n_cycles,
               knots_len=args.knots_len, train_epochs=args.train_epochs,
               cos_plaq_exact_pure_gauge=round(exact_pure, 4))
    for n, m in arms.items():
        ess = float(calc_ess(logqp[n], 0.0))
        accept, _ = estimate_accept_rate(jax.device_get(logqp[n]))
        sps = n_per / float(np.median(times[n]))
        chain = m.mcmc.sample_chain(16, args.batch, collect_samples=True)
        theta = np.asarray(chain["samples"]).reshape(-1, 2, *lat)
        pang = np.asarray(u1_plaq_angle(jax.numpy.asarray(theta)))
        q = pang.sum(axis=(1, 2)) / (2 * np.pi)
        out[n] = dict(
            train_s=train_s[n], raw_per_s=round(sps, 1),
            ess=round(ess, 4), accept=round(accept, 4),
            eff_per_s=round(sps * ess, 1),
            cos_plaq=round(float(np.cos(pang).mean()), 4),
            topo_q_std=round(float(q.std()), 3),
            mcmc_accept=round(float(np.asarray(chain["accept_rate"]).mean()),
                              4))
    with open(args.out, "a") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
