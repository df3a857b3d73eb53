"""Round-5 Schwinger scaling campaign: stochastic fermion gradients
(VERDICT r4 item 4).

Round 4 recorded the first trained Schwinger numbers (8x8, exact staggered
log-det) but the exact path is cubic in V.  Round 5 added the matrix-free
estimator (models/fermions.py StochasticStaggeredLogDet: Hutchinson probes
+ batched CG on the K = m^2 - H^2 stencil, unbiased GRADIENT surrogate,
keyed per train step by the Fitter).  This campaign:

 1. VALIDATES it end-to-end at 8x8: exact-train vs stochastic-train at the
    same protocol must land at statistically equal ESS / <cos P> / sigma(Q)
    (the unit suite already proves gradient unbiasedness at 4x4);
 2. MEASURES 16x16 and 24x24 Schwinger eff samples/s -- volumes where
    every training step with the dense determinant would be prohibitive.
    Sampling/ESS always uses the EXACT log-det (keyless action fallback),
    so Metropolis exactness is untouched; only training is stochastic.

Per-arm output: train time, stochastic vs exact step cost, raw/ESS/accept
/eff from exact-measure sampling, <cos P> and sigma(Q) vs the pure-gauge
values (the determinant must order the plaquette and suppress topology).

    python scripts/exp_r5_schwinger_scale.py --out runs/r5_schwinger.jsonl
"""

import argparse
import json
import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")

# (name, lat, estimator, train_epochs, train_batch, sample_iters, batch,
#  steps_per_call)
ARMS = [
    ("s8_exact", 8, "exact", 8000, 256, 200, 512, 250),
    ("s8_stoch", 8, "stoch", 8000, 256, 200, 512, 250),
    ("s16_stoch", 16, "stoch", 8000, 256, 100, 512, 100),
    ("s24_stoch", 24, "stoch", 8000, 256, 50, 256, 50),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arms", nargs="*", default=None)
    p.add_argument("--beta", type=float, default=2.0)
    p.add_argument("--mass", type=float, default=0.2)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--n_cycles", type=int, default=2)
    p.add_argument("--knots_len", type=int, default=8)
    p.add_argument("--hidden", type=int, nargs="*", default=[16])
    p.add_argument("--n_probes", type=int, default=2)
    p.add_argument("--cg_tol", type=float, default=1e-5)
    p.add_argument("--cg_maxiter", type=int, default=512)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--max_epochs", type=int, default=None)
    p.add_argument("--epochs", type=int, default=None,
                   help="override the per-arm epoch budget outright")
    p.add_argument("--out", default="runs/r5_schwinger.jsonl")
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import optax

    import normflow__tpu as nf
    from normflow__tpu.mcmc import estimate_accept_rate
    from normflow__tpu.models.fermions import (SchwingerAngleAction,
                                               StochasticStaggeredLogDet)
    from normflow__tpu.models.gauge import build_u1_gauge_flow, u1_plaq_angle
    from normflow__tpu.training.losses import calc_ess

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    arms = [a for a in ARMS if args.arms is None or a[0] in args.arms]
    kq = jax.random.key(1234)

    rows = []
    for (name, L, estimator, epochs, train_batch, sample_iters, batch,
         spc) in arms:
        if args.epochs is not None:
            epochs = args.epochs
        if args.max_epochs is not None:
            epochs = min(epochs, args.max_epochs)
        lat = (L, L)
        print(f"[r5-schwinger] {name} ...", flush=True)

        logdet = None
        if estimator == "stoch":
            logdet = StochasticStaggeredLogDet(
                lat_shape=lat, mass=args.mass, n_probes=args.n_probes,
                cg_tol=args.cg_tol, cg_maxiter=args.cg_maxiter)
        action = SchwingerAngleAction(beta=args.beta, lat_shape=lat,
                                      mass=args.mass, logdet_func=logdet)
        flow = build_u1_gauge_flow(jax.random.key(0), lat,
                                   knots_len=args.knots_len,
                                   hidden=tuple(args.hidden),
                                   n_cycles=args.n_cycles)
        prior = nf.prior.UniformPrior.build(
            low=-np.pi * np.ones((2, *lat)), high=np.pi * np.ones((2, *lat)))
        model = nf.Model(net_=flow, prior=prior, action=action, seed=0)

        t0 = time.time()
        model.fit(n_epochs=epochs, batch_size=train_batch,
                  hyperparam=dict(lr=args.lr, weight_decay=0.0),
                  scheduler=optax.cosine_decay_schedule(
                      1.0, decay_steps=epochs, alpha=0.1),
                  grad_estimator="path", clip_grad_norm=25.0,
                  steps_per_call=spc,
                  checkpoint_dict=dict(print_stride=None))
        train_s = round(time.time() - t0, 1)
        print(f"[r5-schwinger] {name} trained in {train_s} s", flush=True)

        # exact-measure sampling (keyless action -> exact log-det).
        # A DISTINCT key per timed rep: re-running one executable on the
        # bit-identical input buffers returned in ~0 ms on the tunneled
        # runtime (s24 arm, round 5 -- a result cache somewhere below us),
        # which silently fabricates the raw rate.  Distinct keys force a
        # real execution per rep; a dispatch-floor sanity check guards the
        # number.
        times = []
        logqp = model.posterior.logqp_stream(sample_iters, batch, key=kq)
        jax.block_until_ready(logqp)
        for rep in range(args.reps):
            krep = jax.random.fold_in(kq, rep)
            t0 = time.time()
            logqp = model.posterior.logqp_stream(sample_iters, batch,
                                                 key=krep)
            jax.block_until_ready(logqp)
            times.append(time.time() - t0)
        n_per = sample_iters * batch
        med_t = float(np.median(times))
        raw = n_per / med_t
        if med_t < 0.04:  # under the tunnel's per-dispatch floor (~49 ms)
            print(f"[r5-schwinger] WARNING: {name} median {med_t:.4f} s "
                  "is below the dispatch floor; raw rate unreliable",
                  flush=True)
            raw = float("nan")
        ess = float(calc_ess(logqp, 0.0))
        accept, _ = estimate_accept_rate(jax.device_get(logqp))

        # physics from the exact Metropolis chain
        out = model.mcmc.sample_chain(8, min(batch, 256),
                                      collect_samples=True)
        theta = np.asarray(out["samples"]).reshape(-1, 2, *lat)
        pang = np.asarray(u1_plaq_angle(jax.numpy.asarray(theta)))
        cosp = float(np.cos(pang).mean())
        q_std = float((pang.sum(axis=(1, 2)) / (2 * np.pi)).std())

        row = dict(arm=name, lat=L, estimator=estimator, epochs=epochs,
                   mass=args.mass, beta=args.beta, n_probes=args.n_probes,
                   train_s=train_s, raw_per_s=round(raw, 1),
                   ess=round(ess, 4), accept=round(accept, 4),
                   eff_per_s=round(raw * ess, 1),
                   cos_plaq=round(cosp, 4), topo_q_std=round(q_std, 3),
                   times_s=[round(t, 3) for t in times])
        rows.append(row)
        with open(args.out, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(f"[r5-schwinger] {json.dumps(row)}", flush=True)

    print(json.dumps(dict(tag="r5_schwinger", rows=rows)))


if __name__ == "__main__":
    main()
