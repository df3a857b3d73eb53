"""On-chip measurement for the U(1) gauge model (BASELINE config 5).

Trains ``zoo.build_u1_model`` and reports: raw/effective sampling rate,
ESS, accept rate, and <cos P> against the exact strong/weak-coupling
answer I1(beta)/I0(beta) for 2-D U(1) (exactly solvable; plaquettes
decouple in the infinite-volume/open-bc limit, and at 16x16 periodic the
correction is negligible vs MC error).

    python scripts/exp_u1_bench.py
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
    p.add_argument("--lat", type=int, default=16)
    p.add_argument("--beta", type=float, default=2.0)
    p.add_argument("--train_epochs", type=int, default=8000)
    p.add_argument("--train_batch", type=int, default=256)
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--sample_iters", type=int, default=200)
    p.add_argument("--steps_per_call", type=int, default=500)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--n_cycles", type=int, default=2)
    p.add_argument("--knots_len", type=int, default=8)
    p.add_argument("--hidden", type=int, nargs="*", default=[16])
    p.add_argument("--tag", default="u1")
    p.add_argument("--bf16", action="store_true",
                   help="also measure the bf16-conditioner sampling arm")
    p.add_argument("--platform", default=None,
                   help="force a jax platform (e.g. 'cpu' for smoke tests)")
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import optax
    from scipy import special

    from normflow__tpu.zoo import build_u1_model
    from normflow__tpu.models.gauge import u1_plaq_angle
    from normflow__tpu.training.losses import calc_ess
    from normflow__tpu.mcmc import estimate_accept_rate

    model = build_u1_model((args.lat, args.lat), beta=args.beta,
                           seed=args.seed, n_cycles=args.n_cycles,
                           knots_len=args.knots_len,
                           hidden=tuple(args.hidden))
    t0 = time.time()
    model.fit(n_epochs=args.train_epochs, batch_size=args.train_batch,
              hyperparam=dict(lr=args.lr, weight_decay=0.0),
              scheduler=optax.cosine_decay_schedule(
                  1.0, decay_steps=args.train_epochs, alpha=0.1),
              steps_per_call=args.steps_per_call,
              grad_estimator="path", clip_grad_norm=25.0,
              checkpoint_dict=dict(print_stride=None))
    train_time = time.time() - t0

    key = jax.random.key(args.seed + 1)
    _, k2 = jax.random.split(key)

    def measure_arm(m):
        logqp = m.posterior.logqp_stream(args.sample_iters, args.batch,
                                         key=k2)
        jax.block_until_ready(logqp)
        t1 = time.time()
        logqp = m.posterior.logqp_stream(args.sample_iters, args.batch,
                                         key=k2)
        jax.block_until_ready(logqp)
        sps = args.sample_iters * args.batch / (time.time() - t1)
        return sps, logqp

    sps, logqp = measure_arm(model)
    ess = float(calc_ess(logqp, 0.0))
    accept, _ = estimate_accept_rate(jax.device_get(logqp))
    bf16 = None
    if args.bf16:
        from normflow__tpu.zoo import with_conv_compute_dtype

        f32_net = model.net_
        model.net_ = with_conv_compute_dtype(model.net_, "bfloat16")
        sps_b, logqp_b = measure_arm(model)
        ess_b = float(calc_ess(logqp_b, 0.0))
        bf16 = {"raw_samples_per_sec": round(sps_b, 1),
                "ess": round(ess_b, 4),
                "eff_per_s": round(sps_b * ess_b, 1)}
        if sps_b * ess_b <= sps * ess:  # keep the winner for the MCMC pass
            model.net_ = f32_net

    # exact-corrected observable from the Metropolis chain
    out = model.mcmc.sample_chain(16, args.batch, collect_samples=True)
    theta = np.asarray(out["samples"]).reshape(-1, 2, args.lat, args.lat)
    pang = np.asarray(u1_plaq_angle(jax.numpy.asarray(theta)))
    cosp = float(np.cos(pang).mean())
    q = pang.sum(axis=(1, 2)) / (2 * np.pi)
    exact = float(special.iv(1, args.beta) / special.iv(0, args.beta))
    print(json.dumps({
        "tag": args.tag, "n_cycles": args.n_cycles,
        "knots_len": args.knots_len, "hidden": args.hidden, "lr": args.lr,
        "lat": args.lat, "beta": args.beta,
        "train_epochs": args.train_epochs,
        "train_time_s": round(train_time, 1),
        "raw_samples_per_sec": round(sps, 1),
        "ess": round(ess, 4), "accept": round(accept, 4),
        "eff_per_s": round(sps * ess, 1),
        "cos_plaq": round(cosp, 4), "cos_plaq_exact": round(exact, 4),
        "topo_q_std": round(float(q.std()), 3),
        "mcmc_accept": round(float(np.asarray(out["accept_rate"]).mean()),
                             4),
        **({"bf16_arm": bf16} if bf16 else {}),
    }))


if __name__ == "__main__":
    main()
