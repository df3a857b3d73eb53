"""bf16 conditioner convs for SAMPLING only: raw-throughput vs ESS A/B.

Round-1 rejected bf16 convs for *training* (ESS loss at equal wall-clock).
This asks a different question: train in f32 as usual, then run the
sampling program with the conditioner conv stacks in bf16 (MXU-native).
The Metropolis correction stays exact (logq and the sample y come from the
same program), so the only costs are ESS (flow quality at the rounded
parameters) and any logq inconsistency is nil by construction.

Trains ONCE, then interleaves timed reps of the f32 and bf16 sampling
programs (tunnel throughput drifts; back-to-back comparisons lie).

    python scripts/exp_bf16sample.py --train_epochs 24000
"""

import argparse
import json
import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")


def with_compute_dtype(net_, dtype):
    """Return a copy of the flagship net with the coupling conditioner
    convs set to ``compute_dtype=dtype``."""
    from normflow__tpu.models.nets import ConvNet, RowParityFeature

    def convert(cond):
        if isinstance(cond, RowParityFeature):
            return cond.replace(net=convert(cond.net))
        if isinstance(cond, ConvNet):
            return cond.replace(compute_dtype=dtype)
        return cond

    flows = list(net_.flows)
    coupling = flows[2]
    flows[2] = coupling.replace(nets=tuple(convert(n)
                                           for n in coupling.nets))
    return net_.replace(flows=tuple(flows))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--train_epochs", type=int, default=24000)
    p.add_argument("--train_batch", type=int, default=512)
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--sample_iters", type=int, default=400)
    p.add_argument("--steps_per_call", type=int, default=1000)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--lat", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--knots", type=int, default=12)
    p.add_argument("--dc_knots", type=int, default=16)
    p.add_argument("--hidden", type=int, nargs="*", default=[16, 16])
    p.add_argument("--tag", default="")
    args = p.parse_args()

    import optax

    from normflow__tpu.zoo import build_phi4_model
    from normflow__tpu.training.losses import calc_ess
    from normflow__tpu.mcmc import estimate_accept_rate

    model = build_phi4_model((args.lat, args.lat), seed=args.seed,
                             knots=args.knots, dc_knots=args.dc_knots,
                             hidden=tuple(args.hidden))
    model.fit(n_epochs=args.train_epochs, batch_size=args.train_batch,
              hyperparam=dict(lr=3e-3, weight_decay=1e-4),
              scheduler=optax.cosine_decay_schedule(
                  1.0, decay_steps=args.train_epochs, alpha=0.05),
              steps_per_call=args.steps_per_call,
              grad_estimator="path", clip_grad_norm=25.0,
              checkpoint_dict=dict(print_stride=None))

    nets = {"f32": model.net_,
            "bf16": with_compute_dtype(model.net_, "bfloat16")}
    key = jax.random.key(args.seed + 1)
    _, k2 = jax.random.split(key)
    logqp_by, times = {}, {b: [] for b in nets}
    for b, n in nets.items():  # compile both
        model.net_ = n
        logqp_by[b] = model.posterior.logqp_stream(
            args.sample_iters, args.batch, key=k2)
        jax.block_until_ready(logqp_by[b])
    for _ in range(args.reps):
        for b, n in nets.items():
            model.net_ = n
            t0 = time.time()
            logqp_by[b] = model.posterior.logqp_stream(
                args.sample_iters, args.batch, key=k2)
            jax.block_until_ready(logqp_by[b])
            times[b].append(time.time() - t0)

    out = {}
    n_per = args.sample_iters * args.batch
    for b in nets:
        sps = n_per / float(np.median(times[b]))
        ess = float(calc_ess(logqp_by[b], 0.0))
        accept, _ = estimate_accept_rate(jax.device_get(logqp_by[b]))
        out[b] = {"samples_per_s": round(sps, 1), "ess": round(ess, 4),
                  "accept": round(accept, 4),
                  "eff_per_s": round(sps * ess, 1)}
        print(json.dumps({b: out[b]}), flush=True)
    print(json.dumps({"summary": out, "tag": args.tag,
                      "knots": args.knots, "dc_knots": args.dc_knots,
                      "hidden": args.hidden}))


if __name__ == "__main__":
    main()
