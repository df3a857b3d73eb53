"""Round-5 micro-optimization A/Bs on the measured VPU-latency roofline.

The profiler-grounded roofline (docs/EXPERIMENTS.md round 5) attributes the
1.02 ms flagship sampling iteration to: conditioner convs 26%, knot
construction 17%, bf16->f32 copy_convert 11%, DistConvertor 9%, and a 37%
tail of small VPU ops (mask scatter/cat, RNG, action).  This script A/Bs
two semantics-light levers against that attribution, INTERLEAVED in one
session on a TRAINED flow:

  fuse   : ConvNet.fuse_out_cast -- final bf16 conv emits f32 via XLA's
           preferred_element_type (MXU epilogue cast) instead of a separate
           copy_convert op.  Targets the 11% bucket.  Strictly more
           accurate (keeps f32 accumulation), so ESS moves at bf16-rounding
           level only.
  rbg    : jax.random rbg key type instead of threefry for the SAMPLING
           stream (training keys untouched).  The rbg generator is far
           cheaper per block on TPU; targets the RNG share of the 37%
           bucket.  Changes the sample stream (different randomness, same
           distribution) -- ESS re-measured, exactness unaffected.

    python scripts/exp_r5_micro.py --snapshot runs/r5_knots/e96_L4_k12.msgpack
"""

import argparse
import itertools
import json
import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--snapshot", required=True)
    p.add_argument("--lat", type=int, default=32)
    p.add_argument("--n_layers", type=int, default=4)
    p.add_argument("--knots", type=int, default=12)
    p.add_argument("--hidden", type=int, nargs="*", default=[24, 24])
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--sample_iters", type=int, default=400)
    p.add_argument("--reps", type=int, default=7)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="runs/r5_micro.jsonl")
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from normflow__tpu.mcmc import estimate_accept_rate
    from normflow__tpu.training.checkpoint import load_snapshot
    from normflow__tpu.training.losses import calc_ess
    from normflow__tpu.zoo import build_phi4_model, with_conv_compute_dtype

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    m = build_phi4_model((args.lat, args.lat), seed=args.seed,
                         n_layers=args.n_layers, knots=args.knots,
                         hidden=tuple(args.hidden))
    net, _, _, _ = load_snapshot(args.snapshot, net=m.net_)
    net_bf16 = with_conv_compute_dtype(net, "bfloat16")

    def set_fuse(net_, on):
        from normflow__tpu.models.nets import ConvNet

        is_conv = lambda n: isinstance(n, ConvNet)
        return jax.tree_util.tree_map(
            lambda n: n.replace(fuse_out_cast=on) if is_conv(n) else n,
            net_, is_leaf=is_conv)

    key_tf = jax.random.key(args.seed + 1)
    key_rbg = jax.random.key(args.seed + 1, impl="rbg")

    # arms: (name, net, key) -- fully crossed so the two levers' gains are
    # separable and the combined winner is measured directly
    arms = {
        "base": (set_fuse(net_bf16, False), key_tf),
        "fuse": (set_fuse(net_bf16, True), key_tf),
        "rbg": (set_fuse(net_bf16, False), key_rbg),
        "fuse+rbg": (set_fuse(net_bf16, True), key_rbg),
    }

    logqp, times = {}, {n: [] for n in arms}
    for n, (nt, k) in arms.items():  # compile/warmup
        m.net_ = nt
        logqp[n] = m.posterior.logqp_stream(args.sample_iters, args.batch,
                                            key=k)
        jax.block_until_ready(logqp[n])
    for _ in range(args.reps):
        for n, (nt, k) in arms.items():
            m.net_ = nt
            t0 = time.time()
            logqp[n] = m.posterior.logqp_stream(args.sample_iters,
                                                args.batch, key=k)
            jax.block_until_ready(logqp[n])
            times[n].append(time.time() - t0)

    n_per = args.sample_iters * args.batch
    rows = []
    with open(args.out, "a") as f:
        for n in arms:
            med = float(np.median(times[n]))
            ess = float(calc_ess(logqp[n], 0.0))
            accept, _ = estimate_accept_rate(jax.device_get(logqp[n]))
            row = dict(arm=n, raw_per_s=round(n_per / med, 1),
                       ess=round(ess, 4), accept=round(accept, 4),
                       eff_per_s=round(n_per / med * ess, 1),
                       times_s=[round(t, 4) for t in times[n]])
            rows.append(row)
            f.write(json.dumps(row) + "\n")
    print(json.dumps(dict(tag="r5_micro", snapshot=args.snapshot,
                          batch=args.batch, reps=args.reps, arms=rows)))


if __name__ == "__main__":
    main()
