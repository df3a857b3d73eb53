"""Interleaved sampling-batch sweep at 64x64 (and optionally 128x128).

The batch-512 sampling optimum was measured at 32x32 (docs/EXPERIMENTS.md
round 3); at 64x64 the per-sample working set is 4x larger, so the
VMEM-residency optimum should sit at a smaller batch.  The round-4 128
run (batch 256) read 97.8k raw/s at 64x64 vs 69-71k for the batch-512
arms — but those were SEPARATE sessions, so per the drift policy this
sweep re-measures all batches INTERLEAVED in one session on the same
trained flow (bf16-conditioner arm).  ESS is batch-independent; the scan
length is scaled so every arm times ~the same number of samples.

    python scripts/exp_r4_batch64.py \
        --snapshot runs/r4_transfer64_snaps/zero4L_e192.msgpack
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
    p.add_argument("--snapshot", required=True,
                   help="trained 64x64 flow (4L flagship layout)")
    p.add_argument("--lat", type=int, default=64)
    p.add_argument("--snapshot_lat", type=int, default=None,
                   help="lattice size the snapshot was saved at (loads "
                        "there, then transfers to --lat)")
    p.add_argument("--n_layers", type=int, default=4)
    p.add_argument("--knots", type=int, default=12)
    p.add_argument("--hidden", type=int, nargs="*", default=[24, 24])
    p.add_argument("--batches", type=int, nargs="*",
                   default=[128, 256, 512, 1024])
    p.add_argument("--samples_per_arm", type=int, default=102400,
                   help="scan length = this / batch (equal work per arm)")
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="runs/r4_batch64.jsonl")
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from normflow__tpu.models import PackedEvenOddMask
    from normflow__tpu.training.checkpoint import load_snapshot
    from normflow__tpu.training.losses import calc_ess
    from normflow__tpu.zoo import build_phi4_model, with_conv_compute_dtype

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    lat = (args.lat, args.lat)
    snap_lat = args.snapshot_lat or args.lat
    m0 = build_phi4_model((snap_lat, snap_lat), seed=args.seed,
                          n_layers=args.n_layers, knots=args.knots,
                          hidden=tuple(args.hidden))
    net, _, _, _ = load_snapshot(args.snapshot, net=m0.net_)
    if snap_lat != args.lat:
        net = net.transfer(shape=lat, mask=PackedEvenOddMask(shape=lat))
    m = build_phi4_model(lat, seed=args.seed, n_layers=args.n_layers,
                         knots=args.knots, hidden=tuple(args.hidden))
    m.net_ = with_conv_compute_dtype(net, "bfloat16")

    kq = jax.random.key(args.seed + 1)
    iters = {b: max(args.samples_per_arm // b, 8) for b in args.batches}
    times = {b: [] for b in args.batches}
    logqp = {}
    for b in args.batches:  # compile/warmup every batch's program
        logqp[b] = m.posterior.logqp_stream(iters[b], b, key=kq)
        jax.block_until_ready(logqp[b])
    for _ in range(args.reps):
        for b in args.batches:
            t0 = time.time()
            logqp[b] = m.posterior.logqp_stream(iters[b], b, key=kq)
            jax.block_until_ready(logqp[b])
            times[b].append(time.time() - t0)

    out = dict(tag="r4_batch64", snapshot=args.snapshot, lat=args.lat,
               arms={})
    for b in args.batches:
        med = float(np.median(times[b]))
        n = iters[b] * b
        ess = float(calc_ess(logqp[b], 0.0))
        out["arms"][str(b)] = dict(
            iters=iters[b], raw_per_s=round(n / med, 1),
            ess=round(ess, 4), eff_per_s=round(n / med * ess, 1))
    with open(args.out, "a") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
