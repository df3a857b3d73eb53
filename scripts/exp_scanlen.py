"""Scan-length sweep for the sampling program (round-2 follow-up).

The timed ``logqp_stream`` program at 50 iterations runs ~185 ms; the
tunnel's per-dispatch overhead (1-50 ms) is a material fraction of that, so
the measured samples/s UNDERSTATES sustained chip throughput.  Production
sampling (``sample_chain``) scans far more than 50 rounds per dispatch, so
the honest headline number should use a scan long enough that the dispatch
constant is amortized.  This sweep finds the knee.

Reps are interleaved across scan lengths (throughput drifts +-20% on the
minute scale through the tunnel; back-to-back comparisons lie).

    python scripts/exp_scanlen.py
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
    p.add_argument("--lat", type=int, default=32)
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--iters", type=int, nargs="*",
                   default=[50, 100, 200, 400])
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args()

    from __graft_entry__ import _flagship_model

    model = _flagship_model(lat_shape=(args.lat, args.lat), seed=0)
    key = jax.random.key(1)

    # compile every program first
    for it in args.iters:
        jax.block_until_ready(
            model.posterior.logqp_stream(it, args.batch, key=key))

    times = {it: [] for it in args.iters}
    for _ in range(args.reps):
        for it in args.iters:
            t0 = time.time()
            jax.block_until_ready(
                model.posterior.logqp_stream(it, args.batch, key=key))
            times[it].append(time.time() - t0)

    out = {}
    for it in args.iters:
        med = float(np.median(times[it]))
        out[f"iters{it}"] = {
            "s": round(med, 4),
            "samples_per_s": round(it * args.batch / med, 1),
        }
        print(json.dumps({f"iters{it}": out[f"iters{it}"]}), flush=True)

    # dispatch-constant estimate from the (iters, time) slope
    its = np.array(args.iters, float)
    meds = np.array([float(np.median(times[it])) for it in args.iters])
    slope, intercept = np.polyfit(its, meds, 1)
    out["per_iter_ms"] = round(1e3 * slope, 3)
    out["dispatch_overhead_ms"] = round(1e3 * intercept, 1)
    out["asymptotic_samples_per_s"] = round(args.batch / slope, 1)
    print(json.dumps({"summary": out}))


if __name__ == "__main__":
    main()
