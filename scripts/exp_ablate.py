"""Time attribution for the sampling program by component ablation.

``bench.py`` roofline says sampling is neither MXU- nor HBM-bound (0.1%
MFU, ~4% HBM) -- so where does the time go?  This measures ``logqp_stream``
throughput for the flagship with components removed (throughput is weight
-independent, so untrained nets are fine):

    full            PSD + DC + coupling(4) + DC
    no_psd          DC + coupling(4) + DC
    no_dc           PSD + coupling(4)
    coupling_only   coupling(4)
    coupling2_only  coupling(2 layers)
    empty           no flows (prior RNG + action + scan overhead)

Reps are interleaved across variants (tunnel throughput drifts on the
minute scale).

    python scripts/exp_ablate.py
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
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args()

    from normflow__tpu import zoo

    model = zoo.build_phi4_model(lat_shape=(args.lat, args.lat), seed=0)
    f = model.net_.flows  # (psd, dc, coupling, dc)
    model2 = zoo.build_phi4_model(lat_shape=(args.lat, args.lat), seed=0,
                                  n_layers=2)
    variants = {
        "full": f,
        "no_psd": f[1:],
        "no_dc": (f[0], f[2]),
        "coupling_only": (f[2],),
        "coupling2_only": (model2.net_.flows[2],),
        "empty": (),
    }
    key = jax.random.key(1)
    nets = {k: model.net_.replace(flows=tuple(v))
            for k, v in variants.items()}

    for k in variants:  # compile
        model.net_ = nets[k]
        jax.block_until_ready(
            model.posterior.logqp_stream(args.iters, args.batch, key=key))

    times = {k: [] for k in variants}
    for _ in range(args.reps):
        for k in variants:
            model.net_ = nets[k]
            t0 = time.time()
            jax.block_until_ready(
                model.posterior.logqp_stream(args.iters, args.batch,
                                             key=key))
            times[k].append(time.time() - t0)

    out = {}
    n = args.iters * args.batch
    for k in variants:
        med = float(np.median(times[k]))
        out[k] = {"s": round(med, 4), "samples_per_s": round(n / med, 1)}
        print(json.dumps({k: out[k]}), flush=True)
    base = out["empty"]["s"]
    for k in variants:
        out[k]["net_ms"] = round(1e3 * (out[k]["s"] - base), 2)
    print(json.dumps({"summary": out}))


if __name__ == "__main__":
    main()
