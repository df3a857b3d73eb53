"""Raw sampling-throughput map for the flagship (no training needed).

Sweeps coupling backend (xla/pallas), PRNG implementation
(threefry2x32 vs the faster TPU-native rbg), and sampling batch size.
Throughput is architecture-only (ESS needs a trained model), measured on
the scanned ``logqp_stream`` program.

    python scripts/exp_sampling.py
"""

import argparse
import itertools
import json
import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")


def measure(model, batch, iters=50, reps=3, seed=1):
    key = jax.random.key(seed)
    logqp = model.posterior.logqp_stream(iters, batch, key=key)
    jax.block_until_ready(logqp)
    times = []
    for _ in range(reps):
        t0 = time.time()
        logqp = model.posterior.logqp_stream(iters, batch, key=key)
        jax.block_until_ready(logqp)
        times.append(time.time() - t0)
    return iters * batch / float(np.median(times))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--lat", type=int, default=32)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--prng", nargs="*", default=["threefry2x32", "rbg"])
    p.add_argument("--batches", type=int, nargs="*",
                   default=[1024, 2048, 4096])
    p.add_argument("--backends", nargs="*",
                   default=["xla", "xla_bf16", "pallas", "pallas_reg"],
                   help="coupling backends; xla_bf16 = XLA coupling with "
                        "bf16 conditioner convs (the round-2 winning arm)")
    args = p.parse_args()

    results = {}
    for prng in args.prng:
        jax.config.update("jax_default_prng_impl", prng)
        from __graft_entry__ import _flagship_model
        from normflow__tpu.zoo import with_conv_compute_dtype

        model = _flagship_model(lat_shape=(args.lat, args.lat), seed=0)
        base_net = model.net_
        for backend in args.backends:
            if backend != "xla" and jax.devices()[0].platform != "tpu":
                continue
            if backend == "xla_bf16":
                net = with_conv_compute_dtype(base_net, "bfloat16")
            else:
                flows = list(base_net.flows)
                flows[2] = flows[2].replace(backend=backend)
                net = base_net.replace(flows=tuple(flows))
            model.net_ = net
            for batch in args.batches:
                sps = measure(model, batch, iters=args.iters)
                key = f"{prng}/{backend}/b{batch}"
                results[key] = round(sps, 1)
                print(json.dumps({key: results[key]}), flush=True)
    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
