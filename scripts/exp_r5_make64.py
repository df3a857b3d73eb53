"""Transfer a trained 32x32 coarse snapshot to a 64x64 net snapshot.

Pure parameter surgery (``Flow.transfer`` rescales the spectral block and
re-masks the couplings for the new lattice; no training, no sampling), so
it runs on CPU without touching the TPU tunnel -- the chip-side 128x128
campaign (scripts/exp_r4_128.py) then consumes the produced snapshot.

    python scripts/exp_r5_make64.py \
        --coarse_snapshot runs/r5_knots/e96_L4_k12.msgpack \
        --out_snapshot runs/r5_128/net64.msgpack
"""

import argparse
import json
import os
import sys

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--coarse_snapshot", required=True)
    p.add_argument("--out_snapshot", required=True)
    p.add_argument("--n_layers", type=int, default=4)
    p.add_argument("--knots", type=int, default=12)
    p.add_argument("--hidden", type=int, nargs="*", default=[24, 24])
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from normflow__tpu.models import PackedEvenOddMask
    from normflow__tpu.training.checkpoint import (load_snapshot,
                                                   save_snapshot)
    from normflow__tpu.zoo import build_phi4_model

    m32 = build_phi4_model((32, 32), seed=args.seed,
                           n_layers=args.n_layers, knots=args.knots,
                           hidden=tuple(args.hidden))
    net32, _, _, _ = load_snapshot(args.coarse_snapshot, net=m32.net_)
    net64 = net32.transfer(shape=(64, 64),
                           mask=PackedEvenOddMask(shape=(64, 64)))
    os.makedirs(os.path.dirname(args.out_snapshot) or ".", exist_ok=True)
    save_snapshot(args.out_snapshot, net=net64)
    print(json.dumps(dict(tag="r5_make64", coarse=args.coarse_snapshot,
                          out=args.out_snapshot)))


if __name__ == "__main__":
    main()
