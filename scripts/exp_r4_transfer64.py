"""Round-4 64x64 capacity arm (VERDICT r3 item 3).

Round 3 established that 64x64 quality is set by the coarse (32x32) flow's
per-site quality (the exp(-sigma^2 V/V0) volume law predicts the zero-shot
ESS to the third digit) and that fine-tuning the SAME architecture adds
nothing.  The one untried per-site axis is capacity AT the target volume:
transfer the converged coarse flow into a LARGER 64x64 net -- extra
coupling layers initialized near-identity (zero final-conv weights, so the
flow starts exactly at the transferred optimum) -- then fine-tune.

Arms (sampling measured with INTERLEAVED reps at the end, bf16 arm):
  zero   : plain zero-shot transfer (round-3 baseline)
  ft     : plain transfer + fine-tune          (control: ft alone)
  cap    : transfer + N extra near-identity layers + fine-tune (capacity)

    python scripts/exp_r4_transfer64.py \
        --coarse_snapshot runs/r4_flagship/e48_L4_k12.msgpack
"""

import argparse
import json
import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")


def add_identity_layers(net_, n_extra, *, knots, hidden, key):
    """Append near-identity coupling conditioners to the RQ-spline stack
    via ``Coupling.grow`` (zero final conv -> all-zero spline parameters
    -> uniform knots, unit derivatives -> identity spline; hidden layers
    keep their random init so the zeroed conv still gets gradients)."""
    from normflow__tpu.models.nets import RowParityFeature
    from normflow__tpu.nn import ConvAct

    cpl = net_.flows[2]
    conv_kwargs = dict(in_channels=2, out_channels=3 * knots - 2,
                       hidden_sizes=tuple(hidden), kernel_size=3,
                       conv_dim=2, acts=("tanh",) * len(hidden) + (None,),
                       bias=False)
    keys = jax.random.split(key, n_extra)
    new_nets = tuple(RowParityFeature(net=ConvAct.build(k, **conv_kwargs))
                     for k in keys)
    flows = list(net_.flows)
    flows[2] = cpl.grow(new_nets)
    return net_.replace(flows=tuple(flows))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--coarse_snapshot", required=True,
                   help="trained 32x32 flagship snapshot (exp_r4_flagship)")
    p.add_argument("--n_layers", type=int, default=4)
    p.add_argument("--knots", type=int, default=12)
    p.add_argument("--hidden", type=int, nargs="*", default=[24, 24])
    p.add_argument("--extra_layers", type=int, default=2)
    p.add_argument("--ft_epochs", type=int, default=6000)
    p.add_argument("--ft_lr", type=float, default=1e-3)
    p.add_argument("--train_batch", type=int, default=512)
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--sample_iters", type=int, default=200)
    p.add_argument("--steps_per_call", type=int, default=200)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--lat", type=int, default=64)
    p.add_argument("--out", default="runs/r4_transfer64.jsonl")
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import optax

    from normflow__tpu.mcmc import estimate_accept_rate
    from normflow__tpu.models import PackedEvenOddMask
    from normflow__tpu.training.checkpoint import load_snapshot
    from normflow__tpu.training.losses import calc_ess
    from normflow__tpu.zoo import build_phi4_model, with_conv_compute_dtype

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    lat = (args.lat, args.lat)
    hidden = tuple(args.hidden)

    # coarse flow from the campaign snapshot (no retraining)
    m32 = build_phi4_model((32, 32), seed=args.seed,
                           n_layers=args.n_layers, knots=args.knots,
                           hidden=hidden)
    net32, _, _, _ = load_snapshot(args.coarse_snapshot, net=m32.net_)
    net64 = net32.transfer(shape=lat, mask=PackedEvenOddMask(shape=lat))

    def make_model(net_, seed):
        m = build_phi4_model(lat, seed=seed, n_layers=args.n_layers,
                             knots=args.knots, hidden=hidden)
        m.net_ = net_
        return m

    def finetune(m, tag):
        t0 = time.time()
        m.fit(n_epochs=args.ft_epochs, batch_size=args.train_batch,
              hyperparam=dict(lr=args.ft_lr, weight_decay=1e-4),
              scheduler=optax.cosine_decay_schedule(
                  1.0, decay_steps=args.ft_epochs, alpha=0.05),
              steps_per_call=args.steps_per_call,
              grad_estimator="path", clip_grad_norm=25.0,
              checkpoint_dict=dict(print_stride=None))
        print(f"[r4-64] {tag} fine-tuned in {time.time() - t0:.0f} s",
              flush=True)

    models = {"zero": make_model(net64, args.seed)}
    models["ft"] = make_model(net64, args.seed + 10)
    finetune(models["ft"], "ft")
    cap_net = add_identity_layers(net64, args.extra_layers,
                                  knots=args.knots, hidden=hidden,
                                  key=jax.random.key(args.seed + 100))
    models["cap"] = make_model(cap_net, args.seed + 20)
    finetune(models["cap"], "cap")

    from normflow__tpu.training.checkpoint import save_snapshot

    # one snapshot dir PER --out file (a shared "r4_transfer64" dir let a
    # 6-layer run overwrite the 4-layer run's snapshots)
    snap_dir = os.path.splitext(args.out)[0] + "_snaps"
    os.makedirs(snap_dir, exist_ok=True)
    for name, m in models.items():  # f32 nets, reusable for 128x128
        save_snapshot(os.path.join(snap_dir, f"{name}.msgpack"), net=m.net_)

    # ---- interleaved sampling (bf16-conditioner arm) -------------------- #
    for name, m in models.items():
        m.net_ = with_conv_compute_dtype(m.net_, "bfloat16")
    kq = jax.random.key(args.seed + 1)
    times = {n: [] for n in models}
    logqp = {}
    for n, m in models.items():
        logqp[n] = m.posterior.logqp_stream(args.sample_iters, args.batch,
                                            key=kq)
        jax.block_until_ready(logqp[n])
    for _ in range(args.reps):
        for n, m in models.items():
            t0 = time.time()
            logqp[n] = m.posterior.logqp_stream(args.sample_iters,
                                                args.batch, key=kq)
            jax.block_until_ready(logqp[n])
            times[n].append(time.time() - t0)

    n_per = args.sample_iters * args.batch
    out = dict(tag="r4_transfer64", coarse_snapshot=args.coarse_snapshot,
               extra_layers=args.extra_layers, ft_epochs=args.ft_epochs,
               ft_lr=args.ft_lr, lat=args.lat)
    for n in models:
        med = float(np.median(times[n]))
        ess = float(calc_ess(logqp[n], 0.0))
        accept, _ = estimate_accept_rate(jax.device_get(logqp[n]))
        out[n] = dict(raw_per_s=round(n_per / med, 1), ess=round(ess, 4),
                      accept=round(accept, 4),
                      eff_per_s=round(n_per / med * ess, 1))
    with open(args.out, "a") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
