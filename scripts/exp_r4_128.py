"""Round-4 stretch: one 128x128 data point (VERDICT r3 item 7).

Transfers a trained 64x64 flow (exp_r4_transfer64 snapshot) up to 128x128
and records eff samples/s plus the volume-law check at 16x the flagship
volume: ESS(V) ~ exp(-sigma^2 V/V0) predicts ESS_128 = ESS_64^4 from the
measured 64x64 ESS of the SAME flow (the round-3 32->64 transfer verified
this law to the third digit).

    python scripts/exp_r4_128.py \
        --snapshot64 runs/r4_transfer64/cap.msgpack --n_layers 6
"""

import argparse
import json
import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")


def measure(model, batch, iters, key, reps=5):
    from normflow__tpu.mcmc import estimate_accept_rate
    from normflow__tpu.training.losses import calc_ess

    logqp = model.posterior.logqp_stream(iters, batch, key=key)
    jax.block_until_ready(logqp)
    times = []
    for _ in range(reps):
        t0 = time.time()
        logqp = model.posterior.logqp_stream(iters, batch, key=key)
        jax.block_until_ready(logqp)
        times.append(time.time() - t0)
    sps = iters * batch / float(np.median(times))
    ess = float(calc_ess(logqp, 0.0))
    accept, _ = estimate_accept_rate(jax.device_get(logqp))
    return dict(raw_per_s=round(sps, 1), ess=round(ess, 4),
                accept=round(accept, 4), eff_per_s=round(sps * ess, 1))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--snapshot64", required=True,
                   help="trained 64x64 snapshot (exp_r4_transfer64)")
    p.add_argument("--n_layers", type=int, default=4,
                   help="coupling layers IN THE SNAPSHOT (4 + extra_layers "
                        "for the capacity arm)")
    p.add_argument("--knots", type=int, default=12)
    p.add_argument("--hidden", type=int, nargs="*", default=[24, 24])
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--sample_iters", type=int, default=100)
    p.add_argument("--ft_epochs", type=int, default=0)
    p.add_argument("--ft_lr", type=float, default=1e-3)
    p.add_argument("--ft_clip", type=float, default=25.0)
    p.add_argument("--ft_spike", type=float, default=None,
                   help="arm the rewind_on_spike guard during fine-tune")
    p.add_argument("--train_batch", type=int, default=128)
    p.add_argument("--steps_per_call", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="runs/r4_128.jsonl")
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from normflow__tpu.models import PackedEvenOddMask
    from normflow__tpu.training.checkpoint import load_snapshot
    from normflow__tpu.zoo import build_phi4_model, with_conv_compute_dtype

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    hidden = tuple(args.hidden)

    m64 = build_phi4_model((64, 64), seed=args.seed,
                           n_layers=args.n_layers, knots=args.knots,
                           hidden=hidden)
    net64, _, _, _ = load_snapshot(args.snapshot64, net=m64.net_)
    m64.net_ = with_conv_compute_dtype(net64, "bfloat16")
    k64, k128, kft = jax.random.split(jax.random.key(args.seed + 1), 3)
    r64 = measure(m64, args.batch, args.sample_iters, k64)

    m128 = build_phi4_model((128, 128), seed=args.seed,
                            n_layers=args.n_layers, knots=args.knots,
                            hidden=hidden)
    net128 = net64.transfer(shape=(128, 128),
                            mask=PackedEvenOddMask(shape=(128, 128)))
    m128.net_ = with_conv_compute_dtype(net128, "bfloat16")
    r128 = measure(m128, args.batch, args.sample_iters, k128)

    out = dict(tag="r4_128", snapshot64=args.snapshot64,
               n_layers=args.n_layers, lat64=r64, lat128_zeroshot=r128,
               volume_law_pred_ess128=round(r64["ess"] ** 4, 4))
    if args.ft_epochs > 0:
        import optax

        m128.net_ = net128  # fine-tune in f32
        t0 = time.time()
        m128.fit(n_epochs=args.ft_epochs, batch_size=args.train_batch,
                 hyperparam=dict(lr=args.ft_lr, weight_decay=1e-4),
                 scheduler=optax.cosine_decay_schedule(
                     1.0, decay_steps=args.ft_epochs, alpha=0.05),
                 steps_per_call=args.steps_per_call,
                 grad_estimator="path", clip_grad_norm=args.ft_clip,
                 rewind_on_spike=args.ft_spike,
                 checkpoint_dict=dict(print_stride=None))
        out["ft_train_s"] = round(time.time() - t0, 1)
        out["ft"] = dict(epochs=args.ft_epochs, lr=args.ft_lr,
                         clip=args.ft_clip, spike=args.ft_spike,
                         batch=args.train_batch)
        m128.net_ = with_conv_compute_dtype(m128.net_, "bfloat16")
        out["lat128_finetuned"] = measure(m128, args.batch,
                                          args.sample_iters, kft)
    with open(args.out, "a") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
