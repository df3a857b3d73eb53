"""Round-2 experiment: forward-KL polishing on MCMC-corrected samples.

Protocol: reverse-KL pre-train (rep or path estimator), then fine-tune by
maximizing ``E_p[log q]`` over Metropolis-corrected samples drawn from the
current flow (exact target samples), refreshed periodically.  Forward KL
is mode-covering, so it targets exactly what the reverse-KL optimum lacks
(acceptance / ESS are tail-sensitive).

    python scripts/exp_fkl.py --pre_epochs 6000 --fkl_epochs 1500
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def forward_kl_polish(model, n_epochs, *, sample_rounds=32, sample_batch=512,
                      refresh_every=250, batch_size=512, lr=5e-4,
                      steps_per_call=250):
    """Fine-tune the flow by maximizing log q on fresh MCMC samples."""
    import optax

    from functools import partial

    net = model.net_
    prior = model.prior
    tx = optax.adamw(lr, weight_decay=0.0)
    opt_state = tx.init(net)

    @partial(jax.jit, static_argnums=(3, 4))
    def polish_steps(net, opt_state, key, n_steps, batch_size, samples):
        n_pool = samples.shape[0]

        def body(carry, k):
            net, opt_state = carry

            def loss_of(net):
                idx = jax.random.randint(k, (batch_size,), 0, n_pool)
                y = samples[idx]
                x, mlogj = net.backward(y)
                logq = prior.log_prob(x) + mlogj
                return -jnp.mean(logq)

            loss, grads = jax.value_and_grad(loss_of)(net)
            updates, opt_state = tx.update(grads, opt_state, net)
            net = optax.apply_updates(net, updates)
            return (net, opt_state), loss

        keys = jax.random.split(key, n_steps)
        (net, opt_state), losses = jax.lax.scan(body, (net, opt_state), keys)
        return net, opt_state, losses

    done = 0
    while done < n_epochs:
        model.net_ = net
        out = model.mcmc.sample_chain(sample_rounds, sample_batch,
                                      collect_samples=True)
        pool = out["samples"].reshape(-1, *out["samples"].shape[2:])
        seg = min(refresh_every, n_epochs - done)
        net, opt_state, losses = polish_steps(
            net, opt_state, model.next_key(), seg, batch_size, pool)
        done += seg
        print(f"fkl {done}/{n_epochs}: -E_p[log q] = "
              f"{float(losses[-1]):.3f}, pool accept "
              f"{float(np.asarray(out['accept_rate']).mean()):.3f}",
              flush=True)
    model.net_ = net
    return model


def measure(model, batch=1024, iters=50, seed=1):
    from normflow__tpu.mcmc import estimate_accept_rate
    from normflow__tpu.training.losses import calc_ess

    key = jax.random.key(seed)
    k1, k2 = jax.random.split(key)
    logqp = model.posterior.logqp_stream(iters, batch, key=k1)
    jax.block_until_ready(logqp)
    times = []
    for _ in range(3):
        t0 = time.time()
        logqp = model.posterior.logqp_stream(iters, batch, key=k2)
        jax.block_until_ready(logqp)
        times.append(time.time() - t0)
    sps = iters * batch / float(np.median(times))
    ess = float(calc_ess(logqp, 0.0))
    accept, _ = estimate_accept_rate(jax.device_get(logqp))
    return dict(raw_samples_per_sec=round(sps, 1), ess=round(ess, 4),
                accept=round(accept, 4), eff_per_s=round(sps * ess, 1))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pre_epochs", type=int, default=6000)
    p.add_argument("--fkl_epochs", type=int, default=1500)
    p.add_argument("--grad_estimator", default="rep")
    p.add_argument("--lr", type=float, default=3e-3)
    p.add_argument("--fkl_lr", type=float, default=5e-4)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import optax

    from __graft_entry__ import _flagship_model

    model = _flagship_model(lat_shape=(32, 32), seed=args.seed)
    t0 = time.time()
    model.fit(n_epochs=args.pre_epochs, batch_size=512,
              hyperparam=dict(lr=args.lr, weight_decay=1e-4),
              scheduler=optax.cosine_decay_schedule(
                  1.0, decay_steps=args.pre_epochs, alpha=0.05),
              steps_per_call=500, grad_estimator=args.grad_estimator,
              checkpoint_dict=dict(print_stride=None))
    pre_time = time.time() - t0

    pre = measure(model)
    print(json.dumps({"stage": "pre", "train_time_s": round(pre_time, 1),
                      **pre}), flush=True)

    t0 = time.time()
    forward_kl_polish(model, args.fkl_epochs, lr=args.fkl_lr)
    fkl_time = time.time() - t0
    post = measure(model)
    print(json.dumps({"stage": "post_fkl", "fkl_time_s": round(fkl_time, 1),
                      **post}), flush=True)


if __name__ == "__main__":
    main()
