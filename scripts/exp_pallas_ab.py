"""On-chip A/B measurements for the Pallas kernels (round-2 asks #3, #6).

Measures, inside scanned device programs (the tunnel has a ~1 ms dispatch
floor, so never time single dispatches):

 1. flagship TRAINING step time with coupling backend 'xla' vs 'pallas'
 2. phi4 action (and its gradient) with backend 'xla' vs 'pallas'

Usage:  python scripts/exp_pallas_ab.py [--what train|phi4|all]
"""

import argparse
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def time_scanned(fn, x, n_steps=50, reps=3):
    """Time ``fn(x)`` in a scanned program; return s/step.

    Two defenses against wrong-by-construction readings:

    * the carry perturbs the input by a negligible amount and is derived
      from the output, so every iteration genuinely depends on the previous
      one -- otherwise XLA hoists the loop-invariant body out of the scan
      and the "benchmark" times an empty loop (observed: 0.4 us/step for a
      batch-512 32x32 action, i.e. nothing ran);
    * the per-step time is the SLOPE between an n-step and a 4n-step
      program, which cancels the constant per-dispatch tunnel overhead
      (~1-50 ms) that would otherwise swamp micro-kernels.
    """

    def build(length):
        @jax.jit
        def scanned(x):
            def body(c, _):
                out = fn(x + c)
                lead = out[0] if isinstance(out, tuple) else out
                c2 = 1e-30 * jnp.sum(lead).astype(x.dtype)
                return c2, ()

            c, _ = jax.lax.scan(body, jnp.zeros((), x.dtype), None,
                                length=length)
            return c

        return scanned

    walls = {}
    for length in (n_steps, 4 * n_steps):
        scanned = build(length)
        jax.block_until_ready(scanned(x))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            jax.block_until_ready(scanned(x))
            best = min(best, time.time() - t0)
        walls[length] = best
    return (walls[4 * n_steps] - walls[n_steps]) / (3 * n_steps)


def bench_train(backend, n_steps=100):
    import optax

    from __graft_entry__ import _flagship_model

    model = _flagship_model(lat_shape=(32, 32), seed=0)
    if backend != "xla":
        flows = list(model.net_.flows)
        flows[2] = flows[2].replace(backend=backend)
        model.net_ = model.net_.replace(flows=tuple(flows))

    fit = model.fit
    fit.hyperparam.update(lr=3e-3, weight_decay=1e-4)
    fit.optimizer = fit._build_optimizer("adamw", None, None)
    fit.opt_state = fit.optimizer.init(model.net_)
    fit.grad_estimator = "rep"
    fit._make_step_fn()
    multi = fit._multi_step_fn

    key = jax.random.key(1)
    net, opt, losses = multi(model.net_, fit.opt_state, key, 512, n_steps)
    jax.block_until_ready(losses)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        _, _, losses = multi(model.net_, fit.opt_state, key, 512, n_steps)
        jax.block_until_ready(losses)
        best = min(best, time.time() - t0)
    return 1000 * best / n_steps  # ms/step


def bench_phi4(backend, batch=1024, lat=32):
    from normflow__tpu.models.actions import ScalarPhi4Action

    act = ScalarPhi4Action(kappa=0.6, m_sq=-2.4, lambd=0.5, backend=backend)
    x = jax.random.normal(jax.random.key(0), (batch, lat, lat))

    t_fwd = time_scanned(lambda x: act(x), x, n_steps=200)

    grad_fn = jax.grad(lambda x: jnp.sum(act(x)))
    t_grad = time_scanned(grad_fn, x, n_steps=200)
    return t_fwd * 1e6, t_grad * 1e6  # us


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--what", default="all", choices=["train", "phi4", "all"])
    args = p.parse_args()

    out = {"platform": jax.devices()[0].platform}
    if args.what in ("train", "all"):
        for b in ("xla", "pallas", "pallas_reg"):
            out[f"train_ms_{b}"] = round(bench_train(b), 2)
            print(json.dumps({f"train_ms_{b}": out[f"train_ms_{b}"]}),
                  flush=True)
    if args.what in ("phi4", "all"):
        for batch in (512, 1024):
            for b in ("xla", "pallas"):
                f_, g_ = bench_phi4(b, batch=batch)
                out[f"phi4_b{batch}_us_{b}"] = [round(f_, 1), round(g_, 1)]
                print(json.dumps(
                    {f"phi4_b{batch}_us_{b}": out[f"phi4_b{batch}_us_{b}"]}),
                    flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
