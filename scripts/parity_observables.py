"""Observable parity: our framework vs the torch reference, within MC error.

BASELINE.json's north star asks to "match the reference's trained loss,
accept_rate, and phi^4 observables (<phi^2>, susceptibility) within
Monte-Carlo error on its example models".  Both frameworks MCMC-correct
their flows to the SAME Boltzmann density, so after training the sampled
observables must agree within combined error bars regardless of flow
quality (flow quality only changes the autocorrelation time).

This script trains BOTH implementations on the reference's 8x8 example
config (examples/scalar_affine.py: kappa=0.67, m_sq=-2.68, lambd=0.5,
PSDBlock -> DistConvertor -> AffineCoupling(4 x ConvAct, EvenOddMask) ->
DistConvertor, batch 128, 1000 epochs), draws MCMC chains from each, and
compares

    <phi^2>  = mean over sites+configs of phi^2
    chi      = V * ( <m^2> - <|m|>^2 ),   m = lattice-mean of phi per config

with binned (autocorrelation-robust) error bars computed by the same code
for both sides.  Everything runs on CPU (the reference cannot run anywhere
else here).

    python scripts/parity_observables.py --train_epochs 1000 --rounds 100
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")


def observables(samples, n_bins=20):
    """samples: (n_configs, *lat) chain-ordered array -> dict of (val, err).

    Errors are delete-one-bin jackknife over chain-ordered bins (bins
    absorb autocorrelation; jackknife handles the nonlinear chi directly,
    including the m^2 / |m| correlation that naive quadrature ignores)."""
    samples = np.asarray(samples, float)
    v = float(np.prod(samples.shape[1:]))
    axes = tuple(range(1, samples.ndim))
    phi2 = (samples**2).mean(axis=axes)
    m = samples.mean(axis=axes)
    n_bins = max(2, min(n_bins, len(m) // 10))
    n = (len(m) // n_bins) * n_bins

    def bins(x):
        return x[:n].reshape(n_bins, -1).mean(axis=1)

    def jack(fn, *series):
        bs = [bins(s) for s in series]
        full = fn(*[b.mean() for b in bs])
        leave = np.array([fn(*[np.delete(b, i).mean() for b in bs])
                          for i in range(n_bins)])
        err = np.sqrt((n_bins - 1) / n_bins
                      * ((leave - leave.mean()) ** 2).sum())
        return float(full), float(err)

    phi2_val, phi2_err = jack(lambda a: a, phi2)
    chi_val, chi_err = jack(lambda m2, am: v * (m2 - am**2),
                            m**2, np.abs(m))
    return {"phi2": (phi2_val, phi2_err), "chi": (chi_val, chi_err)}


def run_reference(args):
    from bench_reference import load_reference

    if not hasattr(np, "product"):
        np.product = np.prod
    nf = load_reference()
    import torch

    from normflow.action import ScalarPhi4Action
    from normflow.prior import NormalPrior
    from normflow.mask import EvenOddMask
    from normflow.nn import (
        ModuleList_, DistConvertor_, AffineCoupling_, ConvAct, FFTNet_,
        MeanFieldNet_, PSDBlock_,
    )

    torch.manual_seed(args.seed)
    lat = (args.lat, args.lat)
    hidden = [8, 8]
    conv = dict(in_channels=1, out_channels=2, hidden_sizes=hidden,
                kernel_size=3, padding_mode="circular", conv_dim=2,
                acts=["tanh"] * len(hidden) + [None], bias=False)
    net_ = ModuleList_([
        PSDBlock_(
            mfnet_=MeanFieldNet_.build(knots_len=10, symmetric=True,
                                       smooth=True, final_scale=True),
            fftnet_=FFTNet_.build(lat, knots_len=10, ignore_zeromode=True)),
        DistConvertor_(50, symmetric=True, smooth=True),
        AffineCoupling_([ConvAct(**conv) for _ in range(4)],
                        mask=EvenOddMask(shape=lat)),
        DistConvertor_(50, symmetric=True, smooth=True),
    ])
    model = nf.Model(
        net_=net_, prior=NormalPrior(shape=lat),
        action=ScalarPhi4Action(kappa=0.67, m_sq=-2.68, lambd=0.5))
    t0 = time.time()
    model.fit(n_epochs=args.train_epochs, batch_size=128,
              hyperparam=dict(lr=1e-3, weight_decay=1e-4),
              checkpoint_dict=dict(print_stride=200))
    train_s = time.time() - t0

    chains = []
    for _ in range(args.rounds):
        y = model.mcmc.sample(batch_size=args.chain_batch)
        chains.append(y.cpu().numpy())
    accept = float(np.mean([float(a) for a in
                            model.mcmc.history.accept_rate]))
    samples = np.concatenate(chains)  # chain-ordered
    obs = observables(samples)
    return {"train_s": round(train_s, 1), "accept": round(accept, 4),
            "n_configs": len(samples), **{k: [round(v, 5), round(e, 5)]
                                          for k, (v, e) in obs.items()}}


def run_ours(args):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from examples.scalar_affine import assemble_net
    import normflow__tpu as nf

    lat = (args.lat, args.lat)
    action = nf.action.ScalarPhi4Action(kappa=0.67, m_sq=-2.68, lambd=0.5)
    prior = nf.prior.NormalPrior.build(shape=lat)
    net_ = assemble_net(lat_shape=lat, key=jax.random.key(args.seed))
    model = nf.Model(net_=net_, prior=prior, action=action, seed=args.seed)
    t0 = time.time()
    model.fit(n_epochs=args.train_epochs, batch_size=128,
              hyperparam=dict(lr=1e-3, weight_decay=1e-4),
              param_groups=[
                  {"ind": [0, 1, 3], "hyper": dict(weight_decay=1e-4)},
                  {"ind": [2], "hyper": dict(weight_decay=1e-2)},
              ],
              steps_per_call=200,
              checkpoint_dict=dict(print_stride=200))
    train_s = time.time() - t0

    out = model.mcmc.sample_chain(args.rounds, args.chain_batch,
                                  collect_samples=True)
    samples = np.asarray(out["samples"]).reshape(-1, *lat)
    accept = float(np.mean(np.asarray(out["accept_rate"])))
    obs = observables(samples)
    return {"train_s": round(train_s, 1), "accept": round(accept, 4),
            "n_configs": len(samples), **{k: [round(v, 5), round(e, 5)]
                                          for k, (v, e) in obs.items()}}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--train_epochs", type=int, default=1000)
    p.add_argument("--rounds", type=int, default=100)
    p.add_argument("--chain_batch", type=int, default=128)
    p.add_argument("--lat", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--side", choices=["both", "ref", "ours"], default="both")
    args = p.parse_args()

    results = {}
    if args.side in ("both", "ours"):
        results["ours"] = run_ours(args)
        print(json.dumps({"ours": results["ours"]}), flush=True)
    if args.side in ("both", "ref"):
        results["ref"] = run_reference(args)
        print(json.dumps({"ref": results["ref"]}), flush=True)

    if "ours" in results and "ref" in results:
        verdicts = {}
        for k in ("phi2", "chi"):
            va, ea = results["ours"][k]
            vb, eb = results["ref"][k]
            sigma = abs(va - vb) / max(np.hypot(ea, eb), 1e-12)
            verdicts[k] = {"ours": [va, ea], "ref": [vb, eb],
                           "n_sigma": round(float(sigma), 2),
                           "pass": bool(sigma < 3.0)}
        print(json.dumps({"parity": verdicts}))


if __name__ == "__main__":
    main()
