"""64x64 phi^4 with data-sharded training + 1024 Metropolis chains.

BASELINE.json config 4: reverse-KL training with the batch sharded over a
(possibly multi-host) device mesh, then exact sampling with 1024
independence-Metropolis chains per round, all inside scanned device
programs.  Run on a pod slice with no code changes (docs/DISTRIBUTED.md);
runs on a single chip/CPU for smoke testing with small ``--n_epochs``.
"""

import jax
import numpy as np

import normflow__tpu as nf
from normflow__tpu.ops import observables as obs


def main(lat_shape=(64, 64), kappa=0.6, m_sq=-2.4, lambd=0.5,
         n_epochs=4000, batch_size=512, chains=1024, chain_rounds=16,
         knots=8, hidden=(16, 16), n_layers=4, lr=3e-3, seed=0,
         n_devices=None, steps_per_call=500, multihost=False,
         coarse_epochs=0):
    import optax

    if multihost:
        # multi-process pod slice: must run before ANY backend-touching
        # jax call (docs/DISTRIBUTED.md); single-host multi-device runs
        # need no process group
        nf.parallel.init_distributed()

    from __graft_entry__ import _flagship_model

    model = _flagship_model(lat_shape=lat_shape, knots=knots, seed=seed,
                            n_layers=n_layers, hidden=hidden)
    model.action = nf.action.ScalarPhi4Action(kappa=kappa, m_sq=m_sq,
                                              lambd=lambd)

    if coarse_epochs > 0:
        # coarse-to-fine: converge the flow at half the lattice size and
        # transfer up -- the measured-best init for large lattices
        # (docs/TRAINING.md "Scaling to larger lattices": 64x64 zero-shot
        # transfer beats 24k from-scratch epochs)
        coarse_shape = tuple(s // 2 for s in lat_shape)
        coarse = _flagship_model(lat_shape=coarse_shape, knots=knots,
                                 seed=seed, n_layers=n_layers,
                                 hidden=hidden)
        coarse.action = model.action
        coarse.fit(n_epochs=coarse_epochs, batch_size=batch_size,
                   hyperparam=dict(lr=lr, weight_decay=1e-4),
                   scheduler=optax.cosine_decay_schedule(
                       1.0, decay_steps=max(coarse_epochs, 1), alpha=0.05),
                   steps_per_call=steps_per_call,
                   checkpoint_dict=dict(print_stride=None))
        model.net_ = coarse.net_.transfer(
            shape=lat_shape,
            mask=nf.models.PackedEvenOddMask(shape=lat_shape))

    if n_devices is None:
        n_devices = len(jax.devices())
    if n_devices > 1:
        model.device_handler.use_mesh(n_devices=n_devices)
        model.device_handler.replicate_params()
    print(f"devices={n_devices} params={model.net_.npar}")

    model.fit(n_epochs=n_epochs, batch_size=batch_size,
              hyperparam=dict(lr=lr, weight_decay=1e-4),
              scheduler=optax.cosine_decay_schedule(
                  1.0, decay_steps=max(n_epochs, 1), alpha=0.05),
              steps_per_call=steps_per_call,
              checkpoint_dict=dict(print_stride=max(n_epochs // 8, 1)))

    # 1024 INDEPENDENT Metropolis chains, sharded over the mesh (the
    # compiled sampler is collective-free -- ESS/s scales linearly with
    # chips); first rounds are burn-in (round 0 = raw flow samples)
    burn = min(4, chain_rounds - 1)
    out = model.mcmc.sample_parallel_chains(chain_rounds + burn, chains,
                                            collect_samples=True)
    gather = model.device_handler.all_gather_into_tensor  # multihost-safe
    samples = np.asarray(gather(out["samples"]))[burn:]  # (rounds, chains, ...)
    p2 = np.asarray(obs.phi2(jax.numpy.asarray(
        samples.reshape(-1, *lat_shape)))).reshape(samples.shape[:2])
    chi = float(obs.susceptibility(jax.numpy.asarray(
        samples.reshape(-1, *lat_shape))))
    # autocorrelation lives ALONG each chain (rounds axis); the flattened
    # round-major stream interleaves independent chains and would read
    # tau ~ 1 regardless of the true within-chain correlation.  The error
    # bar uses the spread of independent per-chain means -- unbiased for
    # any within-chain tau.
    tau = float(np.mean([obs.integrated_autocorr_time(p2[:, c])
                         for c in range(0, p2.shape[1],
                                        max(p2.shape[1] // 32, 1))]))
    mu_c = p2.mean(axis=0)
    err = float(mu_c.std(ddof=1) / np.sqrt(mu_c.size))
    print(f"<phi^2> = {p2.mean():.5f} +- {err:.5f}"
          f"   chi = {chi:.3f}   tau_int(phi^2, per chain) = {tau:.1f}"
          f"   accept = {np.asarray(out['accept_rate']).mean():.3f}")
    return model


if __name__ == "__main__":
    from argparse import ArgumentParser

    parser = ArgumentParser()
    add = parser.add_argument
    add("--lat_shape", type=str)
    add("--n_epochs", type=int)
    add("--batch_size", type=int)
    add("--chains", type=int)
    add("--chain_rounds", type=int)
    add("--n_devices", type=int)
    add("--lr", type=float)
    add("--seed", type=int)
    add("--multihost", action="store_true", default=None)
    add("--coarse_epochs", type=int,
        help="coarse-to-fine: pre-train at half the lattice size for this "
             "many epochs, then transfer (0 = off; 48000 is the measured "
             "best -- docs/TRAINING.md)")

    args = {k: v for k, v in vars(parser.parse_args()).items()
            if v is not None}
    if "lat_shape" in args:
        import ast
        args["lat_shape"] = ast.literal_eval(args["lat_shape"])
    main(**args)
