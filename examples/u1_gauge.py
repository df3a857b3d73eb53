"""2-D U(1) gauge theory with gauge-equivariant plaquette couplings.

The gauge-sector extension (BASELINE.json config 5).  Flow variables are
link angles; couplings transform plaquette angles with circular RQ splines
conditioned on frozen plaquettes, so the flow is gauge equivariant by
construction (normflow__tpu/models/gauge.py).
"""

import jax
import numpy as np

import normflow__tpu as nf
from normflow__tpu.models.gauge import (
    U1AngleAction, build_u1_gauge_flow, u1_plaq_angle,
)


def main(beta=2.0, lat_shape=(16, 16), n_epochs=2000, batch_size=256,
         n_cycles=4, knots_len=8, lr=1e-3, seed=0, n_devices=1,
         steps_per_call=None):
    key = jax.random.key(seed)
    flow = build_u1_gauge_flow(key, lat_shape, knots_len=knots_len,
                               hidden=(16,), n_cycles=n_cycles)
    prior = nf.prior.UniformPrior.build(
        low=-np.pi * np.ones((2, *lat_shape)),
        high=np.pi * np.ones((2, *lat_shape)))
    action = U1AngleAction(beta=beta)
    model = nf.Model(net_=flow, prior=prior, action=action, seed=seed)
    print("number of model parameters =", model.net_.npar)

    if n_devices > 1:
        model.device_handler.use_mesh(n_devices=n_devices)

    model.fit(n_epochs=n_epochs, batch_size=batch_size,
              hyperparam=dict(lr=lr, weight_decay=0.0),
              steps_per_call=steps_per_call,
              checkpoint_dict=dict(print_stride=max(n_epochs // 10, 1)))

    nf.backward_sanitychecker(model)

    out = model.mcmc.sample_chain(8, batch_size, collect_samples=True)
    theta = np.asarray(out["samples"]).reshape(-1, 2, *lat_shape)
    p = np.asarray(u1_plaq_angle(jax.numpy.asarray(theta)))
    q = p.sum(axis=(1, 2)) / (2 * np.pi)
    print(f"<cos P> = {np.cos(p).mean():.4f}   "
          f"topological charge: mean {q.mean():+.3f} std {q.std():.3f}   "
          f"accept_rate = {np.asarray(out['accept_rate']).mean():.3f}")
    return model


if __name__ == "__main__":
    from argparse import ArgumentParser

    parser = ArgumentParser()
    add = parser.add_argument
    add("--beta", type=float)
    add("--lat_shape", type=str)
    add("--n_epochs", type=int)
    add("--batch_size", type=int)
    add("--n_cycles", type=int)
    add("--knots_len", type=int)
    add("--lr", type=float)
    add("--seed", type=int)
    add("--n_devices", type=int)

    args = {k: v for k, v in vars(parser.parse_args()).items()
            if v is not None}
    if "lat_shape" in args:
        import ast
        args["lat_shape"] = ast.literal_eval(args["lat_shape"])
    main(**args)
