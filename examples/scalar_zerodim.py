"""Zero-dimensional phi^4 with a DistConvertor flow.

TPU-native port of the reference example
(/root/reference/examples/scalar_zerodim.py).  Parity target (reference
README.md:52-58): loss ~ -1.05 and accept_rate ~ 0.914 at epoch 500.
"""

import normflow__tpu as nf


def main(m_sq=-1.2, lambd=0.5, knots_len=10, n_epochs=1000, batch_size=1024,
         lat_shape=1, n_devices=1, seed=0, snapshot_path=None):

    net_ = nf.nn.DistConvertor_.build(knots_len, symmetric=True)
    prior = nf.prior.NormalPrior.build(shape=lat_shape)
    action = nf.action.ScalarPhi4Action(kappa=0, m_sq=m_sq, lambd=lambd)
    model = nf.Model(net_=net_, prior=prior, action=action, seed=seed)

    print("number of model parameters =", model.net_.npar)

    if n_devices > 1:
        model.device_handler.use_mesh(n_devices=n_devices)

    model.fit(
        n_epochs=n_epochs,
        save_every=None,
        batch_size=batch_size,
        hyperparam=dict(lr=0.01, weight_decay=0.0),
        checkpoint_dict=dict(print_stride=100, snapshot_path=snapshot_path),
    )

    nf.backward_sanitychecker(model)
    return model


if __name__ == "__main__":
    from argparse import ArgumentParser

    parser = ArgumentParser()
    add = parser.add_argument
    add("--lat_shape", type=str)
    add("--m_sq", type=float)
    add("--lambd", type=float)
    add("--knots_len", type=int)
    add("--batch_size", type=int)
    add("--n_epochs", type=int)
    add("--n_devices", type=int)
    add("--seed", type=int)

    args = {k: v for k, v in vars(parser.parse_args()).items() if v is not None}
    if "lat_shape" in args:
        import ast
        args["lat_shape"] = ast.literal_eval(args["lat_shape"])
    main(**args)
