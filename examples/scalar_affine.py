"""2-D phi^4 with PSD block + affine couplings.

TPU-native port of the reference example
(/root/reference/examples/scalar_affine.py): composite net
``PSDBlock -> DistConvertor -> AffineCoupling(n_layers x ConvNet,
EvenOddMask) -> DistConvertor`` trained by reverse KL on an 8x8 lattice.

Multi-device: pass ``--n_devices`` to shard the batch over a device mesh
(replaces the reference's DDP spawn; same batch-division convention).
"""

import jax

import normflow__tpu as nf
from normflow__tpu.nn import (
    AffineCoupling_, ConvAct, DistConvertor_, FFTNet_, Identity_,
    MeanFieldNet_, ModuleList_, PSDBlock_,
)


# =============================================================================
def main(kappa=0.67, m_sq=-4 * 0.67, lambd=0.5, n_epochs=1000, batch_size=128,
         lat_shape=(8, 8), n_devices=1, seed=0, lr=0.001,
         snapshot_path=None, **net_kwargs):

    action = nf.action.ScalarPhi4Action(kappa=kappa, m_sq=m_sq, lambd=lambd)
    prior = nf.prior.NormalPrior.build(shape=lat_shape)
    net_ = assemble_net(lat_shape=lat_shape, key=jax.random.key(seed),
                        **net_kwargs)
    model = nf.Model(net_=net_, prior=prior, action=action, seed=seed)

    print("number of model parameters =", model.net_.npar)

    if n_devices > 1:
        model.device_handler.use_mesh(n_devices=n_devices)

    model.fit(
        n_epochs=n_epochs,
        save_every=200,
        batch_size=batch_size,
        hyperparam=dict(lr=lr),
        param_groups=[
            {"ind": [0, 1, 3], "hyper": dict(weight_decay=1e-4)},
            {"ind": [2], "hyper": dict(weight_decay=1e-2)},
        ],
        checkpoint_dict=dict(print_stride=100, snapshot_path=snapshot_path),
    )

    nf.backward_sanitychecker(model)
    return model


# =============================================================================
def assemble_net(*, lat_shape, key, n_layers=4, hidden_sizes=(8, 8),
                 zee2sym=True, acts=None, knots0_len=10, knots1_len=10,
                 knots2_len=50, knots4_len=50):
    """The reference's composite architecture (scalar_affine.py:64-114),
    assembled channels-last."""

    mfdict = dict(knots_len=knots0_len, symmetric=zee2sym, final_scale=True,
                  smooth=True)
    fftdict = dict(knots_len=knots1_len, ignore_zeromode=True)

    flows = []
    # 1. PSD block: mean-field + spectral flow
    mfnet = MeanFieldNet_.build(**mfdict) if knots0_len > 1 else Identity_()
    fftnet = FFTNet_.build(lat_shape, **fftdict)
    flows.append(PSDBlock_(mfnet=mfnet, fftnet=fftnet))

    # 2. elementwise activation flow
    if knots2_len > 1:
        flows.append(DistConvertor_.build(knots2_len, symmetric=zee2sym,
                                          smooth=True))

    # 3. affine coupling stack over the checkerboard
    if acts is None:
        tag = "tanh" if zee2sym else "leaky_relu"
        acts = (*[tag] * len(hidden_sizes), None)
    conv_kwargs = dict(
        in_channels=1, out_channels=2, hidden_sizes=tuple(hidden_sizes),
        kernel_size=3, conv_dim=len(lat_shape), acts=tuple(acts),
        bias=not zee2sym,
    )
    mask = nf.mask.EvenOddMask(shape=lat_shape)
    keys = jax.random.split(key, n_layers)
    flows.append(AffineCoupling_(
        nets=tuple(ConvAct.build(k, **conv_kwargs) for k in keys),
        mask=mask,
    ))

    # 4. final elementwise activation flow
    if knots4_len > 1:
        flows.append(DistConvertor_.build(knots4_len, symmetric=zee2sym,
                                          smooth=True))

    return ModuleList_(flows=tuple(flows))


# =============================================================================
if __name__ == "__main__":
    from argparse import ArgumentParser

    parser = ArgumentParser()
    add = parser.add_argument
    add("--lat_shape", type=str)
    add("--m_sq", type=float)
    add("--lambd", type=float)
    add("--kappa", type=float)
    add("--knots0_len", type=int)
    add("--knots1_len", type=int)
    add("--knots2_len", type=int)
    add("--knots4_len", type=int)
    add("--zee2sym", type=lambda s: s.lower() in ("1", "true", "yes"))
    add("--batch_size", type=int)
    add("--n_epochs", type=int)
    add("--n_devices", type=int)
    add("--lr", type=float)
    add("--n_layers", type=int)
    add("--hidden_sizes", type=str)
    add("--snapshot_path", type=str)
    add("--seed", type=int)

    args = {k: v for k, v in vars(parser.parse_args()).items() if v is not None}
    import ast
    for k in ("lat_shape", "hidden_sizes"):
        if k in args:
            args[k] = ast.literal_eval(args[k])
    main(**args)
