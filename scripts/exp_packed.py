"""TPU experiment: packed-checkerboard flagship vs baseline."""
import jax, time, optax
import numpy as np
import normflow__tpu as nf
from normflow__tpu.training.losses import calc_ess
from normflow__tpu.nn import (ModuleList_, RQSplineCoupling_, ConvAct,
    DistConvertor_, PSDBlock_, MeanFieldNet_, FFTNet_)


def flagship(packed=False, m=8, hidden=(16,16), lat=(32,32), dc_knots=16,
             compute_dtype=None, seed=0, parity_feature=False, ksize=3):
    from normflow__tpu.models.nets import RowParityFeature
    if packed:
        mask = nf.models.PackedEvenOddMask(shape=lat)
    else:
        mask = nf.mask.EvenOddMask(shape=lat)
    in_ch = 2 if parity_feature else 1
    conv_kwargs = dict(in_channels=in_ch, out_channels=3*m-2, hidden_sizes=hidden,
        kernel_size=ksize, conv_dim=2, acts=('tanh',)*len(hidden)+(None,),
        bias=False, compute_dtype=compute_dtype)
    keys = jax.random.split(jax.random.key(seed), 4)
    mknet = (lambda kk: RowParityFeature(net=ConvAct.build(kk, **conv_kwargs)))         if parity_feature else (lambda kk: ConvAct.build(kk, **conv_kwargs))
    net = ModuleList_(flows=(
        PSDBlock_(mfnet=MeanFieldNet_.build(8, symmetric=True, smooth=True,
                                            final_scale=True),
                  fftnet=FFTNet_.build(lat, knots_len=8, ignore_zeromode=True)),
        DistConvertor_.build(dc_knots, symmetric=True, smooth=True),
        RQSplineCoupling_.build(
            tuple(mknet(kk) for kk in keys), mask=mask,
            xlim=(-4.,4.), ylim=(-4.,4.),
            extrap={'left':'linear','right':'linear'}),
        DistConvertor_.build(dc_knots, symmetric=True, smooth=True),
    ))
    return nf.Model(net_=net, prior=nf.prior.NormalPrior.build(shape=lat),
        action=nf.action.ScalarPhi4Action(kappa=0.6, m_sq=-2.4, lambd=0.5),
        seed=seed)


def measure(model, tag, pallas=True):
    if pallas:
        flows = list(model.net_.flows)
        flows[2] = flows[2].replace(backend='pallas')
        model.net_ = model.net_.replace(flows=tuple(flows))
    k = jax.random.key(99)
    lq = model.posterior.logqp_stream(20, 1024, key=k); jax.block_until_ready(lq)
    t0=time.time(); lq = model.posterior.logqp_stream(20, 1024, key=k); jax.block_until_ready(lq)
    sps = 20*1024/(time.time()-t0)
    ess = float(calc_ess(lq, 0.0))
    print(f'{tag}: samples/s={sps:.0f} ess={ess:.4f} eff/s={sps*ess:.0f}', flush=True)


def train(model, n, tag):
    t0=time.time()
    model.fit(n_epochs=n, batch_size=512,
        hyperparam=dict(lr=3e-3, weight_decay=1e-4),
        scheduler=optax.cosine_decay_schedule(1.0, decay_steps=n, alpha=0.05),
        steps_per_call=1000, checkpoint_dict=dict(print_stride=None))
    print(f'{tag}: trained {n} in {time.time()-t0:.0f}s', flush=True)


if __name__ == '__main__':
    import sys
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12000
    variant = sys.argv[2] if len(sys.argv) > 2 else 'packed'
    if variant == 'packed':
        mP = flagship(packed=True)
    elif variant == 'packed_pf':
        mP = flagship(packed=True, parity_feature=True)
    elif variant == 'packed_pf_k5':
        mP = flagship(packed=True, parity_feature=True, ksize=5)
    else:
        mP = flagship(packed=False)
    train(mP, n, f'{variant},{n}')
    measure(mP, f'{variant},{n}')
