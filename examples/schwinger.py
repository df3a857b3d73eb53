"""The Schwinger model: 2-D U(1) gauge theory with staggered fermions.

The working realization of what the reference sketches in
/root/reference/src/action/schwinger_action.py (non-functional there --
SURVEY §2.14.2): the gauge-equivariant plaquette-coupling flow of
``models.gauge`` trained against the Wilson action PLUS the exact staggered
Dirac log-determinant (``models.fermions``).  The fermion determinant is
differentiable (batched ``slogdet``), so it participates in flow training
like any other action term.

Small volumes by design: the exact determinant is cubic in the lattice
volume.  For larger volumes plug a stochastic log-det estimator into
``SchwingerAction.logdet_func``.
"""

import jax
import numpy as np

import normflow__tpu as nf
from normflow__tpu.models.fermions import SchwingerAngleAction
from normflow__tpu.models.gauge import build_u1_gauge_flow, u1_plaq_angle


def main(beta=2.0, mass=0.2, lat_shape=(8, 8), n_epochs=1000,
         batch_size=128, n_cycles=2, knots_len=8, lr=1e-3, seed=0,
         steps_per_call=None, n_devices=1):
    key = jax.random.key(seed)
    flow = build_u1_gauge_flow(key, lat_shape, knots_len=knots_len,
                               hidden=(16,), n_cycles=n_cycles)
    prior = nf.prior.UniformPrior.build(
        low=-np.pi * np.ones((2, *lat_shape)),
        high=np.pi * np.ones((2, *lat_shape)))
    action = SchwingerAngleAction(beta=beta, lat_shape=tuple(lat_shape),
                                  mass=mass, n_copies=1)
    model = nf.Model(net_=flow, prior=prior, action=action, seed=seed)
    print("number of model parameters =", model.net_.npar)

    if n_devices > 1:
        model.device_handler.use_mesh(n_devices=n_devices)

    model.fit(n_epochs=n_epochs, batch_size=batch_size,
              hyperparam=dict(lr=lr, weight_decay=0.0),
              steps_per_call=steps_per_call,
              checkpoint_dict=dict(print_stride=max(n_epochs // 10, 1)))

    out = model.mcmc.sample_chain(8, batch_size, collect_samples=True)
    theta = np.asarray(out["samples"]).reshape(-1, 2, *lat_shape)
    p = np.asarray(u1_plaq_angle(jax.numpy.asarray(theta)))
    q = p.sum(axis=(1, 2)) / (2 * np.pi)
    print(f"<cos P> = {np.cos(p).mean():.4f}   "
          f"topological charge: mean {q.mean():+.3f} std {q.std():.3f}   "
          f"accept_rate = {np.asarray(out['accept_rate']).mean():.3f}")
    return model


if __name__ == "__main__":
    main()
