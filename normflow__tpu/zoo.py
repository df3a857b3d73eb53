"""Model zoo: canonical builders for the benchmark / example configurations.

These assemble the BASELINE.json configurations from the framework's
components so benchmarks, examples, and the driver entry points share one
definition.  The phi^4 flagship defaults are the measured winners of the
round-1 architecture study (scripts/exp_packed.py):

- checkerboard-PACKED coupling partitions (conditioner runs on half the
  sites; +50% sampling throughput vs the reference's multiplicative layout)
- a row-parity feature channel so shared-weight convs are consistent on the
  packed grid (recovers the ESS the bare packing loses)
- one RQ-spline coupling block of 4 alternating conv conditioners between
  PSD/DistConvertor stages.
"""

from __future__ import annotations

import jax
import numpy as np

from .models import actions as _action
from .models import masks as _mask
from .models import priors as _prior
from .models import PackedEvenOddMask
from .models.nets import RowParityFeature
from .nn import (
    ConvAct, DistConvertor_, FFTNet_, MeanFieldNet_, ModuleList_, PSDBlock_,
    RQSplineCoupling_,
)
from .training.model import Model

__all__ = ["build_phi4_model", "build_u1_model", "with_conv_compute_dtype"]


def with_conv_compute_dtype(net_, dtype):
    """Copy of a flow with every ``ConvNet``'s compute dtype overridden.

    ``with_conv_compute_dtype(net_, 'bfloat16')`` after f32 training runs
    the coupling conditioner convs on the MXU in bf16 during sampling:
    measured +9.9% raw throughput for -1% ESS on the 32x32 flagship
    (docs/EXPERIMENTS.md).  Metropolis exactness is unaffected -- logq and
    the sample come from the same program."""
    from .models.nets import ConvNet

    is_conv = lambda n: isinstance(n, ConvNet)
    return jax.tree_util.tree_map(
        lambda n: n.replace(compute_dtype=dtype) if is_conv(n) else n,
        net_, is_leaf=is_conv)


def build_phi4_model(lat_shape=(32, 32), *, kappa=0.6, m_sq=-2.4, lambd=0.5,
                     knots=8, hidden=(24, 24), n_layers=4, dc_knots=16,
                     packed=True, parity_feature=None, kernel_size=3,
                     coupling_backend="xla", seed=0, dtype=None,
                     conv_dilations=None) -> Model:
    """The 2-D phi^4 flagship: PSD block -> DistConvertor -> RQ-spline
    coupling stack -> DistConvertor (BASELINE configs 2-4).

    ``knots=8`` is the round-5 knots-at-convergence winner
    (docs/EXPERIMENTS.md): at the converged 96k-epoch protocol it trades
    -0.031 ESS for +12% raw = +7.1% effective rate over 12 knots (the
    round-2 "8 knots loses ESS" reading was optimization-limited at 12k
    epochs; 12 knots remains the per-site-QUALITY winner, ESS 0.7219 vs
    0.6907, and is what the coarse-to-fine volume-transfer recipes use).
    ``hidden=(24, 24)``: 24-channel conditioner convs cost no raw speed
    on the bf16 MXU sampling path and buy +1.5% ESS over 16 (interleaved
    A/B; 32 channels cross a tile boundary and lose 11% raw)."""
    lat_shape = tuple(lat_shape)
    if parity_feature is None:
        parity_feature = packed
    if packed:
        mask = PackedEvenOddMask(shape=lat_shape)
    else:
        mask = _mask.EvenOddMask(shape=lat_shape)

    in_ch = 2 if parity_feature else 1
    conv_kwargs = dict(
        in_channels=in_ch, out_channels=3 * knots - 2,
        hidden_sizes=tuple(hidden), kernel_size=kernel_size,
        conv_dim=len(lat_shape), acts=("tanh",) * len(hidden) + (None,),
        bias=False, dtype=dtype, dilations=conv_dilations)

    def make_net(k):
        net = ConvAct.build(k, **conv_kwargs)
        return RowParityFeature(net=net) if parity_feature else net

    keys = jax.random.split(jax.random.key(seed), n_layers)
    net_ = ModuleList_(flows=(
        PSDBlock_(
            mfnet=MeanFieldNet_.build(8, symmetric=True, smooth=True,
                                      final_scale=True, dtype=dtype),
            fftnet=FFTNet_.build(lat_shape, knots_len=8, ignore_zeromode=True,
                                 dtype=dtype),
        ),
        DistConvertor_.build(dc_knots, symmetric=True, smooth=True,
                             dtype=dtype),
        RQSplineCoupling_.build(
            tuple(make_net(k) for k in keys), mask=mask,
            xlim=(-4.0, 4.0), ylim=(-4.0, 4.0),
            extrap={"left": "linear", "right": "linear"},
            backend=coupling_backend),
        DistConvertor_.build(dc_knots, symmetric=True, smooth=True,
                             dtype=dtype),
    ))
    prior = _prior.NormalPrior.build(shape=lat_shape, dtype=dtype)
    action = _action.ScalarPhi4Action(kappa=kappa, m_sq=m_sq, lambd=lambd)
    return Model(net_=net_, prior=prior, action=action, seed=seed)


def build_u1_model(lat_shape=(16, 16), *, beta=2.0, knots_len=8, hidden=(16,),
                   n_cycles=4, seed=0, dtype=None) -> Model:
    """2-D U(1) gauge model with gauge-equivariant plaquette couplings
    (BASELINE config 5).

    ``n_cycles=4`` (at the 24k-epoch protocol) is the round-4 5-seed
    winner: mean 47.1k eff samples/s, worst seed 24.6k, ESS 0.13-0.32
    with NO training collapse in 5/5 seeds.  The shallower 2-cycle flow
    is 1.9x faster raw (stripe-restricted spline: 349k vs 185k samples/s)
    but diverges outright on 4 of 14 measured trajectories at >=48k
    epochs (accept -> 1e-4, unphysical plaquette), and at 24k epochs its
    best ESS (0.10) is below the WORST 4-cycle seed (0.13) — the round-3
    flip to 2 cycles rested on an unlucky 3-seed draw at a different
    steps_per_call trajectory seeding (full grid: docs/EXPERIMENTS.md
    round 4).  Exactness (Metropolis-corrected observables) is seed- and
    architecture-independent."""
    from .models.gauge import U1AngleAction, build_u1_gauge_flow

    lat_shape = tuple(lat_shape)
    flow = build_u1_gauge_flow(jax.random.key(seed), lat_shape,
                               knots_len=knots_len, hidden=hidden,
                               n_cycles=n_cycles, dtype=dtype)
    prior = _prior.UniformPrior.build(
        low=-np.pi * np.ones((2, *lat_shape)),
        high=np.pi * np.ones((2, *lat_shape)), dtype=dtype)
    return Model(net_=flow, prior=prior, action=U1AngleAction(beta=beta),
                 seed=seed)
