r"""Gauge-equivariant U(1) flows: plaquette couplings with circular splines.

The gauge-sector extension (BASELINE.json config 5).  The reference package
ships the ingredients (``U1GaugeAction``, ``PhaseDistConvertor_``, gauge
masks) but no complete gauge flow; this module provides the standard
construction for 2-D U(1) (masked plaquette couplings, after Kanwar et al.,
arXiv:2003.06413, re-derived here for TPU layouts):

- flow variables are link angles ``theta[b, mu, x0, x1]`` in [-pi, pi);
- a coupling layer transforms the *plaquette angles* of an "active" stripe
  of columns with a circular rational-quadratic spline conditioned on
  gauge-invariant features (cos/sin of frozen plaquettes), then pushes the
  change into one link per active plaquette;
- every input to the conditioner is a plaquette (gauge invariant), the
  transformed quantity is a plaquette, and the link update is equivariant,
  so the whole flow is gauge equivariant by construction;
- log-Jacobian: d theta'/d theta = f'(P) per active link.

Masking: updating link ``theta_1(x)`` changes plaquettes ``P(x)`` and
``P(x - e0)``; with active columns ``x0 = offset (mod 4)``, plaquettes at
``offset+1, offset+2`` are frozen (conditioners), ``offset+3`` are passive.
Cycling ``offset`` 0..3 and both link directions gives 8 layer orientations
that together update every link.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import spline as sp
from ..struct import Pytree, static
from .core import Flow
from .elementwise import softplus_log2

__all__ = ["U1PlaquetteCoupling", "U1AngleAction", "u1_plaq_angle",
           "build_u1_gauge_flow"]

_PI = float(np.pi)


def wrap_angle(x):
    """Wrap to [-pi, pi)."""
    return (x + _PI) % (2 * _PI) - _PI


def u1_plaq_angle(theta):
    """Plaquette angle ``P(x) = t0(x) + t1(x+e0) - t0(x+e1) - t1(x)``.

    ``theta``: (..., 2, L0, L1) link angles; lattice axes are the last two.
    """
    t0 = theta[..., 0, :, :]
    t1 = theta[..., 1, :, :]
    return wrap_angle(t0 + jnp.roll(t1, -1, -2) - jnp.roll(t0, -1, -1) - t1)


class U1AngleAction(Pytree):
    r"""Wilson action on link angles: ``S = -beta sum_x cos P(x)``.

    Angle-variable counterpart of ``U1GaugeAction``
    (reference gauge_action.py:73-92, which acts on complex links).
    """

    beta: float = static(default=1.0)

    def __call__(self, theta):
        return self.action(theta)

    def action(self, theta):
        p = u1_plaq_angle(theta)
        return -self.beta * jnp.sum(jnp.cos(p), axis=tuple(range(1, p.ndim)))

    def action_density(self, theta):
        return -self.beta * jnp.cos(u1_plaq_angle(theta))

    def calc_topo_charge(self, theta):
        p = u1_plaq_angle(theta)
        return jnp.sum(p, axis=tuple(range(1, p.ndim))) / (2 * _PI)

    def log_prob(self, x, action_logz=0.0):
        return -self.action(x) - action_logz


def _circular_spline_knots(out):
    """Circular RQ-spline knots on [-pi, pi] from ``3(m-1)`` net channels.

    Endpoints pinned to (+-pi, +-pi); the boundary derivative is shared
    (d[0] == d[m-1]) so the map is a C^1 circle diffeomorphism.
    """
    n = out.shape[-1]
    m1 = n // 3  # = m - 1 segments
    wx, wy, wd = jnp.split(out, [m1, 2 * m1], axis=-1)

    def coords(w):
        return sp.knot_coords(w, -_PI, 2 * _PI)

    kx = coords(wx)
    ky = coords(wy)
    d = softplus_log2(wd)
    kd = jnp.concatenate([d, d[..., :1]], axis=-1)  # periodic derivative
    return kx, ky, kd


class U1PlaquetteCoupling(Flow):
    """One masked plaquette-coupling layer for 2-D U(1).

    ``mu``: which link direction is updated (0 or 1); ``offset``: the active
    stripe phase (columns/rows with ``coord % 4 == offset``).  ``net`` maps
    2 channels (cos, sin of masked frozen plaquettes, channels-last) to
    ``3(m-1)`` spline-parameter channels.
    """

    net: Any
    mu: int = static(default=1)
    offset: int = static(default=0)
    label: str | None = static(default="u1_plaq_coupling_")

    # stripe axis: updating theta_mu couples plaquettes along axis (1 - mu)
    # of the plaquette lattice -- stripes run across lattice axis mu's
    # conjugate coordinate.
    @property
    def _axis(self):
        # lattice coordinate whose value defines the stripes
        return 0 if self.mu == 1 else 1

    def _masks(self, shape, dtype):
        l = shape[self._axis]
        assert l % 4 == 0, "stripe masking needs the lattice dim % 4 == 0"
        coord = np.arange(l) % 4
        active = (coord == self.offset)
        frozen = (coord == (self.offset + 1) % 4) | \
                 (coord == (self.offset + 2) % 4)
        if self._axis == 0:
            a, f = active.reshape(-1, 1), frozen.reshape(-1, 1)
        else:
            a, f = active.reshape(1, -1), frozen.reshape(1, -1)
        ones = np.ones(shape)
        return (jnp.asarray(a * ones, dtype), jnp.asarray(f * ones, dtype))

    def _spline_params(self, p_frozen_masked):
        feats = jnp.stack([jnp.cos(p_frozen_masked),
                           jnp.sin(p_frozen_masked)], axis=-1)
        return self.net(feats)

    def _stripe_idx(self, arr, trailing):
        """Index tuple selecting the active stripe (every 4th row/col of
        the lattice axes, which sit ``trailing`` axes before the end)."""
        idx = [slice(None)] * arr.ndim
        idx[arr.ndim - 2 - trailing + self._axis] = slice(
            self.offset, None, 4)
        return tuple(idx)

    def _transform(self, theta, inverse):
        p = u1_plaq_angle(theta)
        lat_shape = p.shape[-2:]
        _, frozen = self._masks(lat_shape, p.dtype)
        out = self._spline_params(p * frozen)
        # The active stripe is 1/4 of the sites.  The conditioner conv must
        # see the full (masked) lattice, but the VPU-heavy part -- knot
        # construction (softmax/cumsum over 3(m-1) channels) and the RQ
        # transform -- only matters on the active stripe: restrict it there
        # with a static strided slice instead of transforming all sites
        # and masking (values on non-active sites were always discarded).
        p_act = p[self._stripe_idx(p, 0)]
        kx, ky, kd = _circular_spline_knots(out[self._stripe_idx(out, 1)])
        p_new, g = sp.rqs(p_act, kx, ky, kd, inverse=inverse)
        delta = wrap_angle(p_new - p_act)
        # theta_mu(x) appears in P(x) with coefficient c = +1 for mu=0 and
        # c = -1 for mu=1; solve P'(x) = P(x) + delta by shifting that one
        # link (which no frozen plaquette contains): d theta = delta / c.
        c = 1.0 if self.mu == 0 else -1.0
        theta_mu = theta[..., self.mu, :, :]
        stripe = self._stripe_idx(theta_mu, 0)
        theta_mu = theta_mu.at[stripe].set(
            wrap_angle(theta_mu[stripe] + c * delta))
        theta = theta.at[..., self.mu, :, :].set(theta_mu)
        return theta, jnp.log(g)  # logg on the active stripe only

    def forward(self, x, log0=0.0, *, density: bool = False):
        theta, logg = self._transform(x, inverse=False)
        return theta, log0 + self._reduce(logg, x, density)

    def backward(self, x, log0=0.0, *, density: bool = False):
        theta, logg = self._transform(x, inverse=True)
        return theta, log0 + self._reduce(logg, x, density)

    def _reduce(self, logg, x, density):
        if density:
            # spread the plaquette-density over the updated link entries
            zmu = jnp.zeros_like(x[..., self.mu, :, :])
            zmu = zmu.at[self._stripe_idx(zmu, 0)].set(logg)
            return jnp.zeros_like(x).at[..., self.mu, :, :].set(zmu)
        # logg lives on the active stripe; sum all non-batch axes
        n_batch = logg.ndim - 2
        return jnp.sum(logg, axis=tuple(range(n_batch, logg.ndim)))


def build_u1_gauge_flow(key, lat_shape, knots_len=8, hidden=(16,),
                        n_cycles=1, dtype=None):
    """Stack of 8 plaquette couplings per cycle (both directions x 4
    offsets), updating every link.  Returns a ``FlowList``."""
    from .core import FlowList
    from .nets import ConvNet

    m1 = knots_len - 1
    layers = []
    n_layers = 8 * n_cycles
    keys = jax.random.split(key, n_layers)
    i = 0
    for _ in range(n_cycles):
        for mu in (0, 1):
            for offset in range(4):
                net = ConvNet.build(
                    keys[i], 2, 3 * m1, kernel_size=3, conv_dim=2,
                    hidden_sizes=tuple(hidden),
                    acts=("tanh",) * len(hidden) + (None,), dtype=dtype)
                layers.append(U1PlaquetteCoupling(net=net, mu=mu,
                                                  offset=offset))
                i += 1
    return FlowList(flows=tuple(layers))
