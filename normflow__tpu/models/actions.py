r"""Lattice actions (target log-densities).

TPU-native re-design of /root/reference/src/action/: each action is a pytree
of (possibly trainable) couplings with ``__call__(cfgs) -> per-sample action``.
The hot path -- the phi^4 stencil -- is expressed as rolls + elementwise +
reduction, which XLA fuses into a single HBM-bandwidth-bound kernel; a Pallas
fused variant lives in ``normflow__tpu.ops.kernels``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..struct import Pytree, static

__all__ = [
    "ScalarPhi4Action", "GaugeAction", "U1GaugeAction", "MatrixAction",
    "SchwingerAction", "calc_trace", "calc_reduced_trace",
]


class ScalarPhi4Action(Pytree):
    r"""The phi^4 action

    .. math::
        S = \sum_x \big( w_2 \phi^2 + w_4 \phi^4 \big)
            - w_0 \sum_{x,\mu} \phi(x) \phi(x+\hat\mu)

    with lattice-spacing-absorbed couplings (reference
    scalar_action.py:9-69; ``get_coef`` at l.22-33).
    """

    m_sq: float = static(default=0.0)
    lambd: float = static(default=0.0)
    kappa: float = static(default=1.0)
    a: float = static(default=1.0)
    backend: str = static(default="xla")  # 'xla' | 'pallas'

    def get_coef(self, lat_ndim: int):
        a = self.a
        kappa = self.kappa * a ** (lat_ndim - 2)
        m_sq = self.m_sq * a**lat_ndim
        lambd = self.lambd * a**lat_ndim
        w0 = 0.5 * (2 * kappa)
        w2 = 0.5 * (m_sq + 2 * kappa * lat_ndim)
        w4 = lambd
        return w0, w2, w4

    def __call__(self, cfgs):
        return self.action(cfgs)

    def action(self, cfgs):
        """Per-sample action; axis 0 is the batch axis."""
        dims = tuple(range(1, cfgs.ndim))
        w0, w2, w4 = self.get_coef(cfgs.ndim - 1)
        if self.backend == "pallas" and 1 <= cfgs.ndim - 1 <= 3:
            from ..ops.kernels import phi4_action_pallas

            return phi4_action_pallas(cfgs, w0, w2, w4)
        phi2 = cfgs * cfgs
        act = jnp.sum(w2 * phi2 + w4 * phi2 * phi2, axis=dims)
        if w0 != 0.0:
            for mu in dims:
                act = act - w0 * jnp.sum(cfgs * jnp.roll(cfgs, 1, mu), axis=dims)
        return act

    def action_density(self, cfgs):
        """Symmetric positive-kinetic action density (scalar_action.py:48-62)."""
        dims = tuple(range(1, cfgs.ndim))
        w0, w2, w4 = self.get_coef(cfgs.ndim - 1)
        w2 = w2 - w0 * (cfgs.ndim - 1)
        phi2 = cfgs * cfgs
        dens = w2 * phi2 + w4 * phi2 * phi2
        for mu in dims:
            dens = dens + (w0 / 4) * (cfgs - jnp.roll(cfgs, -1, mu)) ** 2
            dens = dens + (w0 / 4) * (cfgs - jnp.roll(cfgs, +1, mu)) ** 2
        return dens

    def potential(self, x):
        return self.m_sq * x**2 + self.lambd * x**4

    def log_prob(self, x, action_logz=0.0):
        return -self.action(x) - action_logz


def calc_trace(x):
    return jnp.sum(jnp.diagonal(x, axis1=-2, axis2=-1), axis=-1)


def calc_reduced_trace(x):
    """Reduced trace = trace / n (reference gauge_action.py:99-100)."""
    return jnp.mean(jnp.diagonal(x, axis1=-2, axis2=-1), axis=-1)


class GaugeAction(Pytree):
    r"""Wilson plaquette action ``S = -beta sum Re tr'(plaq)``.

    Mirrors ``GaugeAction`` (reference gauge_action.py:11-70).  Link layout:
    ``cfgs[batch, mu, *lattice, nc, nc]`` -- direction axis 1, matrix axes
    last (MXU-friendly batched matmuls for the plaquette products).
    """

    beta: float = static(default=1.0)
    ndim: int = static(default=2)
    nc: int = static(default=2)

    def __call__(self, cfgs):
        return self.action(cfgs)

    def action(self, cfgs):
        dims = tuple(range(1, 1 + self.ndim))
        act = 0.0
        for mu in range(1, self.ndim):
            for nu in range(mu):
                act = act + jnp.sum(self.calc_plaq(cfgs, mu=mu, nu=nu), axis=dims)
        return -self.beta * act

    def action_density(self, cfgs):
        dens = 0.0
        for mu in range(1, self.ndim):
            for nu in range(mu):
                dens = dens + self.calc_plaq(cfgs, mu=mu, nu=nu)
        return -self.beta * dens

    def calc_plaq(self, cfgs, *, mu, nu, real=True):
        """Plaquette in the (mu, nu) plane (reference gauge_action.py:47-56).

        Lattice axes start at 2 (batch, direction, *lattice, ...).
        """
        x_mu = cfgs[:, mu]
        x_nu = cfgs[:, nu]
        plaq = self.plaq_rule(
            x_mu,
            jnp.roll(x_nu, -1, axis=1 + mu),
            jnp.roll(x_mu, -1, axis=1 + nu),
            x_nu,
        )
        return jnp.real(plaq) if real else plaq

    @staticmethod
    def plaq_rule(a, b, c, d):
        adj = lambda m: jnp.swapaxes(jnp.conjugate(m), -1, -2)
        return calc_reduced_trace((a @ b) @ adj(d @ c))

    def log_prob(self, x, action_logz=0.0):
        return -self.action(x) - action_logz

    @property
    def parameters(self):
        return dict(beta=self.beta, ndim=self.ndim)


class U1GaugeAction(GaugeAction):
    """U(1) specialization: links are complex phases, not matrices.

    Mirrors ``U1GaugeAction`` (reference gauge_action.py:73-92); layout
    ``cfgs[batch, mu, *lattice]`` complex.
    """

    nc: int = static(default=1)

    @staticmethod
    def plaq_rule(a, b, c, d):
        return a * b * jnp.conjugate(d * c)

    def calc_topo_charge(self, cfgs):
        """Topological charge from plaquette angles (gauge_action.py:83-92)."""
        topo = 0.0
        for mu in range(1, self.ndim):
            for nu in range(mu):
                ang = jnp.angle(self.calc_plaq(cfgs, mu=mu, nu=nu, real=False))
                dims = tuple(range(1, ang.ndim))
                topo = topo + jnp.sum(ang, axis=dims) / (2 * np.pi)
        return topo


class SchwingerAction(Pytree):
    r"""Schwinger model: U(1) gauge action + fermion log-determinant.

    The reference's version is non-functional (unresolvable imports and an
    undefined name -- schwinger_action.py:9-10,32; SURVEY §2.14.2).  This is
    the working design it sketches: the bosonic Wilson part plus a pluggable
    ``logdet_func(cfgs) -> per-sample log det`` for the (staggered) fermion
    determinant.
    """

    gauge: U1GaugeAction
    logdet_func: Any = static(default=None)

    @classmethod
    def build(cls, *, beta, ndim=2, logdet_func=None):
        return cls(gauge=U1GaugeAction(beta=beta, ndim=ndim),
                   logdet_func=logdet_func)

    def __call__(self, cfgs):
        return self.action(cfgs)

    def action(self, cfgs):
        act = self.gauge.action(cfgs)
        if self.logdet_func is not None:
            act = act - self.logdet_func(cfgs)
        return act

    def log_prob(self, x, action_logz=0.0):
        return -self.action(x) - action_logz


class MatrixAction(Pytree):
    r"""Matrix-model action ``S = -beta re tr'(M Gamma)``.

    Mirrors ``MatrixAction`` (reference matrix_action.py:9-49); the optional
    ``staples_matrix`` is the Gamma coupling matrix.
    """

    beta: float = static(default=1.0)
    staples_matrix: jax.Array | None = None

    def __call__(self, cfgs):
        return self.action(cfgs)

    def action(self, cfgs):
        act = self.action_density(cfgs)
        if act.ndim > 1:
            act = jnp.sum(act, axis=tuple(range(1, act.ndim)))
        return act

    def action_density(self, cfgs):
        if self.staples_matrix is not None:
            cfgs = cfgs @ self.staples_matrix
        return -self.beta * jnp.real(calc_reduced_trace(cfgs))

    def log_prob(self, x, action_logz=0.0):
        return -self.action(x) - action_logz

    @property
    def parameters(self):
        return {"beta": self.beta}


# staggered-fermion log-det for SchwingerAction (namespace convenience)
from .fermions import (  # noqa: E402
    StaggeredFermionLogDet, build_schwinger_action, staggered_dirac_matrix,
)

__all__ += ["StaggeredFermionLogDet", "build_schwinger_action",
            "staggered_dirac_matrix"]
