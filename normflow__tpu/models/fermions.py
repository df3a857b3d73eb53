r"""Staggered fermions: the Dirac log-determinant for the Schwinger model.

Completes ``SchwingerAction`` (models/actions.py): the reference sketches a
U(1)-gauge + staggered-fermion action but its fermion part is non-functional
(/root/reference/src/action/schwinger_action.py:8-32 -- unresolvable imports
and an undefined ``subtractive_term``).  This module supplies the working
TPU-native design: a vectorized construction of the staggered Dirac matrix
``D`` from U(1) links and a batched ``slogdet`` (differentiable, so the
fermion determinant participates in flow training).

Staggered (Kogut-Susskind) operator on a d-dim periodic lattice:

.. math::
    D_{x,y} = m\,\delta_{x,y} + \tfrac{1}{2}\sum_\mu \eta_\mu(x)
        \big[ U_\mu(x)\,\delta_{x+\hat\mu,y}
            - U^*_\mu(x-\hat\mu)\,\delta_{x-\hat\mu,y} \big],

with phases :math:`\eta_\mu(x) = (-1)^{x_0+\dots+x_{\mu-1}}` and (by
default) antiperiodic boundary conditions in the time direction (axis 0).
The hopping part is anti-Hermitian, so ``det D = prod(m^2 + |lambda|^2)``
is real and positive for ``m > 0`` -- ``slogdet``'s log-magnitude IS the
log-determinant.

Scaling note: ``D`` is ``V x V`` (V = lattice volume); the batched
``slogdet`` is an MXU-friendly LU factorization but cubic in V, so this is
the small-to-moderate-volume exact path (e.g. up to ~16x16).  Larger
volumes call for a stochastic estimator, which can be plugged into
``SchwingerAction.logdet_func`` the same way.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..struct import Pytree, static

__all__ = ["StaggeredFermionLogDet", "staggered_dirac_matrix",
           "build_schwinger_action", "SchwingerAngleAction"]


def _site_tables(lat_shape, antiperiodic_time=True):
    """Static index/phase tables for the staggered operator.

    Returns, per direction mu: forward/backward neighbor linear indices,
    eta phases, and boundary signs (antiperiodic wrap in time).
    """
    lat_shape = tuple(lat_shape)
    ndim = len(lat_shape)
    coords = np.stack(np.meshgrid(
        *[np.arange(n) for n in lat_shape], indexing="ij"), axis=0)
    coords = coords.reshape(ndim, -1)  # (ndim, V)

    def lin(c):
        idx = np.zeros(c.shape[1], dtype=np.int64)
        for mu in range(ndim):
            idx = idx * lat_shape[mu] + c[mu]
        return idx

    nbr_plus, nbr_minus, eta, sgn_plus, sgn_minus = [], [], [], [], []
    for mu in range(ndim):
        cp = coords.copy()
        cp[mu] = (cp[mu] + 1) % lat_shape[mu]
        cm = coords.copy()
        cm[mu] = (cm[mu] - 1) % lat_shape[mu]
        nbr_plus.append(lin(cp))
        nbr_minus.append(lin(cm))
        eta.append((-1.0) ** coords[:mu].sum(axis=0))
        if antiperiodic_time and mu == 0:
            sgn_plus.append(np.where(coords[0] == lat_shape[0] - 1, -1.0, 1.0))
            sgn_minus.append(np.where(coords[0] == 0, -1.0, 1.0))
        else:
            sgn_plus.append(np.ones(coords.shape[1]))
            sgn_minus.append(np.ones(coords.shape[1]))
    return nbr_plus, nbr_minus, eta, sgn_plus, sgn_minus, coords


def staggered_dirac_matrix(links, mass, *, antiperiodic_time=True):
    """Dense staggered Dirac matrices ``(batch, V, V)`` from U(1) links.

    ``links``: complex ``(batch, ndim, *lat_shape)`` (layout of
    ``U1GaugeAction``); real input is interpreted as link ANGLES.
    """
    if not jnp.iscomplexobj(links):
        links = jnp.exp(1j * links)
    batch = links.shape[0]
    ndim = links.shape[1]
    lat_shape = links.shape[2:]
    V = int(np.prod(lat_shape))
    u = links.reshape(batch, ndim, V)

    tables = _site_tables(lat_shape, antiperiodic_time)
    nbr_plus, nbr_minus, eta, sgn_plus, sgn_minus = tables[:5]

    rows = jnp.arange(V)
    D = jnp.zeros((batch, V, V), dtype=u.dtype)
    D = D.at[:, rows, rows].add(jnp.asarray(mass, u.dtype))
    for mu in range(ndim):
        w_plus = jnp.asarray(0.5 * eta[mu] * sgn_plus[mu], u.dtype)
        w_minus = jnp.asarray(0.5 * eta[mu] * sgn_minus[mu], u.dtype)
        # forward hop: + eta(x)/2 * U_mu(x) at (x, x+mu)
        D = D.at[:, rows, jnp.asarray(nbr_plus[mu])].add(w_plus * u[:, mu])
        # backward hop: - eta(x)/2 * conj(U_mu(x-mu)) at (x, x-mu)
        u_behind = u[:, mu][:, jnp.asarray(nbr_minus[mu])]
        D = D.at[:, rows, jnp.asarray(nbr_minus[mu])].add(
            -w_minus * jnp.conjugate(u_behind))
    return D


def _eo_tables(lat_shape, antiperiodic_time=True):
    """Even/odd-block index tables for the Schur-complement construction."""
    lat_shape = tuple(lat_shape)
    V = int(np.prod(lat_shape))
    nbr_plus, nbr_minus, eta, sgn_plus, sgn_minus, coords = _site_tables(
        lat_shape, antiperiodic_time)
    parity = coords.sum(axis=0) % 2
    even = np.nonzero(parity == 0)[0]
    pos = np.full(V, -1, dtype=np.int64)  # linear index -> position in block
    pos[even] = np.arange(even.size)
    odd = np.nonzero(parity == 1)[0]
    pos[odd] = np.arange(odd.size)
    return even, odd, pos, nbr_plus, nbr_minus, eta, sgn_plus, sgn_minus


def staggered_eo_hopping(links, *, antiperiodic_time=True):
    """The even->odd hopping block ``A_eo`` (batch, V/2, V/2): rows are even
    sites, columns odd sites.  The staggered operator in the even/odd basis
    is ``[[m I, A_eo], [-A_eo^H, m I]]`` (the hopping is anti-Hermitian and
    strictly parity-changing)."""
    if not jnp.iscomplexobj(links):
        links = jnp.exp(1j * links)
    batch, ndim = links.shape[:2]
    lat_shape = links.shape[2:]
    V = int(np.prod(lat_shape))
    if any(n % 2 for n in lat_shape):
        # an odd extent makes the periodic wrap connect SAME-parity sites,
        # so the hopping is no longer strictly parity-changing and the
        # even/odd Schur identity silently breaks -- require all-even.
        raise ValueError("even-odd log-det needs every lattice extent even; "
                         f"got {lat_shape} (use method='dense')")
    u = links.reshape(batch, ndim, V)
    even, odd, pos, nbr_plus, nbr_minus, eta, sgn_plus, sgn_minus = \
        _eo_tables(lat_shape, antiperiodic_time)

    A = jnp.zeros((batch, V // 2, V // 2), dtype=u.dtype)
    rows = jnp.asarray(pos[even])
    for mu in range(ndim):
        w_plus = jnp.asarray((0.5 * eta[mu] * sgn_plus[mu])[even],
                             u.dtype)
        w_minus = jnp.asarray((0.5 * eta[mu] * sgn_minus[mu])[even],
                              u.dtype)
        cols_p = jnp.asarray(pos[nbr_plus[mu][even]])
        A = A.at[:, rows, cols_p].add(w_plus * u[:, mu][:, even])
        cols_m = jnp.asarray(pos[nbr_minus[mu][even]])
        u_behind = u[:, mu][:, nbr_minus[mu][even]]
        A = A.at[:, rows, cols_m].add(-w_minus * jnp.conjugate(u_behind))
    return A


class StaggeredFermionLogDet(Pytree):
    """Per-sample ``log det D`` of the staggered operator (batched, exact).

    ``n_copies`` multiplies the log-det (number of staggered fields; one
    staggered field in 2-D describes N_f = 2 continuum flavors).  Plug an
    instance into ``SchwingerAction.build(logdet_func=...)``.

    ``method='schur'`` (default) uses the even/odd Schur complement: the
    hopping is strictly parity-changing, so
    ``det D = det(m^2 I + A_eo^H A_eo)`` over the half lattice -- a
    Hermitian POSITIVE-DEFINITE matrix, evaluated by batched Cholesky
    (~8x fewer FLOPs than LU on the full matrix, MXU-friendly, and real
    by construction).  ``method='dense'`` keeps the full-matrix
    ``slogdet`` as the oracle path.
    """

    lat_shape: tuple = static()
    mass: float = static(default=0.1)
    n_copies: int = static(default=1)
    antiperiodic_time: bool = static(default=True)
    method: str = static(default="schur")

    def __call__(self, cfgs):
        if self.lat_shape and tuple(cfgs.shape[2:]) != tuple(self.lat_shape):
            raise ValueError(
                f"configs have lattice {tuple(cfgs.shape[2:])} but this "
                f"log-det was built for {tuple(self.lat_shape)}")
        if self.method == "schur":
            A = staggered_eo_hopping(
                cfgs, antiperiodic_time=self.antiperiodic_time)
            n_half = A.shape[-1]
            gram = (self.mass**2) * jnp.eye(n_half, dtype=A.dtype) \
                + jnp.einsum("bji,bjk->bik", jnp.conjugate(A), A)
            L = jnp.linalg.cholesky(gram)
            diag = jnp.real(jnp.diagonal(L, axis1=-2, axis2=-1))
            logabs = 2.0 * jnp.sum(jnp.log(diag), axis=-1)
        else:
            D = staggered_dirac_matrix(
                cfgs, self.mass, antiperiodic_time=self.antiperiodic_time)
            _, logabs = jnp.linalg.slogdet(D)
        return self.n_copies * logabs


class SchwingerAngleAction(Pytree):
    r"""Schwinger-model action on LINK ANGLES:

    .. math::
        S(\theta) = -\beta \sum_x \cos P(x) - N_c \log\det D[e^{i\theta}]

    Angle-variable counterpart of :func:`build_schwinger_action`, matching
    the gauge-equivariant flows in ``models.gauge`` (which work in angle
    variables).  ``theta``: real ``(batch, ndim, *lat_shape)``.
    """

    beta: float = static(default=1.0)
    lat_shape: tuple = static(default=())
    mass: float = static(default=0.1)
    n_copies: int = static(default=1)
    antiperiodic_time: bool = static(default=True)
    method: str = static(default="schur")

    def __call__(self, theta):
        return self.action(theta)

    def action(self, theta):
        from .gauge import U1AngleAction

        gauge = U1AngleAction(beta=self.beta).action(theta)
        logdet = StaggeredFermionLogDet(
            lat_shape=self.lat_shape, mass=self.mass,
            n_copies=self.n_copies, method=self.method,
            antiperiodic_time=self.antiperiodic_time)(theta)
        return gauge - logdet

    def calc_topo_charge(self, theta):
        from .gauge import U1AngleAction

        return U1AngleAction(beta=self.beta).calc_topo_charge(theta)

    def log_prob(self, x, action_logz=0.0):
        return -self.action(x) - action_logz


def build_schwinger_action(*, beta, lat_shape, mass=0.1, n_copies=1,
                           antiperiodic_time=True, method="schur"):
    """A working Schwinger-model action: Wilson U(1) gauge part + exact
    staggered-fermion log-det (what reference schwinger_action.py:13-41
    sketches)."""
    from .actions import SchwingerAction

    return SchwingerAction.build(
        beta=beta, ndim=len(lat_shape),
        logdet_func=StaggeredFermionLogDet(
            lat_shape=tuple(lat_shape), mass=mass, n_copies=n_copies,
            method=method, antiperiodic_time=antiperiodic_time))
