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

__all__ = ["StaggeredFermionLogDet", "StochasticStaggeredLogDet",
           "staggered_dirac_matrix", "apply_staggered_hop",
           "apply_staggered_K", "build_schwinger_action",
           "SchwingerAngleAction"]


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


# ===================================================================== #
# Stencil (matrix-free) staggered operator + stochastic log-det
# ===================================================================== #
def _hop_phase_tables(lat_shape, antiperiodic_time=True):
    """Lattice-shaped phase tables for the roll-based hopping stencil.

    Returns, per direction mu, numpy arrays of shape ``lat_shape``:
    ``w_plus[mu] = eta_mu * sgn_plus_mu`` (forward-hop weight without the
    link) and ``w_minus[mu] = eta_mu * sgn_minus_mu``.
    """
    lat_shape = tuple(lat_shape)
    ndim = len(lat_shape)
    coords = np.stack(np.meshgrid(
        *[np.arange(n) for n in lat_shape], indexing="ij"), axis=0)
    w_plus, w_minus = [], []
    for mu in range(ndim):
        eta = (-1.0) ** coords[:mu].sum(axis=0) * np.ones(lat_shape)
        sp = np.ones(lat_shape)
        sm = np.ones(lat_shape)
        if antiperiodic_time and mu == 0:
            sp = np.where(coords[0] == lat_shape[0] - 1, -1.0, 1.0)
            sm = np.where(coords[0] == 0, -1.0, 1.0)
        w_plus.append(eta * sp)
        w_minus.append(eta * sm)
    return w_plus, w_minus


def apply_staggered_hop(links, v, *, antiperiodic_time=True):
    r"""Matrix-free hopping ``H v`` on full-lattice vectors (O(V) stencil).

    ``links``: complex ``(batch, ndim, *lat)`` (real input = link angles);
    ``v``: complex ``(batch, ..., *lat)`` -- extra leading axes (e.g. a
    probe axis) broadcast against the batch.  Implements

    .. math::
        (Hv)(x) = \tfrac12\sum_\mu \eta_\mu(x)\big[ s^+_\mu(x) U_\mu(x)
            v(x+\hat\mu) - s^-_\mu(x) U^*_\mu(x-\hat\mu) v(x-\hat\mu)\big],

    the hopping part of the staggered matrix built by
    :func:`staggered_dirac_matrix` (equal by construction; tested against
    the dense matrix).  ``H`` is anti-Hermitian.
    """
    if not jnp.iscomplexobj(links):
        links = jnp.exp(1j * links)
    ndim = links.shape[1]
    lat_shape = links.shape[2:]
    w_plus, w_minus = _hop_phase_tables(lat_shape, antiperiodic_time)
    # lattice dims are the trailing ndim axes of v
    out = jnp.zeros_like(v)
    extra = v.ndim - 1 - ndim  # leading axes beyond batch
    for mu in range(ndim):
        ax = v.ndim - ndim + mu
        u = links[:, mu]
        if extra:
            # leading probe/extra axes come BEFORE the batch axis in v
            u = u.reshape((1,) * extra + u.shape)
        wp = jnp.asarray(w_plus[mu], out.real.dtype)
        wm = jnp.asarray(w_minus[mu], out.real.dtype)
        out = out + 0.5 * wp * u * jnp.roll(v, -1, axis=ax)
        out = out - 0.5 * wm * jnp.roll(jnp.conjugate(u) * v, 1, axis=ax)
    return out


def apply_staggered_K(links, mass, v, *, antiperiodic_time=True):
    r"""Matrix-free ``K v`` with ``K = m^2 + H^\dagger H = m^2 - H^2``.

    ``K`` is Hermitian positive definite and block-diagonal in parity, with
    ``\log\det D = \tfrac12 \log\det K`` over the FULL lattice (for
    ``D = m + H``: ``D^\dagger D = (m - H)(m + H) = m^2 - H^2 = K`` and
    ``\det D`` is real positive for ``m > 0``).
    """
    hv = apply_staggered_hop(links, v, antiperiodic_time=antiperiodic_time)
    hhv = apply_staggered_hop(links, hv, antiperiodic_time=antiperiodic_time)
    return (mass * mass) * v - hhv


def _cg_batched(matvec, b, *, tol, maxiter, lat_ndim):
    """Conjugate gradients on a batch of independent Hermitian-PD systems.

    ``b``: complex ``(..., *lat)``; inner products reduce over the trailing
    ``lat_ndim`` axes only, so every leading index gets its own step sizes
    (exact per-system CG, unlike flattening the batch into one big system).
    Runs until every system's residual norm is below ``tol * |b|`` or
    ``maxiter`` iterations.
    """
    axes = tuple(range(b.ndim - lat_ndim, b.ndim))

    def dot(x, y):
        return jnp.sum(jnp.conjugate(x) * y, axis=axes).real

    def expand(s):
        return s.reshape(s.shape + (1,) * lat_ndim)

    b2 = dot(b, b)
    tol2 = (tol * tol) * b2

    def cond(state):
        _, r, _, rs, it = state
        return (it < maxiter) & jnp.any(rs > tol2)

    def body(state):
        x, r, p, rs, it = state
        kp = matvec(p)
        pkp = dot(p, kp)
        live = rs > tol2
        alpha = jnp.where(live, rs / jnp.where(pkp > 0, pkp, 1.0), 0.0)
        x = x + expand(alpha) * p
        r = r - expand(alpha) * kp
        rs_new = dot(r, r)
        beta = jnp.where(live, rs_new / jnp.where(rs > 0, rs, 1.0), 0.0)
        p = r + expand(beta) * p
        return x, r, p, rs_new, it + 1

    x0 = jnp.zeros_like(b)
    state = (x0, b, b, b2, jnp.asarray(0))
    x, _, _, rs, _ = jax.lax.while_loop(cond, body, state)
    return x


class StochasticStaggeredLogDet(Pytree):
    r"""Stochastic, matrix-free estimator of the staggered ``log det D``
    GRADIENT -- the scaling path past the exact O(V^3) evaluation
    (:class:`StaggeredFermionLogDet`; its own docstring names this
    estimator as the large-volume plan).

    Mechanism (Hutchinson trace + CG, all O(V) stencils):

    .. math::
        \partial_\theta \log\det D
            = \tfrac12\,\mathrm{tr}(K^{-1}\partial_\theta K)
            \approx \tfrac12\,\tfrac1P \sum_p
              \mathrm{Re}\,[\,(K^{-1}z_p)^\dagger\, (\partial_\theta K)\, z_p],

    with ``K = m^2 - H^2`` (Hermitian PD on the full lattice), Z4 complex
    noise probes ``z_p`` (``E[z z^\dagger] = I``), and ``K^{-1}z`` from
    batched conjugate gradients under ``stop_gradient``.  The returned
    value is the differentiable surrogate
    ``0.5 * Re[sg(K^{-1}z)^\dagger K(theta) z]`` averaged over probes: its
    *gradient* is the unbiased estimate above; its *value* is ~``V/2``
    (``z^\dagger z / 2``), NOT the log-determinant -- so this class is for
    TRAINING (only gradients drive the fit).  Exactness-critical paths
    (Metropolis accept/reject, ESS measurement) must use the exact action:
    calling an instance WITHOUT a key (``key=None``) falls back to the
    exact method, which is what ``Fitter``'s eval and the samplers do --
    only the jitted train step threads a fresh probe key per step via
    ``with_key``.

    Cost per train step: ``n_probes x O(cg iters) x O(V)`` stencil ops;
    CG iterations scale with ``cond(K) ~ (m^2 + 4)/m^2`` (mass-dependent,
    volume-independent for fixed physics).
    """

    lat_shape: tuple = static()
    mass: float = static(default=0.1)
    n_copies: int = static(default=1)
    antiperiodic_time: bool = static(default=True)
    n_probes: int = static(default=2)
    cg_tol: float = static(default=1e-5)
    cg_maxiter: int = static(default=256)
    key: Any = None  # data leaf; None -> exact fallback

    def with_key(self, key):
        return self.replace(key=key)

    def exact(self):
        return StaggeredFermionLogDet(
            lat_shape=self.lat_shape, mass=self.mass,
            n_copies=self.n_copies,
            antiperiodic_time=self.antiperiodic_time)

    def __call__(self, cfgs):
        if self.key is None:
            return self.exact()(cfgs)
        links = cfgs if jnp.iscomplexobj(cfgs) else jnp.exp(1j * cfgs)
        batch = links.shape[0]
        lat_shape = links.shape[2:]
        ndim = len(lat_shape)
        cdtype = links.dtype

        # Z4 probes: entries uniform in {1, i, -1, -i}; E[z z^dagger] = I.
        quarter = jax.random.randint(
            self.key, (self.n_probes, batch) + tuple(lat_shape), 0, 4)
        table = jnp.asarray([1 + 0j, 1j, -1 + 0j, -1j], cdtype)
        z = table[quarter]

        links_sg = jax.lax.stop_gradient(links)
        sol = _cg_batched(
            lambda v: apply_staggered_K(
                links_sg, self.mass, v,
                antiperiodic_time=self.antiperiodic_time),
            z, tol=self.cg_tol, maxiter=self.cg_maxiter, lat_ndim=ndim)
        sol = jax.lax.stop_gradient(sol)
        kz_live = apply_staggered_K(
            links, self.mass, z,
            antiperiodic_time=self.antiperiodic_time)
        axes = tuple(range(2, 2 + ndim))
        est = 0.5 * jnp.mean(
            jnp.sum(jnp.conjugate(sol) * kz_live, axis=axes).real, axis=0)
        return self.n_copies * est


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
    logdet_func: Any = None  # data leaf: pluggable (e.g. stochastic) log-det

    def with_key(self, key):
        """Thread a fresh RNG key into a stochastic ``logdet_func`` (the
        jitted train step calls this each step; see ``Fitter``).  A no-op
        for the exact log-det."""
        if self.logdet_func is not None and hasattr(self.logdet_func,
                                                    "with_key"):
            return self.replace(logdet_func=self.logdet_func.with_key(key))
        return self

    def __call__(self, theta):
        return self.action(theta)

    def action(self, theta):
        from .gauge import U1AngleAction

        gauge = U1AngleAction(beta=self.beta).action(theta)
        ld = self.logdet_func
        if ld is None:
            ld = StaggeredFermionLogDet(
                lat_shape=self.lat_shape, mass=self.mass,
                n_copies=self.n_copies, method=self.method,
                antiperiodic_time=self.antiperiodic_time)
        return gauge - ld(theta)

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
