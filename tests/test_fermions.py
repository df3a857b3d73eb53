"""Staggered-fermion log-det tests (the Schwinger model's fermion part)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

import normflow__tpu as nf
from normflow__tpu.models.fermions import (
    StaggeredFermionLogDet, staggered_dirac_matrix, build_schwinger_action,
)


def _loop_dirac_oracle(links, mass, antiperiodic_time=True):
    """Independent nested-loop construction of the staggered matrix."""
    links = np.asarray(links)
    batch, ndim = links.shape[:2]
    lat = links.shape[2:]
    V = int(np.prod(lat))
    D = np.zeros((batch, V, V), dtype=complex)

    def lin(c):
        idx = 0
        for mu in range(ndim):
            idx = idx * lat[mu] + (c[mu] % lat[mu])
        return idx

    for b in range(batch):
        for x in np.ndindex(*lat):
            s = lin(x)
            D[b, s, s] += mass
            for mu in range(ndim):
                eta = (-1.0) ** sum(x[:mu])
                xp = list(x)
                xp[mu] += 1
                sign_p = -1.0 if (antiperiodic_time and mu == 0
                                  and x[0] == lat[0] - 1) else 1.0
                D[b, s, lin(xp)] += 0.5 * eta * sign_p * links[(b, mu) + x]
                xm = list(x)
                xm[mu] -= 1
                sign_m = -1.0 if (antiperiodic_time and mu == 0
                                  and x[0] == 0) else 1.0
                u_behind = links[(b, mu) + tuple(np.mod(xm, lat))]
                D[b, s, lin(tuple(np.mod(xm, lat)))] -= \
                    0.5 * eta * sign_m * np.conj(u_behind)
    return D


def _random_links(rng, lat=(4, 4), batch=2):
    theta = rng.uniform(-np.pi, np.pi, size=(batch, len(lat), *lat))
    return np.exp(1j * theta)


def test_dirac_matrix_matches_loop_oracle(rng):
    links = _random_links(rng)
    D = np.asarray(staggered_dirac_matrix(jnp.asarray(links), 0.3))
    D_ref = _loop_dirac_oracle(links, 0.3)
    np.testing.assert_allclose(D, D_ref, atol=1e-12)


def test_dirac_matrix_periodic_bc(rng):
    links = _random_links(rng, lat=(2, 6), batch=1)
    D = np.asarray(staggered_dirac_matrix(
        jnp.asarray(links), 0.5, antiperiodic_time=False))
    D_ref = _loop_dirac_oracle(links, 0.5, antiperiodic_time=False)
    np.testing.assert_allclose(D, D_ref, atol=1e-12)


def test_logdet_real_positive(rng):
    """m + anti-Hermitian hopping => det is real and positive for m > 0."""
    links = _random_links(rng, lat=(4, 4), batch=3)
    D = staggered_dirac_matrix(jnp.asarray(links), 0.2)
    # hopping part anti-Hermitian
    H = np.asarray(D) - 0.2 * np.eye(16)
    np.testing.assert_allclose(H, -H.conj().transpose(0, 2, 1), atol=1e-12)
    sign, logabs = jnp.linalg.slogdet(D)
    np.testing.assert_allclose(np.asarray(sign), 1.0 + 0.0j, atol=1e-10)
    assert np.isfinite(np.asarray(logabs)).all()


def test_logdet_gauge_invariance(rng):
    """det D is invariant under U_mu(x) -> g(x) U_mu(x) g*(x+mu)."""
    lat = (4, 4)
    links = _random_links(rng, lat=lat, batch=1)
    alpha = rng.uniform(-np.pi, np.pi, size=lat)
    g = np.exp(1j * alpha)
    gauged = links.copy()
    for mu in range(2):
        g_shift = np.roll(g, -1, axis=mu)
        gauged[:, mu] = g * links[:, mu] * np.conj(g_shift)
    ld = StaggeredFermionLogDet(lat_shape=lat, mass=0.25)
    a = float(ld(jnp.asarray(links))[0])
    b = float(ld(jnp.asarray(gauged))[0])
    np.testing.assert_allclose(a, b, rtol=1e-10)


def test_logdet_free_field_value():
    """At U = 1 the staggered determinant has a closed form via momentum
    modes: eigenvalues of the free operator are m + i sum_mu sin(p_mu) with
    antiperiodic p_0; check log det against the product formula."""
    lat = (4, 4)
    links = jnp.ones((1, 2, *lat), dtype=complex)
    ld = StaggeredFermionLogDet(lat_shape=lat, mass=0.3)
    got = float(ld(links)[0])
    # free staggered det: prod over momenta of (m^2 + sum sin^2 p_mu)^(1/2)
    # on the HALVED Brillouin zone -- equivalently det(D^dag D) over all
    # momenta gives 2*logdet; use the dense eigenvalue oracle instead:
    D = staggered_dirac_matrix(links, 0.3)
    ev = np.linalg.eigvals(np.asarray(D)[0])
    want = float(np.log(np.abs(ev)).sum())
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_schur_logdet_matches_dense(rng):
    """Even/odd Schur-complement Cholesky path == full-matrix slogdet."""
    for lat, apbc in [((4, 4), True), ((4, 4), False), ((2, 6), True),
                      ((4, 4, 4), True)]:
        links = _random_links(rng, lat=lat, batch=2)
        dense = StaggeredFermionLogDet(lat_shape=lat, mass=0.35,
                                       antiperiodic_time=apbc,
                                       method="dense")
        schur = StaggeredFermionLogDet(lat_shape=lat, mass=0.35,
                                       antiperiodic_time=apbc,
                                       method="schur")
        np.testing.assert_allclose(np.asarray(schur(jnp.asarray(links))),
                                   np.asarray(dense(jnp.asarray(links))),
                                   rtol=1e-10)


def test_schur_rejects_odd_extent(rng):
    """Odd extents wrap even sites onto even sites, breaking the
    parity-changing structure the Schur identity needs -- must raise, not
    silently return a wrong value (V=12 is even, so a volume-only check
    would pass)."""
    links = _random_links(rng, lat=(3, 4), batch=1)
    schur = StaggeredFermionLogDet(lat_shape=(3, 4), mass=0.35,
                                   method="schur")
    with pytest.raises(ValueError, match="extent"):
        schur(jnp.asarray(links))


def test_schur_logdet_grad_matches_dense(rng):
    lat = (4, 4)
    theta = jnp.asarray(rng.uniform(-np.pi, np.pi, size=(1, 2, *lat)))
    g = {}
    for method in ("dense", "schur"):
        ld = StaggeredFermionLogDet(lat_shape=lat, mass=0.3, method=method)
        g[method] = np.asarray(jax.grad(lambda t: jnp.sum(ld(t)))(theta))
    np.testing.assert_allclose(g["schur"], g["dense"], rtol=1e-8, atol=1e-10)


def test_logdet_accepts_angles(rng):
    lat = (4, 4)
    theta = jnp.asarray(rng.uniform(-np.pi, np.pi, size=(2, 2, *lat)))
    ld = StaggeredFermionLogDet(lat_shape=lat, mass=0.4)
    a = np.asarray(ld(theta))
    b = np.asarray(ld(jnp.exp(1j * theta)))
    np.testing.assert_allclose(a, b, rtol=1e-12)


def test_logdet_differentiable(rng):
    lat = (4, 4)
    theta = jnp.asarray(rng.uniform(-np.pi, np.pi, size=(1, 2, *lat)))
    ld = StaggeredFermionLogDet(lat_shape=lat, mass=0.4)
    g = jax.grad(lambda t: jnp.sum(ld(t)))(theta)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_schwinger_action_end_to_end(rng):
    lat = (4, 4)
    act = build_schwinger_action(beta=2.0, lat_shape=lat, mass=0.3,
                                 n_copies=2)
    links = jnp.asarray(_random_links(rng, lat=lat, batch=3))
    s_full = np.asarray(act(links))
    s_gauge = np.asarray(act.gauge.action(links))
    assert np.isfinite(s_full).all()
    # fermions contribute: S = S_gauge - n_copies * logdet
    ld = StaggeredFermionLogDet(lat_shape=lat, mass=0.3, n_copies=2)
    np.testing.assert_allclose(s_full, s_gauge - np.asarray(ld(links)),
                               rtol=1e-12)


def test_schwinger_builders_plumb_method(rng):
    """Odd-extent lattices need method='dense'; the public builders must
    expose it (the guard's own advice was otherwise unreachable)."""
    lat = (3, 4)
    act = build_schwinger_action(beta=2.0, lat_shape=lat, mass=0.3,
                                 method="dense")
    links = jnp.asarray(_random_links(rng, lat=lat, batch=2))
    assert np.isfinite(np.asarray(act(links))).all()
    from normflow__tpu.models.fermions import SchwingerAngleAction
    ang = SchwingerAngleAction(beta=2.0, lat_shape=lat, mass=0.3,
                               method="dense")
    theta = jnp.asarray(rng.uniform(-np.pi, np.pi, size=(2, 2, *lat)))
    assert np.isfinite(np.asarray(ang(theta))).all()


def test_logdet_lat_shape_mismatch_raises(rng):
    ld = StaggeredFermionLogDet(lat_shape=(4, 4), mass=0.3)
    links = jnp.asarray(_random_links(rng, lat=(2, 6), batch=1))
    with pytest.raises(ValueError, match="built for"):
        ld(links)
