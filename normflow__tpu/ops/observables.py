r"""Lattice observables and chain metrology.

The north-star parity targets (BASELINE.json) are physics observables --
``<phi^2>``, susceptibility -- and effective-sample rates; the reference has
no observables module, so this is new (small, jnp-native) surface.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "phi2", "abs_mean_phi", "susceptibility", "binder_cumulant",
    "two_point_function", "integrated_autocorr_time", "effective_sample_size",
]


def phi2(cfgs):
    """Volume-averaged ``<phi^2>`` per configuration: (B,)."""
    return jnp.mean(cfgs**2, axis=tuple(range(1, cfgs.ndim)))


def abs_mean_phi(cfgs):
    """|volume-mean of phi| per configuration (magnetization proxy)."""
    return jnp.abs(jnp.mean(cfgs, axis=tuple(range(1, cfgs.ndim))))


def susceptibility(cfgs):
    r"""Magnetic susceptibility ``chi = V (<m^2> - <|m|>^2)`` with
    ``m = mean(phi)``.  Returns a scalar over the batch."""
    dims = tuple(range(1, cfgs.ndim))
    v = float(np.prod(cfgs.shape[1:]))
    m = jnp.mean(cfgs, axis=dims)
    return v * (jnp.mean(m**2) - jnp.mean(jnp.abs(m)) ** 2)


def binder_cumulant(cfgs):
    r"""Binder cumulant ``U = 1 - <m^4> / (3 <m^2>^2)``."""
    dims = tuple(range(1, cfgs.ndim))
    m = jnp.mean(cfgs, axis=dims)
    return 1.0 - jnp.mean(m**4) / (3.0 * jnp.mean(m**2) ** 2)


def two_point_function(cfgs, axis: int = 1, connected: bool = True):
    """Zero-momentum 2-pt function along ``axis``: (B, L).

    With ``connected=True`` (default) the disconnected piece is subtracted
    using the ENSEMBLE mean over the batch: subtracting each
    configuration's own slab mean squared would shift every t-slice down by
    ~Var(m) = chi/V, which is not small near criticality and biases
    effective-mass fits.  NOTE that the subtraction makes the returned rows
    depend on the batch composition -- they are NOT independent
    per-configuration observables.  For jackknife/bootstrap over
    configurations, call with ``connected=False`` (raw correlator rows ARE
    independent) and subtract ``mean(cfgs_resample)**2`` inside each
    resample."""
    other = tuple(d for d in range(1, cfgs.ndim) if d != axis)
    slab = jnp.mean(cfgs, axis=other) if other else cfgs  # (B, L)
    l = slab.shape[1]
    fk = jnp.fft.rfft(slab, axis=1)
    corr = jnp.fft.irfft(fk * jnp.conj(fk), n=l, axis=1) / l
    if not connected:
        return corr
    return corr - jnp.mean(slab) ** 2


def integrated_autocorr_time(series, c: float = 5.0) -> float:
    """Integrated autocorrelation time with automatic windowing
    (Sokal's ``tau_int`` with window ``W >= c * tau``)."""
    x = np.asarray(series, dtype=np.float64).ravel()
    n = x.size
    x = x - x.mean()
    f = np.fft.rfft(x, n=2 * n)
    acf = np.fft.irfft(f * np.conj(f))[:n].real
    if acf[0] == 0:
        return 1.0
    acf = acf / acf[0]
    tau = 1.0
    for w in range(1, n):
        tau = 1.0 + 2.0 * np.sum(acf[1:w + 1])
        if w >= c * tau:
            break
    return float(max(tau, 1.0))


def effective_sample_size(series) -> float:
    """Chain effective sample count ``N / tau_int`` for an observable."""
    x = np.asarray(series).ravel()
    return float(x.size / integrated_autocorr_time(x))
