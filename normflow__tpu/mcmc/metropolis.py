"""Independence-Metropolis and blocked MCMC for exact sampling.

TPU-native re-design of /root/reference/src/mcmc/mcmc.py.  The sequential
accept/reject chain scan -- a host-side numpy loop in the reference
(mcmc.py:304-328, with a GPU->CPU transfer per batch) -- becomes a
``jax.lax.scan`` that runs on-device with identical semantics, including the
carried ``_ref`` chain state and batch compaction via index gathers.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.stats import Resampler, estimate_logz, fmt_val_err
from ..training.model import _shard

__all__ = [
    "MCMCSampler", "BlockedMCMCSampler", "MCMCHistory", "Metropolis",
    "ModifiedMetropolis", "accept_scan", "estimate_accept_rate",
]


# ===================================================================== #
# Device-side accept/reject scan
# ===================================================================== #
@partial(jax.jit, static_argnums=(3,))
def _accept_scan_core(lrand, logqp, logqp_ref, tau=None):
    """The accept/reject chain recurrence as a ``lax.scan``, parameterized
    by the log-acceptance rule: standard Metropolis (``tau=None``,
    ``log P_acc = x`` with ``x = logqp_ref - logqp``) or the modified rule
    ``log P_acc = -(tau x^2 + relu(-x))`` (reference mcmc.py:355-375).

    This single scan is the framework's ONE implementation of the chain
    recurrence; the device sampler (:func:`accept_scan`) and the host
    utilities (:class:`Metropolis`) are both thin fronts over it.
    """
    if tau is None:
        log_acc = lambda x: x
    else:
        log_acc = lambda x: -(tau * x * x + jax.nn.relu(-x))

    def step(carry, inp):
        ref, idx_ref = carry
        lr, lqp, i = inp
        accept = lr < log_acc(ref - lqp)
        ref = jnp.where(accept, lqp, ref)
        idx = jnp.where(accept, i + 1, idx_ref)
        return (ref, idx), (accept, idx)

    iota = jnp.arange(logqp.shape[0])
    (_, _), (accept_seq, indices) = jax.lax.scan(
        step, (logqp_ref, jnp.asarray(0)), (lrand, logqp, iota))
    return accept_seq, indices


@jax.jit
def accept_scan(key, logqp, logqp_ref):
    """Metropolis accept/reject over a chain of proposals (on device).

    TPU-native replacement of ``Metropolis.calc_accept_status`` +
    ``calc_accept_indices`` (reference mcmc.py:304-328): proposal ``i`` is
    accepted iff ``log u_i < logqp_ref - logqp_i`` with ``logqp_ref`` the
    running value of the last accepted proposal.

    Returns ``(accept_seq, indices)``; ``indices[i]`` is 0 for "keep the
    incoming reference state" or ``j+1`` meaning "proposal j" -- i.e. indices
    into arrays extended with the reference at position 0.
    """
    lrand = jnp.log(jax.random.uniform(key, logqp.shape, logqp.dtype))
    return _accept_scan_core(lrand, logqp, logqp_ref)


# ===================================================================== #
# Host-side utilities (for resampled accept-rate estimation).  The chain
# recurrence delegates to the device scan above; the statistics helpers
# are closed-form vectorized numpy.
# ===================================================================== #
class Metropolis:
    """Static Metropolis utilities (reference API: mcmc.py:298-352)."""

    _tau = None  # standard rule; ModifiedMetropolis overrides

    @classmethod
    def calc_accept_status(cls, logqp, logqp_ref=None, rng=None, tau=None):
        """Accept/reject status over a proposal chain.

        Host front over :func:`_accept_scan_core`: the uniforms come from a
        (seedable) numpy ``rng``; the recurrence runs as the same compiled
        scan the production sampler uses, pinned to the LOCAL CPU backend
        (host statistics must not depend on a possibly-remote accelerator),
        with a plain-numpy fallback when no CPU backend is registered.
        """
        logqp = np.asarray(logqp, dtype=np.float32)
        rng = np.random.default_rng() if rng is None else rng
        ref = logqp[0] if logqp_ref is None else np.float32(logqp_ref)
        # log U with U in (0, 1]: numpy's random() is [0, 1), and an exact
        # 0 draw (possible in f32) would emit log(0) = -inf with a runtime
        # warning; 1 - U flips the support, same distribution.
        lrand = np.log1p(-rng.random(logqp.shape[0], dtype=np.float32))
        tau = cls._tau if tau is None else float(tau)
        cpu = _initialized_cpu_device()
        if cpu is not None:
            with jax.default_device(cpu):
                status, _ = _accept_scan_core(
                    jnp.asarray(lrand), jnp.asarray(logqp),
                    jnp.asarray(ref), tau)
            return np.asarray(status)
        # numpy recurrence (host statistics must never block on a remote
        # accelerator backend)
        rule = (lambda x: x) if tau is None else (
            lambda x: -(tau * x * x + max(-x, 0.0)))
        status = np.empty(logqp.shape[0], dtype=bool)
        for i in range(logqp.shape[0]):
            status[i] = lrand[i] < rule(ref - logqp[i])
            if status[i]:
                ref = logqp[i]
        return status

    @staticmethod
    def calc_accept_indices(accept_seq):
        """Compaction indices: ``indices[i]`` = index of the last accepted
        proposal at or before ``i`` (0 when none yet).  A running maximum
        over accepted positions -- one ``np.maximum.accumulate``."""
        accept_seq = np.asarray(accept_seq)
        n = len(accept_seq)
        return np.maximum.accumulate(
            np.where(accept_seq, np.arange(n), 0))

    @staticmethod
    def calc_accept_count(accept_seq):
        """Gaps between consecutive accepted positions."""
        return np.diff(np.flatnonzero(accept_seq))

    @staticmethod
    def calc_tau_rejections_prob(accept_seq, max_tau=100):
        """P(tau+1 rejections in a row), tau = 0..max_tau-1, via windowed
        counts on the rejection indicator's prefix sums: a window of length
        L is all-rejected iff its prefix-sum increment equals L."""
        rej = np.asarray(accept_seq) == False  # noqa: E712 (bool arrays)
        csum = np.concatenate([[0], np.cumsum(rej)])
        p_tau = np.zeros(max_tau)
        for tau in range(min(max_tau, len(rej))):
            length = tau + 1
            p_tau[tau] = np.mean((csum[length:] - csum[:-length]) == length)
        return p_tau


def _initialized_cpu_device():
    """The local CPU device when obtaining it cannot trigger a *remote*
    backend initialization, else None (-> plain-numpy recurrence).

    ``jax.extend.backend.get_backend('cpu')`` initializes every platform in
    ``JAX_PLATFORMS`` when none is initialized yet -- on a remote-accelerator
    config (axon/TPU tunnels) that can block for minutes, which host-side
    statistics must never do.  There is no public API to merely *peek* at
    already-initialized backends, so the compiled CPU scan is used only when
    it is provably safe or cheap:

    - ``NORMFLOW_HOST_SCAN=cpu`` in the environment: explicit opt-in (the
      documented caveat: may initialize all configured platforms);
      ``NORMFLOW_HOST_SCAN=numpy`` forces the numpy path;
    - ``JAX_PLATFORMS`` pins host-only platforms (e.g. the test suite's
      ``cpu``): initialization cannot reach a remote device;
    - the process already holds live JAX arrays (``jax.live_arrays()``):
      backends are initialized, so the call returns from cache instantly.
    """
    import os

    mode = os.environ.get("NORMFLOW_HOST_SCAN", "").lower()
    if mode == "numpy":
        return None
    if mode != "cpu":
        platforms = [p.strip() for p in
                     os.environ.get("JAX_PLATFORMS", "").split(",") if p]
        try:
            platforms = platforms or [
                p.strip() for p in
                (jax.config.jax_platforms or "").split(",") if p]
        except AttributeError:
            pass
        host_only = platforms and all(p == "cpu" for p in platforms)
        if not host_only and not jax.live_arrays():
            return None
    try:
        backend = jax.extend.backend.get_backend("cpu")
        return backend.local_devices()[0]
    except Exception:
        return None


class ModifiedMetropolis(Metropolis):
    """Modified acceptance rule ``exp(-(tau x^2 + relu(-x)))``
    (reference API: mcmc.py:355-375; its ``tau`` sits before ``rng``).
    ``tau=0`` keeps the relu term, which is decision-equivalent to the
    standard rule since ``log u <= 0``."""

    _tau = 0.0

    @classmethod
    def calc_accept_status(cls, logqp, logqp_ref=None, tau=0, rng=None):
        return super().calc_accept_status(logqp, logqp_ref=logqp_ref,
                                          rng=rng, tau=float(tau))


def estimate_accept_rate(logqp, n_resamples=10, method="shuffling", seed=None):
    """Estimate the Metropolis acceptance rate by resampling logqp
    (reference mcmc.py:117-124).  Returns ``(mean, std)``."""
    rng = np.random.default_rng(seed)
    calc_rate = lambda x: float(np.mean(Metropolis.calc_accept_status(
        np.asarray(x).ravel(), rng=rng)))
    resampler = Resampler(method, seed=seed)
    return resampler.eval(np.asarray(logqp).ravel(), fn=calc_rate,
                          n_resamples=n_resamples)


# ===================================================================== #
# Samplers
# ===================================================================== #
class MCMCSampler:
    """Independence-Metropolis sampler on top of the flow posterior.

    Mirrors ``MCMCSampler`` (reference mcmc.py:15-128): draws a batch of raw
    samples, runs the accept/reject chain (carrying persistent ``_ref`` state
    across calls), and replaces rejected entries by the last accepted sample.
    """

    def __init__(self, model):
        self._model = model
        self.history = MCMCHistory()
        self._ref: dict[str, Any] | None = None

    def reset(self):
        self._ref = None
        self.history.reset_history()

    def sample(self, batch_size=1, **kwargs):
        return self.sample__(batch_size=batch_size, **kwargs)[0]

    def sample_(self, batch_size=1, **kwargs):
        return self.sample__(batch_size=batch_size, **kwargs)[:2]

    def sample__(self, batch_size=1, key=None, bookkeeping=False):
        """Return ``(y, logq, logp)`` after Metropolis correction."""
        m = self._model
        key = m.next_key() if key is None else key
        k_prop, k_acc = jax.random.split(key)
        y, logq, logp = m.posterior.sample__(batch_size=batch_size, key=k_prop)

        if bookkeeping:
            self.history.bookkeeping(raw_logq=logq, raw_logp=logp)

        y, logq, logp = self._accept_reject_step(
            k_acc, y, logq, logp, bookkeeping=bookkeeping)

        if bookkeeping:
            self.history.bookkeeping(logq=logq, logp=logp)
        return y, logq, logp

    def _accept_reject_step(self, key, y, logq, logp, bookkeeping=False):
        if self._ref is None:
            # no reference yet: seed the chain from the first proposal
            # (reference mcmc.py:309-310 semantics)
            ref = dict(sample=y[0], logq=logq[0], logp=logp[0])
        else:
            ref = self._ref
        yn, logqn, logpn, accept_seq = _accept_reject_kernel(
            key, y, logq, logp, ref["sample"], ref["logq"], ref["logp"])
        self._ref = dict(sample=yn[-1], logq=logqn[-1], logp=logpn[-1])

        self.history.bookkeeping(accept_rate=float(jnp.mean(accept_seq)))
        if bookkeeping:
            accept_np = np.asarray(accept_seq)
            self.history.bookkeeping(
                accept_seq=accept_np,
                accept_ind=Metropolis.calc_accept_indices(accept_np))
        return yn, logqn, logpn

    def sample_chain(self, n_batches, batch_size, key=None,
                     collect_samples=False, bookkeeping=False):
        """Run many Metropolis rounds in one device program.

        Returns a dict with per-round ``accept_rate`` (n_batches,),
        corrected ``logq``/``logp`` streams (n_batches, batch_size), and
        (if ``collect_samples``) all corrected samples.  The persistent
        ``_ref`` chain state is consumed and updated exactly as ``sample__``.

        ``bookkeeping=True`` additionally collects the RAW per-round
        ``logq``/``logp`` proposal streams and the accept sequence inside
        the scan and records everything in :attr:`history` (the scanned
        equivalent of ``sample__(bookkeeping=True)``; reference
        mcmc.py:30-44).
        """
        m = self._model
        key = m.next_key() if key is None else key
        if self._ref is None:
            # inf reference logqp => first proposal always accepted, so the
            # zero dummy reference sample is never selected.  Shape/dtype of
            # the dummy must match the FLOW OUTPUT exactly (scan carry) --
            # probed abstractly via eval_shape, so shape-changing flows
            # (partitioners, PriorList models) are handled and nothing runs.
            out = jax.eval_shape(
                lambda net, k: net.forward(m.prior.sample(k, 1))[0],
                m.net_, jax.random.key(0))
            dummy = jax.tree_util.tree_map(
                lambda a: jnp.zeros(a.shape[1:], a.dtype), out)
            dt = jax.tree_util.tree_leaves(out)[0].dtype
            carry0 = (dummy, jnp.asarray(jnp.inf, dt), jnp.asarray(0.0, dt))
        else:
            dt = jnp.asarray(
                jax.tree_util.tree_leaves(self._ref["sample"])[0]).dtype
            carry0 = (self._ref["sample"], jnp.asarray(self._ref["logq"], dt),
                      jnp.asarray(self._ref["logp"], dt))
        carry, (ys, logq, logp, accept_rate, raw) = _chain_scan(
            m.net_, m.prior, m.action, key, carry0, n_batches, batch_size,
            collect_samples, m.device_handler.batch_sharder(), bookkeeping)
        self._ref = dict(sample=carry[0], logq=carry[1], logp=carry[2])
        for r in jax.device_get(accept_rate):
            self.history.bookkeeping(accept_rate=float(r))
        if bookkeeping:
            gather = m.device_handler.all_gather_into_tensor
            raw_logq, raw_logp, accept_seq = (np.asarray(gather(r))
                                              for r in raw)
            logq_np, logp_np = np.asarray(gather(logq)), np.asarray(gather(logp))
            for i in range(n_batches):
                self.history.bookkeeping(
                    raw_logq=raw_logq[i], raw_logp=raw_logp[i],
                    logq=logq_np[i], logp=logp_np[i],
                    accept_seq=accept_seq[i],
                    accept_ind=Metropolis.calc_accept_indices(accept_seq[i]))
        out = dict(logq=logq, logp=logp, accept_rate=accept_rate)
        if collect_samples:
            out["samples"] = ys
        return out

    def sample_parallel_chains(self, n_rounds, n_chains, key=None,
                               collect_samples=False, bookkeeping=False):
        """Run ``n_chains`` INDEPENDENT Metropolis chains for ``n_rounds``.

        Each chain receives one proposal per round and accepts/rejects
        against its own reference -- the accept step is elementwise over
        chains (no sequential scan at all), so the whole sampler is
        embarrassingly parallel and shards over a device mesh (the
        multi-chip production sampler, BASELINE config 4).  This is a
        different chain structure than :meth:`sample__`/:meth:`sample_chain`
        (which thread ONE chain through the batch, reference semantics);
        both are exact.

        Returns a dict with per-round ``accept_rate`` (n_rounds,), the
        final per-chain states, corrected ``logq``/``logp`` streams
        (n_rounds, n_chains), and optionally all corrected samples.
        """
        m = self._model
        key = m.next_key() if key is None else key
        carry, (ys, logq, logp, accept, raw) = _parallel_chains_scan(
            m.net_, m.prior, m.action, key, n_rounds, n_chains,
            collect_samples, m.device_handler.batch_sharder(), bookkeeping)
        # per-round rates from the per-chain accept flags, ON HOST: keeps
        # the compiled sampler free of cross-chip collectives (a mean over
        # the sharded chains axis would lower to an all-reduce per round).
        # gather() is required on multi-process meshes, where the sharded
        # flags span non-addressable devices (no-op single-process)
        gather = m.device_handler.all_gather_into_tensor
        accept_np = np.asarray(gather(accept))
        accept_rate = np.mean(accept_np, axis=1)
        for r in accept_rate:
            self.history.bookkeeping(accept_rate=float(r))
        if bookkeeping:
            raw_logq, raw_logp = (np.asarray(gather(r)) for r in raw)
            logq_np, logp_np = np.asarray(gather(logq)), np.asarray(gather(logp))
            for i in range(n_rounds):
                self.history.bookkeeping(
                    raw_logq=raw_logq[i], raw_logp=raw_logp[i],
                    logq=logq_np[i], logp=logp_np[i],
                    accept_seq=accept_np[i])
        out = dict(logq=logq, logp=logp, accept_rate=accept_rate,
                   final_samples=carry[0])
        if collect_samples:
            out["samples"] = ys
        return out

    def serial_sample_generator(self, n_samples, batch_size=16, key=None):
        """Yield chain samples one by one (reference mcmc.py:89-97)."""
        m = self._model
        key = m.next_key() if key is None else key
        for i in range(n_samples):
            ind = i % batch_size
            if ind == 0:
                key, sub = jax.random.split(key)
                y, logq, logp = self.sample__(batch_size, key=sub)
            yield y[ind][None], logq[ind][None], logp[ind][None]

    def calc_accept_rate(self, n_samples=1024, batch_size=None,
                         n_resamples=10, method="shuffling", key=None):
        """Acceptance rate from freshly drawn raw samples (mcmc.py:99-115)."""
        m = self._model
        key = m.next_key() if key is None else key
        if batch_size is None or batch_size > n_samples:
            batch_size = n_samples
        n_batches = int(np.ceil(n_samples / batch_size))
        logqp = np.zeros(n_batches * batch_size)
        for k in range(n_batches):
            key, sub = jax.random.split(key)
            _, logq, logp = m.posterior.sample__(batch_size=batch_size, key=sub)
            logqp[k * batch_size:(k + 1) * batch_size] = np.asarray(logq - logp)
        return estimate_accept_rate(logqp, n_resamples, method)

    estimate_accept_rate = staticmethod(estimate_accept_rate)

    def log_prob(self, y, action_logz=0.0):
        return -self._model.action(y) - action_logz


def _accept_reject_core(key, y, logq, logp, ref_y, ref_logq, ref_logp):
    logqp = logq - logp
    accept_seq, indices = accept_scan(key, logqp, ref_logq - ref_logp)
    ext = lambda ref, arr: jnp.concatenate([ref[None], arr], axis=0)
    take = lambda ref, arr: jnp.take(ext(ref, arr), indices, axis=0)
    return (take(ref_y, y), take(ref_logq, logq), take(ref_logp, logp),
            accept_seq)


@jax.jit
def _accept_reject_kernel(key, y, logq, logp, ref_y, ref_logq, ref_logp):
    """Fused accept/reject + compaction, entirely on device."""
    return _accept_reject_core(key, y, logq, logp, ref_y, ref_logq, ref_logp)


@partial(jax.jit, static_argnums=(5, 6, 7, 8, 9))
def _chain_scan(net, prior, action, key, carry0, n_batches, batch_size,
                collect_samples, sharder=None, bookkeeping=False):
    """Run ``n_batches`` propose+accept/reject rounds in ONE device program.

    The chain reference state ``(ref_sample, ref_logq, ref_logp)`` is the
    scan carry; per-round acceptance rates (and optionally all corrected
    samples) are collected.  This is the production sampler: zero Python
    between rounds.

    On an attached mesh the PROPOSAL generation (prior draw + flow forward +
    action -- all the FLOPs) is sharded over the 'data' axis; only the
    (batch,)-sized logqp is gathered for the inherently sequential accept
    scan, and the compaction gather runs on the sharded arrays.
    """

    def body(carry, k):
        ref_y, ref_lq, ref_lp = carry
        k1, k2 = jax.random.split(k)
        x, logr = prior.sample_(k1, batch_size)
        if sharder is not None:
            x, logr = _shard(sharder, x), sharder(logr)
        y, logj = net.forward(x)
        logq = logr - logj
        logp = -action(y)
        yn, lqn, lpn, accept = _accept_reject_core(
            k2, y, logq, logp, ref_y, ref_lq, ref_lp)
        raw = (logq, logp, accept) if bookkeeping else jnp.zeros((0,))
        out = (yn if collect_samples else jnp.zeros((0,)),
               lqn, lpn, jnp.mean(accept.astype(lqn.dtype)), raw)
        return (yn[-1], lqn[-1], lpn[-1]), out

    keys = jax.random.split(key, n_batches)
    return jax.lax.scan(body, carry0, keys)


@partial(jax.jit, static_argnums=(4, 5, 6, 7, 8))
def _parallel_chains_scan(net, prior, action, key, n_rounds, n_chains,
                          collect_samples, sharder=None, bookkeeping=False):
    """n_chains independent chains, one proposal each per round; accepts are
    elementwise (no scan over the batch).

    THE multi-chip production sampler: on an attached mesh the proposals,
    the per-chain reference states (the scan carry), and every output stream
    are sharded over the 'data' axis, and the compiled program contains NO
    cross-chip collectives -- chips run their chain shards fully
    independently, so ESS/s scales linearly by construction (per-round
    accept RATES are reduced on host, not in-program)."""

    def body(carry, k):
        ref_y, ref_lq, ref_lp = carry
        k1, k2 = jax.random.split(k)
        x, logr = prior.sample_(k1, n_chains)
        if sharder is not None:
            x, logr = _shard(sharder, x), sharder(logr)
        y, logj = net.forward(x)
        logq = logr - logj
        logp = -action(y)
        lrand = jnp.log(jax.random.uniform(k2, (n_chains,), logq.dtype))
        if sharder is not None:
            lrand = sharder(lrand)
        accept = lrand < (ref_lq - ref_lp) - (logq - logp)
        bshape = (n_chains,) + (1,) * (y.ndim - 1)
        yn = jnp.where(accept.reshape(bshape), y, ref_y)
        lqn = jnp.where(accept, logq, ref_lq)
        lpn = jnp.where(accept, logp, ref_lp)
        raw = (logq, logp) if bookkeeping else jnp.zeros((0,))
        out = (yn if collect_samples else jnp.zeros((0,)),
               lqn, lpn, accept, raw)
        return (yn, lqn, lpn), out

    probe = prior.sample(jax.random.key(0), n_chains)
    dt = jax.tree_util.tree_leaves(probe)[0].dtype
    carry0 = (jnp.zeros_like(probe),
              jnp.full((n_chains,), jnp.inf, dt),   # first proposal accepted
              jnp.zeros((n_chains,), dt))
    if sharder is not None:
        carry0 = jax.tree_util.tree_map(sharder, carry0)
    keys = jax.random.split(key, n_rounds)
    return jax.lax.scan(body, carry0, keys)


class BlockedMCMCSampler(MCMCSampler):
    """Block-Gibbs MCMC in latent space (reference mcmc.py:132-219).

    The latent configuration is updated block by block with proposals from
    the chopped prior; each block proposal requires a full flow forward.
    The sweep over blocks and the batch loop are both ``lax.scan``s -- the
    whole sampler is one fused device program (the reference re-enters
    Python per proposal).

    Intentionally NOT mesh-sharded: each block update conditions on the
    current state of every other block, so the sweep is inherently
    sequential per sample (matching the reference's semantics,
    mcmc.py:132-219).  For multi-chip throughput run independent chains
    via ``MCMCSampler.sample_parallel_chains`` (batch-sharded, zero
    collectives) instead.
    """

    def sample__(self, batch_size=1, n_blocks=1, key=None, bookkeeping=False):
        m = self._model
        prior = m.prior
        key = m.next_key() if key is None else key

        nvar = prior.nvar
        if isinstance(n_blocks, int) and n_blocks > 0:
            block_len = nvar // n_blocks
            assert block_len * n_blocks == nvar
        else:
            block_len, n_blocks = nvar, 1
        # eager homogeneity validation (inside the jitted kernel the prior
        # is traced and cannot be checked) -- a per-site prior would bias
        # every block after the first
        prior.chopped(block_len)

        k_init, k_run = jax.random.split(key)
        if self._ref is None:
            x = prior.sample(k_init, 1)
            logqp_ref = jnp.asarray(0.0, x.dtype)
            has_ref = False
        else:
            x = m.net_.backward(self._ref["sample"][None])[0]
            logqp_ref = jnp.asarray(self._ref["logq"] - self._ref["logp"])
            has_ref = True

        cfgs, logq, logp, accept_seq = _blocked_sweep_kernel(
            m.net_, prior, m.action, k_run, x, logqp_ref, has_ref,
            batch_size, n_blocks, block_len)

        self._ref = dict(sample=cfgs[-1], logq=logq[-1], logp=logp[-1])
        self.history.bookkeeping(accept_rate=float(jnp.mean(accept_seq)))
        if bookkeeping:
            self.history.bookkeeping(logq=logq, logp=logp)
            self.history.bookkeeping(accept_seq=np.asarray(accept_seq).ravel())
        return cfgs, logq, logp


@partial(jax.jit, static_argnums=(6, 7, 8, 9))
def _blocked_sweep_kernel(net, prior, action, key, x, logqp_ref, has_ref,
                          batch_size, n_blocks, block_len):
    """Scan over (samples x blocks) of latent block-Gibbs updates."""
    shape = x.shape[1:]
    x_flat = x.reshape(-1)
    chopped = prior.chopped(block_len)

    def evaluate(x_flat):
        xs = x_flat.reshape(1, *shape)
        y, logj = net.forward(xs)
        logq = prior.log_prob(xs) - logj
        logp = -action(y)
        return y[0], logq[0], logp[0]

    def block_step(carry, inp):
        x_flat, ref, has_ref, y_acc, logq_acc, logp_acc = carry
        b, proposal, lrand = inp
        x_new = jax.lax.dynamic_update_slice(x_flat, proposal, (b * block_len,))
        y, logq, logp = evaluate(x_new)
        logqp = logq - logp
        accept = jnp.where(has_ref, lrand < (ref - logqp), True)
        sel = lambda new, old: jnp.where(accept, new, old)
        carry = (sel(x_new, x_flat), sel(logqp, ref),
                 jnp.logical_or(has_ref, accept),
                 sel(y, y_acc), sel(logq, logq_acc), sel(logp, logp_acc))
        return carry, accept

    def sample_step(carry, key):
        x_flat, ref, has_ref, y_acc, logq_acc, logp_acc = carry
        kp, kr = jax.random.split(key)
        proposals = chopped.sample(kp, n_blocks)  # (n_blocks, block_len)
        lrand = jnp.log(jax.random.uniform(kr, (n_blocks,), x_flat.dtype))
        blocks = jnp.arange(n_blocks)
        carry, accepts = jax.lax.scan(
            block_step,
            (x_flat, ref, has_ref, y_acc, logq_acc, logp_acc),
            (blocks, proposals, lrand))
        # the carried (y, logq, logp) are those of the accepted state -- no
        # extra flow forward is needed to emit the sample
        _, _, _, y_acc, logq_acc, logp_acc = carry
        return carry, (y_acc, logq_acc, logp_acc, accepts)

    keys = jax.random.split(key, batch_size)
    has_ref_arr = jnp.asarray(has_ref)
    y0, logq0, logp0 = evaluate(x_flat)
    carry0 = (x_flat, logqp_ref, has_ref_arr, y0, logq0, logp0)
    _, (cfgs, logq, logp, accept_seq) = jax.lax.scan(
        sample_step, carry0, keys)
    return cfgs, logq, logp, accept_seq


class MCMCHistory:
    """Bookkeeping of MCMC runs (reference mcmc.py:223-294)."""

    def __init__(self):
        self.reset_history()

    def reset_history(self):
        self.logq = []
        self.logp = []
        self.raw_logq = []
        self.raw_logp = []
        self.accept_seq = []
        self.accept_ind = []
        self.accept_rate = []

    def report_summary(self, since=0, asstr=False):
        if asstr:
            fmt = lambda mean, std: fmt_val_err(mean, std, err_digits=2)
        else:
            fmt = lambda mean, std: (mean, std)
        mean_std = lambda t: (float(np.mean(t)), float(np.std(t)))
        out = {}
        if self.logq and self.logp:
            logqp = np.asarray(self.logq[-1]) - np.asarray(self.logp[-1])
            out["logqp"] = fmt(*mean_std(logqp))
            out["logz"] = fmt(*estimate_logz(logqp))
        if self.accept_rate:
            # the scanned production samplers (sample_chain,
            # sample_parallel_chains) record only accept_rate -- the
            # summary must not crash after them
            out["accept_rate"] = fmt(*mean_std(np.asarray(self.accept_rate)))
        return out

    def bookkeeping(self, logq=None, logp=None, raw_logq=None, raw_logp=None,
                    accept_seq=None, accept_rate=None, accept_ind=None):
        if raw_logq is not None:
            self.raw_logq.append(np.array(raw_logq))
        if raw_logp is not None:
            self.raw_logp.append(np.array(raw_logp))
        if logq is not None:
            self.logq.append(np.asarray(logq))
        if logp is not None:
            self.logp.append(np.asarray(logp))
        if accept_rate is not None:
            self.accept_rate.append(accept_rate)
        if accept_seq is not None:
            self.accept_seq.append(accept_seq)
        if accept_ind is not None:
            self.accept_ind.append(accept_ind)

    @property
    def logqp(self):
        return [lq - lp for lq, lp in zip(self.logq, self.logp)]

    @property
    def raw_logqp(self):
        return [lq - lp for lq, lp in zip(self.raw_logq, self.raw_logp)]
