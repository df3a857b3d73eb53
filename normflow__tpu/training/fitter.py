"""Training loop: one jitted step, optax optimizers, metrics, checkpoints.

TPU-native re-design of ``Fitter`` (/root/reference/src/_normflowcore.py:123-428):

- the whole step (prior sample -> flow -> reverse-KL loss -> grad -> update)
  is ONE jitted pure function of ``(net, opt_state, key)`` -- XLA fuses the
  model end-to-end; there is no per-op Python overhead in the hot loop;
- NaN-loss guard: divergent steps keep the old parameters *and* optimizer
  state (reference skips only ``optimizer.step()``, l.289-292);
- data parallelism: when a mesh is attached (``model.device_handler``), the
  sampled batch is sharding-constrained over the 'data' axis and XLA inserts
  the gradient psum -- the TPU-native replacement for DDP/NCCL;
- per-group hyperparameters via ``optax.multi_transform`` replace the
  reference's (dead, see SURVEY §2.14) param-group path;
- snapshots include optimizer state and RNG key.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.stats import estimate_logz, fmt_val_err
from . import losses
from .checkpoint import load_snapshot, save_snapshot, snapshot_path_for_epoch

__all__ = ["Fitter"]


class Fitter:
    """Trains a ``Model`` (callable, like ``model.fit(...)``)."""

    def __init__(self, model):
        self._model = model
        self.train_batch_size = 1
        self.train_history = dict(
            loss=[], logqp=[], logz=[], ess=[], rho=[], accept_rate=[]
        )
        self.hyperparam = dict(lr=0.001, weight_decay=0.01)
        # NB: the reference's dead `display` key is intentionally dropped
        # (never read there either, _normflowcore.py:140); passing it via
        # checkpoint_dict still works (stored, ignored).
        self.checkpoint_dict = dict(
            print_stride=100,
            print_batch_size=1024,
            print_extra_func=None,
            snapshot_path=None,
            epochs_run=0,
        )
        self.loss_fn = losses.calc_kl_mean
        self.grad_estimator = "rep"
        self.optimizer = None
        self.opt_state = None
        self._step_fn = None
        self._eval_fn = None
        self._has_controls = False
        self.rewind_on_spike = None
        self.max_rewinds = 10
        self.rewind_lr_backoff = None
        self._lr_scale = 1.0

    # ------------------------------------------------------------------ #
    def __call__(self, n_epochs=1000, save_every=None, batch_size=64,
                 optimizer_class="adamw", scheduler=None, loss_fn=None,
                 hyperparam=None, checkpoint_dict=None, param_groups=None,
                 steps_per_call=None, grad_estimator="rep",
                 clip_grad_norm=None, rewind_on_spike=None,
                 rewind_lr_backoff=None):
        """Fit the model (reference _normflowcore.py:151-219).

        ``optimizer_class``: an optax GradientTransformation factory
        ``(learning_rate=..., weight_decay=...) -> tx``, or one of
        ``'adamw' | 'adam' | 'sgd'``.  ``scheduler``: an optax schedule
        ``step -> lr`` multiplying the base learning rate.
        ``param_groups``: list of ``{'ind': [...], 'hyper': {...}}`` giving
        per-top-level-flow hyperparameter overrides.
        ``grad_estimator``: ``'rep'`` (plain reparametrization, the
        reference's estimator) or ``'path'`` (path-gradient /
        sticking-the-landing: drops the score term by re-evaluating
        ``log q`` through the inverse flow with stopped parameters --
        an unbiased, much lower-variance estimator of the reverse-KL
        gradient near the optimum; costs one extra backward pass).
        ``clip_grad_norm``: if set, clip the global gradient norm (over
        trainable leaves) to this value before the optimizer update --
        recommended for long, high-lr runs where a single outlier batch
        can otherwise blow up the Adam second moments.
        ``rewind_on_spike``: if set (a float, in loss units), arm the
        divergence safeguard: after every scanned segment the segment's
        median loss is compared against the best segment median so far,
        and a jump past ``best + rewind_on_spike`` (or a non-finite
        segment) rewinds net AND optimizer state to the last healthy
        snapshot and re-seeds the RNG stream, giving the trajectory a
        fresh draw from a known-good point.  Catches the finite-loss
        spiral collapses that the per-step NaN guard cannot (loss -903 ->
        +81k within a segment, observed in long U(1)/phi^4 runs --
        docs/EXPERIMENTS.md).  At most ``self.max_rewinds`` rewinds.
        """
        self.hyperparam.update(hyperparam or {})
        self.checkpoint_dict.update(checkpoint_dict or {})
        if loss_fn is not None:
            self.loss_fn = loss_fn
        if save_every is None:
            save_every = n_epochs
        self.grad_estimator = grad_estimator
        self.rewind_on_spike = rewind_on_spike
        # ``rewind_lr_backoff`` (round 5): multiply the effective lr by this
        # factor on EVERY rewind (a traced update scale, so no recompile).
        # Rationale: rewind+reseed alone rescues only transient spikes --
        # the deterministic "landscape walk" collapses (U(1) 2-cycle, 3 of
        # 4 probed) re-enter the same spiral from the healthy snapshot
        # regardless of the RNG stream; shrinking the step is the knob
        # noise cannot provide (round-4 clip-3 evidence says gradient
        # magnitude is partly implicated).
        self.rewind_lr_backoff = rewind_lr_backoff
        self._lr_scale = 1.0
        if grad_estimator == "path" and self.loss_fn is not losses.calc_kl_mean:
            # the path estimator drops the score term, which is an unbiased
            # simplification only for reverse-KL-style expectations
            # E_q[log q - log p] (+ a logZ term, which has zero path
            # gradient); with an arbitrary loss_fn it silently biases the
            # gradient
            import warnings

            warnings.warn(
                "grad_estimator='path' is unbiased only for the reverse-KL "
                f"loss family; got loss_fn={getattr(self.loss_fn, '__name__', self.loss_fn)!r}. "
                "The gradient may be biased -- use grad_estimator='rep'.",
                stacklevel=2)

        from ..models.couplings import has_controls, refresh_controls
        self._has_controls = has_controls(self._model.net_)
        if self._has_controls:
            # establish the control leaves (and hence the pytree structure)
            # BEFORE the optimizer state is built / the step is traced
            self._model.net_ = refresh_controls(
                self._model.net_, self._model.next_key(), batch_size)

        self.optimizer = self._build_optimizer(
            optimizer_class, scheduler, param_groups)
        if clip_grad_norm is not None:
            self.optimizer = optax.chain(
                optax.clip_by_global_norm(clip_grad_norm), self.optimizer)
        # mask out non-trainable leaves: Frozen sub-flows AND Const-wrapped
        # arrays (no updates, no weight decay for either)
        from ..models.core import trainable_mask as frozen_mask
        from ..struct import trainable_mask as const_mask

        net = self._model.net_
        mask = jax.tree_util.tree_map(
            lambda a, b: a and b, frozen_mask(net), const_mask(net))
        if not all(jax.tree_util.tree_leaves(mask)):
            self.optimizer = optax.masked(self.optimizer, mask)
        self.opt_state = self.optimizer.init(self._model.net_)

        snapshot_path = self.checkpoint_dict["snapshot_path"]
        if snapshot_path is None:
            print("Not saving model snapshots")
        elif os.path.exists(snapshot_path):
            print(f"Trying to load snapshot from {snapshot_path}")
            self._load_snapshot(snapshot_path)
        else:
            print("Starting training from scratch")

        self._step_fn = self._make_step_fn()
        self._eval_fn = None  # rebuilt lazily (depends on loss_fn)
        return self.train(n_epochs, batch_size, save_every,
                          steps_per_call=steps_per_call)

    # ------------------------------------------------------------------ #
    def _build_optimizer(self, optimizer_class, scheduler, param_groups):
        def make_tx(hyper):
            lr = hyper.get("lr", 0.001)
            if scheduler is not None:
                lr = lambda step: hyper.get("lr", 0.001) * scheduler(step)
            wd = hyper.get("weight_decay", 0.0)
            if callable(optimizer_class) and not isinstance(optimizer_class, str):
                return optimizer_class(learning_rate=lr, weight_decay=wd)
            name = (optimizer_class or "adamw").lower()
            if name == "adamw":
                return optax.adamw(lr, weight_decay=wd)
            if name == "adam":
                # torch-Adam semantics: L2 folded into the gradient
                tx = optax.adam(lr)
                return optax.chain(optax.add_decayed_weights(wd), tx) if wd \
                    else tx
            if name == "sgd":
                tx = optax.sgd(lr)
                return optax.chain(optax.add_decayed_weights(wd), tx) if wd \
                    else tx
            raise ValueError(f"unknown optimizer {optimizer_class!r}")

        if not param_groups:
            return make_tx(self.hyperparam)

        # Per-group hyperparameters over top-level flows of a FlowList
        # (functional replacement of reference nn/_core.py:77-93).
        net = self._model.net_
        n = len(net.flows)
        group_of = {}
        for g, spec in enumerate(param_groups):
            for i in spec["ind"]:
                group_of[i] = g + 1
        labels = net.replace(flows=tuple(
            jax.tree_util.tree_map(lambda _: f"g{group_of.get(i, 0)}", f)
            for i, f in enumerate(net.flows)
        ))
        txs = {"g0": make_tx(self.hyperparam)}
        for g, spec in enumerate(param_groups):
            hyper = dict(self.hyperparam)
            hyper.update(spec.get("hyper", {}))
            txs[f"g{g + 1}"] = make_tx(hyper)
        # NB: the label pytree is itself callable (FlowList), so hand optax a
        # thunk -- otherwise it would call the labels as a function of params.
        return optax.multi_transform(txs, lambda params: labels)

    # ------------------------------------------------------------------ #
    def _make_step_fn(self):
        prior = self._model.prior
        action = self._model.action
        loss_fn = self.loss_fn
        optimizer = self.optimizer
        sharder = self._model.device_handler.batch_sharder()
        use_path = self.grad_estimator == "path"
        has_ctrl = self._has_controls

        keyed_action = hasattr(action, "with_key")

        def step_core(net, opt_state, key, batch_size, lr_scale=1.0):
            if has_ctrl:
                from ..models.couplings import refresh_controls

                ctrl_key, key = jax.random.split(key)
                net = refresh_controls(net, ctrl_key, batch_size)
            if keyed_action:
                # stochastic actions (e.g. the Hutchinson+CG fermion
                # log-det estimator) receive a fresh probe key per step;
                # eval/sampling paths stay keyless -> exact action
                act_key, key = jax.random.split(key)
                act = action.with_key(act_key)
            else:
                act = action

            def loss_of(net):
                x, logr = prior.sample_(key, batch_size)
                x = sharder(x)
                y, logj = net.forward(x)
                if use_path:
                    # Path gradient ("sticking the landing"): log q(y) is
                    # recomputed through the inverse flow with STOPPED
                    # parameters, so the gradient flows only through the
                    # sample path y = f_theta(x) and the score term
                    # (zero-mean, high-variance) is dropped exactly.
                    net_sg = jax.tree_util.tree_map(
                        jax.lax.stop_gradient, net)
                    x_inv, mlogj = net_sg.backward(y)
                    logq = prior.log_prob(x_inv) + mlogj
                else:
                    logq = logr - logj
                logp = -act(y)
                loss = loss_fn(logq, logp)
                return loss, (logq, logp)

            (loss, (logq, logp)), grads = jax.value_and_grad(
                loss_of, has_aux=True)(net)
            updates, new_opt = optimizer.update(grads, opt_state, net)
            # rewind-lr-backoff hook: scaling the (post-optimizer) update
            # is exactly lr -> lr_scale*lr for adamw/adam/sgd, without
            # rebuilding the optimizer or invalidating its state
            updates = jax.tree_util.tree_map(lambda u: u * lr_scale,
                                             updates)
            new_net = optax.apply_updates(net, updates)
            # NaN guard (reference _normflowcore.py:289-292): keep the old
            # params AND optimizer state on divergent steps.  Checking the
            # loss alone is NOT enough: a step can have a finite loss but
            # non-finite gradients (observed at 32x32 with lr 3e-3 around
            # epoch 7k), which poisons the params and makes EVERY later
            # loss NaN -- so require every update leaf finite too.
            ok = jnp.isfinite(loss)
            for u in jax.tree_util.tree_leaves(updates):
                ok = ok & jnp.all(jnp.isfinite(u))
            sel = lambda old, new: jax.tree_util.tree_map(
                lambda a, b: jnp.where(ok, b, a), old, new)
            return sel(net, new_net), sel(opt_state, new_opt), loss, logq - logp

        @partial(jax.jit, static_argnums=(3,))
        def step(net, opt_state, key, batch_size, lr_scale=1.0):
            return step_core(net, opt_state, key, batch_size, lr_scale)

        # Multi-epoch segment in ONE device program (lax.scan over steps):
        # removes per-epoch Python/dispatch overhead from the hot loop -- the
        # TPU-native replacement for the reference's Python epoch loop.
        @partial(jax.jit, static_argnums=(3, 4))
        def multi_step(net, opt_state, key, batch_size, n_steps,
                       lr_scale=1.0):
            def body(carry, k):
                net, opt_state = carry
                net, opt_state, loss, _ = step_core(net, opt_state, k,
                                                    batch_size, lr_scale)
                return (net, opt_state), loss

            keys = jax.random.split(key, n_steps)
            (net, opt_state), losses = jax.lax.scan(body, (net, opt_state),
                                                    keys)
            return net, opt_state, losses

        self._multi_step_fn = multi_step
        return step

    def _make_eval_fn(self):
        prior = self._model.prior
        action = self._model.action
        sharder = self._model.device_handler.batch_sharder()

        has_ctrl = self._has_controls

        @partial(jax.jit, static_argnums=(2,))
        def evaluate(net, key, batch_size):
            if has_ctrl:
                from ..models.couplings import refresh_controls

                ctrl_key, key = jax.random.split(key)
                net = refresh_controls(net, ctrl_key, batch_size)
            x, logr = prior.sample_(key, batch_size)
            x = sharder(x)
            y, logj = net.forward(x)
            logq = logr - logj
            logp = -action(y)
            return logq, logp

        return evaluate

    # ------------------------------------------------------------------ #
    def train(self, n_epochs, batch_size=None, save_every=None,
              steps_per_call=None):
        """Run the epoch loop (reference _normflowcore.py:249-273).

        ``steps_per_call > 1`` runs that many epochs per device program via
        ``lax.scan`` (segments are cut at checkpoint epochs so printed
        metrics and snapshots land on the same epochs as ``steps_per_call=1``).
        """
        if batch_size is not None:
            self.train_batch_size = batch_size
        if save_every is None:
            save_every = n_epochs
        if self._step_fn is None:
            self._step_fn = self._make_step_fn()
        model = self._model
        print_stride = self.checkpoint_dict["print_stride"]
        evals_on = print_stride is not None
        stride = max(int(print_stride), 1) if evals_on else n_epochs + 1
        spc = steps_per_call or 1

        def next_stop(epoch):
            stops = [n_epochs, epoch + spc]
            if evals_on:
                for mark in (1, 10):
                    if epoch < mark:
                        stops.append(mark)
                stops.append((epoch // stride + 1) * stride)
            if save_every > 0:
                stops.append((epoch // save_every + 1) * save_every)
            return min(s for s in stops if s > epoch)

        guard = self.rewind_on_spike
        if guard is not None:
            last_good = (model.net_, self.opt_state)
            best_seg = np.inf
            rewinds = self.train_history.setdefault("rewinds", [])

        t1 = time.time()
        epoch = 0
        while epoch < n_epochs:
            seg = next_stop(epoch) - epoch
            if seg == 1:
                loss, _ = self.step()
                losses = [loss]
            else:
                net, self.opt_state, losses = self._multi_step_fn(
                    model.net_, self.opt_state, model.next_key(),
                    self.train_batch_size, seg, self._lr_scale)
                model.net_ = net
            epoch += seg
            # ONE bulk device->host transfer per segment.  Iterating the
            # device array (`float(l) for l in losses`) costs a separate
            # ~50 ms round trip PER ELEMENT on remote/tunneled devices and
            # silently dominated the epoch loop (~10x the compute time).
            losses_np = np.atleast_1d(np.asarray(jax.device_get(losses)))
            if guard is not None:
                seg_med = (float(np.median(losses_np))
                           if np.isfinite(losses_np).all() else np.inf)
                if seg_med > best_seg + guard:
                    if len(rewinds) < self.max_rewinds:
                        model.net_, self.opt_state = last_good
                        # fresh trajectory from the healthy point: advance
                        # the RNG stream past the segment that diverged
                        model._key = jax.random.fold_in(
                            model._key, 7919 + len(rewinds))
                        rewinds.append(epoch)
                        if self.rewind_lr_backoff is not None:
                            self._lr_scale *= float(self.rewind_lr_backoff)
                        if model.device_handler.rank == 0:
                            back = (f", lr scale -> {self._lr_scale:g}"
                                    if self.rewind_lr_backoff else "")
                            print(f"Epoch {epoch} | loss spike "
                                  f"{seg_med:g} > best {best_seg:g} + "
                                  f"{guard:g}: rewound to last healthy "
                                  f"snapshot ({len(rewinds)}/"
                                  f"{self.max_rewinds}){back}")
                        continue
                else:
                    best_seg = min(best_seg, seg_med)
                    last_good = (model.net_, self.opt_state)
            if model.device_handler.rank == 0:
                self.train_history["loss"].extend(losses_np.tolist())
            self.checkpoint(epoch, losses_np[-1], save_every)
        t2 = time.time()
        if n_epochs > 0 and model.device_handler.rank == 0:
            print(f"({jax.devices()[0].platform}) Time = {t2 - t1:.3g} sec.")
        return self.train_history

    def step(self):
        """One training step (reference _normflowcore.py:275-294)."""
        model = self._model
        net, self.opt_state, loss, logqp = self._step_fn(
            model.net_, self.opt_state, model.next_key(),
            self.train_batch_size, self._lr_scale
        )
        model.net_ = net
        return loss, logqp

    # ------------------------------------------------------------------ #
    def checkpoint(self, epoch, loss, save_every):
        """Metric printing + snapshotting (reference _normflowcore.py:296-323).

        (Per-epoch loss history is appended by ``train``.)
        """
        model = self._model
        rank = model.device_handler.rank
        cd = self.checkpoint_dict
        if rank == 0:
            if (cd["snapshot_path"] is not None and save_every
                    and epoch % save_every == 0):
                self._save_snapshot(epoch)

        if not cd["print_stride"]:  # None or 0: evals disabled
            return
        if epoch == 1 or epoch == 10 or (epoch % cd["print_stride"] == 0):
            if self._eval_fn is None:
                self._eval_fn = self._make_eval_fn()
            logq, logp = self._eval_fn(
                model.net_, model.next_key(), cd["print_batch_size"])
            if model.device_handler.nranks > 1:
                # multi-host: the metric batch is sharded across processes;
                # gather to every host before host-level math (reference
                # all_gather_into_tensor, _normflowcore.py:310-317)
                logq = model.device_handler.all_gather_into_tensor(logq)
                logp = model.device_handler.all_gather_into_tensor(logp)
            if rank == 0:
                logq, logp = jnp.asarray(logq), jnp.asarray(logp)
                loss_ = self.loss_fn(logq, logp)
                self._append_to_train_history(np.asarray(logq), np.asarray(logp))
                self.print_fit_status(epoch, loss=float(loss_))

    def _append_to_train_history(self, logq, logp):
        from ..mcmc import estimate_accept_rate

        logqp = logq - logp
        logz = estimate_logz(logqp, method="jackknife")
        accept_rate = estimate_accept_rate(logqp)
        ess = float(losses.calc_ess(jnp.asarray(logqp), 0.0))
        rho = float(losses.calc_corrcoef(jnp.asarray(logq), jnp.asarray(logp)))
        self.train_history["logqp"].append(
            (float(np.mean(logqp)), float(np.std(logqp))))
        self.train_history["logz"].append(logz)
        self.train_history["ess"].append(ess)
        self.train_history["rho"].append(rho)
        self.train_history["accept_rate"].append(accept_rate)

    def print_fit_status(self, epoch, loss=None):
        h = self.train_history
        if loss is None:
            loss = h["loss"][-1]
        logqp_mean, logqp_std = h["logqp"][-1]
        logz_mean, logz_std = h["logz"][-1]
        ar_mean, ar_std = h["accept_rate"][-1]
        adjusted_logqp_mean = logqp_mean + logz_mean
        ess, rho = h["ess"][-1], h["rho"][-1]

        if epoch == 1:
            print(f"\n>>> Training progress ({jax.devices()[0].platform}) <<<\n")
            print("Note: log(q/p) is estimated with normalized p; "
                  "mean & error are obtained from samples in a batch\n")

        epoch += self.checkpoint_dict["epochs_run"]
        str_ = f"Epoch: {epoch} | loss: {loss:g} | ess: {ess:g} | rho: {rho:g}"
        str_ += " | log(z): {0} | log(q/p): {1} | accept_rate: {2}".format(
            fmt_val_err(logz_mean, logz_std, err_digits=2),
            fmt_val_err(adjusted_logqp_mean, logqp_std, err_digits=2),
            fmt_val_err(ar_mean, ar_std, err_digits=1),
        )
        if self.checkpoint_dict["print_extra_func"] is not None:
            str_ += self.checkpoint_dict["print_extra_func"](epoch)
        print(str_)

    # ------------------------------------------------------------------ #
    def _save_snapshot(self, epoch):
        cd = self.checkpoint_dict
        epochs_run = epoch + cd["epochs_run"]
        path = snapshot_path_for_epoch(cd["snapshot_path"], epochs_run)
        model = self._model
        save_snapshot(path, net=model.net_, opt_state=self.opt_state,
                      epoch=epochs_run, key=model._key)
        print(f"Epoch {epochs_run} | Model Snapshot saved at {path}")

    def _load_snapshot(self, path):
        model = self._model
        net, opt_state, epoch, key = load_snapshot(
            path, net=model.net_, opt_state=self.opt_state, key=model._key)
        model.net_ = net
        model._key = key
        self.opt_state = opt_state
        self.checkpoint_dict["epochs_run"] = epoch
        print(f"Snapshot found: {path}\nResuming training via Saved Snapshot "
              f"at Epoch {epoch}")

    # loss zoo re-exported as static methods for API parity ------------- #
    calc_kl_mean = staticmethod(losses.calc_kl_mean)
    calc_kl_var = staticmethod(losses.calc_kl_var)
    calc_corrcoef = staticmethod(losses.calc_corrcoef)
    calc_direct_kl_mean = staticmethod(losses.calc_direct_kl_mean)
    calc_kl_mean_includelogz = staticmethod(losses.calc_kl_mean_includelogz)
    calc_least_squares = staticmethod(losses.calc_least_squares)
    calc_minus_logz = staticmethod(losses.calc_minus_logz)
    calc_ess = staticmethod(losses.calc_ess)
    calc_minus_ess = staticmethod(losses.calc_minus_ess)
