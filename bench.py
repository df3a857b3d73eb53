"""Benchmark: effective samples/s/chip on 32x32 phi^4 (the driver's metric).

Drift policy (docs/EXPERIMENTS.md): raw throughput over the tunnel drifts
+-20% minute-to-minute, so every raw-rate comparison in this script is
INTERLEAVED within one session (the backend A/B below); quality metrics
(ESS/accept) are seed-deterministic.  Never compare raw numbers from two
separate bench runs.

Protocol (fully seeded -- two consecutive runs agree within the quoted
error bars):
 1. build the flagship 32x32 RQ-spline-coupling flow (BASELINE.json config 3);
 2. train for --train_epochs of reverse-KL (path-gradient estimator, fixed
    seed, one jitted scanned step, global grad-norm clip 25 -- unclipped
    runs can blow up late in training (round-2 48k-epoch study: finite
    loss spiral, accept -> 0), while tight thresholds (1-3) are active in
    NORMAL training and cost ~7% ESS; 25 is catastrophe-only insurance,
    measured at no ESS cost (0.6472 vs 0.6494 unclipped));
 3. measure raw sampling throughput (scanned sampling program, median of
    --reps timed repetitions; spread reported).  The default scan length
    (400 rounds/dispatch) amortizes the ~49 ms per-dispatch tunnel/host
    overhead to <4% (scripts/exp_scanlen.py: 242k samples/s at 50 rounds
    vs 319k at 400, asymptote 333k) -- production sampling
    (``sample_chain``) scans far more than this per dispatch;
 4. ESS fraction from the same logqp stream, with a bootstrap error bar;
 5. effective samples/s = throughput * ESS  (+- error from both factors).

Also reports a MEASURED roofline for the sampling program: the winner
program is re-run under ``jax.profiler.trace`` and the xplane is reduced
with xprof's op_profile -- per-op bytes come from the compiled program's
actual buffer-space assignment (HBM vs VMEM) and per-op times are measured
on-device, so ``hbm_util``/``mfu`` are real utilizations (<= 1 by
construction), unlike the round-4 cost-analysis upper bound that reported
hbm_util 2.62.  Round-5 ground truth on v5e: MFU ~0.15, HBM ~0.02, VMEM
rd/wr ~0.06/0.12 -- the program is VPU-latency-bound with a VMEM-resident
working set, NOT bandwidth-bound (docs/EXPERIMENTS.md round 5).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

``vs_baseline`` compares against the reference implementation's measured
effective-samples/s on this host's CPU (the reference publishes no speed
numbers -- BASELINE.md; torch-CPU is its only runnable configuration here).
"""

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# Reference (torch CPU, jkomijani/normflow_) effective samples/s for the
# IDENTICAL 32x32 architecture on this host, measured 2026-08-17 with
# scripts/bench_reference.py --train_epochs 400: raw 220.6 samples/s,
# ESS 0.0132 -> 2.915 eff/s (training took 3767 s; our protocol trains
# fewer wall-clock seconds than the reference received).
REFERENCE_EFF_SAMPLES_PER_SEC = 2.915

def bootstrap_ess_err(logqp, n_boot=200, seed=123):
    """Bootstrap standard error of the normalized ESS."""
    from normflow__tpu.ops.stats import calc_ess

    rng = np.random.default_rng(seed)
    logqp = np.asarray(logqp)
    n = logqp.shape[0]
    vals = [
        float(calc_ess(jnp.asarray(logqp[rng.integers(0, n, n)]), 0.0))
        for _ in range(n_boot)
    ]
    return float(np.std(vals))


def measured_roofline(model, sample_iters, batch, key):
    """Profiler-grounded roofline of the CURRENT model's sampling program.

    Captures a ``jax.profiler`` device trace of one ``logqp_stream``
    program and reduces it with xprof's op_profile: returns utilization
    fractions where bytes/flops come from the compiled program's buffer
    assignment (memory-space aware) and times are measured per-op on the
    device.  All fractions are true utilizations in [0, 1].  Returns {} if
    the profiler tooling is unavailable (non-TPU or missing xprof).
    """
    import glob
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="nf_bench_trace_")
    try:
        with jax.profiler.trace(tmp):
            out = model.posterior.logqp_stream(sample_iters, batch, key=key)
            jax.block_until_ready(out)
        paths = glob.glob(os.path.join(tmp, "**", "*.xplane.pb"),
                          recursive=True)
        if not paths:
            return {}
        from xprof.convert import raw_to_tool_data as rtd

        data, _ = rtd.xspace_to_tool_data(paths, "op_profile", {})
        d = json.loads(data if isinstance(data, str) else data.decode())
        root = d.get("byProgramExcludeIdle") or d.get("byProgram")
        if root is None:
            return {}
        # the sampling program's node (largest non-IDLE child)
        prog = None
        for ch in root.get("children", []):
            if ch.get("name", "").startswith("jit__logqp_scan"):
                prog = ch
        node = prog or root
        m = node.get("metrics", {})
        bw = m.get("bandwidthUtils", [None, None, None])
        res = {
            "mfu_measured": round(float(m.get("flops", 0.0)), 5),
            "hbm_util_measured": (round(float(bw[0]), 5)
                                  if bw and bw[0] is not None else None),
            "vmem_rd_util": (round(float(bw[1]), 5)
                             if bw and len(bw) > 1 and bw[1] is not None
                             else None),
            "vmem_wr_util": (round(float(bw[2]), 5)
                             if bw and len(bw) > 2 and bw[2] is not None
                             else None),
        }
        # device busy fraction from the raw events (the program `while`)
        try:
            from jax.profiler import ProfileData

            pd = ProfileData.from_file(paths[0])
            start = stop = None
            for plane in pd.planes:
                st = dict(plane.stats) if plane.stats else {}
                if "profile_start_time" in st:
                    start, stop = (st["profile_start_time"],
                                   st["profile_stop_time"])
            plane = pd.find_plane_with_name("/device:TPU:0")
            if plane is not None:
                busy = 0.0
                for ln in plane.lines:
                    if ln.name == "XLA Modules":
                        busy = sum(e.duration_ns for e in ln.events)
                if start is not None and stop is not None and stop > start:
                    res["device_busy_frac"] = round(
                        busy / (stop - start), 4)
        except Exception:
            pass
        mfu = res.get("mfu_measured") or 0.0
        hbm = res.get("hbm_util_measured") or 0.0
        res["roofline_bound_measured"] = (
            "compute" if mfu > 0.5 else
            "bandwidth" if hbm > 0.5 else "latency/VPU")
        return res
    except Exception:
        return {}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def autotune_batch(model, candidates=(128, 256, 512, 1024), iters=50,
                   reps=3, key=None):
    """Pick the sampling batch by a short INTERLEAVED raw-rate sweep.

    The optimum shifts with lattice volume (round-4 finding: 512 at 32x32,
    128 at 64x64/128x128 -- VMEM working-set residency), so per-volume
    hardcoding goes stale; this measures it at run time.  ESS is
    batch-independent, so raw rate decides.  Returns (best_batch, table).
    """
    key = jax.random.key(0) if key is None else key
    progs = {}
    for b in candidates:  # compile/warmup
        progs[b] = model.posterior.logqp_stream(iters, b, key=key)
        jax.block_until_ready(progs[b])
    times = {b: [] for b in candidates}
    for _ in range(reps):
        for b in candidates:
            t0 = time.time()
            jax.block_until_ready(
                model.posterior.logqp_stream(iters, b, key=key))
            times[b].append(time.time() - t0)
    rate = {b: iters * b / float(np.median(ts)) for b, ts in times.items()}
    best = max(rate, key=rate.get)
    return best, {b: round(r, 1) for b, r in rate.items()}


def _probe_backend(max_tries=7):
    """Wait (bounded) for a healthy JAX backend before committing to the run.

    The tunneled TPU needs ~15-20 min to recover after a wedged client;
    worse, a failed backend init is CACHED in-process -- so each probe runs
    in a FRESH subprocess and the main process only touches jax.devices()
    once a probe has succeeded.  On final failure, print a one-line
    diagnostic JSON (the driver's contract) and exit 0 instead of dumping a
    traceback with rc=1 (round-2 BENCH capture failure mode).
    """
    import subprocess
    import sys

    delays = [0, 30, 60, 120, 240, 420, 420][:max_tries]
    last_err = ""
    for i, d in enumerate(delays):
        time.sleep(d)
        # visible heartbeat: queue watchdogs (scripts/tpu_queue.sh) and
        # humans tailing the log can tell "probing" from "hung"
        print(f"[bench] backend probe attempt {i + 1}/{len(delays)}",
              flush=True)
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; d = jax.devices()[0]; print(d.platform)"],
                capture_output=True, text=True, timeout=300)
            if r.returncode == 0 and r.stdout.strip():
                return r.stdout.strip().splitlines()[-1]
            last_err = (r.stdout + r.stderr).strip()[-500:]
        except subprocess.TimeoutExpired:
            last_err = "backend probe timed out after 300 s"
    print(json.dumps({
        "metric": "effective samples/s/chip (BACKEND UNAVAILABLE)",
        "value": 0.0, "unit": "eff_samples/s/chip", "vs_baseline": 0.0,
        "platform": "unavailable", "error": last_err,
        "note": ("TPU tunnel did not recover within the probe budget; "
                 "last driver-independent on-chip measurement: see README "
                 "round-2 results (235k eff samples/s/chip official pair)"),
    }))
    sys.exit(0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--train_epochs", type=int, default=96000,
                   help="96k is the round-4 official protocol: the epoch "
                        "axis keeps paying at fixed architecture (ESS "
                        "0.656/0.692/0.722 at 24k/48k/96k, raw unchanged "
                        "-- interleaved campaign, docs/EXPERIMENTS.md r4)")
    p.add_argument("--train_batch", type=int, default=512)
    p.add_argument("--batch", type=int, default=0,
                   help="sampling batch; 0 (default) = autotune with a "
                        "short interleaved sweep over 128/256/512/1024 on "
                        "the trained flow (the optimum shifts with volume: "
                        "512 at 32x32, 128 at 64x64 -- round-4 sweeps); "
                        "pass a value to pin it")
    p.add_argument("--sample_iters", type=int, default=400)
    p.add_argument("--steps_per_call", type=int, default=1000)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--lat", type=int, default=32)
    p.add_argument("--n_layers", type=int, default=4,
                   help="coupling layers (capacity experiments)")
    p.add_argument("--knots", type=int, default=8,
                   help="8 is the round-5 knots-at-convergence winner: "
                        "-0.031 ESS for +12% raw = +7.1% eff/s over 12 "
                        "(interleaved 96k-epoch A/B, docs/EXPERIMENTS.md "
                        "r5; the round-2 12-knot default was an "
                        "optimization-limited reading)")
    p.add_argument("--rng_impl", default="rbg",
                   choices=["rbg", "threefry2x32"],
                   help="PRNG for the SAMPLING stream: rbg measured +3.3% "
                        "raw at equal ESS over threefry on v5e (round-5 "
                        "micro A/B; RNG is part of the VPU small-op tail "
                        "the measured roofline identified).  Training "
                        "keys are untouched; Metropolis exactness does "
                        "not depend on the generator")
    p.add_argument("--hidden", type=int, nargs="*", default=[24, 24])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no_pallas", action="store_true")
    p.add_argument("--grad_estimator", default="path",
                   choices=["rep", "path"])
    p.add_argument("--clip", type=float, default=25.0,
                   help="global grad-norm clip for the training phase")
    args = p.parse_args()

    _probe_backend()

    import optax

    from __graft_entry__ import _flagship_model

    model = _flagship_model(lat_shape=(args.lat, args.lat), seed=args.seed,
                            n_layers=args.n_layers, knots=args.knots,
                            hidden=tuple(args.hidden))

    t0 = time.time()
    model.fit(n_epochs=args.train_epochs, batch_size=args.train_batch,
              hyperparam=dict(lr=3e-3, weight_decay=1e-4),
              scheduler=optax.cosine_decay_schedule(
                  1.0, decay_steps=args.train_epochs, alpha=0.05),
              steps_per_call=args.steps_per_call,
              grad_estimator=args.grad_estimator,
              clip_grad_norm=args.clip,
              checkpoint_dict=dict(print_stride=None))
    train_time = time.time() - t0

    # Sampling path: A/B the XLA vs fused-Pallas coupling backend and the
    # bf16-conditioner variant with INTERLEAVED timed repetitions
    # (tunnel/host contention drifts on the minute scale, so back-to-back
    # comparisons lie); keep the winner by EFFECTIVE rate (throughput*ESS
    # -- the bf16 arm trades ~1% ESS for ~10% raw speed).
    def with_backend(backend):
        if backend == "xla_bf16":
            from normflow__tpu.zoo import with_conv_compute_dtype

            return with_conv_compute_dtype(model.net_, "bfloat16")
        flows = list(model.net_.flows)
        flows[2] = flows[2].replace(backend=backend)
        return model.net_.replace(flows=tuple(flows))

    backends = ["xla"]
    if jax.devices()[0].platform == "tpu":
        backends += ["xla_bf16"]
        if not args.no_pallas:
            backends += ["pallas", "pallas_reg"]
    nets = {b: with_backend(b) for b in backends}

    # sampling-batch autotune (round-4 finding: the optimum shifts with
    # volume; round-5 makes bench pick it at run time).  Uses the bf16 arm
    # when available (the usual winner) -- raw-rate ORDER across batches is
    # arm-independent.
    batch_table = None
    if args.batch == 0:
        tune_backend = "xla_bf16" if "xla_bf16" in backends else "xla"
        model.net_ = nets[tune_backend]
        # tune at the OFFICIAL scan length: a short (50-iter) sweep biases
        # toward large batches by amortizing the per-dispatch constant over
        # more samples, flipping the 512-vs-1024 VMEM-residency ordering
        # that holds at the measured scan length (round-5 TPU smoke).
        args.batch, batch_table = autotune_batch(
            model, iters=args.sample_iters,
            key=jax.random.key(args.seed + 2, impl=args.rng_impl))
        print(f"[bench] autotuned sampling batch: {args.batch} "
              f"(raw/s {batch_table})", flush=True)

    key = jax.random.key(args.seed + 1, impl=args.rng_impl)
    k1, k2 = jax.random.split(key)
    times = {b: [] for b in backends}
    logqp_by = {}
    for b in backends:  # warmup/compile both programs
        model.net_ = nets[b]
        logqp_by[b] = model.posterior.logqp_stream(
            args.sample_iters, args.batch, key=k1)
        jax.block_until_ready(logqp_by[b])
    for _ in range(args.reps):
        for b in backends:
            model.net_ = nets[b]
            t0 = time.time()
            logqp_by[b] = model.posterior.logqp_stream(
                args.sample_iters, args.batch, key=k2)
            jax.block_until_ready(logqp_by[b])
            times[b].append(time.time() - t0)
    from normflow__tpu.training.losses import calc_ess

    n_per_program = args.sample_iters * args.batch
    med = {b: float(np.median(times[b])) for b in backends}
    ess_by = {b: float(calc_ess(logqp_by[b], 0.0)) for b in backends}
    eff_by = {b: n_per_program / med[b] * ess_by[b] for b in backends}
    best_backend = max(eff_by, key=eff_by.get)
    model.net_ = nets[best_backend]
    logqp = logqp_by[best_backend]
    dt = med[best_backend]
    times = times[best_backend]
    samples_per_sec = n_per_program / dt
    ess = ess_by[best_backend]
    ess_err = bootstrap_ess_err(logqp)
    from normflow__tpu.mcmc import estimate_accept_rate
    accept, accept_err = estimate_accept_rate(jax.device_get(logqp))

    eff_samples_per_sec = samples_per_sec * ess
    # error: ESS bootstrap + timing spread, combined in quadrature
    rel_t = float(np.std(times) / dt) if len(times) > 1 else 0.0
    rel_e = ess_err / max(ess, 1e-12)
    eff_err = eff_samples_per_sec * float(np.hypot(rel_t, rel_e))

    # -- roofline: MEASURED from a device profile of the winner program -- #
    # (round-5: replaces the cost-analysis upper bound, which reported the
    # physically impossible hbm_util 2.62 -- operand-byte counting ignores
    # the compiled program's actual VMEM residency).
    roofline = {}
    flops_per_sample = None
    if jax.devices()[0].platform == "tpu":
        roofline = measured_roofline(model, args.sample_iters, args.batch,
                                     key=k2)
    try:
        # model FLOPs per sample from cost analysis (per-iteration body,
        # counted once regardless of trip count) -- an op-count statistic,
        # kept for cross-run comparability; utilizations above are measured.
        from normflow__tpu.training.model import _logqp_scan

        compiled = _logqp_scan.lower(
            model.net_, model.prior, model.action, k2, args.sample_iters,
            args.batch).compile()
        ca_list = compiled.cost_analysis()
        ca = ca_list[0] if isinstance(ca_list, (list, tuple)) else ca_list
        flops_per_sample = float(ca.get("flops", 0.0)) / args.batch
    except Exception:
        pass

    vs = (eff_samples_per_sec / REFERENCE_EFF_SAMPLES_PER_SEC
          if REFERENCE_EFF_SAMPLES_PER_SEC else 1.0)
    # vs_baseline conflates hardware and framework: the reference runs
    # only on this host's CPU (torch has no TPU backend), so the ratio is
    # "this framework on its target silicon vs the reference on its only
    # runnable configuration here" -- labeled explicitly rather than
    # presented as a same-hardware speedup (round-4 VERDICT weak #5).
    out = {
        "metric": f"effective samples/s/chip, {args.lat}x{args.lat} phi^4",
        "value": round(eff_samples_per_sec, 3),
        "unit": "eff_samples/s/chip",
        "vs_baseline": round(vs, 3),
        "value_err": round(eff_err, 3),
        "raw_samples_per_sec": round(samples_per_sec, 1),
        "timing_spread_s": [round(t, 4) for t in times],
        "ess": round(ess, 4),
        "ess_err": round(ess_err, 4),
        "accept_rate": round(accept, 4),
        "accept_rate_err": round(accept_err, 4),
        "train_epochs": args.train_epochs,
        "n_layers": args.n_layers,
        "grad_estimator": args.grad_estimator,
        "sampling_backend": best_backend,
        "backend_medians_s": {b: round(v, 4) for b, v in med.items()},
        "backend_eff_per_s": {b: round(v, 1) for b, v in eff_by.items()},
        "train_time_s": round(train_time, 1),
        "platform": jax.devices()[0].platform,
        "sampling_batch": args.batch,
        "knots": args.knots,
        "rng_impl": args.rng_impl,
        "baseline": {
            "eff_per_s": REFERENCE_EFF_SAMPLES_PER_SEC,
            "config": "jkomijani/normflow_ (torch), identical 32x32 "
                      "architecture, this host's CPU -- the reference's "
                      "only runnable configuration here",
            "caveat": "vs_baseline is a cross-hardware+framework ratio, "
                      "not a same-silicon speedup",
        },
    }
    if batch_table is not None:
        out["batch_autotune_raw_per_s"] = batch_table
    out.update(roofline)
    if flops_per_sample is not None:
        out["flops_per_sample"] = round(flops_per_sample)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
