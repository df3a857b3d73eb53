"""Worker for the 2-process distributed test (run via subprocess, NOT
collected by pytest).

Each process initializes `jax.distributed`, attaches a GLOBAL mesh over all
(2 processes x 2 local CPU) devices, runs a small sharded fit, a
cross-process metric gather, and a rank-0-only snapshot -- exercising the
multi-host paths that single-process tests cannot (parallel/mesh.py
init_distributed/fold_key/all_gather_into_tensor, fitter rank-0 branches).

Usage: python _mp_worker.py <process_id> <num_processes> <coordinator> <tmpdir>
"""

import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # .axon_site clobbers the env var


def main():
    pid, nproc, coordinator, tmpdir = (int(sys.argv[1]), int(sys.argv[2]),
                                       sys.argv[3], sys.argv[4])
    from normflow__tpu.parallel import fold_key, init_distributed

    init_distributed(coordinator_address=coordinator, num_processes=nproc,
                     process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 2 * nproc, jax.devices()

    import jax.numpy as jnp
    import numpy as np

    import normflow__tpu as nf
    from normflow__tpu.nn import DistConvertor_

    net = DistConvertor_.build(6, symmetric=True)
    prior = nf.prior.NormalPrior.build(shape=(4,))
    action = nf.action.ScalarPhi4Action(kappa=0, m_sq=-1.2, lambd=0.5)
    model = nf.Model(net_=net, prior=prior, action=action, seed=7)

    mesh = model.device_handler.use_mesh()  # all global devices
    assert mesh.size == 2 * nproc
    model.device_handler.replicate_params()

    snap = os.path.join(tmpdir, "mp_snap.msgpack")
    hist = model.fit(
        n_epochs=4, batch_size=16, save_every=4,
        hyperparam=dict(lr=0.01, weight_decay=0.0),
        checkpoint_dict=dict(print_stride=2, print_batch_size=16,
                             snapshot_path=snap))
    # loss history is recorded on rank 0 only (fitter rank-0 branch);
    # recompute the final loss locally on every rank from the net state to
    # prove the sharded training left IDENTICAL replicated params everywhere
    logq, logp = model.fit._eval_fn(model.net_, jax.random.key(99), 16)
    logq = model.device_handler.all_gather_into_tensor(logq)
    logp = model.device_handler.all_gather_into_tensor(logp)
    loss = float(np.mean(np.asarray(logq) - np.asarray(logp)))
    assert np.isfinite(loss), loss
    if jax.process_index() == 0:
        assert len(hist["loss"]) == 4 and len(hist["ess"]) >= 1

    # fold_key gives distinct per-process keys from one seed
    folded = fold_key(jax.random.key(123))

    # explicit cross-process gather of host-local data
    local = jnp.full((2,), float(jax.process_index()))
    gathered = model.device_handler.all_gather_into_tensor(local)
    gathered = np.asarray(gathered).ravel()
    assert gathered.size == 2 * nproc, gathered
    assert set(np.unique(gathered)) == set(float(r) for r in range(nproc))

    # rank-0-only snapshot: exactly one process wrote it
    from normflow__tpu.training.checkpoint import snapshot_path_for_epoch
    wrote = os.path.exists(snapshot_path_for_epoch(snap, 4))

    # one line the parent parses; loss must be identical across processes
    # (metric history lives on rank 0 only -- fitter rank-0 branch)
    ess = hist["ess"][-1] if jax.process_index() == 0 else -1.0
    print(f"MPRESULT rank={jax.process_index()} loss={loss:.10f} "
          f"ess={ess:.6f} wrote_snapshot={int(wrote)}",
          flush=True)


if __name__ == "__main__":
    main()
