"""Checkpoint save/load: single-file msgpack snapshots of pytree leaves.

Improves on the reference's snapshots (/root/reference/src/_normflowcore.py:221-247),
which save only net weights + epoch: here the snapshot carries the net, the
*optimizer state*, the RNG key, and the epoch counter, so training resumes
bit-exactly.  Pytrees are stored as flattened leaf lists and restored against
a live template (the standard JAX pattern -- structure comes from code,
data from the file).  Paths follow the reference convention
``<base>.E<epoch>.<ext>`` with ``ext = 'msgpack'``.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
from flax.serialization import msgpack_restore, msgpack_serialize

__all__ = ["save_snapshot", "load_snapshot", "snapshot_path_for_epoch"]


def snapshot_path_for_epoch(snapshot_path: str, epoch: int) -> str:
    """``<base>.E<epoch>.msgpack``, mirroring ``_save_snapshot``'s
    ``<base>.E<epoch>.tar`` (reference _normflowcore.py:242).

    Only the basename's ``[.E<n>][.ext]`` suffix is stripped -- dotted
    directories (``run.32x32/model.msgpack``) and multi-dot basenames must
    not lose path components (a wrong base breaks resume silently)."""
    head, base = os.path.split(snapshot_path)
    parts = base.split(".")
    if len(parts) > 1:
        parts = parts[:-1]  # drop the extension
    if len(parts) > 1 and parts[-1][:1] == "E" and parts[-1][1:].isdigit():
        parts = parts[:-1]  # drop an existing .E<epoch>
    return os.path.join(head, ".".join(parts) + f".E{epoch}.msgpack")


from ..utils.serialization import (  # noqa: E402 (shared helpers)
    leaves_of as _leaves_of, restore_into as _restore_into)


def save_snapshot(path: str, *, net, opt_state=None, epoch: int = 0, key=None):
    state: dict[str, Any] = {"net": _leaves_of(net), "epochs_run": epoch}
    if opt_state is not None:
        state["opt_state"] = _leaves_of(opt_state)
    if key is not None:
        state["key"] = np.asarray(jax.random.key_data(key))
    blob = msgpack_serialize(state)
    dirname = os.path.dirname(os.path.abspath(path))
    os.makedirs(dirname, exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)


def load_snapshot(path: str, *, net, opt_state=None, key=None):
    """Restore a snapshot into the given pytree templates.

    Returns ``(net, opt_state, epoch, key)``; ``opt_state``/``key`` pass
    through unchanged if the snapshot predates them or no template is given.
    """
    with open(path, "rb") as f:
        state = msgpack_restore(f.read())
    new_net = _restore_into(net, state["net"])
    new_opt = opt_state
    if opt_state is not None and "opt_state" in state:
        new_opt = _restore_into(opt_state, state["opt_state"])
    new_key = key
    if key is not None and "key" in state:
        new_key = jax.random.wrap_key_data(np.asarray(state["key"]))
    return new_net, new_opt, int(state["epochs_run"]), new_key
