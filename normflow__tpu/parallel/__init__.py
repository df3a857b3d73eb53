"""Device mesh / distributed layer (replaces the reference's ``device``)."""

from .mesh import ModelDeviceHandler, make_mesh, init_distributed, fold_key

__all__ = ["ModelDeviceHandler", "make_mesh", "init_distributed", "fold_key"]
