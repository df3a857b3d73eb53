"""Parity shim for /root/reference/src/nn/scalar/psd_.py."""

from ...models.spectral import PSDBlock as PSDBlock_
