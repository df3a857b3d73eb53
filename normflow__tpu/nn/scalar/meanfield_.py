"""Parity shim for /root/reference/src/nn/scalar/meanfield_.py."""

from ...models.spectral import MeanFieldFlow as MeanFieldNet_
