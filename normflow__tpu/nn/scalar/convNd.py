"""Parity shim for /root/reference/src/nn/scalar/convNd.py."""

from ...models.nets import CircularConv as ConvNd
from ...models.nets import CircularConv as Conv4d
