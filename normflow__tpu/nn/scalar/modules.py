"""Parity shim for /root/reference/src/nn/scalar/modules.py."""

from ...models.nets import ConvNet as ConvAct
from ...models.nets import LinearNet as LinearAct
from ...models.nets import PlusBias, ACTIVATIONS
from ...models.elementwise import SplineNet
