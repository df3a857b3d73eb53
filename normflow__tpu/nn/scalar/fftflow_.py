"""Parity shim for /root/reference/src/nn/scalar/fftflow_.py."""

from ...models.spectral import FFTFlow as FFTNet_
from ...models.spectral import IPSD, IPSDNoZeroMode, FreeScalar
