"""Parity shim for /root/reference/src/nn/scalar/couplings_.py."""

from ...models.couplings import (
    Coupling as Coupling_,
    ShiftCoupling as ShiftCoupling_,
    AffineCoupling as AffineCoupling_,
    RQSplineCoupling as RQSplineCoupling_,
    MultiRQSplineCoupling as MultiRQSplineCoupling_,
)
