"""Parity shim for /root/reference/src/nn/scalar/cntr_couplings_.py."""

from ...models.couplings import (
    DirectCntrCoupling as DirectCntrCoupling_,
    CntrCoupling as CntrCoupling_,
    CntrShiftCoupling as CntrShiftCoupling_,
    CntrAffineCoupling as CntrAffineCoupling_,
    CntrRQSplineCoupling as CntrRQSplineCoupling_,
    CntrMultiRQSplineCoupling as CntrMultiRQSplineCoupling_,
)
