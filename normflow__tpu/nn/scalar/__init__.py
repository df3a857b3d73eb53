"""Reference-parity subnamespace (/root/reference/src/nn/scalar/).

Lets scripts written against ``normflow.nn.scalar...`` port mechanically:
each reference module name re-exports the corresponding TPU-native
implementation from ``normflow__tpu.models``.
"""

from .modules import ConvAct, LinearAct, SplineNet, PlusBias, ACTIVATIONS
from .modules_ import (
    Identity_, Clone_, ScaleNet_, Tanh_, ArcTanh_, Expit_, Logit_,
    Pade11_, Pade22_, Pade32_, SplineNet_, UnityDistConvertor_,
    PhaseDistConvertor_, DistConvertor_, SgnBiasNet_,
)
from .couplings_ import (
    Coupling_, ShiftCoupling_, AffineCoupling_, RQSplineCoupling_,
    MultiRQSplineCoupling_,
)
from .cntr_couplings_ import (
    DirectCntrCoupling_, CntrCoupling_, CntrShiftCoupling_,
    CntrAffineCoupling_, CntrRQSplineCoupling_, CntrMultiRQSplineCoupling_,
)
from .fftflow_ import FFTNet_
from .meanfield_ import MeanFieldNet_
from .psd_ import PSDBlock_
from .convNd import ConvNd, Conv4d
