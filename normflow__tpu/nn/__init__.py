"""Flow networks -- reference-parity namespace (/root/reference/src/nn/__init__.py).

Reference trailing-underscore names map to underscore-free names here (the
``(y, log_det)`` contract is universal in this package); underscored aliases
are provided so reference users can port scripts mechanically.
"""

from ..models.core import (
    Flow, FlowList, MultiChannelFlow, MultiOutChannelFlow,
    InvisibilityMaskWrapper, Frozen, freeze, unfreeze,
)
from ..models.elementwise import (
    Identity, Clone, Scale, Tanh, ArcTanh, Expit, Logit, Pade11, Pade22,
    Pade32, SgnBias, SplineFlow, UnityDistConvertor, PhaseDistConvertor,
    DistConvertor,
)
from ..models.nets import ConvNet, LinearNet, CircularConv, Dense, ACTIVATIONS
from ..models.elementwise import SplineNet
from ..models.spectral import IPSD, IPSDNoZeroMode, FreeScalar
from ..models.couplings import (
    Coupling, ShiftCoupling, AffineCoupling, RQSplineCoupling,
    MultiRQSplineCoupling, DirectCntrCoupling, CntrCoupling,
    CntrShiftCoupling, CntrAffineCoupling, CntrRQSplineCoupling,
    CntrMultiRQSplineCoupling,
)
from ..models.spectral import FFTFlow, IPSD, MeanFieldFlow, PSDBlock
from ..models.gauge import (U1PlaquetteCoupling, U1AngleAction,
                            build_u1_gauge_flow)
from . import scalar

# Reference-parity aliases (trailing underscore convention)
Module_ = Flow
ModuleList_ = FlowList
MultiChannelModule_ = MultiChannelFlow
MultiOutChannelModule_ = MultiOutChannelFlow
InvisibilityMaskWrapperModule_ = InvisibilityMaskWrapper
Identity_ = Identity
Clone_ = Clone
ScaleNet_ = Scale
Tanh_ = Tanh
ArcTanh_ = ArcTanh
Expit_ = Expit
Logit_ = Logit
Pade11_ = Pade11
Pade22_ = Pade22
Pade32_ = Pade32
SgnBiasNet_ = SgnBias
SplineNet_ = SplineFlow
UnityDistConvertor_ = UnityDistConvertor
PhaseDistConvertor_ = PhaseDistConvertor
DistConvertor_ = DistConvertor
ConvAct = ConvNet
LinearAct = LinearNet
Coupling_ = Coupling
ShiftCoupling_ = ShiftCoupling
AffineCoupling_ = AffineCoupling
RQSplineCoupling_ = RQSplineCoupling
MultiRQSplineCoupling_ = MultiRQSplineCoupling
DirectCntrCoupling_ = DirectCntrCoupling
CntrCoupling_ = CntrCoupling
CntrShiftCoupling_ = CntrShiftCoupling
CntrAffineCoupling_ = CntrAffineCoupling
CntrRQSplineCoupling_ = CntrRQSplineCoupling
CntrMultiRQSplineCoupling_ = CntrMultiRQSplineCoupling
FFTNet_ = FFTFlow
MeanFieldNet_ = MeanFieldFlow
PSDBlock_ = PSDBlock
ConvNd = CircularConv
Conv4d = CircularConv
