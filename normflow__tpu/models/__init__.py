"""Model components: flows, priors, actions, masks."""

from . import core
from . import elementwise
from . import priors
from . import actions
from . import masks
from . import nets
from . import gauge
from . import couplings
from . import spectral

from .core import (
    Flow, FlowList, MultiChannelFlow, MultiOutChannelFlow,
    InvisibilityMaskWrapper, Frozen, freeze, unfreeze, trainable_mask,
    sum_density,
)
from .elementwise import (
    Identity, Clone, Scale, Tanh, ArcTanh, Expit, Logit, Pade11, Pade22,
    Pade32, SgnBias, SplineFlow, SplineNet, UnityDistConvertor,
    PhaseDistConvertor, DistConvertor,
)
from .nets import ConvNet, LinearNet, CircularConv, Dense, ACTIVATIONS
from .couplings import (
    Coupling, ShiftCoupling, AffineCoupling, RQSplineCoupling,
    MultiRQSplineCoupling, DirectCntrCoupling, CntrCoupling,
    CntrShiftCoupling, CntrAffineCoupling, CntrRQSplineCoupling,
    CntrMultiRQSplineCoupling,
)
from .spectral import (FFTFlow, IPSD, IPSDNoZeroMode, MeanFieldFlow,
                       PSDBlock, FreeScalar)
from .priors import NormalPrior, UniformPrior, PriorList
from .actions import (ScalarPhi4Action, GaugeAction, U1GaugeAction,
                      MatrixAction, SchwingerAction)
from .fermions import (StaggeredFermionLogDet, build_schwinger_action,
                       staggered_dirac_matrix)
from .gauge import (U1PlaquetteCoupling, U1AngleAction,
                    build_u1_gauge_flow, u1_plaq_angle)
from .masks import (
    Mask, EvenOddMask, AlongAxesEvenOddMask, DummyMask, DoubleMask,
    PackedEvenOddMask,
    GaugeLinksDoubleMask, ZebraPlanarMask, MatrixMask, ListPartitioner,
    ChunkCatPartitioner, AlongAxisEvenOddPartitioner,
)
