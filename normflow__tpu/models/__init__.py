"""Model components: flows, priors, actions, masks."""

from . import core
from . import elementwise
from . import priors
from . import actions
from . import masks

from .core import (
    Flow, FlowList, MultiChannelFlow, MultiOutChannelFlow,
    InvisibilityMaskWrapper, sum_density,
)
from .elementwise import (
    Identity, Clone, Scale, Tanh, ArcTanh, Expit, Logit, Pade11, Pade22,
    Pade32, SgnBias, SplineFlow, UnityDistConvertor, PhaseDistConvertor,
    DistConvertor,
)
from .priors import NormalPrior, UniformPrior, PriorList
from .actions import ScalarPhi4Action, GaugeAction, U1GaugeAction, MatrixAction
from .masks import (
    EvenOddMask, AlongAxesEvenOddMask, DummyMask, DoubleMask,
    GaugeLinksDoubleMask, ZebraPlanarMask, MatrixMask, ListPartitioner,
    ChunkCatPartitioner, AlongAxisEvenOddPartitioner,
)
